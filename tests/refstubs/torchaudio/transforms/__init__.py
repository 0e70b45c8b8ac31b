from .transforms import InverseSpectrogram, Spectrogram  # noqa: F401
