"""librosa.filters.mel shim delegating to the repo's formula-derived
slaney filterbank (see README.md for the shared-derivation caveat)."""

from sesa_tpu.ops.mel import mel_filter_bank


def mel(*, sr, n_fft, n_mels=128, **kwargs):
    assert not kwargs, f"refstub librosa.filters.mel: unsupported {kwargs}"
    return mel_filter_bank(sr, n_fft, n_mels)
