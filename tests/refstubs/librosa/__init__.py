from . import filters  # noqa: F401


def hz_to_midi(frequencies):
    """Canonical MIDI mapping: 69 + 12*log2(f/440)."""
    import numpy as np

    return 12.0 * (np.log2(np.asarray(frequencies, dtype=float)) - np.log2(440.0)) + 69.0


def midi_to_hz(notes):
    import numpy as np

    return 440.0 * (2.0 ** ((np.asarray(notes, dtype=float) - 69.0) / 12.0))
