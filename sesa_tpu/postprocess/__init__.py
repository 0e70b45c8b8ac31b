from sesa_tpu.postprocess.ensemble import (
    ensemble_files,
    ensemble_waveforms,
    ensemble_waveforms_device,
    ENSEMBLE_METHODS,
)
from sesa_tpu.postprocess.phase_fixer import (
    ensemble_phase_fix_device,
    phase_fix_arrays,
    process_phase_fix,
)
