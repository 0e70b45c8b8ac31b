from sesa_tpu.runtime.demix import DemixSpec, demix, apply_tta
