from sesa_tpu.runtime.demix import (DemixJob, DemixSpec, apply_tta, demix,
                                    demix_start, upload_mix)
