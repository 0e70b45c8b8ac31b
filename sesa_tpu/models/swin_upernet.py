"""swin_upernet — STFT image through a Swin-backbone UperNet.

Behavioral spec: reference models/upernet_swin_transformers.py:147-227 —
the same STFT-image shell around HuggingFace's
UperNetForSemanticSegmentation with a Swin backbone. The pretrained
HF vision stack cannot run on this TPU build (torch-only weights and
architecture); the shell is shared with segm_models' self-contained U-Net
so the model TYPE functions, and convert_torch raises with an explanation.
"""

from sesa_tpu.models.segm_models import apply, init  # same shell + U-Net


def convert_torch(state_dict, config):
    raise NotImplementedError(
        "swin_upernet checkpoints wrap HuggingFace's "
        "UperNetForSemanticSegmentation (Swin backbone), a torch vision "
        "stack that is not reproducible in this TPU build. Use the "
        "roformer/mdx23c/scnet families instead."
    )
