from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D, ContrastiveHeads
from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.zoo import MODEL_ZOO, build_model, get_models

__all__ = [
    "VisionTransformer3D",
    "ContrastiveHeads",
    "MaskedAutoencoderViT3D",
    "MODEL_ZOO",
    "build_model",
    "get_models",
]
