from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D, ContrastiveHeads
from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.zoo import MODEL_ZOO, build_model, get_models
from vit_ae_plus_plus_tpu.models.quant import (
    make_quant_feature_step,
    quant_forward_features,
    quantize_params,
)

__all__ = [
    "VisionTransformer3D",
    "ContrastiveHeads",
    "MaskedAutoencoderViT3D",
    "MODEL_ZOO",
    "build_model",
    "get_models",
]
