from vit_ae_plus_plus_tpu.models.vit import (
    ContrastiveHeads,
    VisionTransformer3D,
    VisionTransformer3DContrastive,
)
from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.zoo import MODEL_ZOO, build_model, get_models
from vit_ae_plus_plus_tpu.models.resnet3d import ResNet3D, generate_model
from vit_ae_plus_plus_tpu.models.moco import (
    MoCoResNet3D,
    MoCoViT3D,
    ema_update,
    info_nce,
    moco_loss,
)
from vit_ae_plus_plus_tpu.models.vgg import (
    VGG16Features,
    build_perceptual,
    load_torch_vgg_state_dict,
)
from vit_ae_plus_plus_tpu.models.quant import (
    make_quant_feature_step,
    quant_forward_features,
    quantize_params,
)

__all__ = [
    "ContrastiveHeads",
    "VisionTransformer3D",
    "VisionTransformer3DContrastive",
    "MaskedAutoencoderViT3D",
    "MODEL_ZOO",
    "build_model",
    "get_models",
    "ResNet3D",
    "generate_model",
    "MoCoResNet3D",
    "MoCoViT3D",
    "ema_update",
    "info_nce",
    "moco_loss",
    "VGG16Features",
    "build_perceptual",
    "load_torch_vgg_state_dict",
    "make_quant_feature_step",
    "quant_forward_features",
    "quantize_params",
]
