from vit_ae_plus_plus_tpu.configs.config import (
    ViTConfig,
    MAEConfig,
    TrainConfig,
    DataConfig,
)

__all__ = ["ViTConfig", "MAEConfig", "TrainConfig", "DataConfig"]
