from vit_ae_plus_plus_tpu.data.transforms import (
    Compose,
    RandomAffine3D,
    RandomGamma,
    RandomNoise,
    default_ssl_transforms,
)
from vit_ae_plus_plus_tpu.data.brats import BraTSDataset
from vit_ae_plus_plus_tpu.data.egd import EGDDataset
from vit_ae_plus_plus_tpu.data.factory import get_dataset
from vit_ae_plus_plus_tpu.data.loader import Loader, all_items

__all__ = [
    "Compose",
    "RandomAffine3D",
    "RandomGamma",
    "RandomNoise",
    "default_ssl_transforms",
    "BraTSDataset",
    "EGDDataset",
    "get_dataset",
    "Loader",
    "all_items",
]
