from .sr3_unet import SR3UNet, unet_from_config
from .arcface import IResNet, iresnet100, frozen_prefix_mask
from .mapping import MappingNetwork
from .flame import (FlameModel, load_flame, synthetic_flame, sphere_flame,
                    flame_forward, compute_landmarks)
from . import lbs

__all__ = [
    "SR3UNet", "unet_from_config", "IResNet", "iresnet100",
    "frozen_prefix_mask", "MappingNetwork", "FlameModel", "load_flame",
    "synthetic_flame", "sphere_flame", "flame_forward", "compute_landmarks",
    "lbs",
]
