from .image import (arcface_blob_differentiable, arcface_blob_from_uint8,
                    bgr_swap, degrade_pair, resize, sr_to_mica_inputs,
                    tensor_to_uint8, tensor_to_unit)

__all__ = [
    "arcface_blob_differentiable", "arcface_blob_from_uint8", "bgr_swap",
    "degrade_pair", "resize", "sr_to_mica_inputs", "tensor_to_uint8",
    "tensor_to_unit",
]
