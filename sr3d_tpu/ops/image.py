"""On-device image preprocessing ops (NHWC, jit-compatible).

Replaces the reference's inner-loop host round trips — the single biggest
throughput bug in the reference pipeline, which pulls every SR sample back to
host for ``cv2.resize``/``cv2.dnn.blobFromImages`` per image
(reference: model/sr3d/model.py:462-487, :105-131) — with fused XLA ops that
keep the SR → MICA hand-off entirely in HBM:

* ``tensor_to_uint8`` replicates ``Metrics.tensor2img`` quantisation
  (reference: core/metrics.py:16-42): clamp [-1,1] → [0,1] → round(×255).
* ``arcface_blob_*`` replicate the two reference blob paths: the
  cv2.dnn.blobFromImages route (model2: resize → normalise → BGR swap) and
  the differentiable ``create_tensor_blob`` route (model3: normalise →
  resize → BGR swap).
* resizes use ``jax.image.resize``; ``antialias=False`` matches cv2
  INTER_LINEAR, ``antialias=True`` matches PIL's filtered resampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INPUT_MEAN = 127.5
INPUT_STD = 127.5


def resize(x: jax.Array, height: int, width: int, method: str = "bilinear",
           antialias: bool = False) -> jax.Array:
    """Resize NHWC (or HWC) images. method: 'bilinear'|'bicubic'|'nearest'."""
    method_map = {"bilinear": "linear", "bicubic": "cubic",
                  "nearest": "nearest"}
    m = method_map[method]
    if x.ndim == 3:
        shape = (height, width, x.shape[-1])
    else:
        shape = (x.shape[0], height, width, x.shape[-1])
    return jax.image.resize(x, shape, method=m, antialias=antialias)


def tensor_to_unit(x: jax.Array, min_max=(-1.0, 1.0)) -> jax.Array:
    """Clamp to min_max and rescale to [0,1] (reference core/metrics.py:22-24)."""
    lo, hi = min_max
    x = jnp.clip(x, lo, hi)
    return (x - lo) / (hi - lo)


def tensor_to_uint8(x: jax.Array, min_max=(-1.0, 1.0)) -> jax.Array:
    """[-1,1] float → float array holding exact uint8 values (0..255).

    Matches ``tensor2img``'s ``(img*255).round()`` (core/metrics.py:39-42)
    while staying in floating point on device.
    """
    return jnp.round(tensor_to_unit(x, min_max) * 255.0)


def bgr_swap(x: jax.Array) -> jax.Array:
    """RGB↔BGR channel swap on the last axis (swapRB)."""
    return x[..., ::-1]


def arcface_blob_from_uint8(img_uint8: jax.Array, size: int = 112) -> jax.Array:
    """cv2.dnn.blobFromImages equivalent (model2 path,
    reference model/sr3d/model.py:127-131): resize(size) →
    (x - 127.5)/127.5 → BGR.  Input NHWC float holding uint8 values."""
    x = resize(img_uint8, size, size, "bilinear", antialias=False)
    x = (x - INPUT_MEAN) / INPUT_STD
    return bgr_swap(x)


def arcface_blob_differentiable(img_255: jax.Array, size: int = 112) -> jax.Array:
    """``create_tensor_blob`` equivalent (model3 differentiable path,
    reference model/sr3d/model.py:105-124): (x-127.5)/127.5 → bilinear
    resize(size, align_corners=False ≙ half-pixel) → BGR."""
    x = (img_255 - INPUT_MEAN) / INPUT_STD
    x = resize(x, size, size, "bilinear", antialias=False)
    return bgr_swap(x)


def sr_to_mica_inputs(
    sr: jax.Array,
    *,
    image_size: int = 224,
    blob_size: int = 112,
    quantize: bool = True,
    differentiable: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused SR→MICA hand-off: SR output in [-1,1] NHWC →
    (images [B,224,224,3] in [0,1], arcface blobs [B,112,112,3] in [-1,1] BGR).

    ``quantize=True`` mirrors the reference's uint8 round trip (model2);
    ``differentiable=True`` follows the model3 ordering and skips rounding so
    gradients flow (the straight-through hand-off the reference approximates
    with ``.detach().requires_grad_()``).
    """
    if differentiable:
        unit = tensor_to_unit(sr)                       # [0,1], differentiable
        img224 = resize(unit, image_size, image_size, "bilinear")
        blob = arcface_blob_differentiable(img224 * 255.0, blob_size)
        return img224, blob
    u8 = tensor_to_uint8(sr) if quantize else tensor_to_unit(sr) * 255.0
    u8 = jax.lax.stop_gradient(u8)
    img224_u8 = resize(u8, image_size, image_size, "bilinear")
    if quantize:
        img224_u8 = jnp.round(img224_u8)
    blob = arcface_blob_from_uint8(img224_u8, blob_size)
    return img224_u8 / 255.0, blob


def degrade_pair(hr: jax.Array, l_res: int, r_res: int,
                 antialias: bool = True) -> tuple[jax.Array, jax.Array]:
    """On-device LR/SR-conditioning pair from an HR batch: bicubic downscale
    to l_res and bicubic re-upsample to r_res — the on-line equivalent of the
    offline prep tool (reference datasets/tool/prepare_data.py:37-47)."""
    lr = resize(hr, l_res, l_res, "bicubic", antialias=antialias)
    sr_cond = resize(lr, r_res, r_res, "bicubic", antialias=False)
    return lr, sr_cond
