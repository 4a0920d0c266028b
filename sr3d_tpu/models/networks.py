"""Network factory — ``define_G`` parity.

Reference: model/sr/networks.py:60-116 (``define_G`` selects ``sr3`` vs
``ddpm`` module families by ``which_model_G`` and wraps the UNet in
``GaussianDiffusion``).  In this functional framework the "wrap" is returning
the module + matching time-input convention; init styles (orthogonal /
kaiming / normal, reference init_weights :9-58) are provided for
from-scratch training parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ddpm_unet import DDPMUNet
from .sr3_unet import SR3UNet


def define_g(sr_model_cfg, *, dtype=jnp.bfloat16, remat: bool = False):
    """Build the generator UNet from ``cfg.sr.model``.

    Returns ``(module, time_input)`` where time_input is "gamma" (SR3
    continuous noise level) or "t" (DDPM integer steps) — the convention the
    diffusion functions need (sr3d_tpu.diffusion.gaussian).
    """
    unet_cfg = sr_model_cfg["unet"]
    diff_cfg = sr_model_cfg["diffusion"]
    which = str(sr_model_cfg.get("which_model_G", "sr3"))
    kw = dict(
        in_channel=int(unet_cfg["in_channel"]),
        out_channel=int(unet_cfg["out_channel"]),
        inner_channel=int(unet_cfg["inner_channel"]),
        norm_groups=int(unet_cfg.get("norm_groups", 32)),
        channel_mults=tuple(unet_cfg["channel_multiplier"]),
        attn_res=tuple(unet_cfg["attn_res"]),
        res_blocks=int(unet_cfg["res_blocks"]),
        dropout=float(unet_cfg["dropout"]),
        image_size=int(diff_cfg["image_size"]),
        dtype=dtype,
        remat=remat,
    )
    if which == "sr3":
        return SR3UNet(**kw), "gamma"
    if which == "ddpm":
        return DDPMUNet(**kw), "t"
    raise NotImplementedError(f"which_model_G: {which}")


def init_weights_variant(params, rng, init_type: str = "orthogonal",
                         scale: float = 1.0):
    """Re-initialise conv/dense kernels in a param pytree with the
    reference's init families (orthogonal | kaiming | normal,
    reference model/sr/networks.py:9-58).  Biases → 0."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    keys = jax.random.split(rng, len(flat))
    for (path, leaf), k in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        elif name == "kernel" and leaf.ndim >= 2:
            if init_type == "orthogonal":
                init = jax.nn.initializers.orthogonal(scale)
            elif init_type == "kaiming":
                init = jax.nn.initializers.variance_scaling(
                    2.0 * scale, "fan_in", "normal")
            elif init_type == "normal":
                init = jax.nn.initializers.normal(0.02 * scale)
            else:
                raise NotImplementedError(init_type)
            leaves.append(init(k, leaf.shape, leaf.dtype))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
