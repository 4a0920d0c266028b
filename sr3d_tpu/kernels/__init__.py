"""Pallas TPU kernels for the UNet hot path, with XLA fallbacks.

Flag-gated (``cfg.tpu.use_pallas``): every kernel has a reference XLA
implementation used on CPU / in tests; the pallas path is selected on TPU
backends only.  See /opt/skills/guides/pallas_guide.md for the hardware
model these follow.
"""

from .groupnorm_swish import fused_groupnorm_swish  # noqa: F401
from .attention import fused_spatial_attention  # noqa: F401
