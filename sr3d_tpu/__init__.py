"""sr3d_tpu — TPU-native SR3 diffusion face super-resolution + MICA 3D reconstruction.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``zouiner/3d-super-resolution-Face-reconstruction`` (reference mounted read-only
at /root/reference):

* SR3 conditional-diffusion super-resolution (continuous noise-level training,
  full DDPM reverse sampling compiled as one ``jax.lax.scan``).
* MICA 3D face reconstruction (ArcFace iResNet-100 identity encoder → mapping
  MLP → FLAME linear-blend-skinning decoder).
* Joint trainers replicating the reference "model2" (SR detached from MICA) and
  "model3" (differentiable, gradient-checkpointed sampling) semantics.

Everything on the compute path is functional and jit-compiled: pure parameter
pytrees, schedules as arrays, device-side preprocessing (no host round trips),
and sharding over a ``jax.sharding.Mesh`` for multi-chip scale-out.
"""

__version__ = "0.1.0"
