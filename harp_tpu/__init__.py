"""harp_tpu: a TPU-native (JAX/XLA/Pallas) personalized hand-avatar framework.

Re-implements the capabilities of the HARP reference (per-sequence
inverse-rendering of a hand avatar from monocular RGB video) with a
TPU-first architecture:

- pure-functional forward model and losses (jit/vmap/scan friendly)
- a tile-binned differentiable rasterizer (XLA reference path + Pallas TPU
  kernel) replacing pytorch3d's CUDA rasterizer
- frame-axis data parallelism via jax.sharding over a device Mesh
- optax-based staged optimization replacing the torch Adam driver

Reference layout studied (not copied) from /root/reference; see SURVEY.md.
"""

__version__ = "0.1.0"
