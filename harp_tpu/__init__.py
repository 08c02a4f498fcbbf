"""harp_tpu: a TPU-native (JAX/XLA/Pallas) personalized hand-avatar framework.

Re-implements the capabilities of the HARP reference (per-sequence
inverse-rendering of a hand avatar from monocular RGB video) with a
TPU-first architecture:

- pure-functional forward model and losses (jit/vmap/scan friendly)
- a tile-binned differentiable rasterizer (XLA path with active-tile
  compaction + a Pallas TPU kernel) replacing pytorch3d's CUDA rasterizer
- all per-pixel differentiable work on compact active-tile arrays
- frame-axis / sequence-axis data parallelism via jax.sharding
- optax-based staged optimization replacing the torch Adam driver

Typical use:

    from harp_tpu import HarpConfig, load_hand_model
    from harp_tpu.fit import init_params, FitData, fit_sequence
    from harp_tpu.fit.evaluate import evaluate_sequence

or the CLI: `python fit_avatar.py --synthetic ...`.

Reference layout studied (not copied) from /root/reference; see SURVEY.md,
PARITY.md (component mapping) and RESULTS.md (measured performance).
"""

__version__ = "0.1.0"

from harp_tpu.config import HarpConfig
from harp_tpu.assets import (
    AvatarAssets,
    build_synthetic_assets,
    build_synthetic_arm_assets,
    load_mano_model,
)
from harp_tpu.models.zoo import load_hand_model
