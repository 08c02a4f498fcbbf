"""Resume / test-mode ("known appearance") parameter preparation
(reference optimize_sequence.py:355-393).

Flows replicated:
- resume from a previous run's saved_params pickle;
- known_appearance: keep the fitted appearance (texture, normal map,
  displacements, shape), re-initialize per-frame pose/cam from the new
  sequence's preprocessing output;
- the reference's resume mutations: 30-frame linear pose interpolation,
  mean-pooled trans/rot, backfill of wrist_pose / amb_ratio / normal_map.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from harp_tpu.config import HarpConfig
from harp_tpu.utils.io import load_result


def interpolate_poses_30(pose: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation between every 30th frame's pose
    (optimize_sequence.py:368-372)."""
    pose = np.asarray(pose).copy()
    n = pose.shape[0]
    for i in range(n // 30 - 1):
        a = pose[i * 30].copy()
        b = pose[i * 30 + 30].copy()
        for j in range(30):
            pose[i * 30 + j] = ((30 - j) * a + j * b) / 30.0
    return jnp.asarray(pose)


def prepare_resume_params(start_from: str, input_params: dict,
                          config: HarpConfig) -> dict:
    """Load a previous run's params and apply the reference's resume recipe."""
    params = load_result(start_from, test=config.known_appearance and
                         config.start_from != "" and _pose_already_opt(config))
    n = np.asarray(input_params["pose"]).shape[0]

    if config.known_appearance and not _pose_already_opt(config):
        # New sequence: take pose-side params from the fresh preprocessing.
        for k in ("trans", "pose", "rot", "cam"):
            params[k] = jnp.asarray(input_params[k], jnp.float32)

    params["pose"] = interpolate_poses_30(params["pose"])
    params["trans"] = jnp.broadcast_to(
        jnp.asarray(params["trans"]).mean(0), (n, 3)
    ).astype(jnp.float32)
    params["rot"] = jnp.broadcast_to(
        jnp.asarray(params["rot"]).mean(0), (n, 3)
    ).astype(jnp.float32)

    if "wrist_pose" not in params:
        params["wrist_pose"] = jnp.zeros((n, 3), jnp.float32)
    if "amb_ratio" not in params:
        params["amb_ratio"] = jnp.asarray(0.4, jnp.float32)
    if "normal_map" not in params:
        ts = config.texture_size
        params["normal_map"] = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (ts, ts, 3)
        ).astype(jnp.float32)
    return params


def _pose_already_opt(config: HarpConfig) -> bool:
    return getattr(config, "pose_already_opt", False)
