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


def load_fit_checkpoint(path: str, params_template: dict,
                        config: HarpConfig) -> dict:
    """Load a mid-protocol fit checkpoint from either backend.

    path: a checkpoint.pkl file, a run directory containing one, or a run
    directory containing an `orbax/` checkpoint tree. For Orbax, a `like`
    payload is built from `params_template` + freshly-initialized optimizer
    states so optax's named-tuple states restore with their original pytree
    structure (ADVICE round-2: restore() without `like` returns plain
    dicts/lists that optax cannot consume).

    Returns the payload dict {params, opt_states, epoch, plateau_scale,
    extra} — feed `payload["params"]` to fit_sequence's `params` and the
    payload itself to its `resume=`.
    """
    import os

    from harp_tpu.fit.optimizer import build_optimizers
    from harp_tpu.utils.io import load_checkpoint

    if os.path.isdir(os.path.join(path, "orbax")) or os.path.basename(
            os.path.normpath(path)) == "orbax":
        from harp_tpu.utils.orbax_io import OrbaxCheckpointer

        run_dir = (os.path.dirname(os.path.normpath(path))
                   if os.path.basename(os.path.normpath(path)) == "orbax"
                   else path)
        ckpt = OrbaxCheckpointer(run_dir)
        try:
            _, opt_states_like, _ = build_optimizers(params_template, config)
            n_verts = params_template["verts_disps"].shape[0]
            like = {
                "params": params_template,
                "opt_states": opt_states_like,
                "epoch": 0,
                "plateau_scale": 1.0,
                "extra": {"plateau": {"best": 0.0, "bad_epochs": 0,
                                      "scale": 1.0},
                          "ref_verts": np.zeros((n_verts, 3), np.float32)},
            }
            return ckpt.restore(like=like)
        finally:
            ckpt.close()
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint.pkl")
    return load_checkpoint(path)
