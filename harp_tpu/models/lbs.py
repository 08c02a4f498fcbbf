"""Generic linear-blend-skinning engine.

One implementation serves both the 16-joint MANO skeleton and the 55-joint
SMPL-X skeleton (reference semantics: manopth/manolayer.py:197-261 and the
smplx package's `lbs`, called from hand_models_harp/body_models.py:2335).

TPU-first notes: the kinematic chain is composed level-by-level (joints
grouped by tree depth, precomputed in numpy), so each level is one batched
(B, L, 3, 3) matmul instead of a Python loop over joints; the skinning step
is a single (V, K) x (B, K, 12) matmul that XLA maps onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def kinematic_levels(parents: np.ndarray) -> list[np.ndarray]:
    """Group joint indices by depth in the kinematic tree.

    parents[0] must be the root (parent < 0 or == 0 self-reference ignored).
    Returns a list of int arrays; level 0 is [0].
    """
    parents = np.asarray(parents)
    K = parents.shape[0]
    depth = np.zeros(K, dtype=np.int64)
    for j in range(1, K):
        depth[j] = depth[parents[j]] + 1
    levels = []
    for d in range(int(depth.max()) + 1):
        levels.append(np.nonzero(depth == d)[0].astype(np.int32))
    return levels


def forward_kinematics(
    rotmats: jnp.ndarray,
    joints_rest: jnp.ndarray,
    parents: np.ndarray,
    levels: list[np.ndarray] | None = None,
):
    """Compose per-joint local rotations into global rigid transforms.

    Args:
      rotmats: (B, K, 3, 3) local joint rotations.
      joints_rest: (B, K, 3) rest-pose joint locations.
      parents: (K,) static int parents, parents[0] is the root.
      levels: optional precomputed `kinematic_levels(parents)`.

    Returns:
      (R_global (B, K, 3, 3), t_global (B, K, 3)): world transforms per joint,
      where joint j maps local points p to R_global[j] @ p + t_global[j] and
      t_global[j] is the posed joint location.
    """
    parents = np.asarray(parents)
    if levels is None:
        levels = kinematic_levels(parents)

    # Local translations: offset from parent joint (root keeps its location).
    t_local = joints_rest - jnp.where(
        (jnp.asarray(parents) >= 0)[None, :, None],
        jnp.take(joints_rest, jnp.maximum(jnp.asarray(parents), 0), axis=1),
        jnp.zeros_like(joints_rest),
    )

    R_g = rotmats
    t_g = t_local
    for lvl in levels[1:]:
        lvl = np.asarray(lvl)
        par = parents[lvl]
        Rp = R_g[:, par]
        tp = t_g[:, par]
        Rl = rotmats[:, lvl]
        tl = t_local[:, lvl]
        # Broadcast-sum instead of dot_general: 3x3 dots with >=3 batch dims
        # trigger an XLA simplifier verifier bug under an outer vmap
        # (batch-dim order flip in the simplified dot). 27 multiplies, so
        # elementwise costs nothing.
        R_new = (Rp[..., :, :, None] * Rl[..., None, :, :]).sum(-2)
        t_new = (Rp * tl[..., None, :]).sum(-1) + tp
        R_g = R_g.at[:, lvl].set(R_new)
        t_g = t_g.at[:, lvl].set(t_new)
    return R_g, t_g


def linear_blend_skinning(
    R_global: jnp.ndarray,
    t_global: jnp.ndarray,
    joints_rest: jnp.ndarray,
    weights: jnp.ndarray,
    v_posed: jnp.ndarray,
) -> jnp.ndarray:
    """Skin vertices with rest-pose-relative joint transforms.

    v_out = sum_k w[v,k] * (R_k @ (v - j_k) + t_k)
          = (sum_k w R_k) v + sum_k w (t_k - R_k j_k)

    Args:
      R_global, t_global: from `forward_kinematics`.
      joints_rest: (B, K, 3) rest joints.
      weights: (V, K) skinning weights.
      v_posed: (B, V, 3) blend-shaped rest vertices.

    Returns: (B, V, 3) posed vertices.
    """
    t_rel = t_global - jnp.einsum("bkij,bkj->bki", R_global, joints_rest)
    # Pack rotation (9) + translation (3) and do one big MXU matmul.
    R_v = jnp.einsum("vk,bkij->bvij", weights, R_global)
    t_v = jnp.einsum("vk,bki->bvi", weights, t_rel)
    return jnp.einsum("bvij,bvj->bvi", R_v, v_posed) + t_v
