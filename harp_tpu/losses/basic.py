"""Core fitting losses, numerically matching the reference driver.

Sources studied: optimize_sequence.py:517-553 (call sites + weighting),
loss/kps_loss.py, loss/arap.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from harp_tpu.ops.mesh import MeshTopology, edge_lengths


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def silhouette_loss(alpha_pred: jnp.ndarray, mask_true: jnp.ndarray) -> jnp.ndarray:
    """L1 between soft silhouette and GT mask (optimize_sequence.py:519)."""
    return l1_loss(mask_true, alpha_pred)


def photometric_loss(img_pred: jnp.ndarray, img_true: jnp.ndarray,
                     mask_eroded: jnp.ndarray) -> jnp.ndarray:
    """Masked L1; mask is the eroded GT silhouette (optimize_sequence.py:543)."""
    m = mask_eroded[..., None]
    return l1_loss(img_true * m, img_pred * m)


def kps_anchor_loss(gt_joints_mm: jnp.ndarray, pred_joints_mm: jnp.ndarray,
                    use_arm: bool = False) -> jnp.ndarray:
    """Root-aligned squared joint error in (mm/100)^2 (loss/kps_loss.py:4-18).

    Both inputs in millimeters, (B, J, 3); arm mode compares first 21 joints.
    """
    if use_arm:
        pred_joints_mm = pred_joints_mm[:, :21]
        gt_joints_mm = gt_joints_mm[:, :21]
    gt = gt_joints_mm - gt_joints_mm[:, 0:1]
    pred = pred_joints_mm - pred_joints_mm[:, 0:1]
    # (||d||/100)^2 == sum(d^2)/1e4: computed without the sqrt so the
    # gradient is finite at the (always exactly zero) root-joint row.
    return (((gt - pred) ** 2).sum(-1) / 1e4).mean()


def vert_disp_reg(disps: jnp.ndarray) -> jnp.ndarray:
    """sum(d^2) for 1-D normal displacements, sum(|d|^2) for 3-D
    (optimize_sequence.py:531-535)."""
    if disps.shape[-1] == 1:
        return jnp.sum(disps**2.0)
    return jnp.sum((disps ** 2.0).sum(-1))


def arap_loss(verts: jnp.ndarray, ref_verts: jnp.ndarray,
              topology: MeshTopology) -> jnp.ndarray:
    """Edge-length preservation vs a reference mesh (loss/arap.py:4-58).

    verts: (B, V, 3) meters; ref_verts: (V, 3) or (1, V, 3) meters. The
    reference scales lengths to mm before squaring and averages per edge
    then per mesh.
    """
    if ref_verts.ndim == 2:
        ref_verts = ref_verts[None]
    e = edge_lengths(verts, topology) * 1000.0
    e_ref = edge_lengths(ref_verts, topology) * 1000.0
    return ((e - e_ref) ** 2.0).mean()
