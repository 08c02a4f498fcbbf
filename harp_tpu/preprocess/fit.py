"""Preprocessing: fit model parameters to METRO-predicted vertices and smooth
the sequence (reference metro_modifications/hand_utils.py:16-131, 540-688,
785-801). METRO inference itself stays external (a separate network); this
module consumes its per-frame vertex predictions.

TPU-native structure: each Adam phase is ONE jitted lax.scan over iterations
(the reference runs 1200 Python-loop steps with per-step kernel launches);
the whole frame batch is fit simultaneously. Early stopping is carried as a
`done` flag inside the scan so no host synchronization is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from harp_tpu.models.mano import ManoModel, mano_forward


def _adam_scan(loss_fn, params, lr, n_iters, early_stop_rel=None):
    """Run n_iters of Adam inside one scan. loss_fn: params -> scalar."""
    tx = optax.adam(lr)
    state = tx.init(params)

    def step(carry, _):
        params, state, prev_loss, done = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_state = tx.update(grads, state, params)
        new_params = optax.apply_updates(params, updates)
        if early_stop_rel is not None:
            new_done = done | (prev_loss - loss < early_stop_rel)
            prev_loss = (prev_loss + loss) / 2.0  # reference's running average
        else:
            new_done = done
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(new_done, o, n), new, old
        )
        params = keep(new_params, params)
        state = keep(new_state, state)
        return (params, state, prev_loss, new_done), loss

    (params, _, _, _), losses = jax.lax.scan(
        step, (params, state, jnp.asarray(1e9, jnp.float32), jnp.asarray(False)),
        None, length=n_iters,
    )
    return params, losses


def fit_mano_to_vertices(model: ManoModel, target_vertices_mm: jnp.ndarray,
                         epoch_coarse: int = 500, epoch_fine: int = 700,
                         max_tries: int = 4, loss_threshold: float = 10.0,
                         seed: int = 0):
    """Fit (rot, pose, shape, trans) so MANO vertices match targets (mm).

    Mirrors optimize_for_mano_param: coarse phase (rot+trans, lr 1e-1, MSE in
    mm), fine phase (all params, lr 1e-2), retried up to `max_tries` times if
    the fine loss stays above `loss_threshold`.

    Returns dict with joints/verts/rot/pose/shape/trans (the reference's
    per-frame pkl schema).
    """
    B = target_vertices_mm.shape[0]
    target = jnp.asarray(target_vertices_mm, jnp.float32)
    mean_m = target.mean(1) / 1000.0

    def mse(params):
        verts, _ = mano_forward(
            model,
            jnp.concatenate([params["rot"], params["pose"]], 1),
            params["shape"], params["trans"],
        )
        return ((verts - target) ** 2).mean()

    @jax.jit
    def one_try(_key):
        params = {
            "rot": jnp.zeros((B, 3), jnp.float32),
            "pose": jnp.zeros((B, 45), jnp.float32),
            "shape": jnp.zeros((B, 10), jnp.float32),
            "trans": mean_m,
        }
        coarse_params = {"rot": params["rot"], "trans": params["trans"]}

        def coarse_loss(cp):
            p = dict(params, **cp)
            return mse(p)

        coarse_params, _ = _adam_scan(coarse_loss, coarse_params, 1e-1, epoch_coarse)
        params = dict(params, **coarse_params)
        params, losses = _adam_scan(mse, params, 1e-2, epoch_fine)
        return params, losses[-1]

    best_params, best_loss = None, np.inf
    for t in range(max_tries):
        params, loss = one_try(jnp.asarray(t))
        loss = float(loss)
        if loss < best_loss:
            best_params, best_loss = params, loss
        if loss <= loss_threshold:
            break

    verts, joints = mano_forward(
        model,
        jnp.concatenate([best_params["rot"], best_params["pose"]], 1),
        best_params["shape"], best_params["trans"],
    )
    return {
        "joints": joints, "verts": verts,
        "rot": best_params["rot"], "pose": best_params["pose"],
        "shape": best_params["shape"], "trans": best_params["trans"],
        "fit_error": best_loss,
    }


def fit_arm_to_vertices(model, target_vertices_mm: jnp.ndarray,
                        epoch_coarse: int = 500, epoch_fine: int = 700,
                        max_tries: int = 4, loss_threshold: float = 10.0):
    """Fit SMPLXARM (rot, pose, shape, trans) to METRO's 778 MANO-subset
    vertices (mm) — optimize_for_mano_arm_param semantics
    (hand_utils.py:134-240): the loss compares the arm model's MANO-subset
    verts (return_type='mano') against the target; wrist_pose stays zero
    (the reference never passes right_wrist_pose here, so the SMPLXARM
    forward's zero default applies); coarse phase (rot, trans) lr 1e-1,
    fine phase (rot, pose, shape, trans) lr 1e-2, retried while
    MSE > loss_threshold (mm^2).

    Returns the per-frame pkl schema dict: joints (22, incl. elbow) / verts
    (MANO subset) / rot / pose / shape / trans / fit_error.
    """
    from harp_tpu.models.smplx_arm import smplx_arm_forward

    B = target_vertices_mm.shape[0]
    target = jnp.asarray(target_vertices_mm, jnp.float32)

    def fwd(p, return_type="mano"):
        wrist = jnp.zeros((B, 3), jnp.float32)
        return smplx_arm_forward(
            model, p["shape"], p["rot"], p["trans"], p["pose"], wrist,
            return_type=return_type,
        )

    def mse(p):
        verts, _ = fwd(p)
        return ((verts - target) ** 2).mean()

    @jax.jit
    def one_try(_key):
        params = {
            "rot": jnp.zeros((B, 3), jnp.float32),
            "pose": jnp.zeros((B, 45), jnp.float32),
            "shape": jnp.zeros((B, 10), jnp.float32),
            # Reference inits trans to zeros (hand_utils.py:174); the target
            # mean (meters) cuts the coarse phase's work without changing
            # the optimum — same deviation as fit_mano_to_vertices.
            "trans": target.mean(1) / 1000.0,
        }
        coarse = {"rot": params["rot"], "trans": params["trans"]}
        coarse, _ = _adam_scan(
            lambda cp: mse(dict(params, **cp)), coarse, 1e-1, epoch_coarse
        )
        params = dict(params, **coarse)
        params, losses = _adam_scan(mse, params, 1e-2, epoch_fine)
        return params, losses[-1]

    best_params, best_loss = None, np.inf
    for t in range(max_tries):
        params, loss = one_try(jnp.asarray(t))
        loss = float(loss)
        if loss < best_loss:
            best_params, best_loss = params, loss
        if loss <= loss_threshold:
            break

    verts, joints = fwd(best_params, return_type="mano")
    return {
        "joints": joints, "verts": verts,
        "rot": best_params["rot"], "pose": best_params["pose"],
        "shape": best_params["shape"], "trans": best_params["trans"],
        "fit_error": best_loss,
    }


def fit_nimble_to_vertices(model, target_vertices_mm: jnp.ndarray,
                           epoch_coarse: int = 200, epoch_fine: int = 400,
                           max_tries: int = 1, loss_threshold: float = 10.0):
    """Fit NIMBLE (rot, 30 pose PCA, 20 shape, trans) to METRO's 778
    MANO-topology vertices (mm) — optimize_for_nimble_param semantics
    (hand_utils.py:244-360): the loss compares nimble_to_mano(skin verts)
    against the target; coarse (rot, trans) lr 1e-1 x 200, fine (all)
    lr 1e-2 x 400, a single try by default (the reference's retry loop is
    range(1) there). Output joints are the 21 MANO-protocol joints
    regressed from the fitted MANO surface (hand_utils.py:345-352).
    """
    from harp_tpu.models.nimble import (
        nimble_forward, nimble_to_mano, mano_protocol_joints,
    )

    B = target_vertices_mm.shape[0]
    target = jnp.asarray(target_vertices_mm, jnp.float32)
    ncomps = model.ncomps

    def mano_verts(p):
        skin, _ = nimble_forward(
            model, jnp.concatenate([p["rot"], p["pose"]], 1), p["shape"],
            p["trans"],
        )
        return nimble_to_mano(model, skin)

    def mse(p):
        return ((mano_verts(p) - target) ** 2).mean()

    @jax.jit
    def one_try(_key):
        params = {
            "rot": jnp.zeros((B, 3), jnp.float32),
            "pose": jnp.zeros((B, ncomps), jnp.float32),
            "shape": jnp.zeros((B, model.nshape), jnp.float32),
            "trans": target.mean(1) / 1000.0,
        }
        coarse = {"rot": params["rot"], "trans": params["trans"]}
        coarse, _ = _adam_scan(
            lambda cp: mse(dict(params, **cp)), coarse, 1e-1, epoch_coarse
        )
        params = dict(params, **coarse)
        params, losses = _adam_scan(mse, params, 1e-2, epoch_fine)
        return params, losses[-1]

    best_params, best_loss = None, np.inf
    for t in range(max_tries):
        params, loss = one_try(jnp.asarray(t))
        loss = float(loss)
        if loss < best_loss:
            best_params, best_loss = params, loss
        if loss <= loss_threshold:
            break

    mv = mano_verts(best_params)
    return {
        "joints": mano_protocol_joints(model, mv), "verts": mv,
        "rot": best_params["rot"], "pose": best_params["pose"],
        "shape": best_params["shape"], "trans": best_params["trans"],
        "fit_error": best_loss,
    }


def remove_spike(pose: jnp.ndarray, threshold: float = 1.0) -> jnp.ndarray:
    """Replace pose rows whose both neighboring deltas exceed `threshold`
    with the neighbor mean (hand_utils.remove_spike:785-801)."""
    pose = jnp.asarray(pose)
    diff = jnp.linalg.norm(pose[1:] - pose[:-1], axis=1)  # diff[i] = |p[i+1]-p[i]|
    # Frame i (1..N-2) is a spike if diff[i-1] > t and diff[i] > t.
    spike = (diff[:-1] > threshold) & (diff[1:] > threshold)
    mid_new = (pose[:-2] + pose[2:]) / 2.0
    mid = jnp.where(spike[:, None], mid_new, pose[1:-1])
    return jnp.concatenate([pose[:1], mid, pose[-1:]], axis=0)


def _smooth_poses_penalty(x: jnp.ndarray) -> jnp.ndarray:
    """sum((x - detached 3-frame mean)^2) / (N-2) on interior frames
    (LossSmoothPoses semantics, hand_utils.py:499-513)."""
    interp = jax.lax.stop_gradient((x[1:-1] + x[:-2] + x[2:]) / 3.0)
    return ((x[1:-1] - interp) ** 2).sum() / (x.shape[0] - 2)


def smooth_pose_sequence(model: ManoModel, params: dict,
                         total_iters: int = 1000, lr: float = 1e-3,
                         w_anchor: float = 1e-2, w_smooth: float = 1e-1,
                         early_stop_rel: float = 1e-5):
    """Temporal smoothing of fitted poses (optimize_smooth_seq pose phase).

    params: dict with per-frame rot (N,3), pose (N,45), shape (N,10),
    trans (N,3), joints (N,21,3). Optimizes (rot, pose, shape) against a
    root-aligned joint anchor + 3-frame interpolation smoothness.
    """
    anchor = jax.lax.stop_gradient(
        jnp.asarray(params["joints"]) - jnp.asarray(params["joints"])[:, 0:1]
    )
    n = anchor.shape[0]
    opt = {
        "rot": jnp.asarray(params["rot"], jnp.float32),
        "pose": jnp.asarray(params["pose"], jnp.float32),
        "shape": jnp.asarray(params["shape"], jnp.float32),
    }
    trans = jnp.asarray(params["trans"], jnp.float32)

    def loss_fn(p):
        _, joints = mano_forward(
            model, jnp.concatenate([p["rot"], p["pose"]], 1), p["shape"], trans
        )
        joints = joints - joints[:, 0:1]
        l_anchor = ((joints[:, :21] - anchor[:, :21]) ** 2).sum() / n
        l_smooth = _smooth_poses_penalty(joints)
        return w_anchor * l_anchor + w_smooth * l_smooth

    opt, losses = jax.jit(
        lambda o: _adam_scan(loss_fn, o, lr, total_iters, early_stop_rel)
    )(opt)
    out = dict(params)
    out.update({k: v for k, v in opt.items()})
    verts, joints = mano_forward(
        model, jnp.concatenate([opt["rot"], opt["pose"]], 1), opt["shape"], trans
    )
    out["verts"], out["joints"] = verts, joints
    return out


def smooth_camera_sequence(model: ManoModel, params: dict, img_res: int = 224,
                           total_iters: int = 1000, lr: float = 1e-3,
                           w_anchor: float = 1e-2, w_smooth: float = 1e-2):
    """Camera smoothing against the camera-relative root trajectory
    (optimize_smooth_seq cam phase, hand_utils.py:648-684)."""
    focal = 1000.0 * img_res / 224.0
    _, joints = mano_forward(
        model,
        jnp.concatenate([jnp.asarray(params["rot"]), jnp.asarray(params["pose"])], 1),
        jnp.asarray(params["shape"]), jnp.asarray(params["trans"]),
    )
    root = jax.lax.stop_gradient(joints[:, 0] / 1000.0)
    cam0 = jnp.asarray(params["cam"], jnp.float32)

    def cam_rel_root(cam):
        t = jnp.stack(
            [cam[:, 1], cam[:, 2], 2 * focal / (img_res * cam[:, 0] + 1e-9)], 1
        )
        return t + root

    anchor = jax.lax.stop_gradient(cam_rel_root(cam0))
    n = cam0.shape[0]

    def loss_fn(cam):
        crr = cam_rel_root(cam)
        l_anchor = ((crr - anchor) ** 2).sum() / n
        l_smooth = _smooth_poses_penalty(crr)
        return w_anchor * l_anchor + w_smooth * l_smooth

    cam, _ = jax.jit(lambda c: _adam_scan(loss_fn, c, lr, total_iters))(cam0)
    out = dict(params)
    out["cam"] = cam
    return out
