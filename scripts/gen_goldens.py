"""Generate golden parity fixtures by RUNNING the reference implementation.

Executes the reference's torch code in-place (read-only, sys.path import from
/root/reference — nothing is copied into this repo) on a deterministic
synthetic MANO-style model, and saves (inputs, outputs) npz fixtures that
tests/test_golden_parity.py replays against the JAX implementations.

Covered reference surfaces:
- manopth/rodrigues_layer.py:43 `batch_rodrigues` (axis-angle -> rotmat)
- manopth/rot6d.py:4 `compute_rotation_matrix_from_ortho6d`
- manopth/manolayer.py:108-296 `ManoLayer.forward` — both the
  (use_pca=False, flat_hand_mean=True) METRO configuration and the
  (use_pca=True, ncomps=6, flat_hand_mean=False) PCA configuration,
  with and without trans, th_betas given and defaulted.

The real MANO_RIGHT.pkl is registration-gated and absent, so the model is
the repo's deterministic synthetic hand padded to 778 vertices (the
reference layer hard-codes fingertip vertex ids up to 745,
manolayer.py:269-272). Parity proven on it is parity of the MATH — every
branch of the forward runs on real-shaped (778, 16) data.

Run:  python scripts/gen_goldens.py   (writes tests/golden/*.npz)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import torch

torch.manual_seed(0)

from harp_tpu.assets import build_synthetic_hand

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden")
os.makedirs(OUT_DIR, exist_ok=True)


def padded_mano_arrays(target_v: int = 778, seed: int = 7):
    """Synthetic hand padded to 778 verts so the reference's hard-coded
    fingertip ids (745/317/444/556/673) are valid. Padded verts ride joint 0
    with small but NONZERO shape/pose dirs, so they exercise the full LBS
    path; J_regressor gets zero columns for them (joints unchanged)."""
    m = build_synthetic_hand(n_ring=8, seed=0)
    V0 = m.v_template.shape[0]
    pad = target_v - V0
    rng = np.random.RandomState(seed)

    v_pad = 0.02 * rng.randn(pad, 3).astype(np.float32) + np.float32([0.0, 0.0, 0.05])
    v_template = np.concatenate([m.v_template, v_pad], 0)

    sd_pad = (0.002 * rng.randn(pad, 3, m.shapedirs.shape[2])).astype(np.float32)
    shapedirs = np.concatenate([m.shapedirs, sd_pad], 0)

    pd_pad = (0.0002 * rng.randn(pad, 3, m.posedirs.shape[2])).astype(np.float32)
    posedirs = np.concatenate([m.posedirs, pd_pad], 0)

    J_regressor = np.concatenate(
        [m.J_regressor, np.zeros((16, pad), np.float32)], 1
    )

    w_pad = np.zeros((pad, 16), np.float32)
    w_pad[:, 0] = 0.7
    w_pad[:, 4] = 0.3  # blend two joints: padded verts test multi-joint LBS
    weights = np.concatenate([m.weights, w_pad], 0)

    # Random orthogonal PCA basis (45x45) so the use_pca path is nontrivial.
    q, _ = np.linalg.qr(rng.randn(45, 45))
    hands_components = q.astype(np.float32)
    hands_mean = (0.1 * rng.randn(45)).astype(np.float32)

    return dict(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_regressor,
        weights=weights,
        faces=m.faces,
        kintree_parents=m.parents,
        hands_components=hands_components,
        hands_mean=hands_mean,
    )


class _Ch:
    """Minimal chumpy-array stand-in: the reference layer only reads `.r`."""

    def __init__(self, a):
        self.r = np.asarray(a)


class _Sparse:
    def __init__(self, a):
        self._a = np.asarray(a)

    def toarray(self):
        return self._a


def make_ready_arguments(arrs):
    def ready_arguments(path):  # signature-compatible with the reference
        kintree = np.stack(
            [arrs["kintree_parents"].astype(np.int64),
             np.arange(16, dtype=np.int64)]
        )
        return {
            "betas": _Ch(np.zeros(arrs["shapedirs"].shape[2], np.float64)),
            "shapedirs": _Ch(arrs["shapedirs"].astype(np.float64)),
            "posedirs": _Ch(arrs["posedirs"].astype(np.float64)),
            "v_template": _Ch(arrs["v_template"].astype(np.float64)),
            "J_regressor": _Sparse(arrs["J_regressor"].astype(np.float64)),
            "weights": _Ch(arrs["weights"].astype(np.float64)),
            "f": arrs["faces"].astype(np.uint32),
            "hands_components": arrs["hands_components"].astype(np.float64),
            "hands_mean": arrs["hands_mean"].astype(np.float64),
            "kintree_table": kintree,
        }

    return ready_arguments


def gen_rotation_goldens():
    from manopth import rodrigues_layer, rot6d

    rng = np.random.RandomState(3)
    axisang = rng.randn(32, 3).astype(np.float32) * np.float32(
        rng.uniform(0.0, 3.0, (32, 1))
    )
    axisang[0] = 0.0  # identity corner case (the 1e-8 epsilon path)
    axisang[1] = [np.pi, 0.0, 0.0]
    rotmats = rodrigues_layer.batch_rodrigues(
        torch.tensor(axisang)
    ).reshape(32, 3, 3).numpy()

    ortho6d = rng.randn(16, 6).astype(np.float32)
    rot6d_mats = rot6d.compute_rotation_matrix_from_ortho6d(
        torch.tensor(ortho6d)
    ).numpy()

    np.savez_compressed(
        os.path.join(OUT_DIR, "rotations_golden.npz"),
        axisang=axisang, rodrigues_out=rotmats,
        ortho6d=ortho6d, rot6d_out=rot6d_mats,
    )
    print("rotations_golden.npz:", rotmats.shape, rot6d_mats.shape)


def gen_mano_goldens():
    import manopth.manolayer as ml

    arrs = padded_mano_arrays()
    ml.ready_arguments = make_ready_arguments(arrs)

    rng = np.random.RandomState(11)
    cases = []

    # Case A: METRO configuration (use_pca=False, flat_hand_mean=True),
    # axis-angle 48-dof pose, explicit betas + trans.
    layer_aa = ml.ManoLayer(
        mano_root="unused", use_pca=False, flat_hand_mean=True, ncomps=45
    ).double()
    for i in range(3):
        pose = (0.4 * rng.randn(2, 48)).astype(np.float32)
        betas = (1.5 * rng.randn(2, 10)).astype(np.float32)
        trans = (0.1 * rng.randn(2, 3)).astype(np.float32)
        v, j = layer_aa(
            torch.tensor(pose).double(), torch.tensor(betas).double(),
            torch.tensor(trans).double()
        )
        cases.append(dict(config="aa_flat", pose=pose, betas=betas,
                          trans=trans, verts=v.numpy(), joints=j.numpy()))

    # Case B: PCA configuration (ncomps=6, flat_hand_mean=False).
    layer_pca = ml.ManoLayer(
        mano_root="unused", use_pca=True, flat_hand_mean=False, ncomps=6
    ).double()
    for i in range(2):
        pose = (0.8 * rng.randn(2, 9)).astype(np.float32)  # 3 rot + 6 pca
        betas = (1.0 * rng.randn(2, 10)).astype(np.float32)
        trans = (0.05 * rng.randn(2, 3)).astype(np.float32)
        v, j = layer_pca(
            torch.tensor(pose).double(), torch.tensor(betas).double(),
            torch.tensor(trans).double()
        )
        cases.append(dict(config="pca6_mean", pose=pose, betas=betas,
                          trans=trans, verts=v.numpy(), joints=j.numpy()))

    out = {}
    for k, v in arrs.items():
        out["model_" + k] = v
    for i, c in enumerate(cases):
        for k in ("pose", "betas", "trans", "verts", "joints"):
            out[f"case{i}_{k}"] = c[k]
        out[f"case{i}_config"] = np.bytes_(c["config"])
    out["n_cases"] = np.int64(len(cases))
    np.savez_compressed(os.path.join(OUT_DIR, "mano_golden.npz"), **out)
    size = os.path.getsize(os.path.join(OUT_DIR, "mano_golden.npz"))
    print(f"mano_golden.npz: {len(cases)} cases, {size/1e6:.2f} MB")


def gen_loss_goldens():
    """Pure-torch loss surfaces (no pytorch3d/chumpy): kps_loss,
    albedo_reg / normal_reg / close_to_z_reg, LossSmoothPoses /
    LossSmoothRoots. Values AND input-gradients are pinned — gradients
    verify the reference's .detach() placements transfer to stop_gradient.

    Reference: loss/kps_loss.py:4-18, loss/texture_reg.py:5-45,
    loss/smooth.py:29-131 (executed read-only from /root/reference).
    """
    from loss.kps_loss import kps_loss
    from loss import texture_reg as ref_treg
    from loss.smooth import LossSmoothPoses, LossSmoothRoots

    rng = np.random.RandomState(23)
    out = {}

    # --- kps_loss: gt in mm, pred in METERS (x1000 inside). use_arm slices
    # pred to the first 21 joints (gt is already 21 in the reference call).
    for tag, use_arm, J_pred in (("hand", False, 21), ("arm", True, 25)):
        gt_mm = (30.0 * rng.randn(4, 21, 3)).astype(np.float64)
        pred_m = (0.03 * rng.randn(4, J_pred, 3)).astype(np.float64)
        g = torch.tensor(gt_mm)
        p = torch.tensor(pred_m, requires_grad=True)
        val = kps_loss(g, p, use_arm=use_arm, device="cpu")
        val.backward()
        out[f"kps_{tag}_gt_mm"] = gt_mm
        out[f"kps_{tag}_pred_m"] = pred_m
        out[f"kps_{tag}_val"] = val.item()
        out[f"kps_{tag}_grad_pred_m"] = p.grad.numpy()

    # --- texture regs. torch.normal is global-RNG; capture the drawn float
    # offsets by patching it, save the truncated ints the indexing used.
    H = W = 24
    tex = rng.rand(H, W, 3).astype(np.float64)
    nrm = (rng.rand(H, W, 3) * 2.0 - 1.0).astype(np.float64)
    uv_mask = (rng.rand(H, W) > 0.3).astype(np.float64)
    dist_f = torch.tensor((2.0 * rng.randn(H, W, 2)).astype(np.float64))

    orig_normal = torch.normal

    def fixed_normal(*a, **k):
        return dist_f

    torch.normal = fixed_normal
    try:
        t = torch.tensor(tex, requires_grad=True)
        v_alb = ref_treg.albedo_reg(t, std=2.0, uv_mask=torch.tensor(uv_mask))
        v_alb.backward()
        nm = torch.tensor(nrm, requires_grad=True)
        v_nrm = ref_treg.normal_reg(nm, std=2.0, uv_mask=torch.tensor(uv_mask))
        v_nrm.backward()
    finally:
        torch.normal = orig_normal
    nz = torch.tensor(nrm, requires_grad=True)
    v_z = ref_treg.close_to_z_reg(nz)
    v_z.backward()

    out.update(
        treg_texture=tex, treg_normal_map=nrm, treg_uv_mask=uv_mask,
        treg_offsets=dist_f.to(torch.int).numpy().astype(np.int32),
        treg_albedo_val=v_alb.item(), treg_albedo_grad=t.grad.numpy(),
        treg_normal_val=v_nrm.item(), treg_normal_grad=nm.grad.numpy(),
        treg_closez_val=v_z.item(), treg_closez_grad=nz.grad.numpy(),
    )

    # --- LossSmoothPoses / LossSmoothRoots. The classes call
    # mano_layer(cat(rot, pose), shape.repeat, trans) three times (center /
    # left / right fids, clamped at sequence bounds). Stand in a
    # deterministic linear layer joints = reshape(x @ A^T): parity then
    # covers the neighbor-fid clamping, root alignment, 3-frame interp,
    # detach placement, and the /N — with gradients flowing to every param
    # leaf exactly as through a real (frozen) layer.
    F_, J = 6, 21
    D = 48 + 10 + 3  # pose_cat(48) + shape(10) + trans(3)
    A = (0.3 * rng.randn(J * 3, D)).astype(np.float64)
    params_np = dict(
        rot=(0.2 * rng.randn(F_, 3)).astype(np.float64),
        pose=(0.3 * rng.randn(F_, 45)).astype(np.float64),
        shape=(0.5 * rng.randn(1, 10)).astype(np.float64),
        trans=(0.1 * rng.randn(F_, 3)).astype(np.float64),
        cam=np.stack(
            [1.0 + 0.1 * rng.rand(F_), 0.05 * rng.randn(F_),
             0.05 * rng.randn(F_)], 1
        ).astype(np.float64),
    )
    fid = np.array([0, 2, 5], np.int64)  # exercises both boundary clamps
    focal, res = 531.0, 224

    params_t = {k: torch.tensor(v, requires_grad=True)
                for k, v in params_np.items()}
    A_t = torch.tensor(A)

    class StubLayer:
        def __call__(self, pose_cat, shape, trans):
            x = torch.cat([pose_cat, shape, trans], dim=1)
            joints = (x @ A_t.T).reshape(-1, J, 3)
            return joints * 0.0, joints  # verts unused by the losses

    layer = StubLayer()
    lsp = LossSmoothPoses(F_, use_arm=False)
    v_poses = lsp.smooth_pose(params_t, torch.tensor(fid), layer, device="cpu")
    v_poses.backward()
    grads_poses = {k: (p.grad.numpy().copy() if p.grad is not None
                       else np.zeros_like(params_np[k]))
                   for k, p in params_t.items()}

    params_t2 = {k: torch.tensor(v, requires_grad=True)
                 for k, v in params_np.items()}
    lsr = LossSmoothRoots(F_, focal, res, use_arm=False)
    v_roots = lsr.smooth_root(params_t2, torch.tensor(fid), layer, device="cpu")
    v_roots.backward()
    grads_roots = {k: (p.grad.numpy().copy() if p.grad is not None
                       else np.zeros_like(params_np[k]))
                   for k, p in params_t2.items()}

    out.update(
        smooth_A=A, smooth_fid=fid.astype(np.int32),
        smooth_nframes=np.int64(F_), smooth_focal=np.float64(focal),
        smooth_res=np.int64(res),
        smooth_poses_val=v_poses.item(), smooth_roots_val=v_roots.item(),
    )
    for k, v in params_np.items():
        out["smooth_param_" + k] = v
    for k, v in grads_poses.items():
        out["smooth_poses_grad_" + k] = v
    for k, v in grads_roots.items():
        out["smooth_roots_grad_" + k] = v

    np.savez_compressed(os.path.join(OUT_DIR, "losses_golden.npz"), **out)
    print("losses_golden.npz:",
          {k: out[k] for k in out if k.endswith("_val")})


if __name__ == "__main__":
    gen_rotation_goldens()
    gen_mano_goldens()
    gen_loss_goldens()
