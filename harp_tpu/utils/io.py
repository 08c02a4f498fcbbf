"""Checkpoint / result IO.

Two layers (SURVEY.md §5 gap-fix):
- `save_result`/`load_result`: the reference's pickle param-dict format
  (utils/file_utils.py:6-37, "saved_params[_test].pkl") for interoperability.
- `save_checkpoint`/`load_checkpoint`: atomic full-state checkpoints
  (params + optimizer state + epoch + plateau schedule) the reference lacks
  — a crash there loses up to 200 epochs. Write-to-temp + rename keeps the
  file consistent under interruption.
"""

from __future__ import annotations

import os
import pickle
import tempfile

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_result(params: dict, base_output_dir: str, test: bool = False) -> str:
    os.makedirs(base_output_dir, exist_ok=True)
    suffix = "_test" if test else ""
    path = os.path.join(base_output_dir, f"saved_params{suffix}.pkl")
    payload = {k: (np.asarray(v) if v is not None else None) for k, v in params.items()}
    _atomic_pickle(payload, path)
    return path


def load_result(base_output_dir: str, test: bool = False) -> dict:
    suffix = "_test" if test else ""
    path = os.path.join(base_output_dir, f"saved_params{suffix}.pkl")
    with open(path, "rb") as f:
        params = pickle.load(f)
    import jax.numpy as jnp

    return {k: (jnp.asarray(v) if v is not None else None) for k, v in params.items()}


def _atomic_pickle(obj, path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(path: str, params: dict, opt_states, epoch: int,
                    plateau_scale: float = 1.0, extra: dict | None = None) -> None:
    payload = {
        "params": _to_numpy_tree(params),
        "opt_states": _to_numpy_tree(opt_states),
        "epoch": epoch,
        "plateau_scale": plateau_scale,
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    _atomic_pickle(payload, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    import jax.numpy as jnp

    payload["params"] = jax.tree.map(jnp.asarray, payload["params"])
    payload["opt_states"] = jax.tree.map(jnp.asarray, payload["opt_states"])
    return payload


def export_obj(path: str, verts: np.ndarray, faces: np.ndarray,
               verts_uvs: np.ndarray | None = None,
               faces_uvs: np.ndarray | None = None,
               texture_png: str | None = None) -> None:
    """Write an OBJ (optionally with wedge UVs + an MTL/texture reference),
    the equivalent of the reference's pytorch3d save_obj export
    (optimize_sequence.py:785-791)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    mtl_lines = []
    if texture_png is not None:
        mtl_path = os.path.splitext(path)[0] + ".mtl"
        with open(mtl_path, "w") as m:
            m.write("newmtl material_0\nmap_Kd %s\n" % os.path.basename(texture_png))
        mtl_lines = ["mtllib %s" % os.path.basename(mtl_path), "usemtl material_0"]
    with open(path, "w") as f:
        for line in mtl_lines:
            f.write(line + "\n")
        for v in np.asarray(verts):
            f.write("v %.6f %.6f %.6f\n" % tuple(v))
        if verts_uvs is not None:
            for vt in np.asarray(verts_uvs):
                f.write("vt %.6f %.6f\n" % tuple(vt))
        faces = np.asarray(faces) + 1
        if verts_uvs is not None and faces_uvs is not None:
            fuv = np.asarray(faces_uvs) + 1
            for fv, ft in zip(faces, fuv):
                f.write(
                    "f %d/%d %d/%d %d/%d\n"
                    % (fv[0], ft[0], fv[1], ft[1], fv[2], ft[2])
                )
        else:
            for fv in faces:
                f.write("f %d %d %d\n" % tuple(fv))
