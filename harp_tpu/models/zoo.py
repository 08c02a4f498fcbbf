"""Model-zoo switch (reference utils/hand_model_utils.load_hand_model:11-81).

Builds AvatarAssets for each supported model family:
- "harp" (primary): MANO hand or SMPL-X arm, subdivided template + UVs;
- "html": MANO + the HTML linear texture basis (no subdivision, 778 verts);
- "nimble": requires the external NIMBLE release; an adapter protocol is
  defined and the loader raises a clear error when assets are absent.

All real model files are registration-gated; `synthetic=True` builds the
procedural stand-ins used by tests and benchmarks.
"""

from __future__ import annotations

import numpy as np

from harp_tpu.assets import (
    AvatarAssets,
    build_synthetic_assets,
    build_synthetic_arm_assets,
    load_mano_model,
    load_obj_with_uv,
)
from harp_tpu.config import HarpConfig
from harp_tpu.ops.mesh import build_topology, build_subdivision


def _load_uv_mask(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L")).astype(np.float32) / 255.0


def _assets_from_model(model, faces, num_verts, template_obj: str,
                       uv_mask_path: str, subdivide: bool = True) -> AvatarAssets:
    coarse = build_topology(faces, num_verts)
    if subdivide:
        sub = build_subdivision(coarse)
        render_faces, n_render = sub.faces, sub.num_verts
    else:
        sub, render_faces, n_render = None, coarse.faces, num_verts
    sub_topology = build_topology(render_faces, n_render)
    _, _, verts_uvs, faces_uvs = load_obj_with_uv(template_obj)
    return AvatarAssets(
        model=model, coarse_topology=coarse, subdivision=sub,
        sub_topology=sub_topology, verts_uvs=verts_uvs, faces_uvs=faces_uvs,
        uv_mask=_load_uv_mask(uv_mask_path),
    )


def load_hand_model(config: HarpConfig, *, synthetic: bool = False,
                    mano_pkl: str = "mano/models/MANO_RIGHT.pkl",
                    smplx_npz: str = "models/SMPLX_NEUTRAL.npz",
                    arm_corr: str = "template/arm/smplx_arm_corr.pkl",
                    hand_template: str = "template/hand/textured_hand.obj",
                    arm_template: str = "template/arm/arm_template.obj",
                    hand_uv_mask: str = "template/hand/uv_mask.png",
                    arm_uv_mask: str = "template/arm/uv_mask.png",
                    html_tex_model: str = "htmlpth/TextureBasis/model_sr/model.pkl",
                    nimble_dict: str = "nimble/assets/NIMBLE_DICT_9137.pkl",
                    nimble_vreg: str = "nimble/assets/NIMBLE_MANO_VREG.pkl",
                    nimble_template: str = "template/nimble/rand_1_skin.obj"):
    """Returns (assets, extras). extras carries model-family specifics
    (e.g. the HTML texture basis)."""
    extras = {}
    if config.model_type == "nimble":
        import dataclasses as _dc
        import os

        from harp_tpu.models.nimble import (
            build_synthetic_nimble, load_nimble_model,
        )

        if synthetic:
            # NIMBLE's synthetic stand-in shares the synthetic hand's skin
            # topology/UVs; only the driving model differs (30-comp pose
            # PCA, 20 shape comps, anatomical layers, MANO regression).
            base = build_synthetic_assets(
                uv_size=config.texture_size, subdivide=False
            )
            return _dc.replace(base, model=build_synthetic_nimble()), extras
        if not os.path.exists(nimble_dict):
            raise FileNotFoundError(
                f"NIMBLE release not found at {nimble_dict!r} "
                "(registration-gated, https://nimblehand.github.io); pass "
                "nimble_dict/nimble_vreg/nimble_template paths, or use "
                "synthetic=True for the structural stand-in."
            )
        model = load_nimble_model(nimble_dict, nimble_vreg)
        # The NIMBLE skin mesh is already dense (5990 verts): no subdivision,
        # matching the reference (hand_model_utils.py:28-56).
        assets = _assets_from_model(
            model, model.faces, model.num_verts, nimble_template,
            hand_uv_mask, subdivide=False,
        )
        return assets, extras

    if config.model_type == "html":
        from harp_tpu.models.html import load_html_basis, synthetic_texture_basis

        if synthetic:
            assets = build_synthetic_assets(
                uv_size=config.texture_size, subdivide=False
            )
            extras["texture_basis"] = synthetic_texture_basis(
                size=config.texture_size, num_coeffs=101
            )
        else:
            model = load_mano_model(mano_pkl, flat_hand_mean=False)
            assets = _assets_from_model(
                model, model.faces, model.num_verts, hand_template,
                hand_uv_mask, subdivide=False,
            )
            extras["texture_basis"] = load_html_basis(html_tex_model)
        return assets, extras

    # model_type == "harp"
    if synthetic:
        assets = (build_synthetic_arm_assets(uv_size=config.texture_size)
                  if config.use_arm else
                  build_synthetic_assets(uv_size=config.texture_size))
        return assets, extras
    if config.use_arm:
        from harp_tpu.models.smplx_arm import load_smplx_arm

        model = load_smplx_arm(smplx_npz, arm_corr)
        assets = _assets_from_model(
            model, model.arm_faces, int(model.arm_vert_idx.shape[0]),
            arm_template, arm_uv_mask,
        )
    else:
        model = load_mano_model(mano_pkl, flat_hand_mean=False)
        assets = _assets_from_model(
            model, model.faces, model.num_verts, hand_template, hand_uv_mask
        )
    return assets, extras
