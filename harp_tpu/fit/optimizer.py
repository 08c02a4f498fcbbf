"""Grouped Adam + plateau LR scheduling (reference get_optimizers,
optimize_sequence.py:253-310).

Two parameter groups:
- "coarse" (lr 1e-3): pose, cam, [shape, verts_disps], and for the arm model
  with opt_arm_pose also wrist_pose + rot. NOTE the reference does NOT
  optimize trans, and rot only in the arm/opt_arm_pose path — replicated.
- "app" (lr 1e-2): light_positions, amb_ratio, and (unless appearance is
  known) texture + normal_map.

The coarse group's LR follows torch ReduceLROnPlateau(patience=40,
factor=0.1, rel threshold 1e-4) on the epoch loss, implemented as a scale
factor carried by the Python driver loop.
"""

from __future__ import annotations

import dataclasses

import optax

from harp_tpu.config import HarpConfig


def group_param_names(config: HarpConfig):
    coarse = ["pose", "cam"]
    if config.known_appearance:
        if config.use_arm and config.opt_arm_pose:
            coarse += ["wrist_pose", "rot"]
    else:
        if config.use_arm and config.opt_arm_pose:
            coarse += ["wrist_pose", "rot"]
        coarse += ["shape"]
        if config.use_vert_disp:
            coarse += ["verts_disps"]

    app = ["light_positions", "amb_ratio"]
    if not config.known_appearance:
        if config.model_type == "html":
            app += ["html_texture"]  # linear basis coeffs, not free texels
        else:
            app += ["texture", "normal_map"]
    return {"coarse": coarse, "app": app}


def _mask_for(params: dict, names) -> dict:
    return {k: (k in names) for k in params}


def build_txs(params: dict, config: HarpConfig):
    """The grouped transforms + masks, WITHOUT initializing state — usable
    with abstract params (ShapeDtypeStruct leaves), since only the key set
    is read. The stage-1 program prewarm (driver.prewarm_stage1_program)
    builds its lowering from these before any real arrays exist."""
    groups = group_param_names(config)
    lrs = {"coarse": config.lr_pose, "app": config.lr_app}
    txs, masks = {}, {}
    for g, names in groups.items():
        mask = _mask_for(params, names)
        inv_mask = {k: not v for k, v in mask.items()}
        # optax.masked leaves masked-OUT updates untouched (raw gradients!),
        # so explicitly zero them with a second masked set_to_zero.
        txs[g] = optax.chain(
            optax.masked(optax.adam(lrs[g]), mask),
            optax.masked(optax.set_to_zero(), inv_mask),
        )
        masks[g] = mask
    return txs, masks


def build_optimizers(params: dict, config: HarpConfig):
    """Returns ({group: optax tx}, {group: state}, {group: mask})."""
    txs, masks = build_txs(params, config)
    states = {g: txs[g].init(params) for g in txs}
    return txs, states, masks


@dataclasses.dataclass
class PlateauState:
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0


def plateau_update(state: PlateauState, epoch_loss: float, patience: int = 40,
                   factor: float = 0.1, threshold: float = 1e-4) -> PlateauState:
    """torch ReduceLROnPlateau(mode=min, threshold_mode=rel) semantics."""
    if epoch_loss < state.best * (1.0 - threshold):
        return PlateauState(best=epoch_loss, bad_epochs=0, scale=state.scale)
    bad = state.bad_epochs + 1
    if bad > patience:
        return PlateauState(best=state.best, bad_epochs=0, scale=state.scale * factor)
    return PlateauState(best=state.best, bad_epochs=bad, scale=state.scale)
