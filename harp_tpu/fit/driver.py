"""Per-sequence avatar fitting: the TPU-native replacement for the reference
driver (optimize_hand_sequence, optimize_sequence.py:313-596).

Architecture differences from the reference (deliberate, TPU-first):
- one jitted `train_step` per training stage (stage flags are static, so XLA
  dead-code-eliminates the unused render/losses — the reference renders RGB
  even in the silhouette-only stage);
- the whole image sequence lives on device as stacked arrays: no DataLoader
  processes, minibatches are gather ops over a shuffled permutation;
- optimizer state is an optax pytree; the plateau schedule is a scalar
  carried by the (cheap) Python epoch loop.
"""

from __future__ import annotations

import dataclasses
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.losses import (
    kps_anchor_loss,
    vert_disp_reg,
    arap_loss,
    albedo_reg,
    normal_reg,
    Vgg16Features,
    vgg_feature_l1,
    vgg_feature_l1_cached,
)
from harp_tpu.ops.mesh import laplacian_smoothing_loss, normal_consistency_loss
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig


@dataclasses.dataclass
class FitData:
    """Device-resident sequence data."""

    images: jnp.ndarray  # (N, H, W, 3) in [0,1]
    masks: jnp.ndarray  # (N, H, W) in [0,1]
    masks_eroded: jnp.ndarray  # (N, H, W)

    @property
    def num_frames(self) -> int:
        return self.images.shape[0]


def compute_losses(params, aux, fids, batch_imgs, batch_masks, batch_masks_er,
                   assets: AvatarAssets, config: HarpConfig, rcfg: RasterConfig,
                   vgg: Vgg16Features | None, ref_verts, key,
                   coarse_on: bool, app_on: bool, extras: dict | None = None):
    """All fitting losses for one minibatch. Returns (total, breakdown).

    extras: model-family statics, e.g. {"texture_basis": TextureBasis} for
    model_type='html' (the UV texture is mean + basis @ html_texture coeffs
    instead of a free texel grid)."""
    from harp_tpu.render.rasterizer import (
        soft_alpha_fast_at, soft_alpha_fast_pack, tile_pixel_coords,
        gather_tiles, scatter_tiles,
    )

    if vgg is not None and aux.get("vgg_params") is not None:
        # The filter bank rides in as a traced argument (via aux), NOT as a
        # closure: a closed-over jnp array is EMBEDDED in the lowered module
        # and the compiled executable (~31 MB of VGG filters per program —
        # measured in-round on the CPU backend and via
        # scripts/probe_exec_size.py), and protocol executables load over
        # the axon tunnel at ~0.5 MB/s. The dataclass only contributes
        # architecture statics here.
        vgg = dataclasses.replace(vgg, params=tuple(aux["vgg_params"]))

    losses = {}
    verts, joints = pipeline.mesh_forward(params, fids, assets, config)
    R, T = pipeline.camera_for_frames(params, fids, config)

    # Compact active-tile path: one camera rasterization; ALL differentiable
    # per-pixel work on (B, A, P) arrays; losses add closed-form background
    # terms for the inactive (background-by-construction) tiles.
    screen, rout = pipeline.raster_camera_view_compact(
        verts, assets, R, T, config, rcfg,
        need_soft=coarse_on, need_hard=app_on,
    )
    act_idx = rout["act_idx"]
    px, py = tile_pixel_coords(act_idx, rcfg)
    n_px = batch_masks.size

    if coarse_on:
        if "pack" in rout:
            # Pallas raster path: fused tile-kernel backward.
            alpha_c = soft_alpha_fast_pack(
                rout["soft_sum"], rout["pack"], screen, assets.render_faces,
                rcfg,
            )
        else:
            alpha_c = soft_alpha_fast_at(
                rout["soft_ids"], rout["soft_sum"], screen, assets.render_faces,
                rcfg, px, py,
            )
        m_c = gather_tiles(batch_masks, act_idx, rcfg)
        # mean |alpha - m| over the full image; inactive tiles: alpha = 0.
        losses["silhouette"] = (
            jnp.abs(alpha_c - m_c).sum() + batch_masks.sum() - m_c.sum()
        ) / n_px
        if not config.known_appearance and config.model_type != "nimble":
            losses["kps_anchor"] = kps_anchor_loss(
                aux["init_joints"][fids], joints, use_arm=config.use_arm
            )
        if config.use_vert_disp and not config.known_appearance:
            losses["vert_disp_reg"] = vert_disp_reg(params["verts_disps"])
            losses["laplacian"] = laplacian_smoothing_loss(verts, assets.sub_topology)
            losses["normal"] = normal_consistency_loss(verts, assets.sub_topology)
            losses["arap"] = arap_loss(verts, ref_verts, assets.sub_topology)

    if app_on:
        from harp_tpu.render.shadow import shadow_visibility_compact

        if config.model_type == "html" and extras and "texture_basis" in extras:
            texture = extras["texture_basis"].texture(params["html_texture"])
        else:
            texture = params["texture"]

        if config.share_light_position:
            light = jnp.broadcast_to(params["light_positions"][0], (fids.shape[0], 3))
        else:
            light = params["light_positions"][fids]
        # ONE barycentric recompute + packed gather serves both the shadow
        # reprojection and the Phong shading.
        geom = pipeline.pixel_geometry_compact(verts, screen, rout, assets, rcfg)
        if config.self_shadow:
            (vis, light_R, light_T, cam_R, cam_T,
             light_counts) = shadow_visibility_compact(
                verts, assets, config, rcfg, params["cam"][fids], light,
                screen, rout, points=geom["points"],
            )
            amb = jax.nn.sigmoid(params["amb_ratio"])
            rgb_c, mask_c = pipeline.shade_pixels_compact(
                verts, screen, rout, assets, R, T, config, rcfg,
                texture, params["normal_map"], light,
                jnp.stack([amb] * 3), 1.0 - jnp.stack([amb] * 3),
                jnp.zeros(3, verts.dtype), vis_map=vis, geom=geom,
            )
        else:
            rgb_c, mask_c = pipeline.shade_pixels_compact(
                verts, screen, rout, assets, R, T, config, rcfg,
                texture, params["normal_map"], light,
                config.ambient_color, config.diffuse_color,
                config.specular_color, shininess=config.shininess, geom=geom,
            )
        # Masked photometric L1 with the closed-form background term for
        # inactive tiles (pred == background there).
        bg = jnp.asarray(config.background_color, rgb_c.dtype)
        gt_c = gather_tiles(batch_imgs, act_idx, rcfg)
        me_c = gather_tiles(batch_masks_er, act_idx, rcfg)[..., None]
        me_full = batch_masks_er[..., None]
        full_bg_term = jnp.abs((bg - batch_imgs) * me_full).sum()
        comp_bg_term = jnp.abs((bg - gt_c) * me_c).sum()
        comp_term = jnp.abs((rgb_c - gt_c) * me_c).sum()
        losses["photo"] = (comp_term + full_bg_term - comp_bg_term) / (n_px * 3)
        if vgg is not None:
            rgb = scatter_tiles(rgb_c, act_idx, rcfg, bg)
            m = batch_masks_er[..., None]
            if "vgg_gt" in aux:
                # GT pyramids precomputed once per sequence (fit_sequence):
                # only the pred-side VGG forward runs in the step.
                losses["vgg"] = vgg_feature_l1_cached(
                    vgg, rgb * m, aux["vgg_gt"], fids, chunk=config.vgg_chunk,
                    remat=config.vgg_remat,
                )
            else:
                losses["vgg"] = vgg_feature_l1(vgg, rgb * m, batch_imgs * m,
                                               chunk=config.vgg_chunk,
                                               remat=config.vgg_remat)
        if config.model_type not in ("nimble", "html"):
            k1, k2 = jax.random.split(key)
            losses["albedo"] = albedo_reg(
                params["texture"], k1, std=1.0, uv_mask=aux["uv_mask"]
            )
            losses["normal_reg"] = normal_reg(
                params["normal_map"], k2, uv_mask=aux["uv_mask"]
            )

    weights = {
        "silhouette": config.w_silhouette,
        "kps_anchor": config.w_kps_anchor,
        "vert_disp_reg": config.w_vert_disp_reg,
        "normal": config.w_normal,
        "laplacian": config.w_laplacian,
        "arap": config.w_arap,
        "photo": config.w_photo,
        "vgg": config.w_vgg,
        "albedo": config.w_albedo,
        "normal_reg": config.w_normal_reg,
    }
    total = jnp.asarray(0.0, jnp.float32)
    for k, v in losses.items():
        total = total + weights[k] * v
    # Raster-budget diagnostics (not losses): tiles whose face list overflowed
    # the per-tile capacity, and occupied tiles beyond the active budget. A
    # mis-budgeted run silently truncates the subject — these make it loud
    # (logged per epoch by fit_sequence, asserted zero in the e2e tests).
    breakdown = dict(losses)
    breakdown["bin_overflow"] = rout["bin_overflow"].sum().astype(jnp.float32)
    breakdown["active_overflow"] = rout["active_overflow"].sum().astype(jnp.float32)
    breakdown["span_overflow"] = rout["span_overflow"].sum().astype(jnp.float32)
    if app_on and config.self_shadow:
        # The light-view depth pass has its own (scaled) raster budget
        # (shadow.light_raster_config); surface its truncation counters too
        # — a dropped light tile renders lit-inside-shadow with no other
        # symptom.
        breakdown["light_bin_overflow"] = (
            light_counts["bin_overflow"].sum().astype(jnp.float32))
        breakdown["light_active_overflow"] = (
            light_counts["active_overflow"].sum().astype(jnp.float32))
        breakdown["light_span_overflow"] = (
            light_counts["span_overflow"].sum().astype(jnp.float32))
    return total, breakdown


def _decode_frames(x):
    """uint8-in-HBM sequence storage → f32 [0,1] at the point of use.

    Long sequences (reference regime: 100-500 frames, data_util.py) do not
    fit as resident f32 arrays — a 300-frame 448² set is ~1.2 GB before
    any step temps, and the round-5 300-frame attempt crashed the worker.
    Stored uint8 (x*255 at ingest) the same set is ~300 MB; the cast back
    happens IN-GRAPH on the gathered minibatch (B frames, not the
    sequence), where XLA fuses it into the first consumer. Binary masks
    encode 0/255 so the round trip is exact; images lose only sub-8-bit
    precision (real frames come from JPEG anyway)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def _grad_step(params, opt_states, aux, fids, batch_imgs, batch_masks,
               batch_masks_er, ref_verts, key, lr_scale, *, assets, config,
               rcfg, vgg, txs, extras, coarse_on: bool, app_on: bool):
    """ONE training step: loss value_and_grad + the two-group optimizer
    update (coarse group lr additionally scaled by the plateau schedule's
    lr_scale). The single definition is shared by the per-step jit
    (make_train_step) and the fused epoch scan (make_epoch_scan) so the two
    dispatch modes cannot drift semantically."""
    batch_imgs = _decode_frames(batch_imgs)
    batch_masks = _decode_frames(batch_masks)
    batch_masks_er = _decode_frames(batch_masks_er)
    (total, breakdown), grads = jax.value_and_grad(
        lambda p: compute_losses(
            p, aux, fids, batch_imgs, batch_masks, batch_masks_er, assets,
            config, rcfg, vgg, ref_verts, key, coarse_on, app_on, extras,
        ),
        has_aux=True,
    )(params)

    new_states = dict(opt_states)
    if coarse_on:
        updates, new_states["coarse"] = txs["coarse"].update(
            grads, opt_states["coarse"], params
        )
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
    if app_on:
        updates, new_states["app"] = txs["app"].update(
            grads, opt_states["app"], params
        )
        params = optax.apply_updates(params, updates)
    return params, new_states, total, breakdown


def make_train_step(assets: AvatarAssets, config: HarpConfig, rcfg: RasterConfig,
                    vgg: Vgg16Features | None, txs,
                    extras: dict | None = None):
    """Build the jitted train step for given (static) stage flags."""

    @partial(jax.jit, static_argnames=("coarse_on", "app_on"), donate_argnums=(0, 1))
    def train_step(params, opt_states, aux, fids, batch_imgs, batch_masks,
                   batch_masks_er, ref_verts, key, lr_scale, *,
                   coarse_on: bool, app_on: bool):
        return _grad_step(
            params, opt_states, aux, fids, batch_imgs, batch_masks,
            batch_masks_er, ref_verts, key, lr_scale, assets=assets,
            config=config, rcfg=rcfg, vgg=vgg, txs=txs, extras=extras,
            coarse_on=coarse_on, app_on=app_on,
        )

    return train_step


def stage_flags(epoch: int, config: HarpConfig):
    s0, s1, _ = config.training_stage
    if epoch < s0:
        return True, False
    if epoch < s0 + s1:
        return True, True
    return False, True


def make_epoch_scan(assets: AvatarAssets, config: HarpConfig, rcfg: RasterConfig,
                    vgg: Vgg16Features | None, txs,
                    extras: dict | None = None, batch_sharding=None):
    """Multi-epoch fused training: ONE jitted lax.scan over (epochs, steps).

    The Python epoch loop dispatches every train step through the host (and,
    on the axon tunnel, each dispatch costs tens of ms — the round-2
    protocol fit ran 0.95 s/step against a 0.69 s/step synced bench).
    Scanning whole epoch segments on device removes that per-step overhead:
    minibatch gathers (images[fids]) happen inside the scan from the
    closed-over device-resident sequence, and the plateau LR schedule is
    carried in the scan state (same ReduceLROnPlateau decisions as
    fit/optimizer.plateau_update, computed in f32 on device).

    Returned fn: run_epochs(params, opt_states, aux, images (N,H,W,3),
    masks (N,H,W), masks_er (N,H,W), fids_es (E, steps, bs),
    keys_es (E, steps, 2), ref_verts, plateau3 (best, bad, scale),
    n_active (i32 scalar), *, coarse_on, app_on) -> (params, opt_states,
    plateau3, totals (E,), breakdown dict of (E,)).

    The sequence arrays are ARGUMENTS, not closures: closed-over jnp arrays
    get embedded in the executable (87 MB images + 2x29 MB masks at the
    448^2/36f protocol — the round-3 "~124 MB stage executables" whose
    57-69 s tunnel loads were the protocol's single largest stall). As
    arguments they are zero-copy device buffers and the executable carries
    only code.

    n_active masks the tail of the segment: epochs with index >= n_active
    still execute (a lax.scan has a static trip count) but their parameter /
    optimizer / plateau updates are discarded by a select against the
    previous carry, so ONE scan executable serves full segments AND stage
    remainders (n_active < E). Without this, every remainder epoch would
    dispatch the separate per-step program — whose ~120 MB executable load
    over the tunnel (57-69 s) is exactly the round-3 protocol's stall tax.
    Masked epochs run on repeated fids/keys and their outputs are garbage;
    the host truncates history to n_active rows.

    batch_sharding: NamedSharding for the per-minibatch gathers inside the
    scan — with a frame-sharded sequence (fit_sequence(mesh=...)) this
    constrains images[fids] etc. to stay frame-sharded; without it GSPMD
    is free to all-gather the full sequence onto every device.
    """
    patience = jnp.asarray(config.plateau_patience, jnp.int32)
    factor = jnp.asarray(config.plateau_factor, jnp.float32)
    threshold = jnp.float32(1e-4)
    constrain = (
        (lambda a: jax.lax.with_sharding_constraint(a, batch_sharding))
        if batch_sharding is not None else (lambda a: a)
    )

    @partial(jax.jit, static_argnames=("coarse_on", "app_on"),
             donate_argnums=(0, 1))
    def run_epochs(params, opt_states, aux, images, msks, mers, fids_es,
                   keys_es, ref_verts, plateau3, n_active, *,
                   coarse_on: bool, app_on: bool):
        def step_body(carry, xs):
            params, opt_states, lr_scale = carry
            fids, key = xs
            params, new_states, total, breakdown = _grad_step(
                params, opt_states, aux, fids, constrain(images[fids]),
                constrain(msks[fids]), constrain(mers[fids]), ref_verts,
                key, lr_scale, assets=assets, config=config, rcfg=rcfg,
                vgg=vgg, txs=txs, extras=extras,
                coarse_on=coarse_on, app_on=app_on,
            )
            return (params, new_states, lr_scale), (total, breakdown)

        def epoch_body(carry, xs):
            params, opt_states, plateau, ei = carry
            fids_s, keys_s = xs
            best, bad, scale = plateau
            (p_new, s_new, _), (totals, breakdowns) = jax.lax.scan(
                step_body, (params, opt_states, scale), (fids_s, keys_s)
            )
            epoch_loss = totals.mean()
            pl_new = plateau
            if coarse_on:
                # plateau_update (fit/optimizer.py) semantics on device.
                improved = epoch_loss < best * (1.0 - threshold)
                new_best = jnp.where(improved, epoch_loss, best)
                new_bad = jnp.where(improved, 0, bad + 1)
                trip = new_bad > patience
                new_scale = jnp.where(trip, scale * factor, scale)
                new_bad = jnp.where(trip, 0, new_bad)
                pl_new = (new_best, new_bad, new_scale)
            # Remainder masking: epochs past n_active computed but discarded.
            active = ei < n_active
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(active, a, b), new, old
            )
            params = sel(p_new, params)
            opt_states = sel(s_new, opt_states)
            plateau = sel(pl_new, plateau)
            return (params, opt_states, plateau, ei + 1), (
                epoch_loss, plateau[2],
                jax.tree.map(lambda x: x.sum(0), breakdowns),
            )

        (params, opt_states, plateau3, _), (totals, scales, breakdown) = jax.lax.scan(
            epoch_body,
            (params, opt_states, plateau3, jnp.asarray(0, jnp.int32)),
            (fids_es, keys_es),
        )
        return params, opt_states, plateau3, totals, scales, breakdown

    return run_epochs


# The axon TPU worker dies (crashes/restarts, losing all loaded state) when
# ONE device program executes for longer than roughly a minute — measured
# round 5 with the app-stage scan on a 300-frame sequence: 16-step segments
# of E=5 epochs (~45 s) run, E=10 (~85 s) reproducibly kill the worker, as
# did every other >80-step dispatch (B12×25-step, B18×25-step, f32 and
# uint8 alike), while all <=80-step dispatches across five protocol runs
# never have. The fused epoch scan therefore caps the WORK per dispatch,
# not just the epochs per segment: long sequences (more steps/epoch) get a
# proportionally shorter scan, falling back to the per-step loop when even
# one epoch is too long.
MAX_SCAN_STEPS_PER_DISPATCH = 80


def _effective_epoch_scan(epoch_scan: int, n_frames: int, batch_size: int) -> int:
    if not epoch_scan or epoch_scan <= 1:
        return epoch_scan
    steps = max(n_frames // max(min(batch_size, n_frames), 1), 1)
    return max(min(epoch_scan, MAX_SCAN_STEPS_PER_DISPATCH // steps), 1)


# Stage-1 scan programs compiled BEFORE the sequence data exists (keyed on
# the fabricated aval signature): on a cold cache the first stage scan is
# the fit's longest serial compile wait (~40-60 s), yet its shapes are fully
# determined by (config, assets, n_frames) — so fit_avatar starts this
# compile while synthetic GT generation / dataset loading still runs.
# Entries: key -> [threading.Event, Compiled | None].
_PREWARM: dict = {}
_PREWARM_HITS: list = []  # keys actually consumed by a fit (test/telemetry)


def _prewarm_scan_key(config, assets, rcfg, flags, aval_tuple, vgg, extras):
    vsig = (None if vgg is None else
            (vgg.source, vgg.compute_dtype, tuple(vgg.layers_weights)))
    return ("scan", flags, id(assets), config, rcfg,
            _tree_sig(aval_tuple, include_sharding=False), vsig,
            id(extras) if extras else None)


def _prewarm_take(key):
    """The prewarmed Compiled for `key`, waiting out an in-flight build;
    None on miss or failed build."""
    ent = _PREWARM.get(key)
    if ent is None:
        return None
    ent[0].wait()
    if ent[1] is not None:
        _PREWARM_HITS.append(key)
    return ent[1]


def _fit_avals(config: HarpConfig, assets: AvatarAssets, n_frames: int):
    """Abstract shapes of (params, aux) exactly as init_params would build
    them (pinned by tests/test_fit_e2e.py::test_prewarm_avals_match) — the
    prewarm path cannot call init_params itself: eagerly creating a dozen
    arrays over the axon tunnel costs seconds, and the data the real call
    needs does not exist yet."""
    n, V, ts = n_frames, assets.num_render_verts, config.texture_size
    f32 = jnp.float32
    sds = lambda sh, dt=f32: jax.ShapeDtypeStruct(sh, dt)
    p_abs = {
        "trans": sds((n, 3)), "pose": sds((n, 45)), "rot": sds((n, 3)),
        "shape": sds((10,)), "wrist_pose": sds((n, 3)), "cam": sds((n, 3)),
        "verts_disps": sds((V, 1 if config.vert_disp_normals else 3)),
        "texture": sds((ts, ts, 3)), "normal_map": sds((ts, ts, 3)),
        "light_positions": sds((n, 3)), "amb_ratio": sds(()),
    }
    if config.model_type == "html":
        p_abs["html_texture"] = sds((101,))
    aux_abs = {"init_joints": sds((n, 21, 3)), "uv_mask": sds((ts, ts))}
    return p_abs, aux_abs


def prewarm_stage_programs(config: HarpConfig, assets: AvatarAssets,
                           n_frames: int, rcfg: RasterConfig | None = None,
                           *, epoch_scan: int = 10, extras: dict | None = None,
                           stage_epochs: tuple = (0,),
                           frames_dtype=jnp.float32):
    """Start AOT-compiling stage-scan executables in daemon threads, before
    the sequence data exists. fit_sequence's prefetch lane picks each
    Compiled out of _PREWARM (matching on the full abstract signature)
    instead of compiling it again; on any mismatch it falls through to its
    own compile — the prewarm can only ever waste its own threads, never
    change results. Single-device only (a mesh run's sharded lowering
    differs). Returns the list of Threads (possibly empty).

    stage_epochs: one representative epoch per program to prewarm.
    (0, config.training_stage[0]) covers the protocol's two distinct scan
    programs — stage 1 (silhouette-only) and the app stages (stage 2 and 3
    share one executable; flags differ only via traced scalars... they do
    not: both are (True, True), one program). The r5 cold anatomy motivates
    the second entry: stage 1 is too short (24 s) to cover the ~86 s
    app-scan compile, leaving a 61.8 s wait at epoch 100 — compiling it
    from process start hides it behind data generation + stage 1."""
    epoch_scan = _effective_epoch_scan(epoch_scan, n_frames,
                                       config.batch_size)
    if not epoch_scan or epoch_scan <= 1:
        return []
    from harp_tpu.fit.optimizer import build_txs
    import threading as _threading

    rcfg = rcfg or config.raster_config()
    p_abs, aux_abs = _fit_avals(config, assets, n_frames)
    vgg = None
    if config.w_vgg > 0:
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
        aux_abs["vgg_params"] = tuple(
            (jax.ShapeDtypeStruct(w.shape, jnp.float32),
             jax.ShapeDtypeStruct(b.shape, jnp.float32))
            for (w, b) in vgg.params
        )
    txs, _ = build_txs(p_abs, config)
    s_abs = {g: jax.eval_shape(txs[g].init, p_abs) for g in txs}
    rv_abs = jax.eval_shape(
        lambda p: pipeline.mesh_forward(p, jnp.asarray([0]), assets,
                                        config)[0][0], p_abs
    )
    H = config.img_size
    f32 = jnp.float32
    fdt = jnp.dtype(frames_dtype)
    sds = jax.ShapeDtypeStruct
    seq_img = sds((n_frames, H, H, 3), fdt)
    seq_msk = sds((n_frames, H, H), fdt)
    seq_mer = sds((n_frames, H, H), fdt)
    bs = min(config.batch_size, n_frames)
    steps = max(n_frames // bs, 1)
    fids_es = sds((epoch_scan, steps, bs), jnp.int32)
    keys_es = sds((epoch_scan, steps, 2), jnp.uint32)
    f32s, i32s = sds((), f32), sds((), jnp.int32)

    gt_abs = None
    if (vgg is not None and config.vgg_cache_gt
            and n_frames <= config.vgg_cache_max_frames):
        # Abstract shapes of the deferred GT-VGG cache, mirroring
        # fit_sequence's vgg_gt_fn eval_shape (the app-stage scan's aux
        # includes the cache pytree).
        from harp_tpu.losses.perceptual import precompute_slices

        gt_shapes = jax.eval_shape(
            lambda im, vp: precompute_slices(
                dataclasses.replace(vgg, params=tuple(vp)), im,
                chunk=config.vgg_chunk,
            ),
            sds((n_frames, H, H, 3), f32), aux_abs["vgg_params"],
        )
        gt_abs = tuple(sds(s.shape, s.dtype) for s in gt_shapes)

    scan_fn = make_epoch_scan(assets, config, rcfg, vgg, txs, extras)
    threads = []
    for e in stage_epochs:
        flags = stage_flags(int(e), config)
        c_on, a_on = flags
        aux_k = (dict(aux_abs, vgg_gt=gt_abs)
                 if (a_on and gt_abs is not None) else aux_abs)
        aval_tuple = (p_abs, s_abs, aux_k, seq_img, seq_msk, seq_mer,
                      fids_es, keys_es, rv_abs)
        key = _prewarm_scan_key(config, assets, rcfg, flags, aval_tuple, vgg,
                                extras)
        if key in _PREWARM:
            continue
        ent = [_threading.Event(), None]
        _PREWARM[key] = ent

        def work(ent=ent, aux_k=aux_k, c_on=c_on, a_on=a_on):
            try:
                ent[1] = scan_fn.lower(
                    p_abs, s_abs, aux_k, seq_img, seq_msk, seq_mer,
                    fids_es, keys_es, rv_abs, (f32s, i32s, f32s), i32s,
                    coarse_on=c_on, app_on=a_on,
                ).compile()
            except Exception:
                ent[1] = None
            finally:
                ent[0].set()

        th = _threading.Thread(target=work, daemon=True)
        th.start()
        threads.append(th)
    return threads


def prewarm_stage1_program(config: HarpConfig, assets: AvatarAssets,
                           n_frames: int, rcfg: RasterConfig | None = None,
                           *, epoch_scan: int = 10, extras: dict | None = None):
    """Back-compat wrapper: prewarm only the stage-1 scan program."""
    ths = prewarm_stage_programs(config, assets, n_frames, rcfg,
                                 epoch_scan=epoch_scan, extras=extras,
                                 stage_epochs=(0,))
    return ths[0] if ths else None


def fit_sequence(config: HarpConfig, assets: AvatarAssets, data: FitData,
                 params: dict, aux: dict, rcfg: RasterConfig | None = None,
                 vgg: Vgg16Features | None = None, seed: int = 0,
                 log_every: int = 10, callback=None,
                 out_dir: str | None = None, image_log_every: int = 0,
                 checkpoint_every: int = 200, extras: dict | None = None,
                 val_data: FitData | None = None,
                 val_params: dict | None = None, val_log_every: int = 20,
                 mesh=None, resume: dict | None = None,
                 epoch_scan: int = 0, prefetch_compile: bool = True,
                 prefetch_extra=None):
    """Run the staged optimization. Returns (params, history).

    out_dir enables observability (the reference's TensorBoard scalars +
    periodic image logs + checkpoints, optimize_sequence.py:490-592):
    per-step loss JSONL, silhouette/RGB pair grids every `image_log_every`
    epochs, full-state checkpoints every `checkpoint_every` epochs, and —
    when `val_data` (+ per-val-frame `val_params` with pose/cam rows) is
    given — a held-out render grid plus UV/normal-map snapshots every
    `val_log_every` epochs (reference visualize_val,
    optimize_sequence.py:97-171; shared shape/appearance are taken live
    from the optimized params, per-frame rows from `val_params`).

    mesh: optional jax.sharding.Mesh — multi-chip fitting of THIS sequence
    (SURVEY §2 DP row): per-frame parameter rows, sequence data, and every
    minibatch are sharded over the mesh's first axis; shared parameters are
    replicated and their gradient psum is inserted by GSPMD. The minibatch
    permutation gather stays on device (a jitted gather with sharded output
    — no host round trip, shardings preserved). Requires batch_size
    divisible by the mesh device count.

    resume: optional checkpoint payload ({opt_states, epoch, plateau_scale},
    the load_checkpoint / OrbaxCheckpointer.restore layout) — continues a
    killed fit mid-protocol: optimizer moments, the epoch cursor (training
    resumes at epoch+1, so stage flags line up), and the plateau lr scale
    are restored; pass the checkpoint's params through `params` as usual.

    epoch_scan: >1 runs EVERY epoch through fused epoch_scan-length
    lax.scan dispatches (make_epoch_scan) — eliminating per-step host
    dispatch (tens of ms each over the axon tunnel). Stage remainders run
    the SAME scan executable with the tail masked out (n_active), so the
    separate per-step train program is never compiled or loaded on this
    path — in round 3 the protocol's three ~120 MB step executables, used
    only for remainder/action epochs, cost ~60 s of tunnel load each.
    Host-side actions (image/val logs, checkpoints) that fall due inside a
    segment are DEFERRED to the segment's last epoch and labeled with it —
    the logged/checkpointed state is exactly the state at that epoch; only
    the cadence shifts by up to epoch_scan-1 epochs. A per-epoch `callback`
    still forces the per-step loop. Semantic differences vs the loop path:
    plateau comparisons run in f32 on device instead of host f64 (decisions
    agree except within ~1e-7 rel of the threshold), and masked remainder
    epochs compute-and-discard (under --debug-nans their garbage outputs
    can false-trip the NaN checker).

    prefetch_extra: optional list of callables the prefetch thread runs
    after the stage programs compile — e.g. AOT-compiling the eval pass so
    its executable loads during the last training stage.

    prefetch_compile: AOT-compile upcoming stage programs (the fused epoch
    scan and the per-step train program per stage-flag combo) in ONE
    background thread, in first-use order, while earlier stages train. On
    the axon tunnel, loading each big stage executable costs ~60 s even
    with a warm compile cache (deserializing ~124 MB of TPU codegen); the
    round-3 protocol spent ~175 s of its 539 s warm wall on such loads,
    all of it overlappable with stage-1/2 compute. The thread only traces
    + compiles (no device execution); the epoch loop blocks on a program's
    completion event before first use and falls back to the plain jit call
    if its compile failed.
    """
    from harp_tpu.fit.optimizer import build_optimizers, PlateauState, plateau_update
    import time as _time

    _walls: dict = {}  # setup/segment timing anatomy, logged to the JSONL
    _t0 = _time.perf_counter()

    rcfg = rcfg or config.raster_config()
    if vgg is None and config.w_vgg > 0:
        vgg = Vgg16Features.create(weights_path=config.vgg_weights or None,
                                   compute_dtype=config.vgg_compute_dtype)
    if vgg is not None:
        # Filters flow as traced args (compute_losses picks them up from
        # aux) so no program embeds the ~31 MB bank as literals.
        aux = dict(aux, vgg_params=tuple(
            (jnp.asarray(w), jnp.asarray(b)) for (w, b) in vgg.params
        ))

    gather_batch = lambda a, f: a[f]
    fsh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from harp_tpu.parallel.sharding import shard_params, frame_sharding

        n_dev = mesh.devices.size
        bs_eff = min(config.batch_size, data.num_frames)
        if bs_eff % n_dev != 0:
            raise ValueError(
                f"batch_size {bs_eff} must be divisible by the mesh's "
                f"{n_dev} devices for frame-axis sharding"
            )
        fsh = frame_sharding(mesh)
        rsh = NamedSharding(mesh, P())
        params = shard_params(mesh, params)
        aux = {
            "init_joints": jax.device_put(aux["init_joints"], fsh),
            **{k: jax.device_put(v, rsh) for k, v in aux.items()
               if k != "init_joints"},
        }
        data = FitData(
            images=jax.device_put(data.images, fsh),
            masks=jax.device_put(data.masks, fsh),
            masks_eroded=jax.device_put(data.masks_eroded, fsh),
        )
        # Device-side permutation gather with frame-sharded output: the
        # epoch loop never pulls image data to the host.
        gather_batch = jax.jit(lambda a, f: a[f], out_shardings=fsh)

    vgg_gt_fn = None
    vgg_gt_masked = None
    if (vgg is not None and config.vgg_cache_gt
            and data.num_frames <= config.vgg_cache_max_frames):
        # One-time GT-side VGG pyramid per frame: the step's vgg loss
        # becomes pred-forward + gather instead of two forwards (plus the
        # checkpoint's GT recompute in the backward). DEFERRED to the first
        # app-stage dispatch (stage 1 never reads it): its ~65 MB executable
        # then compiles/loads in the prefetch thread during stage-1 training
        # instead of blocking the fit start (round-3 anatomy: this program
        # alone cost ~30 s of pre-epoch-0 tunnel load).
        from harp_tpu.losses.perceptual import precompute_slices

        vgg_gt_masked = jax.jit(
            lambda i, m: _decode_frames(i) * _decode_frames(m)[..., None]
        )(data.images, data.masks_eroded)
        vgg_gt_fn = jax.jit(
            lambda im, vp: precompute_slices(
                dataclasses.replace(vgg, params=tuple(vp)), im,
                chunk=config.vgg_chunk,
            )
        )

    txs, opt_states, _ = build_optimizers(params, config)
    train_step = make_train_step(assets, config, rcfg, vgg, txs, extras)

    logger = None
    if out_dir is not None:
        from harp_tpu.utils.profiling import MetricsLogger

        logger = MetricsLogger(out_dir)
    orbax_ckpt = None
    if (out_dir is not None and checkpoint_every
            and config.checkpoint_backend == "orbax"):
        from harp_tpu.utils.orbax_io import OrbaxCheckpointer

        orbax_ckpt = OrbaxCheckpointer(out_dir)

    # ARAP reference mesh: frame 0 at the initial parameters (reference :431).
    if resume is not None and "ref_verts" in (resume.get("extra") or {}):
        # Exact-resume: the ARAP reference is frame 0 at the fit's ORIGINAL
        # initial parameters; recomputing it from checkpointed params would
        # quietly change the loss mid-protocol.
        ref_verts = jnp.asarray(resume["extra"]["ref_verts"])
    else:
        # Jitted: the eager path dispatches the whole LBS+subdivision chain
        # op-by-op over the device tunnel (~tens of ms each). Off-mesh, the
        # concrete compute is DEFERRED to just after the prefetch thread
        # starts, so this program's compile/load overlaps the stage-1 scan's
        # (its abstract shape is enough for the prefetch lowering).
        _ref_fn = jax.jit(
            lambda p: jax.lax.stop_gradient(
                pipeline.mesh_forward(p, jnp.asarray([0]), assets,
                                      config)[0][0]
            )
        )
        if mesh is not None:
            # Under a mesh the prefetch lowering needs the concrete array's
            # GSPMD sharding; compute it now.
            ref_verts = _ref_fn(params)
            jax.block_until_ready(ref_verts)
        else:
            ref_verts = None  # deferred; see below
    _walls["setup_ref_verts_s"] = _time.perf_counter() - _t0

    n = data.num_frames
    bs = min(config.batch_size, n)
    steps = max(n // bs, 1)
    rng = np.random.RandomState(seed)
    # The whole fit's texture-reg key stream, precomputed ON THE CPU BACKEND
    # (threefry is bitwise platform-independent): the old per-segment
    # jax.jit(lax.scan(split))(key) compiled one tunnel program PER DISTINCT
    # segment length (~10-12 s each — the r4c run paid it twice, once for
    # L=10 and once for the L=1 remainder at epoch 300), and a resumed fit
    # replayed start_epoch*steps EAGER splits over the tunnel (~25 ms each).
    # subs_all[e*steps + s] is bit-identical to the carried
    # `key, sub = jax.random.split(key)` stream both paths used before.
    subs_all = _key_stream_host(seed, config.total_epoch * steps)
    plateau = PlateauState()
    history = []
    start_epoch = 0
    if resume is not None:
        opt_states = jax.tree.map(jnp.asarray, resume["opt_states"])
        pl = (resume.get("extra") or {}).get("plateau")
        plateau = (PlateauState(**{k: type(getattr(plateau, k))(v)
                                   for k, v in pl.items()}) if pl else
                   PlateauState(scale=float(resume.get("plateau_scale", 1.0))))
        start_epoch = int(resume["epoch"]) + 1
        # Replay the permutation stream so a resumed fit sees the same
        # minibatches as an uninterrupted one (the key stream is indexed by
        # absolute epoch, so it needs no replay).
        for _ in range(start_epoch):
            rng.permutation(n)

    epoch_scan = _effective_epoch_scan(epoch_scan, n, bs)
    scan_fn = None
    if epoch_scan and epoch_scan > 1:
        scan_fn = make_epoch_scan(assets, config, rcfg, vgg, txs,
                                  extras, batch_sharding=fsh)

    # A per-epoch callback needs host control between epochs — the fused
    # scan path cannot honor it, so fall back to the per-step loop.
    use_scan = scan_fn is not None and callback is None

    def _segment_len(e: int) -> int:
        """Number of REAL epochs the scan dispatch at epoch e advances:
        capped by epoch_scan, the stage boundary, and total_epoch. The scan
        executable always runs epoch_scan epochs; lengths below that run
        with the tail masked (n_active) — same program, no remainder
        compile."""
        flags = stage_flags(e, config)
        L = 1
        while (L < epoch_scan and e + L < config.total_epoch
               and stage_flags(e + L, config) == flags):
            L += 1
        return L

    # --- background AOT compile of upcoming stage programs (see docstring).
    _programs: dict = {}
    _events: dict = {}
    if prefetch_compile:
        import threading

        plan = []
        e_sim = start_epoch
        while e_sim < config.total_epoch:
            flags = stage_flags(e_sim, config)
            if use_scan:
                k = ("scan", flags)
                e_sim += _segment_len(e_sim)
            else:
                k = ("step", flags)
                e_sim += 1
            if k not in _events:
                _events[k] = threading.Event()
                plan.append(k)
        if vgg_gt_fn is not None and any(f[1] for _, f in plan):
            _events["gtvgg"] = threading.Event()

        def _abs(x):
            x = x if hasattr(x, "shape") else jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=getattr(x, "sharding", None))

        # Shape snapshots taken BEFORE any donation invalidates the buffers.
        p_abs = jax.tree.map(_abs, params)
        s_abs = jax.tree.map(_abs, opt_states)
        a_abs = jax.tree.map(_abs, aux)
        rv_abs = (_abs(ref_verts) if ref_verts is not None
                  else _abs(jax.eval_shape(_ref_fn, p_abs)))
        f32s = jax.ShapeDtypeStruct((), jnp.float32)
        i32s = jax.ShapeDtypeStruct((), jnp.int32)
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        def _batch_abs(a):
            # Shape of one gathered minibatch (a[fids]); under a mesh the
            # gather is jitted with out_shardings=fsh, so match it.
            return jax.ShapeDtypeStruct((bs,) + a.shape[1:], a.dtype,
                                        sharding=fsh)

        img_abs = _batch_abs(data.images)
        msk_abs = _batch_abs(data.masks)
        mer_abs = _batch_abs(data.masks_eroded)
        # Whole-sequence shapes for the scan path (the scan gathers
        # minibatches on device from the full arrays).
        seq_img_abs = _abs(data.images)
        seq_msk_abs = _abs(data.masks)
        seq_mer_abs = _abs(data.masks_eroded)
        fids_abs = jax.ShapeDtypeStruct((bs,), jnp.int32)
        fids_es_abs = jax.ShapeDtypeStruct((epoch_scan, steps, bs), jnp.int32)
        keys_es_abs = jax.ShapeDtypeStruct((epoch_scan, steps, 2), jnp.uint32)

        gt_abs = None
        if vgg_gt_fn is not None:
            # Abstract shapes of the deferred GT-VGG cache: app-stage
            # programs are lowered against aux + vgg_gt without running the
            # precompute itself.
            gt_shapes = jax.eval_shape(vgg_gt_fn, vgg_gt_masked,
                                       aux["vgg_params"])
            gt_abs = tuple(
                jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=fsh)
                for s in gt_shapes
            )

        def _aux_abs_for(a_on: bool):
            if a_on and gt_abs is not None:
                return dict(a_abs, vgg_gt=gt_abs)
            return a_abs

        def _compile_prog(k):
            kind, (c_on, a_on) = k
            try:
                aux_k = _aux_abs_for(a_on)
                if kind == "scan" and fsh is None:
                    # A prewarm (prewarm_stage1_program) may already be
                    # compiling this exact program — started before the
                    # data existed. Full-signature match or fall through.
                    pre = _prewarm_take(_prewarm_scan_key(
                        config, assets, rcfg, (c_on, a_on),
                        (p_abs, s_abs, aux_k, seq_img_abs, seq_msk_abs,
                         seq_mer_abs, fids_es_abs, keys_es_abs, rv_abs),
                        vgg, extras,
                    ))
                    if pre is not None:
                        _programs[k] = pre
                        return
                if kind == "scan":
                    low = scan_fn.lower(
                        p_abs, s_abs, aux_k, seq_img_abs, seq_msk_abs,
                        seq_mer_abs, fids_es_abs, keys_es_abs,
                        rv_abs, (f32s, i32s, f32s), i32s,
                        coarse_on=c_on, app_on=a_on,
                    )
                else:
                    low = train_step.lower(
                        p_abs, s_abs, aux_k, fids_abs, img_abs, msk_abs,
                        mer_abs, rv_abs, key_abs, f32s,
                        coarse_on=c_on, app_on=a_on,
                    )
                _programs[k] = low.compile()
            except Exception:  # fall back to the jit path for this combo
                _programs[k] = None
            finally:
                _events[k].set()

        def _compile_gtvgg():
            try:
                _programs["gtvgg"] = vgg_gt_fn.lower(
                    jax.tree.map(_abs, vgg_gt_masked),
                    jax.tree.map(_abs, aux["vgg_params"]),
                ).compile()
            except Exception:
                _programs["gtvgg"] = None
            finally:
                _events["gtvgg"].set()

        def _compile_copies():
            # The tiny snapshot-copy executables used by the deferred
            # logging renders and async checkpoints (first-call compiles
            # cost ~5 s each over the tunnel).
            try:
                _copy_compiled(p_abs)
                _copy_compiled((p_abs, s_abs))
            except Exception:
                pass
            # The pair-grid logging render: warming it here keeps the
            # background writer queue from stalling on its first-call
            # compile (whose drain otherwise lands on the end-of-fit
            # flush — 27.9 s of the r4d warm protocol tail).
            if out_dir is not None and image_log_every:
                try:
                    n_log = min(9, data.num_frames)
                    _log_render_compiled(assets, config, rcfg, n_log,
                                         p_abs, _abs(data.masks[:n_log]))
                except Exception:
                    pass

        def _run_extra(fn):
            def run():
                try:
                    fn()
                except Exception:
                    # A failed extra only costs its own warmup (the real
                    # consumer recompiles transparently) — but say so:
                    # silent failures here cost ~60 s of eval-time compiles
                    # and are invisible otherwise.
                    import traceback

                    traceback.print_exc()
            return run

        # The axon worker overlaps concurrent compile/load requests almost
        # perfectly (scripts/probe_compile_concurrency.py: two protocol
        # stage scans warm-load in 50.7 s wall vs 94.7 s serial), so the
        # plan runs on a small pool of lanes instead of one thread. Tasks
        # stay in first-use order; three lanes keep the worker below the
        # request level that has been observed to wedge it.
        tasks = []
        for i, k in enumerate(plan):
            tasks.append(partial(_compile_prog, k))
            if i == 0 and "gtvgg" in _events:
                tasks.append(_compile_gtvgg)
            if i == 1:
                tasks.append(_compile_copies)
        if len(plan) <= 1:
            tasks.append(_compile_copies)
        tasks.extend(_run_extra(fn) for fn in (prefetch_extra or []))

        _next = [0]
        _next_lock = threading.Lock()

        def _lane():
            while True:
                with _next_lock:
                    i = _next[0]
                    if i >= len(tasks):
                        return
                    _next[0] += 1
                tasks[i]()

        for _ in range(min(3, len(tasks))):
            threading.Thread(target=_lane, daemon=True).start()

    if ref_verts is None:
        # Deferred ARAP-reference compute: rides alongside the prefetch
        # thread's stage-1 scan compile/load instead of before it.
        _t_rv = _time.perf_counter()
        ref_verts = _ref_fn(params)
        jax.block_until_ready(ref_verts)
        _walls["setup_ref_verts_s"] = _time.perf_counter() - _t_rv

    def _program(kind, flags):
        """The AOT-compiled program for (kind, stage flags), or None."""
        ev = _events.get((kind, flags))
        if ev is None:
            return None
        ev.wait()
        return _programs.get((kind, flags))

    def _ensure_vgg_gt():
        """Materialize the deferred GT-VGG feature cache into aux (once,
        right before the first app-stage dispatch). Uses the prefetch
        thread's AOT executable when available."""
        nonlocal aux
        if vgg_gt_fn is None or "vgg_gt" in aux:
            return
        comp = None
        ev = _events.get("gtvgg")
        if ev is not None:
            ev.wait()
            comp = _programs.get("gtvgg")
        gt_slices = (comp(vgg_gt_masked, aux["vgg_params"])
                     if comp is not None
                     else vgg_gt_fn(vgg_gt_masked, aux["vgg_params"]))
        if fsh is not None:
            gt_slices = tuple(jax.device_put(s, fsh) for s in gt_slices)
        aux = dict(aux, vgg_gt=gt_slices)

    def _run_actions(label: int, due) -> None:
        """Host-side actions that fell due during [due) — run once with the
        state at epoch `label` (the segment's last epoch)."""
        if out_dir is not None and image_log_every and any(
                e % image_log_every == 0 for e in due):
            _log_images(params, aux, data, assets, config, rcfg, out_dir, label)
        if (out_dir is not None and val_data is not None and val_log_every
                and any(e % val_log_every == 0 for e in due)):
            _log_val_images(params, val_params, val_data, assets, config,
                            rcfg, out_dir, label, extras)
        if out_dir is not None and checkpoint_every and any(
                e > 0 and e % checkpoint_every == 0 for e in due):
            from harp_tpu.utils.io import save_result, save_checkpoint
            import os

            plateau_extra = {"plateau": dataclasses.asdict(plateau),
                             "ref_verts": np.asarray(ref_verts)}
            if orbax_ckpt is not None:
                # Async: device-to-host + write happen in the background,
                # the epoch loop does not block on storage.
                orbax_ckpt.save(label, params, opt_states, plateau.scale,
                                extra=plateau_extra)
            else:
                # Device-side copies decouple the snapshot from the next
                # segment's donation of params/opt_states; the host pull +
                # pickle ride the background writer thread (mid-protocol
                # this transfer cost ~5 s of epoch-loop block).
                p_snap, s_snap = _copy_tree((params, opt_states))
                scale = plateau.scale

                def write_ckpt(p=p_snap, s=s_snap, lb=label, sc=scale,
                               ex=plateau_extra):
                    save_result(p, out_dir, test=config.known_appearance)
                    save_checkpoint(
                        os.path.join(out_dir, "checkpoint.pkl"), p, s,
                        lb, sc, extra=ex,
                    )

                _submit_log_write(write_ckpt)

    _walls["setup_total_s"] = _time.perf_counter() - _t0
    if logger is not None:
        logger.log(-1, **_walls)

    epoch = start_epoch
    while epoch < config.total_epoch:
        coarse_on, app_on = stage_flags(epoch, config)
        if app_on:
            _t_gt = _time.perf_counter()
            _ensure_vgg_gt()
            _gt_s = _time.perf_counter() - _t_gt
            if logger is not None and _gt_s > 0.5:
                logger.log(epoch, vgg_gt_materialize_s=_gt_s)

        if use_scan:
            E = epoch_scan
            L = _segment_len(epoch)
            fids_np = np.stack([
                rng.permutation(n)[: steps * bs].reshape(steps, bs)
                for _ in range(L)
            ]).astype(np.int32)
            if L < E:
                # Remainder segment: pad with repeats of the last epoch's
                # permutation — the masked tail computes-and-discards, and
                # the host rng stream advances exactly L epochs (so resume
                # replay stays aligned).
                fids_np = np.concatenate(
                    [fids_np, np.repeat(fids_np[-1:], E - L, 0)], 0
                )
            fids_es = jnp.asarray(fids_np)

            subs = subs_all[epoch * steps:(epoch + L) * steps]
            subs = subs.reshape((L, steps) + subs.shape[1:])
            if L < E:
                # Masked tail epochs compute-and-discard; repeat the last
                # epoch's keys (any keys would do — nothing they touch
                # survives the n_active select).
                subs = np.concatenate(
                    [subs, np.broadcast_to(subs[-1:], (E - L,) + subs.shape[1:])], 0
                )
            keys_es = jnp.asarray(subs)
            plateau3 = (jnp.asarray(plateau.best, jnp.float32),
                        jnp.asarray(plateau.bad_epochs, jnp.int32),
                        jnp.asarray(plateau.scale, jnp.float32))
            n_act = jnp.asarray(L, jnp.int32)
            _t_seg = _time.perf_counter()
            comp = _program("scan", (coarse_on, app_on))
            _wait_s = _time.perf_counter() - _t_seg
            if comp is not None:
                params, opt_states, plateau3, totals, scales, breakdown = comp(
                    params, opt_states, aux, data.images, data.masks,
                    data.masks_eroded, fids_es, keys_es, ref_verts,
                    plateau3, n_act,
                )
            else:
                params, opt_states, plateau3, totals, scales, breakdown = scan_fn(
                    params, opt_states, aux, data.images, data.masks,
                    data.masks_eroded, fids_es, keys_es, ref_verts,
                    plateau3, n_act, coarse_on=coarse_on, app_on=app_on,
                )
            term_keys = list(breakdown)
            host = np.asarray(jnp.concatenate(
                [totals, scales, plateau3[0][None], plateau3[1].astype(jnp.float32)[None],
                 plateau3[2][None]]
                + [breakdown[k] for k in term_keys]
            ))  # one host sync for the whole segment's scalars
            totals_h = host[:E]
            scales_h = host[E:2 * E]
            plateau = PlateauState(best=float(host[2 * E]),
                                   bad_epochs=int(host[2 * E + 1]),
                                   scale=float(host[2 * E + 2]))
            terms_h = host[2 * E + 3:].reshape(len(term_keys), E)
            _seg_s = _time.perf_counter() - _t_seg
            _t_act = _time.perf_counter()
            _run_actions(epoch + L - 1, range(epoch, epoch + L))
            _act_s = _time.perf_counter() - _t_act
            for i in range(L):  # masked tail rows are garbage — drop them
                history.append({
                    "epoch": epoch + i, "loss": float(totals_h[i]),
                    **{k: float(terms_h[j, i]) / steps
                       for j, k in enumerate(term_keys)},
                })
                if logger is not None:
                    timing = ({} if i < L - 1 else
                              {"segment_s": _seg_s, "program_wait_s": _wait_s,
                               "actions_s": _act_s})
                    logger.log(epoch + i, lr_scale=float(scales_h[i]),
                               **history[-1], **timing)
            epoch += L
            continue
        else:
            perm = rng.permutation(n)
            total_acc = None
            term_sums: dict = {}
            comp = _program("step", (coarse_on, app_on))
            for s in range(steps):
                fids = jnp.asarray(perm[s * bs : (s + 1) * bs], jnp.int32)
                sub = jnp.asarray(subs_all[epoch * steps + s])
                step_args = (
                    params, opt_states, aux, fids,
                    gather_batch(data.images, fids),
                    gather_batch(data.masks, fids),
                    gather_batch(data.masks_eroded, fids),
                    ref_verts, sub, jnp.asarray(plateau.scale, jnp.float32),
                )
                if comp is not None:
                    params, opt_states, total, breakdown = comp(*step_args)
                else:
                    params, opt_states, total, breakdown = train_step(
                        *step_args, coarse_on=coarse_on, app_on=app_on,
                    )
                # Accumulate ON DEVICE: a host sync per step costs ~25 ms on
                # the tunnel once a Mosaic kernel has run; one sync per epoch.
                total_acc = total if total_acc is None else total_acc + total
                for k, v in breakdown.items():
                    term_sums[k] = v if k not in term_sums else term_sums[k] + v
            term_keys = list(term_sums)
            host_vals = np.asarray(
                jnp.stack([total_acc] + [term_sums[k] for k in term_keys])
            )  # single host sync for the whole epoch's scalars
            epoch_loss = float(host_vals[0]) / steps
            term_sums = {k: float(v) for k, v in zip(term_keys, host_vals[1:])}
            if coarse_on:
                plateau = plateau_update(
                    plateau, epoch_loss, config.plateau_patience,
                    config.plateau_factor,
                )
            # Per-term means over the epoch's steps (the reference logs
            # per-step scalars, optimize_sequence.py:560-564; epoch means
            # carry the same signal without a per-step host sync).
            history.append({"epoch": epoch, "loss": epoch_loss,
                            **{k: v / steps for k, v in term_sums.items()}})
            if logger is not None:
                logger.log(epoch, lr_scale=plateau.scale, **history[-1])
        _run_actions(epoch, (epoch,))
        if callback is not None:
            callback(epoch, params, history[-1])
        epoch += 1
    # Pending async image/checkpoint writes land before we return; the
    # wait is logged so a writer-queue backlog shows up in the anatomy.
    _t_fl = _time.perf_counter()
    _flush_log_writer()
    if logger is not None:
        logger.log(config.total_epoch,
                   final_flush_s=_time.perf_counter() - _t_fl)
        logger.close()
    if orbax_ckpt is not None:
        orbax_ckpt.close()
    return params, history


# Compiled logging-render cache. The loggers below run every
# image_log_every/val_log_every epochs; defining their @jax.jit closure
# inside the function would recompile on EVERY call (the cache key is the
# function object) and permanently load one more executable on the device
# each time — the round-3 448^2 protocol runs crashed the TPU worker out of
# HBM at epoch ~191 after ~19 such raster programs had accumulated. Entries
# hold strong refs to the captured objects so id()-reuse cannot alias.
# Builds are serialized per key (threading.Event): the fit's prefetch lanes
# warm the log_images executable concurrently with the epoch loop / writer
# thread, and an unguarded miss would compile AND load a duplicate raster
# program — the accumulation mode described above.
_LOG_RENDER_CACHE: dict = {}
_LOG_RENDER_LOCK = threading.Lock()
_LOG_RENDER_BUILDING: dict = {}  # key -> threading.Event


def _cached_render(kind, n, objs, build, extra_key=()):
    key = (kind, n) + tuple(id(o) for o in objs) + tuple(extra_key)
    while True:
        with _LOG_RENDER_LOCK:
            hit = _LOG_RENDER_CACHE.get(key)
            if hit is not None and all(a is b for a, b in zip(hit[0], objs)):
                return hit[1]
            ev = _LOG_RENDER_BUILDING.get(key)
            if ev is None:
                ev = threading.Event()
                _LOG_RENDER_BUILDING[key] = ev
                is_builder = True
            else:
                is_builder = False
        if is_builder:
            try:
                fn = build()
                with _LOG_RENDER_LOCK:
                    _LOG_RENDER_CACHE[key] = (objs, fn)
                return fn
            finally:
                with _LOG_RENDER_LOCK:
                    del _LOG_RENDER_BUILDING[key]
                ev.set()
        else:
            # Another thread is building this key: wait, then re-check the
            # cache (if its build raised, the next loop iteration retries
            # as the builder instead of returning a missing entry).
            ev.wait()


def _tree_sig(tree, include_sharding: bool = True):
    """Hashable signature of a pytree's leaf avals + shardings — part of
    the AOT-render cache key, since the Compiled is specialized on them
    (a second fit in the same process with the same assets/config ids but
    different image resolution or param shapes must not reuse it).

    include_sharding=False drops the sharding column: the stage-1 prewarm
    fabricates avals before arrays exist (sharding None), while the live
    fit's avals carry SingleDeviceSharding — equivalent programs on one
    device, so the single-device prewarm key must not distinguish them."""
    sig = []
    for leaf in jax.tree.leaves(tree):
        leaf = leaf if hasattr(leaf, "shape") else jnp.asarray(leaf)
        cols = (tuple(leaf.shape), str(leaf.dtype))
        if include_sharding:
            sh = getattr(leaf, "sharding", None)
            cols += (None if sh is None else str(sh),)
        sig.append(cols)
    return tuple(sig)


def _threefry2x32_np(key: np.ndarray, x0: np.ndarray,
                     x1: np.ndarray) -> tuple:
    """Threefry-2x32 (20 rounds) in pure numpy, lane-for-lane identical to
    jax._src.prng.threefry2x32: the standard rotation schedule
    [13,15,26,6] / [17,29,16,24] alternated over five 4-round groups, with
    the (k_a, k_b + i) key injection after each group."""
    u32 = np.uint32
    rot = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (u32(key[0]), u32(key[1]),
          u32(key[0]) ^ u32(key[1]) ^ u32(0x1BD11BDA))
    inject = ((1, 2), (2, 0), (0, 1), (1, 2), (2, 0))
    x0 = (x0.astype(u32) + ks[0]).astype(u32)
    x1 = (x1.astype(u32) + ks[1]).astype(u32)
    with np.errstate(over="ignore"):
        for i in range(5):
            for r in rot[i % 2]:
                x0 = (x0 + x1).astype(u32)
                x1 = ((x1 << u32(r)) | (x1 >> u32(32 - r))).astype(u32) ^ x0
            a, b = inject[i]
            x0 = (x0 + ks[a]).astype(u32)
            x1 = (x1 + ks[b] + u32(i + 1)).astype(u32)
    return x0, x1


def _key_stream_np(seed: int, count: int) -> np.ndarray:
    """numpy replica of the `key, sub = jax.random.split(key)` chain from
    jax.random.PRNGKey(seed) under jax_threefry_partitionable (the jax>=0.4
    default): split(key)[i] = threefry2x32(key, counter pair (hi=0, lo=i)),
    so each chain step hashes lanes x=[(0,0),(0,1)] and takes lane 0 as the
    carried key, lane 1 as the emitted subkey. Parity vs jax is pinned in
    tests/test_fit_e2e.py::test_key_stream_np_matches_jax.

    The replica hard-codes those partitionable-split semantics and a zero
    high seed word; running it under a different runtime config would
    silently produce a DIFFERENT stream than the jax CPU chain (breaking
    cross-container bit-determinism), so both preconditions are asserted
    loudly instead."""
    if not jax.config.jax_threefry_partitionable:
        raise RuntimeError(
            "_key_stream_np replicates jax_threefry_partitionable split "
            "semantics, but the runtime has jax_threefry_partitionable=False "
            "(e.g. JAX_THREEFRY_PARTITIONABLE=0): the fallback stream would "
            "silently diverge from the jax chain. Re-enable the flag or run "
            "in a container with a CPU backend."
        )
    if not 0 <= int(seed) < 2**32:
        raise RuntimeError(
            f"_key_stream_np zeroes the high seed word (seed={seed!r} needs "
            ">32 bits, only representable under x64 PRNGKey): the fallback "
            "stream would silently diverge from the jax chain. Use a seed "
            "in [0, 2**32)."
        )
    key = np.array([0, np.uint32(seed & 0xFFFFFFFF)], np.uint32)
    x0 = np.array([0, 0], np.uint32)
    x1 = np.array([0, 1], np.uint32)
    subs = np.empty((count, 2), np.uint32)
    for i in range(count):
        y0, y1 = _threefry2x32_np(key, x0, x1)
        key = np.array([y0[0], y1[0]], np.uint32)
        subs[i] = (y0[1], y1[1])
    return subs


def _key_stream_host(seed: int, count: int) -> np.ndarray:
    """The fit's per-step PRNG subkeys, computed once on the CPU backend.

    Bit-identical to carrying `key, sub = jax.random.split(key)` from
    jax.random.PRNGKey(seed) (threefry is platform-independent integer
    math), but never touches the accelerator: the carried form cost one
    tunnel-compiled scan program per distinct segment length, plus
    start_epoch*steps eager tunnel splits on resume replay. Returns a
    (count, 2) uint32 host array; subs_all[i] == the i-th carried subkey.

    Some containers register ONLY the axon TPU backend (no cpu platform);
    there the same chain runs as pure-numpy threefry (_key_stream_np,
    jax-parity pinned) instead of crashing the fit or paying a tunnel
    scan compile.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return _key_stream_np(seed, count)
    with jax.default_device(cpu):
        k0 = jax.random.PRNGKey(seed)

        def body(c, _):
            ks = jax.random.split(c)
            return ks[0], ks[1]

        _, subs = jax.jit(
            partial(jax.lax.scan, body, xs=None, length=count)
        )(k0)
        return np.asarray(subs)


# AOT-compiled buffer-copy programs, keyed on (treedef, avals, shardings).
# An explicit executable cache (vs a plain @jax.jit) lets the prefetch
# thread compile these from ABSTRACT shapes before first use — the jit
# call cache cannot be seeded by an AOT compile, and the first-call compile
# of even this trivial program costs ~5 s over the axon tunnel (r4c paid it
# at the epoch-200 checkpoint).
_COPY_EXEC_CACHE: dict = {}


def _copy_compiled(tree):
    leaves, treedef = jax.tree.flatten(tree)
    key = (treedef,
           tuple((tuple(l.shape), np.dtype(l.dtype).name,
                  getattr(l, "sharding", None)) for l in leaves))
    comp = _COPY_EXEC_CACHE.get(key)
    if comp is None:
        comp = jax.jit(
            lambda t: jax.tree.map(jnp.copy, t)
        ).lower(tree).compile()
        _COPY_EXEC_CACHE[key] = comp
    return comp


def _copy_tree(t):
    """Fresh device buffers for every leaf — a snapshot that survives a
    later donation of the originals (used by async checkpointing and the
    deferred logging renders)."""
    return _copy_compiled(t)(t)


def _grid_u8(imgs, rows: int = 3, cols: int = 3):
    """(n,H,W,3) float in [0,1] -> (rows*H, cols*W, 3) uint8 tile grid, on
    device (viz.image_grid semantics, black padding)."""
    n, H, W, _ = imgs.shape
    pad = rows * cols - n
    if pad > 0:
        imgs = jnp.concatenate(
            [imgs, jnp.zeros((pad, H, W, 3), imgs.dtype)], 0
        )
    g = imgs.reshape(rows, cols, H, W, 3).transpose(0, 2, 1, 3, 4)
    g = g.reshape(rows * H, cols * W, 3)
    return (jnp.clip(g, 0.0, 1.0) * 255.0).astype(jnp.uint8)


# Single background writer for periodic image logs and checkpoint pulls: an
# ordered job QUEUE drained by one persistent thread. The epoch loop only
# pays a device-side snapshot per action; the render dispatch (including its
# FIRST-CALL compile — ~29 s of the r4c protocol's wall, paid at epoch 9),
# the ~10 MB uint8 grid pull, the JPEG encode, and the checkpoint pickle all
# ride here. A queue (vs the old one-pending-thread design) means a
# still-compiling job never blocks the NEXT segment's submit — jobs stay
# ordered and _flush_log_writer() joins them all before fit_sequence returns.
_LOG_QUEUE = None  # queue.Queue | None
_LOG_THREAD = None


def _flush_log_writer():
    if _LOG_QUEUE is not None:
        _LOG_QUEUE.join()


def _submit_log_write(fn):
    global _LOG_QUEUE, _LOG_THREAD
    import queue
    import threading

    if _LOG_THREAD is None or not _LOG_THREAD.is_alive():
        _LOG_QUEUE = queue.Queue()

        def _drain(q=_LOG_QUEUE):
            while True:
                job = q.get()
                try:
                    job()
                except Exception:
                    import traceback

                    traceback.print_exc()
                finally:
                    q.task_done()

        _LOG_THREAD = threading.Thread(target=_drain, daemon=True)
        _LOG_THREAD.start()
    _LOG_QUEUE.put(fn)


def _log_render_compiled(assets, config, rcfg, n, p_tree, masks_tree):
    """The AOT-compiled pair-grid render used by _log_images, cached per
    (assets, config, rcfg, n). Compiling from abstract shapes lets the
    fit's prefetch lanes warm this executable during stage-1 training —
    its first-call tunnel compile otherwise blocks the background writer
    queue, whose drain then lands on the end-of-fit flush (measured 27.9 s
    of the 276.6 s warm r4d protocol tail)."""

    def build():
        fids = jnp.arange(n)

        def render(p, masks_n):
            masks_n = _decode_frames(masks_n)
            verts, _ = pipeline.mesh_forward(p, fids, assets, config)
            R, T = pipeline.camera_for_frames(p, fids, config)
            alpha = pipeline.render_silhouette(verts, assets, R, T, config, rcfg)
            light = jnp.broadcast_to(p["light_positions"][0], (n, 3))
            rgb = pipeline.render_rgb(
                verts, assets, R, T, config, rcfg, p["texture"],
                p["normal_map"], light
            )
            # GT mask in red, prediction in blue (viz.sil_overlay).
            overlay = jnp.stack(
                [masks_n, jnp.zeros_like(alpha), alpha], axis=-1
            )
            return _grid_u8(overlay), _grid_u8(rgb)

        def _abs(x):
            x = x if hasattr(x, "shape") else jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=getattr(x, "sharding", None))

        return jax.jit(render).lower(
            jax.tree.map(_abs, p_tree), jax.tree.map(_abs, masks_tree)
        ).compile()

    # The avals+shardings ride in the key: the returned Compiled is AOT-
    # specialized on them, and a second fit in this process with the same
    # assets/config ids but different shapes must get its own executable
    # (a stale one raises on input mismatch inside the writer thread).
    return _cached_render("log_images", n, (assets, config, rcfg), build,
                          extra_key=_tree_sig((p_tree, masks_tree)))


def _log_images(params, aux, data, assets, config, rcfg, out_dir, epoch):
    """Silhouette overlay + RGB pair grids for the first frames
    (reference show_img_pair logging, optimize_sequence.py:490-501).

    The grids are assembled and quantized to uint8 ON DEVICE (the GT halves
    never change, so only the prediction grids cross the tunnel) and the
    host pull + JPEG encode run on a background writer thread — the epoch
    loop only pays the async dispatch."""
    import os
    from harp_tpu.utils import viz

    n = min(9, data.num_frames)
    sil_path = os.path.join(out_dir, "sil_%04d.jpg" % epoch)
    rgb_path = os.path.join(out_dir, "%04d.jpg" % epoch)
    # Snapshot the params (the next segment donates the live buffers), then
    # resolve the executable AND run the render on the writer queue: the
    # cache lookup normally hits (the fit's prefetch lanes warm it), but on
    # a cold or still-compiling cache the ~28 s tunnel compile must block
    # the writer thread, never the epoch loop.
    p_snap = _copy_tree(params)
    masks_n = data.masks[:n]

    def render_and_write():
        render = _log_render_compiled(assets, config, rcfg, n, p_snap, masks_n)
        sil_grid, rgb_grid = render(p_snap, masks_n)
        viz.save_image(np.asarray(sil_grid), sil_path)
        viz.save_image(np.asarray(rgb_grid), rgb_path)

    _submit_log_write(render_and_write)


def _log_val_images(params, val_params, val_data, assets, config, rcfg,
                    out_dir, epoch, extras=None):
    """Held-out validation render during the fit (reference visualize_val,
    optimize_sequence.py:97-171): per-frame rows (pose/cam/...) come from
    `val_params`, shared shape/appearance live from the optimized `params`;
    saves a val pair grid plus the UV-texture and normal-map snapshots."""
    import os
    from harp_tpu.utils import viz
    from harp_tpu.render.shadow import render_rgb_with_shadow

    n = min(9, val_data.num_frames)
    shared_keys = ("shape", "verts_disps", "texture", "normal_map",
                   "amb_ratio", "html_texture", "light_positions")
    render_params = dict(val_params or {})
    for k in shared_keys:
        if k in params:
            render_params[k] = params[k]

    def build():
        fids = jnp.arange(n)

        @jax.jit
        def render(p):
            verts, _ = pipeline.mesh_forward(p, fids, assets, config)
            R, T = pipeline.camera_for_frames(p, fids, config)
            if config.model_type == "html" and extras and "texture_basis" in extras:
                texture = extras["texture_basis"].texture(p["html_texture"])
            else:
                texture = p["texture"]
            light = jnp.broadcast_to(p["light_positions"][0], (n, 3))
            if config.self_shadow:
                rgb = render_rgb_with_shadow(
                    verts, assets, config, rcfg, p["cam"][fids], light,
                    p["amb_ratio"], texture, p["normal_map"],
                )
            else:
                rgb = pipeline.render_rgb(
                    verts, assets, R, T, config, rcfg, texture,
                    p["normal_map"], light
                )
            return rgb

        return render

    render = _cached_render("log_val", n, (assets, config, rcfg, extras), build)
    rgb = render(render_params)
    viz.save_pair_grid(
        np.asarray(rgb), np.asarray(val_data.images[:n]),
        os.path.join(out_dir, "val_%04d.jpg" % epoch),
    )
    if "texture" in params or "html_texture" in params:
        tex = render_params.get("texture")
        if tex is None and extras and "texture_basis" in extras:
            tex = extras["texture_basis"].texture(render_params["html_texture"])
        if tex is not None:
            viz.save_image(np.asarray(tex),
                           os.path.join(out_dir, "uv_%04d.jpg" % epoch))
    if "normal_map" in params:
        nm = np.asarray(params["normal_map"])
        nm = nm / np.maximum(np.linalg.norm(nm, axis=-1, keepdims=True), 1e-8)
        viz.save_image(nm * 0.5 + 0.5,
                       os.path.join(out_dir, "normal_%04d.jpg" % epoch))
