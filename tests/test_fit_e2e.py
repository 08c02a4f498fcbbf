"""End-to-end integration: fit a synthetic 2-frame scene; losses must drop
and silhouette IoU must improve (SURVEY.md §4 strategy)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from harp_tpu.assets import build_synthetic_assets
from harp_tpu.config import HarpConfig
from harp_tpu.data.synthetic import make_synthetic_sequence
from harp_tpu.fit import init_params, FitData, fit_sequence
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig

ASSETS = build_synthetic_assets(uv_size=64)
# cap 512: the overflow counters (asserted zero below) measured a 306-face
# peak tile at init for this scene and the fit moves the mesh — cap 256
# silently truncated in round 1. This tiny 64^2 scene is far denser per tile
# than the real 448^2 workload (<=135 faces/tile measured).
RCFG = RasterConfig(image_size=64, tile=8, cap=512, bin_chunk=16, tile_chunk=8,
                    face_chunk=64, faces_per_pixel=8)


def _iou(params, data, config):
    fids = jnp.arange(data.num_frames)
    verts, _ = pipeline.mesh_forward(params, fids, ASSETS, config)
    R, T = pipeline.camera_for_frames(params, fids, config)
    alpha = np.asarray(pipeline.render_silhouette(verts, ASSETS, R, T, config, RCFG))
    pred = alpha > 0.5
    true = np.asarray(data.masks) > 0.5
    return (pred & true).sum() / max((pred | true).sum(), 1)


def test_fit_improves_silhouette_and_loss():
    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=8, training_stage=(4, 2, 2), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=2, seed=3, perturb=0.25
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config)

    iou_before = _iou(params, data, config)
    params, history = fit_sequence(config, ASSETS, data, params, aux, rcfg=RCFG)
    iou_after = _iou(params, data, config)

    first_stage = [h["loss"] for h in history[:4]]
    assert first_stage[-1] < first_stage[0], f"coarse loss should drop: {first_stage}"
    assert iou_after > iou_before, (iou_before, iou_after)
    # Appearance stage ran and produced finite params.
    assert np.all(np.isfinite(np.asarray(params["texture"])))
    assert np.all(np.isfinite(np.asarray(params["pose"])))
    # The raster budget must never silently truncate the subject.
    assert all(h["bin_overflow"] == 0 for h in history), "bin capacity overflow"
    assert all(h["active_overflow"] == 0 for h in history), "active budget overflow"
    assert all(h["span_overflow"] == 0 for h in history), "span truncation"


def test_fit_with_shadow_and_vgg_smoke():
    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=True,
        total_epoch=2, training_stage=(1, 1, 0), batch_size=2, w_vgg=1.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=2, seed=1, perturb=0.1
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config)
    params, history = fit_sequence(config, ASSETS, data, params, aux, rcfg=RCFG)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    # The appearance epoch surfaces the LIGHT pass's raster-budget counters
    # too (shadow.light_raster_config has its own scaled budget) and none
    # of them may truncate.
    assert "light_bin_overflow" in history[-1]
    assert all(h[k] == 0 for h in history for k in h if k.endswith("overflow"))


def test_fit_with_val_rendering(tmp_path):
    """Periodic held-out validation rendering during the fit (reference
    visualize_val, optimize_sequence.py:97-171): val grid + UV/normal-map
    snapshots are written every val_log_every epochs."""
    import os

    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=2, training_stage=(1, 1, 0), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=4, seed=5, perturb=0.1
    )
    data = FitData(images=images[:2], masks=masks[:2], masks_eroded=masks_er[:2])
    val_data = FitData(images=images[2:], masks=masks[2:], masks_eroded=masks_er[2:])
    params, aux = init_params(init, ASSETS, config)
    val_params = {k: v[2:] if hasattr(v, "ndim") and v.ndim > 0 and v.shape[0] == 4
                  else v for k, v in params.items()}
    out = str(tmp_path)
    params, history = fit_sequence(
        config, ASSETS, data, params, aux, rcfg=RCFG, out_dir=out,
        val_data=val_data, val_params=val_params, val_log_every=1,
    )
    assert os.path.exists(os.path.join(out, "val_0000.jpg"))
    assert os.path.exists(os.path.join(out, "uv_0000.jpg"))
    assert os.path.exists(os.path.join(out, "normal_0000.jpg"))


def test_arm_fit_smoke():
    """BASELINE config 4: SMPL-X arm model with shadow — short fit runs and
    the coarse loss decreases."""
    from harp_tpu.assets import build_synthetic_arm_assets

    arm_assets = build_synthetic_arm_assets(uv_size=64)
    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=True,
        use_arm=True, total_epoch=4, training_stage=(2, 2, 0), batch_size=2,
        w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        arm_assets, config, RCFG, n_frames=2, seed=4, perturb=0.15,
        cam=(5.0, 0.05, -0.01),
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, arm_assets, config)
    params, history = fit_sequence(config, arm_assets, data, params, aux, rcfg=RCFG)
    assert np.isfinite(history[-1]["loss"])
    assert history[-1]["loss"] < history[0]["loss"] * 1.5  # no blow-up
    assert np.all(np.isfinite(np.asarray(params["wrist_pose"])))


def test_reference_exact_preset_fit():
    """HarpConfig.reference_exact() is the one-flag reproduction of the
    reference's numeric semantics (VERDICT r3 weak #5): full-res shadow map,
    f32 VGG both sides with no GT cache, K=50 soft list, span 4, all tiles.
    Pin the preset's fields AND that a reduced-epoch protocol-shaped fit
    (shadow + VGG on) converges through it."""
    config = HarpConfig.reference_exact(
        img_size=64, focal_length=285.0, texture_size=64,
        total_epoch=6, training_stage=(3, 2, 1), batch_size=2,
    )
    # The five reverted fast-path deviations.
    assert config.shadow_map_scale == 1.0
    assert config.vgg_compute_dtype == "float32"
    assert config.vgg_cache_gt is False
    assert config.raster_faces_per_pixel == 50
    assert config.raster_span_tiles == 4
    assert config.raster_active_fraction == 1.0
    rc = config.raster_config()
    assert rc.faces_per_pixel == 50 and rc.active_fraction == 1.0

    rcfg = config.raster_config(tile=8, cap=512, bin_chunk=16, tile_chunk=8,
                                face_chunk=64)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, rcfg, n_frames=2, seed=3, perturb=0.25
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config)
    params, history = fit_sequence(config, ASSETS, data, params, aux, rcfg=rcfg)
    assert len(history) == 6
    assert history[2]["loss"] < history[0]["loss"]
    assert np.all(np.isfinite(np.asarray(params["texture"])))
    assert all(h[k] == 0 for h in history for k in h if k.endswith("overflow"))


def test_prewarm_avals_match_init_params():
    """driver._fit_avals fabricates the (params, aux) avals the stage-1
    prewarm lowers against WITHOUT calling init_params (no data exists yet,
    and eager array creation over the axon tunnel costs seconds). Its
    shapes must track init_params exactly or the prewarm silently misses."""
    import jax
    from harp_tpu.fit import driver

    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        self_shadow=False, total_epoch=2,
                        training_stage=(1, 1, 0), batch_size=2, w_vgg=0.0)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=3, seed=0
    )
    params, aux = init_params(init, ASSETS, config)
    p_abs, aux_abs = driver._fit_avals(config, ASSETS, 3)

    real_p = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), params)
    fab_p = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), p_abs)
    assert real_p == fab_p
    real_a = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), aux)
    fab_a = jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), aux_abs)
    assert real_a == fab_a


def test_prewarm_stage1_program_is_used_and_exact():
    """prewarm_stage1_program compiles the first stage scan before data
    exists; fit_sequence must consume that executable (PREWARM hit) and
    produce bit-identical results to an unprewarmed fit."""
    from harp_tpu.fit import driver

    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        self_shadow=False, total_epoch=4,
                        training_stage=(4, 0, 0), batch_size=2, w_vgg=0.0)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=4, seed=9, perturb=0.2
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)

    # Baseline fit (no prewarm entry for this config yet).
    params, aux = init_params(init, ASSETS, config)
    p_ref, h_ref = fit_sequence(config, ASSETS, data, params, aux, rcfg=RCFG,
                                epoch_scan=2)

    th = driver.prewarm_stage1_program(config, ASSETS, 4, RCFG, epoch_scan=2)
    assert th is not None
    th.join(timeout=300)
    hits_before = len(driver._PREWARM_HITS)
    params2, aux2 = init_params(init, ASSETS, config)
    p_pre, h_pre = fit_sequence(config, ASSETS, data, params2, aux2,
                                rcfg=RCFG, epoch_scan=2)
    assert len(driver._PREWARM_HITS) > hits_before, "prewarm not consumed"
    assert [h["loss"] for h in h_pre] == [h["loss"] for h in h_ref]
    np.testing.assert_array_equal(np.asarray(p_pre["pose"]),
                                  np.asarray(p_ref["pose"]))


def test_long_sequence_vgg_cache_off_matches_cached():
    """Long sequences trip the GT-VGG cache guard (vgg_cache_max_frames=48,
    config.py — real reference sequences are 100-500 frames,
    data_util.py:76-195) and run the cache-OFF path: both VGG pyramids live
    every step. 64 frames exercises that regime end to end on CPU, and the
    trajectory must match a forced-cache fit on the same data bit-for-bit
    in f32 (the cache is an exactness-preserving optimization; the store
    dtype follows vgg_compute_dtype, so f32 compute caches f32 features)."""
    import dataclasses as dc

    config = HarpConfig(
        img_size=48, focal_length=214.0, texture_size=64, self_shadow=False,
        total_epoch=2, training_stage=(1, 1, 0), batch_size=8, w_vgg=1.0,
        vgg_compute_dtype="float32",
    )
    n_frames = 64
    assert n_frames > config.vgg_cache_max_frames  # the guard must fire
    rcfg = dataclasses.replace(RCFG, image_size=48)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, rcfg, n_frames=n_frames, seed=7, perturb=0.1
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)

    params, aux = init_params(init, ASSETS, config)
    params_off, hist_off = fit_sequence(config, ASSETS, data, params, aux,
                                        rcfg=rcfg)

    config_on = dc.replace(config, vgg_cache_max_frames=128)
    params2, aux2 = init_params(init, ASSETS, config_on)
    params_on, hist_on = fit_sequence(config_on, ASSETS, data, params2, aux2,
                                      rcfg=rcfg)

    assert np.isfinite(hist_off[-1]["loss"])
    np.testing.assert_allclose(hist_off[-1]["loss"], hist_on[-1]["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params_off["texture"]),
                               np.asarray(params_on["texture"]), atol=1e-6)


def test_epoch_scan_matches_python_loop():
    """fit_sequence(epoch_scan=3) — whole epoch segments fused into one
    lax.scan dispatch — must reproduce the per-step Python loop: same loss
    history and final params (modulo Adam f32 reassociation)."""
    import dataclasses as dc
    import jax

    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=6, training_stage=(3, 2, 1), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=4, seed=11, perturb=0.2
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config)
    params_host = jax.tree.map(np.asarray, params)

    p_ref, h_ref = fit_sequence(
        config, ASSETS, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=RCFG, seed=0,
    )
    p_scan, h_scan = fit_sequence(
        config, ASSETS, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=RCFG, seed=0, epoch_scan=3,
    )
    assert len(h_ref) == len(h_scan) == 6
    # Inside the scanned segment the two paths agree to f32 noise; AFTER it,
    # Adam's rsqrt amplifies the ~1e-7 reassociation drift (measured: zero
    # logic difference on a coarse-only segment, params within 3e-7), so
    # later epochs only need to track.
    for a, b in zip(h_ref, h_scan):
        assert a["epoch"] == b["epoch"]
        tol = 5e-5 if a["epoch"] < 3 else 1e-2
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=tol,
                                   err_msg=f"epoch {a['epoch']}")
    p_ref = jax.tree.map(np.asarray, p_ref)
    lr = max(config.lr_pose, config.lr_app)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_scan[k]), p_ref[k], rtol=2e-3,
            atol=6 * 2 * lr + 2e-6,  # Adam sign-flip bound: steps * lr
            err_msg=f"param {k} diverged under epoch_scan",
        )


def test_prefetch_compile_matches_jit_path():
    """prefetch_compile=True (background-thread AOT programs invoked
    directly) must reproduce the plain jit dispatch path exactly — same
    lowering, same executable semantics, both the fused-scan segments and
    the per-step fallback epochs."""
    import jax

    config = HarpConfig(
        img_size=64, focal_length=285.0, texture_size=64, self_shadow=False,
        total_epoch=5, training_stage=(2, 2, 1), batch_size=2, w_vgg=0.0,
    )
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=4, seed=7, perturb=0.2
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)
    params, aux = init_params(init, ASSETS, config)
    params_host = jax.tree.map(np.asarray, params)

    # epoch_scan=2 with a 1-epoch stage 3 exercises BOTH program kinds.
    p_jit, h_jit = fit_sequence(
        config, ASSETS, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=RCFG, seed=0, epoch_scan=2, prefetch_compile=False,
    )
    p_pre, h_pre = fit_sequence(
        config, ASSETS, data, jax.tree.map(jnp.asarray, params_host),
        dict(aux), rcfg=RCFG, seed=0, epoch_scan=2, prefetch_compile=True,
    )
    assert len(h_jit) == len(h_pre) == 5
    for a, b in zip(h_jit, h_pre):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6,
                                   err_msg=f"epoch {a['epoch']}")
    for k in p_jit:
        np.testing.assert_allclose(
            np.asarray(p_pre[k]), np.asarray(p_jit[k]), rtol=1e-6, atol=1e-7,
            err_msg=f"param {k} diverged under prefetch_compile",
        )


def test_key_stream_np_matches_jax():
    """The pure-numpy threefry split chain (the fallback for containers
    that register no cpu backend) is bit-identical to the jax CPU chain."""
    import jax
    from harp_tpu.fit.driver import _key_stream_host, _key_stream_np

    for seed, count in [(0, 40), (1234567, 17), (42, 602)]:
        a = _key_stream_host(seed, count)
        b = _key_stream_np(seed, count)
        assert a.dtype == np.uint32 and b.dtype == np.uint32
        assert np.array_equal(a, b), (seed, count)


def test_prewarm_app_stage_program_is_used_and_exact():
    """prewarm_stage_programs covers the app-stage scan too (its aux
    includes the fabricated GT-VGG cache avals): the fit must consume BOTH
    prewarmed executables and produce bit-identical results to an
    unprewarmed fit. Motivated by the r5 cold anatomy: stage 1 (24 s) could
    not cover the ~86 s app-scan compile, leaving a 61.8 s wait."""
    from harp_tpu.fit import driver

    config = HarpConfig(
        img_size=48, focal_length=214.0, texture_size=64, self_shadow=False,
        total_epoch=4, training_stage=(2, 2, 0), batch_size=2, w_vgg=1.0,
        vgg_compute_dtype="float32",
    )
    rcfg = dataclasses.replace(RCFG, image_size=48)
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, rcfg, n_frames=4, seed=11, perturb=0.2
    )
    data = FitData(images=images, masks=masks, masks_eroded=masks_er)

    params, aux = init_params(init, ASSETS, config)
    p_ref, h_ref = fit_sequence(config, ASSETS, data, params, aux, rcfg=rcfg,
                                epoch_scan=2)

    ths = driver.prewarm_stage_programs(
        config, ASSETS, 4, rcfg, epoch_scan=2,
        stage_epochs=(0, config.training_stage[0]),
    )
    assert len(ths) == 2, "expected two distinct prewarmed programs"
    for th in ths:
        th.join(timeout=600)
    hits_before = len(driver._PREWARM_HITS)
    params2, aux2 = init_params(init, ASSETS, config)
    p_pre, h_pre = fit_sequence(config, ASSETS, data, params2, aux2,
                                rcfg=rcfg, epoch_scan=2)
    assert len(driver._PREWARM_HITS) >= hits_before + 2, \
        "app-stage prewarm not consumed"
    assert [h["loss"] for h in h_pre] == [h["loss"] for h in h_ref]
    np.testing.assert_array_equal(np.asarray(p_pre["texture"]),
                                  np.asarray(p_ref["texture"]))


def test_uint8_frame_storage_matches_f32():
    """uint8-in-HBM sequence storage (the long-sequence memory mode,
    --uint8-frames): a fit on uint8-encoded frames with the in-graph
    decode must match a fit on the PRE-DECODED f32 arrays bit-for-bit —
    the decode is the only difference, and 0/255 mask encoding round-trips
    exactly."""
    config = HarpConfig(img_size=64, focal_length=285.0, texture_size=64,
                        self_shadow=False, total_epoch=4,
                        training_stage=(2, 2, 0), batch_size=2, w_vgg=1.0,
                        vgg_compute_dtype="float32")
    images, masks, masks_er, gt, init = make_synthetic_sequence(
        ASSETS, config, RCFG, n_frames=4, seed=13, perturb=0.2
    )
    enc = lambda x: jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    u8 = FitData(images=enc(images), masks=enc(masks),
                 masks_eroded=enc(masks_er))
    dec = lambda x: x.astype(jnp.float32) / 255.0
    f32 = FitData(images=dec(u8.images), masks=dec(u8.masks),
                  masks_eroded=dec(u8.masks_eroded))

    params, aux = init_params(init, ASSETS, config)
    p_u8, h_u8 = fit_sequence(config, ASSETS, u8, params, aux, rcfg=RCFG,
                              epoch_scan=2)
    params2, aux2 = init_params(init, ASSETS, config)
    p_f32, h_f32 = fit_sequence(config, ASSETS, f32, params2, aux2, rcfg=RCFG,
                                epoch_scan=2)
    assert [h["loss"] for h in h_u8] == [h["loss"] for h in h_f32]
    np.testing.assert_array_equal(np.asarray(p_u8["texture"]),
                                  np.asarray(p_f32["texture"]))


def test_effective_epoch_scan_cap():
    """The per-dispatch work cap (axon worker dies past ~a minute of one
    program execution — RESULTS round 5): long sequences get shorter scan
    segments; the 36/150-frame protocol configs are unchanged."""
    from harp_tpu.fit.driver import (
        MAX_SCAN_STEPS_PER_DISPATCH, _effective_epoch_scan,
    )

    assert _effective_epoch_scan(10, 36, 18) == 10    # protocol: unchanged
    assert _effective_epoch_scan(10, 150, 18) == 10   # 8 steps -> 80 == cap
    assert _effective_epoch_scan(10, 300, 18) == 5    # 16 steps -> 80
    assert _effective_epoch_scan(10, 300, 12) == 3    # 25 steps -> 75
    assert _effective_epoch_scan(10, 3000, 18) == 1   # per-step loop floor
    assert _effective_epoch_scan(0, 300, 18) == 0     # scan disabled stays
    for n, bs in ((36, 18), (150, 18), (300, 12), (500, 10)):
        e = _effective_epoch_scan(10, n, bs)
        if e > 1:
            assert e * (n // bs) <= MAX_SCAN_STEPS_PER_DISPATCH
