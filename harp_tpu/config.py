"""Configuration for harp_tpu.

Replaces the reference's hard-coded config dict + scattered module constants
(utils/config_utils.py:5-47, optimize_sequence.py:319-331,396,411-422) with
one frozen dataclass covering every behavior switch.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import yaml

from harp_tpu.render.rasterizer import RasterConfig


@dataclasses.dataclass(frozen=True)
class HarpConfig:
    # Model
    use_arm: bool = False
    model_type: str = "harp"  # ["harp", "html", "nimble"] — harp is primary
    use_vert_disp: bool = True
    vert_disp_normals: bool = True  # 1-D displacement along vertex normals

    # Camera / images
    img_size: int = 448
    focal_length: float = 2000.0

    # Rendering
    self_shadow: bool = True
    share_light_position: bool = True
    texture_size: int = 512
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Phong light colors (renderer_helper.py:70-73)
    ambient_color: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    diffuse_color: Tuple[float, float, float] = (0.4, 0.4, 0.4)
    specular_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    # Specular exponent of the NON-shadow phong path: the reference uses
    # default pytorch3d Materials (renderer_helper.py:264) whose shininess
    # is 64 (pbr_materials.py:18). The shadow path zeroes specular entirely
    # (renderer_helper.py:441) and never sees this.
    shininess: float = 64.0
    # Raster tile budget (1.0 = all tiles). Large-image hand fits can set
    # ~0.5: the subject occupies a minority of tiles (overflow reported).
    raster_active_fraction: float = 1.0
    # Per-tile face-list capacity: 448 carries ~20% headroom over the peak
    # measured at reference mesh density (scripts/probe_occupancy.py: 371
    # hand / 362 arm across a pose jitter sweep at 448^2).
    raster_cap: int = 448
    # Pair-expansion span: 3 is exact for the reference-density meshes
    # (probed zero truncation, triangles ~8 px) and ~2x cheaper binning
    # sorts than 4; truncation is loud via bin_overflow if a scene ever
    # needs more.
    raster_span_tiles: int = 3
    # Soft-id list depth K. 8 is gradient-exact to 3.3e-5 vs an all-faces
    # brute force (tests/test_grad_fidelity.py); the reference uses
    # K=50 (renderer_helper.py:47) — reference_exact() restores that.
    raster_faces_per_pixel: int = 8
    shadow_bias: float = 0.008
    # Light-view depth-map resolution relative to the image (1.0 = the
    # reference's full-res shadow pass). Default 0.5 quarters the light
    # rasterization and shrinks the PCF backward's scatter target; A/B'd at
    # protocol scale with IoU/L1/MS-SSIM parity (round-1 and round-3
    # RESULTS.md). Set 1.0 for bit-level reference shadow geometry.
    shadow_map_scale: float = 0.5
    shadow_sharpness: float = 1000.0
    # Backward-scatter budget for the PCF light-map gradient: top-K
    # 256-pixel groups (= camera tiles on the compact path) by in-band tap
    # count; at sharpness 1000 the f32 sigmoid derivative is EXACTLY zero
    # outside a thin depth band (render/shadow._pcf_sum). 0 = dense scatter.
    # Default stays 0: with the reference's bias*sharpness = 8 (< the f32
    # saturation threshold 17) every LIT pixel's center tap is in-band by
    # construction, so the band covers ~90% of active tiles and compaction
    # buys nothing (scripts/probe_pcf_band.py: 245-265 of 280 tiles at
    # protocol scale). Useful only for sharper/biased-out configs.
    pcf_grad_tiles: int = 0
    # Backend for the PCF light-map gradient scatter: "auto" = the Mosaic
    # one-hot-matmul kernel (render/pallas/pcf_grad_kernel.py) on TPU and
    # the XLA row-scatter elsewhere; "pallas" / "xla" force;
    # "pallas_interpret" runs the kernel in the Pallas interpreter (CPU
    # parity tests). Identical gradients either way (custom-vjp over the
    # same math; pinned by tests/test_shadow.py).
    pcf_backend: str = "auto"
    shadow_light_radius: float = 1.5

    # Optimization (reference driver defaults)
    total_epoch: int = 301
    training_stage: Tuple[int, int, int] = (100, 100, 100)
    batch_size: int = 18
    known_appearance: bool = False
    pose_already_opt: bool = False
    opt_arm_pose: bool = False
    lr_pose: float = 1.0e-3
    lr_app: float = 1.0e-2
    plateau_patience: int = 40
    plateau_factor: float = 0.1

    # Loss weights (optimize_sequence.py:411-422)
    w_silhouette: float = 7.0
    w_kps_anchor: float = 10.0
    w_vert_disp_reg: float = 2.0
    w_normal: float = 0.1
    w_laplacian: float = 4.0
    w_arap: float = 0.2
    w_photo: float = 1.0
    w_vgg: float = 1.0
    w_albedo: float = 0.5
    w_normal_reg: float = 0.1
    # Path to pretrained VGG16 conv weights npz (scripts/import_vgg16_weights.py).
    # Empty -> deterministic random filters, and perceptual metrics report as
    # LPIPS_proxy instead of LPIPS.
    vgg_weights: str = ""
    # Frames per lax.map(checkpoint) group inside the perceptual loss. The
    # unchunked VGG pyramid at 448^2 x B18 holds ~10 GB of activation temps
    # — the train step only fit a 16 GB v5e with nothing else resident and
    # crashed the TPU worker mid-protocol once logging/scan executables
    # accumulated. Chunking is numerically exact (sum over frames).
    # 0 disables chunking.
    vgg_chunk: int = 6
    # Dtype the VGG conv pyramid runs in during TRAINING (the eval-side
    # perceptual metric always runs f32). bf16 doubles MXU conv throughput
    # and halves activation HBM; loss reductions still accumulate in f32
    # (losses/perceptual._feature_abs_sum). Set "float32" for bit-level
    # reference-semantics training (the reference's torch VGG is f32) —
    # the GT-pyramid cache dtype follows this setting too
    # (precompute_slices defaults its store dtype to vgg.compute_dtype),
    # so f32 compute also caches f32 GT features. See also
    # HarpConfig.reference_exact().
    vgg_compute_dtype: str = "bfloat16"
    # jax.checkpoint the per-chunk VGG forward (recompute-in-backward).
    # True bounds HBM (the reason vgg_chunk exists); False keeps each
    # chunk's bf16 activations (~25 MB/frame) and skips the recompute —
    # measure memory_analysis() headroom before flipping at a new scale.
    vgg_remat: bool = True
    # Cache the GT-side VGG feature pyramids once per sequence (bf16) so the
    # train step runs only the pred-side VGG forward: the GT frame is a
    # constant per fid, yet the reference recomputes its network forward
    # every step (optimize_sequence.py:546-547). ~49 MB HBM/frame at 448²;
    # the max_frames guard keeps the cache off for long sequences where it
    # would crowd out the step's working set (16 GB v5e budget).
    vgg_cache_gt: bool = True
    vgg_cache_max_frames: int = 48
    # "pickle": synchronous atomic checkpoint.pkl (reference-compatible
    # simplicity); "orbax": async background checkpointing with retention
    # (harp_tpu.utils.orbax_io).
    checkpoint_backend: str = "pickle"

    # Data / paths
    metro_output_dir: str = ""
    image_dir: str = ""
    base_output_dir: str = "exp/out/"
    start_from: str = ""
    use_smooth_seq: bool = True
    average_cam_sequence: bool = False
    eval_mesh: bool = False
    gt_mesh_dir: str = ""

    def raster_config(self, **overrides) -> RasterConfig:
        kw = dict(
            image_size=self.img_size,
            active_fraction=self.raster_active_fraction,
            cap=self.raster_cap,
            span_tiles=self.raster_span_tiles,
            faces_per_pixel=self.raster_faces_per_pixel,
        )
        kw.update(overrides)
        return RasterConfig(**kw)

    @classmethod
    def reference_exact(cls, **overrides) -> "HarpConfig":
        """One-flag reproduction of the reference's numeric semantics.

        The fast-path defaults deviate from the reference in five measured,
        individually-toggleable ways; this constructor flips them all back
        in one place (each cited to the reference constant it restores):

        - shadow_map_scale=1.0 — full-resolution light-view depth map
          (renderer_helper.py renders the light pass at image size).
        - vgg_compute_dtype="float32" + vgg_cache_gt=False — the f32 torch
          VGG16 forward on BOTH sides, recomputed every step
          (model/vgg.py; optimize_sequence.py:546-547).
        - raster_faces_per_pixel=50 — the soft-id list depth
          (renderer_helper.py:47, faces_per_pixel=50).
        - raster_span_tiles=4 — the conservative binning span (no
          known-small-triangle assumption).
        - raster_active_fraction=1.0 — every tile rasterized, no
          occupancy budget.

        The tile cap stays at its probed-with-headroom default: it is an
        exactness-preserving buffer bound (overflow is loud), not a
        semantic deviation. Cost vs the fast path is quantified in
        RESULTS.md (round 5: "Reference-exact vs fast path" A/B table —
        same-container 301-epoch protocol runs of both presets).

        Note on HBM: at 448²/B18 the exact preset's stage-1 program needs
        16.2 GiB of temps with active_fraction=1.0 — more than one v5e
        chip. The measured protocol run overrides active_fraction to 0.5
        (exactness-preserving: the budget only bounds buffer sizes and
        overflow counters are checked), which brings stage temps to
        3.1/8.7/8.8 GiB.
        """
        kw = dict(
            shadow_map_scale=1.0,
            vgg_compute_dtype="float32",
            vgg_cache_gt=False,
            raster_faces_per_pixel=50,
            raster_span_tiles=4,
            raster_active_fraction=1.0,
        )
        kw.update(overrides)
        return cls(**kw)

    def to_yaml(self, path: str) -> None:
        # Tuples must dump as plain YAML lists: yaml.dump would tag them
        # !!python/tuple, which from_yaml's safe_load (correctly) refuses —
        # a dumped config.yaml would be unreadable by its own loader.
        d = {k: list(v) if isinstance(v, tuple) else v
             for k, v in dataclasses.asdict(self).items()}
        with open(path, "w") as f:
            yaml.dump(d, f)

    @classmethod
    def from_yaml(cls, path: str) -> "HarpConfig":
        with open(path) as f:
            d = yaml.safe_load(f)
        d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
        return cls(**d)
