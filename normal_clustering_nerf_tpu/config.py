"""Structured configuration for the TPU NGP-MT framework.

Serves the same ~60 knobs as the reference's flat argparse namespace
(reference: opt.py:4-199), as typed dataclasses. `TrainConfig.from_args`
provides a CLI entry with flag names matching the reference so existing
experiment sweeps translate 1:1.
"""
from __future__ import annotations

import argparse
import dataclasses
import math
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """NGP-MT model hyper-parameters (reference: opt.py:42-61, models/ngp_mt.py:40-47)."""
    model_name: str = "NGPMT"
    scale: float = 0.5            # scene in [-scale, scale]^3
    grid_size: int = 128          # occupancy grid resolution G
    density_tresh_decay: float = 1.0
    max_samples: int = 1024       # per-ray sample cap (reference: rend_max_samples)
    near_dist: float = 0.01       # near distance (reference: rend_near_dist)
    use_exposure: bool = False
    pred_norm_nn: bool = False    # NN normal head
    pred_norm_nn_norm: bool = False  # normalize the rendered NN normals
    pred_norm_depth: bool = False    # extract normals from rendered depth
    pred_sem: bool = False
    n_sem_cls: int = 3
    # hash-grid constants (reference: models/ngp_mt.py:40-41)
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 2048  # b = exp(ln(finest*scale/base)/(L-1))
    # hash-table layout: 'brick' = TPU-fast 4^3-vertex brick rows (one
    # aligned row scatter per level in the backward, ~10x faster — see
    # models/brick_hash.py); 'tcnn' = canonical tiny-cuda-nn vertex
    # layout (bit-exact tcnn parity, used by the parity test suite).
    # Equal parameter count: 64 * 2^log2_bricks == 2^log2_hashmap_size.
    # 'triplane' = factorized triplane + coarse 3D grid (4 gather
    # indices/sample vs 16 — the TPU-fast field; models/triplane.py)
    hash_layout: str = "brick"
    log2_bricks: int = 13
    plane_res: int = 512             # triplane vertices per axis
    plane_feats: int = 8             # 16*plane_feats == 128 (one lane row)
    grid3d_res: int = 64             # coarse 3D grid vertices per axis
    grid3d_feats: int = 4
    # MLP widths/depths (reference: models/ngp_mt.py:83-140)
    hidden_dim: int = 64
    sigma_hidden_layers: int = 1
    rgb_hidden_layers: int = 2
    head_hidden_layers: int = 2
    geo_feat_dim: int = 16
    # Feed the view direction to the rgb head (reference behavior,
    # ngp_mt.py:207-209). False = Lambertian radiance c(x): kills the
    # view-dependent-color escape hatch that lets volumetric mist fit
    # the train views exactly on direction-sparse captures.
    rgb_use_dir: bool = True
    # numerics
    compute_dtype: str = "float32"   # "bfloat16" for MXU-friendly compute
    param_dtype: str = "float32"

    @property
    def cascades(self) -> int:
        # reference: models/ngp_mt.py:34
        return max(1 + int(math.ceil(math.log2(2 * self.scale))), 1)

    @property
    def per_level_scale(self) -> float:
        # reference: models/ngp_mt.py:41
        return math.exp(
            math.log(self.finest_resolution * self.scale / self.base_resolution)
            / (self.n_levels - 1)
        )

    @property
    def exp_step_factor(self) -> float:
        # reference: train_nerf.py:186-187 (1/256 for scale>0.5, else 0)
        return 1.0 / 256.0 if self.scale > 0.5 else 0.0

    @property
    def rend_channels(self) -> int:
        """Channels composited per sample: rgb [+ normals] [+ semantics]."""
        c = 3
        if self.pred_norm_nn:
            c += 3
        if self.pred_sem:
            c += self.n_sem_cls
        return c


@dataclass(frozen=True)
class RenderConfig:
    """Static-shape rendering knobs — TPU-specific design space.

    The reference compacts samples into ragged buffers with atomics
    (models/csrc/raymarching.cu:237-241); we march into a dense
    (n_rays, march_block) buffer per round and (optionally) compact
    valid samples into a fixed budget for dense MXU network batches.
    """
    T_threshold: float = 1e-4          # early-ray-termination transmittance
    march_block: int = 1024            # dense per-ray sample slots (<= max_samples)
    sample_budget: int = 0             # 0 = auto (n_rays * 32); cap on net evals
    march_layout: str = "dense"        # 'dense' (N, K) fast path | 'flat' oracle
    # Two-level march: prune fine occupancy probes with the dilated
    # supervoxel mask (models/occupancy.py coarse_occ); exact unless a
    # ray's first K samples span > coarse_k_blocks candidate blocks
    # (0 = auto: max(2*K/4, 8)). Single-cascade scenes only.
    march_coarse: bool = True
    coarse_k_blocks: int = 0
    # occupied supervoxel intervals scanned per ray by the sv-run
    # march. 0 (default) = auto-FULL: ceil(sqrt(3)*G/8)+2, enough for a
    # cube-diagonal ray, so the enumeration horizon can never truncate
    # (a shorter horizon silently starved distal geometry of gradient
    # under a dense early-training grid — trunc_ray_frac 0.78 — and
    # forced near-field billboard memorization; round-3 diagnosis).
    # Positive values bound the horizon explicitly (perf experiments);
    # trunc_ray_frac in step metrics reports any resulting truncation.
    sv_intervals: int = 0
    # Budgeted-sample allocation (ops/ray_march.py stratified_budget):
    # -1 (default) = FULL stratified — all K train samples are evenly
    # strided (by occupied rank) over the ray's whole occupied extent,
    # dt scaled by the stride; degenerates to the exact reference
    # enumeration once a ray's occupied count fits K. 0 = pure first-K
    # cap. k>0 = first K-k samples verbatim + k strided tail.
    # Why not first-K: proximal bias lets per-camera fog billboards
    # capture the entire budget and memorize train views (round-3
    # diagnosis: train 28 dB / held-out 17 dB, predicted depth ~0; a
    # small tail was measured insufficient — fog still won the
    # gradient race at K1=24/tail 8).
    march_tail_k: int = -1
    max_march_iters: int = 4096        # safety bound on marching loop
    # first-sample jitter amplitude (reference: raymarching.cu:195-198
    # always jitters by U[0,1)*dt; 0 disables — diagnostic knob for
    # isolating jitter-variance from true render-path ceilings)
    march_noise: float = 1.0
    test_chunk: int = 65536            # rays per test-render chunk
    test_n_samples: int = 64           # samples per round in test renderer
    # Inference layout: 'bucket' compacts alive rays into power-of-two
    # buckets each round (the TPU analogue of the reference's dynamic
    # alive-ray compaction, models/rendering.py:78-84) so converged rays
    # cost no network evals; 'flat' is the full-batch masked-round
    # oracle (every round evaluates all rays).
    test_layout: str = "bucket"
    test_march_window: int = 128       # occupancy probe steps per round
    # floor on samples/ray per bucket round (TPU: dispatch overhead
    # dominates tiny rounds; see models/rendering.py bucket driver)
    test_min_k: int = 32
    # marching/compositing rounds fused into one dispatch after the
    # first (host dispatch + n_alive fetch cost ~100 ms on a tunneled
    # TPU and dominated the whole test render at 1 round/dispatch)
    test_rounds_per_dispatch: int = 16
    # occupied supervoxel runs enumerated per sv test round: the cursor
    # of a ray that found < K samples only advances to the end of the
    # LAST enumerated run, so a small horizon makes sparse (residual
    # fog) rays crawl — measured n_alive stayed >60k/65k after 2 rounds
    # at 8 intervals because interior rays advanced 8 supervoxels/round
    test_sv_intervals: int = 24
    # full-width rounds dispatched back-to-back before the FIRST alive
    # count fetch: after one 64-sample round the alive set is usually
    # still >N/2 (so round 2 is full-width regardless), and each fetch
    # costs a ~50-80 ms tunnel RTT of device idle
    test_blind_rounds: int = 2
    # Coarse-step bootstrap: for the first `bootstrap_steps` train steps
    # march with dt = sqrt(3)/bootstrap_max_samples (occupancy-cell-
    # sized) so the K-sample probe window covers K/S_boot of the ray
    # span (~25% of the cube diagonal at K=32, S_boot=128 — a much
    # wider reach than the fine march's K/1024). Without it,
    # a fine-step march under a dense warmup occupancy grid confines
    # every ray's K samples to the first few centimetres: far geometry
    # never receives gradient, a view-dependent fog forms at the
    # cameras, and the occupancy grid can never prune (a deadlock the
    # reference avoids by marching unbounded samples/ray,
    # models/csrc/raymarching.cu:166-332 — unaffordable as a static
    # shape). Once the grid has pruned, the fine march's first-K
    # samples start at the true surface and the cap is harmless.
    bootstrap_steps: int = 512
    bootstrap_max_samples: int = 128
    # Per-step random training background (reference: rendering.py:236
    # uses this for its real-scene runs). Default TRUE: with a FIXED
    # training background a budgeted march starts near-transparent and
    # the model falls into a degenerate translucent attractor — it
    # paints luminance as (1-opacity)*bg, pinning dark channels at the
    # sigmoid floor and opacity at 1-mean(target) (round-4 diagnosis:
    # 16 dB grayscale plateau vs 48 dB with random bg on the same
    # scene). All headline datasets are closed indoor scenes where the
    # converged background is irrelevant; set False only for scenes
    # with true fixed-color backgrounds visible in the labels.
    random_bg: bool = True
    anneal_strategy: str = "none"      # 'avoid_near' | 'depth' | 'none'
    anneal_steps: int = 0


@dataclass(frozen=True)
class LossConfig:
    """Loss weights and clustering hyper-parameters (reference: opt.py:64-124)."""
    opacity_w: float = 1e-3
    distortion_w: float = 0.0
    depth_w: float = 0.0
    sem_w: float = 0.0
    norm_GT_depth: bool = False
    norm_depth_dot_w: float = 0.0
    norm_depth_L1_w: float = 0.0
    reg_depth_w: float = 0.0
    manhattan_nerf_w: float = 0.0
    # normal clustering (the paper's contribution)
    norm_D_C_ort_dot_w: float = 0.0
    norm_D_C_centr_dot_w: float = 0.0
    norm_D_C_centr_L1_w: float = 0.0
    norm_D_C_can_dot_w: float = 0.0
    norm_D_C_can_L1_w: float = 0.0
    norm_can_tres: float = 0.0
    norm_can_start: int = 0
    norm_can_end: int = -1
    norm_can_grow: float = 1.0
    norm_yaw_offset_ang: float = 0.0
    norm_pitch_offset_ang: float = 0.0
    norm_roll_offset_ang: float = 0.0
    # clustering internals (reference: losses.py:433-440 uses K=20, niter=20)
    cluster_K: int = 20
    cluster_niter: int = 20
    # Reference-compat quirks (documented deviations):
    # losses.py:290 feeds `ts` to the distortion loss where `ws` is expected;
    # set True to reproduce that behavior bit-for-bit.
    distortion_ts_bug_compat: bool = False
    # losses.py:453-455 `clust_ass_new[clust_ass_new==1][discard_1]=0` is a
    # silent no-op in torch (chained advanced indexing copies); True applies
    # the intended member-discard, False reproduces the reference behavior.
    discard_far_members: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Dataset / split / label-loading config (reference: opt.py:14-39)."""
    root_dir: str = ""
    dataset_name: str = "synthetic"   # hypersim | scannet_manhattan | replica_semnerf | synthetic
    split: str = "train"              # train | trainval | trainvaltest
    split_factor: float = 0.5
    keep_N_tr: int = -1
    downsample: float = 1.0
    load_depth_gt: bool = False
    load_norm_gt: bool = False
    load_norm_depth_gt: bool = False
    load_sem_gt: bool = False
    load_sem_WF_gt: bool = False
    ray_sampling_strategy: str = "all_images"
    batch_size: int = 8192
    random_tr_poses: bool = False
    triang_max_expand: int = 0
    patch_size: int = 8
    storage_dtype: str = "float32"    # on-device image storage
    # Sample batches on the HOST via the native C++ prefetcher
    # (native/raybatch.cpp, the replacement for the reference's 16
    # DataLoader workers — train_nerf.py:293-298) instead of on-device.
    # The native batch shares the device RaySampler's exact
    # {img_idxs, pix_idxs} contract (triangle triples interleaved), so
    # the jitted step is identical — only the index source changes.
    # Use for scenes whose pixel/label arrays exceed device HBM.
    host_sampler: bool = False
    host_sampler_threads: int = 4


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer / schedule (reference: train_nerf.py:237-291, opt.py:127-165)."""
    lr: float = 1e-2
    num_epochs: int = 4               # 1 epoch = 1000 steps
    steps_per_epoch: int = 1000
    grad_clip: float = 0.05
    adam_eps: float = 1e-15
    weight_decay_net: float = 1e-6    # nets only; hash table wd=0
    optimize_ext: bool = False
    lr_dR_norm_glob: float = 0.0
    dR_norm_glob_coding: str = "axis_angle"
    warmup_steps: int = 256           # occupancy-grid warmup (train_nerf.py:101)
    update_interval: int = 16         # density-grid update cadence (train_nerf.py:102)


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh / multi-host config — replaces the reference's DDP
    (train_nerf.py:950-952) with shard_map over a named mesh."""
    mesh_shape: Tuple[int, ...] = (1,)    # 1 = single device (no sharding);
                                          # -1 = all devices on the 'rays' axis
    mesh_axis_names: Tuple[str, ...] = ("rays",)
    multihost: bool = False
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass(frozen=True)
class EvalConfig:
    """Validation / artifact options (reference: opt.py:167-196)."""
    eval_lpips: bool = False
    val_only: bool = False
    save_test_vis: bool = False
    downsample_vis: float = 0.5
    save_test_preds: bool = False
    save_train_preds: bool = False
    downsample_pred_save: float = 0.5


@dataclass(frozen=True)
class TrainConfig:
    exp_name: str = ""
    log_root_dir: str = "./logs"
    seed: int = 1337
    no_debug: bool = False
    ckpt_path: Optional[str] = None
    weight_path: Optional[str] = None
    save_checkpoint: bool = False
    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    # ---------------------------------------------------------------- CLI
    @staticmethod
    def from_args(argv=None) -> "TrainConfig":
        """Parse reference-compatible CLI flags (opt.py names) into a TrainConfig."""
        p = argparse.ArgumentParser()
        p.add_argument("--no_debug", action="store_true", default=False)
        p.add_argument("--log_root_dir", type=str, default="./logs")
        p.add_argument("--exp_name", type=str, default="")
        p.add_argument("--seed", type=int, default=1337)
        # dataset
        p.add_argument("--data_root_dir", type=str, default="")
        p.add_argument("--dataset_name", type=str, default="hypersim",
                       choices=["hypersim", "scannet_manhattan", "replica_semnerf", "synthetic"])
        p.add_argument("--split", type=str, default="train",
                       choices=["train", "trainval", "trainvaltest"])
        p.add_argument("--split_factor", type=float, default=0.5)
        p.add_argument("--keep_N_tr", type=int, default=-1)
        p.add_argument("--downsample", type=float, default=1.0)
        for f in ["load_depth_gt", "load_norm_gt", "load_norm_depth_gt",
                  "load_sem_gt", "load_sem_WF_gt"]:
            p.add_argument(f"--{f}", action="store_true", default=False)
        # model
        p.add_argument("--model_name", type=str, default="NGPMT")
        p.add_argument("--scale", type=float, default=0.5)
        p.add_argument("--grid_size", type=int, default=128)
        p.add_argument("--density_tresh_decay", type=float, default=1.0)
        p.add_argument("--rend_max_samples", type=int, default=1024)
        p.add_argument("--rend_near_dist", type=float, default=0.01)
        p.add_argument("--use_exposure", action="store_true", default=False)
        p.add_argument("--pred_norm_nn", action="store_true", default=False)
        p.add_argument("--pred_norm_nn_norm", action="store_true", default=False)
        p.add_argument("--pred_norm_depth", action="store_true", default=False)
        p.add_argument("--pred_sem", action="store_true", default=False)
        p.add_argument("--compute_dtype", type=str, default="float32",
                       choices=["float32", "bfloat16"])
        # losses
        p.add_argument("--loss_opacity_w", type=float, default=1e-3)
        p.add_argument("--loss_distortion_w", type=float, default=0)
        p.add_argument("--loss_depth_w", type=float, default=0)
        p.add_argument("--loss_sem_w", type=float, default=0)
        p.add_argument("--loss_norm_GT_depth", action="store_true", default=False)
        p.add_argument("--loss_norm_depth_dot_w", type=float, default=0)
        p.add_argument("--loss_norm_depth_L1_w", type=float, default=0)
        p.add_argument("--loss_reg_depth_w", type=float, default=0)
        p.add_argument("--loss_manhattan_nerf_w", type=float, default=0)
        p.add_argument("--loss_norm_D_C_ort_dot_w", type=float, default=0)
        p.add_argument("--loss_norm_D_C_centr_dot_w", type=float, default=0)
        p.add_argument("--loss_norm_D_C_centr_L1_w", type=float, default=0)
        p.add_argument("--loss_norm_D_C_can_dot_w", type=float, default=0)
        p.add_argument("--loss_norm_D_C_can_L1_w", type=float, default=0)
        p.add_argument("--loss_norm_can_tres", type=float, default=0)
        p.add_argument("--loss_norm_can_start", type=float, default=0)
        p.add_argument("--loss_norm_can_end", type=float, default=-1)
        p.add_argument("--loss_norm_can_grow", type=float, default=1)
        p.add_argument("--loss_norm_yaw_offset_ang", type=float, default=0)
        p.add_argument("--loss_norm_pitch_offset_ang", type=float, default=0)
        p.add_argument("--loss_norm_roll_offset_ang", type=float, default=0)
        # training
        p.add_argument("--optimize_ext", action="store_true", default=False)
        p.add_argument("--lr", type=float, default=1e-2)
        p.add_argument("--lr_dR_norm_glob", type=float, default=0)
        p.add_argument("--dR_norm_glob_coding", type=str, default="axis_angle")
        p.add_argument("--num_epochs", type=int, default=4)
        p.add_argument("--batch_size", type=int, default=8192)
        p.add_argument("--ray_sampling_strategy", type=str, default="all_images",
                       choices=["all_images", "same_image",
                                "same_image_triang", "all_images_triang",
                                "all_images_triang_val",
                                "same_image_triang_patch", "all_images_triang_patch"])
        p.add_argument("--random_tr_poses", action="store_true", default=False)
        p.add_argument("--triang_max_expand", type=int, default=0)
        p.add_argument("--anneal_strategy", type=str, default="none",
                       choices=["avoid_near", "depth", "none"])
        p.add_argument("--anneal_steps", type=int, default=0)
        p.add_argument("--num_chips", type=int, default=0,
                       help="0/1 = single device; -1 = all visible devices; "
                            "N = shard rays over N chips")
        p.add_argument("--grad_clip", type=float, default=0.05)
        p.add_argument("--random_bg", action="store_true", default=False)
        # validation
        p.add_argument("--eval_lpips", action="store_true", default=False)
        p.add_argument("--val_only", action="store_true", default=False)
        p.add_argument("--save_test_vis", action="store_true", default=False)
        p.add_argument("--downsample_vis", type=float, default=0.5)
        p.add_argument("--save_test_preds", action="store_true", default=False)
        p.add_argument("--save_train_preds", action="store_true", default=False)
        p.add_argument("--downsample_pred_save", type=float, default=0.5)
        p.add_argument("--ckpt_path", type=str, default=None)
        p.add_argument("--weight_path", type=str, default=None)
        p.add_argument("--save_checkpoint", action="store_true", default=False)
        a = p.parse_args(argv)

        return TrainConfig(
            exp_name=a.exp_name, log_root_dir=a.log_root_dir, seed=a.seed,
            no_debug=a.no_debug, ckpt_path=a.ckpt_path, weight_path=a.weight_path,
            save_checkpoint=a.save_checkpoint,
            model=ModelConfig(
                model_name=a.model_name, scale=a.scale, grid_size=a.grid_size,
                density_tresh_decay=a.density_tresh_decay,
                max_samples=a.rend_max_samples, near_dist=a.rend_near_dist,
                use_exposure=a.use_exposure, pred_norm_nn=a.pred_norm_nn,
                pred_norm_nn_norm=a.pred_norm_nn_norm,
                pred_norm_depth=a.pred_norm_depth, pred_sem=a.pred_sem,
                compute_dtype=a.compute_dtype,
            ),
            render=RenderConfig(
                random_bg=a.random_bg, anneal_strategy=a.anneal_strategy,
                anneal_steps=a.anneal_steps, march_block=a.rend_max_samples,
            ),
            loss=LossConfig(
                opacity_w=a.loss_opacity_w, distortion_w=a.loss_distortion_w,
                depth_w=a.loss_depth_w, sem_w=a.loss_sem_w,
                norm_GT_depth=a.loss_norm_GT_depth,
                norm_depth_dot_w=a.loss_norm_depth_dot_w,
                norm_depth_L1_w=a.loss_norm_depth_L1_w,
                reg_depth_w=a.loss_reg_depth_w,
                manhattan_nerf_w=a.loss_manhattan_nerf_w,
                norm_D_C_ort_dot_w=a.loss_norm_D_C_ort_dot_w,
                norm_D_C_centr_dot_w=a.loss_norm_D_C_centr_dot_w,
                norm_D_C_centr_L1_w=a.loss_norm_D_C_centr_L1_w,
                norm_D_C_can_dot_w=a.loss_norm_D_C_can_dot_w,
                norm_D_C_can_L1_w=a.loss_norm_D_C_can_L1_w,
                norm_can_tres=a.loss_norm_can_tres,
                norm_can_start=int(a.loss_norm_can_start),
                norm_can_end=int(a.loss_norm_can_end),
                norm_can_grow=a.loss_norm_can_grow,
                norm_yaw_offset_ang=a.loss_norm_yaw_offset_ang,
                norm_pitch_offset_ang=a.loss_norm_pitch_offset_ang,
                norm_roll_offset_ang=a.loss_norm_roll_offset_ang,
            ),
            data=DataConfig(
                root_dir=a.data_root_dir, dataset_name=a.dataset_name,
                split=a.split, split_factor=a.split_factor, keep_N_tr=a.keep_N_tr,
                downsample=a.downsample, load_depth_gt=a.load_depth_gt,
                load_norm_gt=a.load_norm_gt, load_norm_depth_gt=a.load_norm_depth_gt,
                load_sem_gt=a.load_sem_gt, load_sem_WF_gt=a.load_sem_WF_gt,
                ray_sampling_strategy=a.ray_sampling_strategy,
                batch_size=a.batch_size, random_tr_poses=a.random_tr_poses,
                triang_max_expand=a.triang_max_expand,
            ),
            optim=OptimConfig(
                lr=a.lr, num_epochs=a.num_epochs, grad_clip=a.grad_clip,
                optimize_ext=a.optimize_ext, lr_dR_norm_glob=a.lr_dR_norm_glob,
                dR_norm_glob_coding=a.dR_norm_glob_coding,
            ),
            parallel=ParallelConfig(
                # 0/1 = single device; -1 = all visible; N = N chips
                mesh_shape=(a.num_chips if a.num_chips != 0 else 1,),
            ),
            eval=EvalConfig(
                eval_lpips=a.eval_lpips, val_only=a.val_only,
                save_test_vis=a.save_test_vis, downsample_vis=a.downsample_vis,
                save_test_preds=a.save_test_preds,
                save_train_preds=a.save_train_preds,
                downsample_pred_save=a.downsample_pred_save,
            ),
        )

    def debug_overrides(self) -> "TrainConfig":
        """Shrunken smoke-test config (reference: train_nerf.py:813-866)."""
        return dataclasses.replace(
            self,
            model=dataclasses.replace(
                self.model, grid_size=32, max_samples=128,
                pred_norm_nn=True, pred_norm_depth=True, pred_sem=True),
            data=dataclasses.replace(
                self.data, batch_size=256,
                ray_sampling_strategy="all_images_triang"),
            optim=dataclasses.replace(self.optim, num_epochs=2, steps_per_epoch=50),
            render=dataclasses.replace(self.render, march_block=128),
        )
