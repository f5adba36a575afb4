"""Training system: the TPU-native replacement for NeRFSystem.

Re-designs the reference's Lightning module (reference:
train_nerf.py:96-806) as a host-side driver around jitted pure
functions: one fused train step (on-device batch sampling -> ray
assembly -> render -> multi-task loss -> AdamW update), a periodic
occupancy-grid refresh every 16 steps with a 256-step warmup
(train_nerf.py:101-102,314-320), one-time invisible-cell marking
(train_nerf.py:306-312), and chunked full-image validation with the
metric suite and Manhattan rotation recovery.
"""
from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..datasets.base import SceneData, generate_random_poses
from ..datasets.normals import extract_normals_from_depth_batch
from ..datasets.ray_utils import axisangle_to_R, get_rays
from ..datasets.sampler import RaySampler
from ..losses import compute_losses
from ..metrics import NeRFMTMetricsPerIm
from ..models.ngp_mt import NGPMT
from ..models.occupancy import OccupancyGrid
from ..models.rendering import (
    prewarm_test_render, render_test, render_train,
)
from .state import TrainState, create_train_state


def _scene_to_device(scene: SceneData, storage_dtype=jnp.float32) -> Dict:
    dev = {
        "poses": jnp.asarray(scene.poses, jnp.float32),
        "directions": jnp.asarray(scene.directions, jnp.float32),
        "rays": jnp.asarray(scene.rays, storage_dtype),
    }
    for k, v in scene.labels.items():
        dt = jnp.int32 if v.dtype.kind in "iu" else storage_dtype
        dev[f"label_{k}"] = jnp.asarray(v, dt)
    return dev


class Trainer:
    def __init__(self, cfg: TrainConfig, scene_train: SceneData,
                 scene_test: Optional[SceneData] = None):
        if scene_train.n_classes:
            cfg = cfg.replace(
                model=cfg.model.__class__(
                    **{**cfg.model.__dict__, "n_sem_cls": scene_train.n_classes}
                )
            )
        self.cfg = cfg
        self.scene_train = scene_train
        self.scene_test = scene_test
        # step_fns picks the bootstrap variant from a chunk's START step,
        # so the bootstrap boundary must fall on a chunk boundary or a
        # full-interval chunk would silently overrun it
        if cfg.render.bootstrap_steps % cfg.optim.update_interval != 0:
            raise ValueError(
                f"render.bootstrap_steps ({cfg.render.bootstrap_steps}) must "
                f"be a multiple of optim.update_interval "
                f"({cfg.optim.update_interval})")
        need_pos_grad = cfg.optim.optimize_ext or cfg.optim.lr_dR_norm_glob > 0
        self.model = NGPMT(cfg.model, need_pos_grad=need_pos_grad)
        self.occ_grid = OccupancyGrid(cfg.model)

        if cfg.data.keep_N_tr != -1:
            self.scene_train = scene_train = scene_train.keep_first_n(
                cfg.data.keep_N_tr)

        n_rand = 0
        if cfg.data.random_tr_poses:
            rnd, _ = generate_random_poses(
                scene_train.poses, scene_train.xyz_cam_min,
                scene_train.xyz_cam_max, 10000, seed=cfg.seed)
            # host numpy on purpose: closed over by the jitted step; a
            # device array here would be fetched at trace time and
            # degrade the axon tunnel (see mark_invisible_cells note)
            self.random_poses = np.asarray(rnd, np.float32)
            n_rand = rnd.shape[0]
        else:
            self.random_poses = None

        self.sampler = RaySampler(
            cfg.data.ray_sampling_strategy, cfg.data.batch_size,
            scene_train.img_wh, scene_train.n_images,
            max_expand=cfg.data.triang_max_expand,
            patch_size=cfg.data.patch_size, n_random_poses=n_rand,
        )
        self.native_sampler = None
        if cfg.data.host_sampler:
            if cfg.data.random_tr_poses:
                raise ValueError("host_sampler does not support "
                                 "random_tr_poses")
            from ..datasets.native_sampler import NativeRaySampler
            labels = scene_train.labels
            self.native_sampler = NativeRaySampler(
                cfg.data.ray_sampling_strategy, cfg.data.batch_size,
                scene_train.img_wh,
                np.asarray(scene_train.rays)[..., :3],
                depth=labels.get("depth"),
                normals=labels.get("normals"),
                semantics=labels.get("semantics"),
                max_expand=cfg.data.triang_max_expand,
                patch_size=cfg.data.patch_size,
                n_threads=cfg.data.host_sampler_threads, seed=cfg.seed)
        self.scene_dev = _scene_to_device(scene_train)
        key = jax.random.PRNGKey(cfg.seed)
        self.state, self.tx = create_train_state(
            cfg, self.model, self.occ_grid, key, scene_train.n_images)

        # Multi-chip: shard rays over a named mesh when the config asks
        # for more than one device (the TPU replacement for Lightning
        # DDP, reference: train_nerf.py:950-952). Single-device configs
        # keep the plain jitted step.
        self.mesh = None
        n_req = cfg.parallel.mesh_shape[0]
        n_chips = len(jax.devices()) if n_req == -1 else n_req
        if n_chips > 1:
            from ..parallel.mesh import make_mesh
            from .distributed import (
                make_sharded_occ_update, make_sharded_train_step,
            )
            self.mesh = make_mesh((n_chips,), cfg.parallel.mesh_axis_names)
            self._train_step = make_sharded_train_step(self, self.mesh)
            self._train_step_boot = make_sharded_train_step(
                self, self.mesh, bootstrap=True)
            self._occ_update = {
                True: make_sharded_occ_update(self, self.mesh, warmup=True),
                False: make_sharded_occ_update(self, self.mesh, warmup=False),
            }
        else:
            self._train_step = jax.jit(self._train_step_impl,
                                       donate_argnums=(0,))
            self._train_step_boot = jax.jit(
                partial(self._train_step_impl, bootstrap=True),
                donate_argnums=(0,))
            self._occ_update = {
                True: jax.jit(partial(self._occ_update_impl, warmup=True),
                              donate_argnums=(0,)),
                False: jax.jit(partial(self._occ_update_impl, warmup=False),
                               donate_argnums=(0,)),
            }
        # Chunked dispatch: `update_interval` optimization steps fused
        # into ONE jitted lax.scan call. On tunneled TPU backends each
        # host dispatch costs ~ms of latency; scanning between occupancy
        # refreshes removes it entirely (the occ cadence is the natural
        # chunk boundary — train_nerf.py:314-320).
        if self.mesh is not None:
            from .distributed import make_sharded_train_chunk
            self._train_chunk = make_sharded_train_chunk(
                self, self.mesh, cfg.optim.update_interval)
            self._train_chunk_boot = make_sharded_train_chunk(
                self, self.mesh, cfg.optim.update_interval, bootstrap=True)
        else:
            self._train_chunk = jax.jit(
                self._make_chunk_fn(cfg.optim.update_interval),
                donate_argnums=(0,))
            self._train_chunk_boot = jax.jit(
                self._make_chunk_fn(cfg.optim.update_interval,
                                    bootstrap=True),
                donate_argnums=(0,))
        if self.native_sampler is not None:
            if self.mesh is not None:
                raise ValueError("host_sampler is single-device only")
            self._train_step_hostb = {
                b: jax.jit(partial(self._train_step_batch_impl, bootstrap=b),
                           donate_argnums=(0,))
                for b in (False, True)
            }
            self._train_chunk_hostb = {
                b: jax.jit(self._make_chunk_batch_fn(
                    cfg.optim.update_interval, bootstrap=b),
                    donate_argnums=(0,))
                for b in (False, True)
            }
        self.R_offset = self._build_R_offset()
        self._prewarmed = False

    def step_fns(self, step: int):
        """(step_fn, chunk_fn) for host step counter `step` — the coarse
        bootstrap variants while step < render.bootstrap_steps."""
        if step < self.cfg.render.bootstrap_steps:
            return self._train_step_boot, self._train_chunk_boot
        return self._train_step, self._train_chunk

    # ------------------------------------------------------------ R offset
    def _build_R_offset(self):
        """Scene rotation offset from euler angles ZYX
        (reference: train_nerf.py:109-122)."""
        from ..utils.rotations import euler_angles_to_matrix
        lc = self.cfg.loss
        ang = np.array([
            lc.norm_yaw_offset_ang, lc.norm_pitch_offset_ang,
            lc.norm_roll_offset_ang,
        ]) * math.pi / 180.0
        if np.all(ang == 0):
            return np.eye(3, dtype=np.float32)
        return euler_angles_to_matrix(ang, "ZYX").astype(np.float32)

    # ------------------------------------------------------- occupancy ops
    def _occ_update_impl(self, occ, params, key, warmup: bool):
        # threshold = 0.01*max_samples/sqrt(3) * decay (train_nerf.py:316-317)
        thr = 0.01 * self.cfg.model.max_samples / math.sqrt(3.0)
        thr *= self.cfg.model.density_tresh_decay
        density_fn = lambda xyz: self.model.density(params["model"], xyz)
        return self.occ_grid.update(
            occ, density_fn, key, thr, warmup=warmup,
            erode=False,
        )

    def mark_invisible_cells(self):
        """One-time camera-coverage marking (train_nerf.py:306-312),
        jitted into a single graph (each eager op costs a full remote
        compile round-trip on tunneled TPU backends)."""
        scene = self.scene_train
        # closures must hold HOST numpy constants, never device arrays:
        # tracing a closed-over device array embeds it as an HLO literal
        # via a device->host fetch, which flips the axon TPU tunnel into
        # a permanently degraded (~1000x slower) dispatch mode.
        if scene.proj is not None:
            proj_static = tuple(
                np.asarray(p, np.float32)
                if not np.isscalar(p) else float(p) for p in scene.proj)
            fn = jax.jit(lambda occ, poses: self.occ_grid.mark_invisible_cells(
                occ, poses, scene.img_wh, self.cfg.model.near_dist,
                proj=proj_static))
        else:
            K = np.asarray(scene.K, np.float32)
            fn = jax.jit(lambda occ, poses: self.occ_grid.mark_invisible_cells(
                occ, poses, scene.img_wh, self.cfg.model.near_dist, K=K))
        occ = fn(self.state.occ, jnp.asarray(np.asarray(scene.poses)))
        self.state = self.state._replace(occ=occ)

    # ------------------------------------------------------------ train step
    def _assemble_rays(self, params, batch, scene):
        poses = scene["poses"][batch["img_idxs"]]
        dirs = scene["directions"][batch["pix_idxs"]]
        if self.cfg.optim.optimize_ext:
            dR = axisangle_to_R(params["dR"][batch["img_idxs"]])
            rot = dR @ poses[..., :3]
            t = poses[..., 3] + params["dT"][batch["img_idxs"]]
            poses = jnp.concatenate([rot, t[..., None]], axis=-1)
        if self.random_poses is not None:
            rnd = jnp.asarray(self.random_poses)[batch["rnd_img_idxs"]]
            poses = jnp.concatenate([poses, rnd], axis=0)
            dirs = jnp.concatenate([dirs, dirs], axis=0)
        return get_rays(dirs, poses)

    def _train_step_impl(self, state: TrainState, scene: Dict,
                         bootstrap: bool = False):
        return self.train_step_core(state, scene, self.sampler,
                                    bootstrap=bootstrap)

    # ------------------------------------------------- host-sampler path
    def _train_step_batch_impl(self, state: TrainState, scene: Dict,
                               batch: Dict, bootstrap: bool = False):
        return self.train_step_core(state, scene, self.sampler,
                                    bootstrap=bootstrap, batch=batch)

    def _make_chunk_batch_fn(self, n_steps: int, bootstrap: bool = False):
        """n_steps host-sampled batches consumed by one lax.scan
        dispatch: the native prefetcher fills an (n_steps, B) index
        block on the host while the previous chunk computes."""
        def chunk_fn(state: TrainState, scene: Dict, batches: Dict):
            def body(st, b):
                return self.train_step_core(st, scene, self.sampler,
                                            bootstrap=bootstrap, batch=b)
            state2, ms = jax.lax.scan(body, state, batches)
            return state2, jax.tree_util.tree_map(lambda x: x[-1], ms)
        return chunk_fn

    def _next_host_batches(self, n: int) -> Dict:
        bs = [self.native_sampler.next_batch() for _ in range(n)]
        return {k: jnp.asarray(np.stack([b[k] for b in bs]))
                for k in ("img_idxs", "pix_idxs")}

    def _make_chunk_fn(self, n_steps: int, sampler=None,
                       axis_name: Optional[str] = None,
                       bootstrap: bool = False):
        """n_steps optimization steps as one lax.scan (one dispatch);
        returns (state, last-step metrics)."""
        sampler = sampler or self.sampler

        def chunk_fn(state: TrainState, scene: Dict):
            def body(st, _):
                return self.train_step_core(st, scene, sampler,
                                            axis_name=axis_name,
                                            bootstrap=bootstrap)
            state2, ms = jax.lax.scan(body, state, None, length=n_steps)
            return state2, jax.tree_util.tree_map(lambda x: x[-1], ms)

        return chunk_fn

    def train_step_core(self, state: TrainState, scene: Dict, sampler,
                        axis_name: Optional[str] = None,
                        bootstrap: bool = False, batch: Optional[Dict] = None):
        """One optimization step; with `axis_name` set (inside shard_map)
        each chip samples its own sub-batch and gradients are pmean-reduced
        (the TPU replacement for Lightning DDP's all-reduce,
        train_nerf.py:950-952). With `batch` given (host-sampler mode),
        the provided {img_idxs, pix_idxs} replace on-device sampling —
        the rest of the step is identical."""
        cfg = self.cfg
        key, k_batch, k_render, k_loss = jax.random.split(state.key, 4)
        if axis_name is not None:
            shard = jax.lax.axis_index(axis_name)
            k_batch = jax.random.fold_in(k_batch, shard)
            k_render = jax.random.fold_in(k_render, shard)
            k_loss = jax.random.fold_in(k_loss, shard)
        if batch is None:
            batch = sampler.sample(k_batch)
        target = {"rgb": scene["rays"][batch["img_idxs"], batch["pix_idxs"]][..., :3]}
        for name in ("depth", "normals", "normals_depth", "semantics",
                     "semantics_WF"):
            lk = f"label_{name}"
            if lk in scene:
                target[name] = scene[lk][batch["img_idxs"], batch["pix_idxs"]]

        def loss_fn(params):
            rays_o, rays_d = self._assemble_rays(params, batch, scene)
            results = render_train(
                self.model, params["model"], state.occ.density_bitfield,
                rays_o, rays_d, k_render, cfg.render,
                global_step=state.step,
                depth_gt=target.get("depth"),
                coarse_occ=state.occ.coarse_occ,
                sv_mask=state.occ.sv_mask,
                sv_payload=state.occ.sv_payload,
                bootstrap=bootstrap,
            )
            loss_d = compute_losses(
                results, target, cfg.loss, self.model.cfg,
                step=state.step, key=k_loss,
                ray_sampling_strategy=cfg.data.ray_sampling_strategy,
                random_tr_poses=cfg.data.random_tr_poses,
                patch_area=self.sampler.patch_area,
                offsets_local=self.sampler.offsets_local,
                theta_WF=params.get("theta_WF"),
            )
            aux = {
                "loss_d": loss_d,
                "rm_samples": results["rm_samples"].astype(jnp.float32),
                "trunc_rays": results.get(
                    "trunc_rays", jnp.zeros((), jnp.int32)).astype(jnp.float32),
                "vr_samples": results["vr_samples"].astype(jnp.float32),
                "mse": jnp.mean(
                    (results["rgb"][: target["rgb"].shape[0]] - target["rgb"]) ** 2
                ),
            }
            return loss_d["total"], aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, occ=state.occ,
            step=state.step + 1, key=key,
        )
        local_bs = sampler.batch_size
        metrics = {
            "psnr": -10.0 * jnp.log10(jnp.maximum(aux["mse"], 1e-12)),
            "rm_samples_per_ray": aux["rm_samples"] / local_bs,
            "vr_samples_per_ray": aux["vr_samples"] / local_bs,
            # fraction of rays whose sample set the bounded sv/coarse
            # march TRUNCATED this step (no-silent-caps guard; 0 when
            # the march is exact — see ops/ray_march.py trunc_rays)
            "trunc_ray_frac": aux["trunc_rays"] / local_bs,
        }
        metrics.update({f"loss_{k}": v for k, v in aux["loss_d"].items()})
        return new_state, metrics

    # ------------------------------------------------------------------ fit
    def prewarm_render(self, n_rays: Optional[int] = None):
        """Kick off background compilation of the test renderer's bucket
        ladder so the first validate/render pays no compile latency
        (compiles overlap training on host threads)."""
        scene = self.scene_test or self.scene_train
        if n_rays is None:
            W, H = scene.img_wh
            n_rays = scene.n_images * W * H
        prewarm_test_render(
            self.model, self.state.params["model"], self.cfg.render, n_rays,
            bitfield=self.state.occ.density_bitfield,
            sv_mask=self.state.occ.sv_mask,
            sv_payload=self.state.occ.sv_payload)

    def fit(self, log_every: int = 100, log_fn=print, logger=None):
        cfg = self.cfg
        total = cfg.optim.num_epochs * cfg.optim.steps_per_epoch
        self.mark_invisible_cells()
        t0 = time.time()
        metrics = {}
        interval = cfg.optim.update_interval
        step = int(self.state.step)
        start_step = step
        last_log = step
        while step < total:
            if step > start_step and not self._prewarmed:
                # ladder compiles start AFTER the first train-step
                # compile: the remote-compile endpoint drops connections
                # under concurrent load, and a dropped MAIN-thread
                # compile is fatal (background ladder compiles retry)
                self._prewarmed = True
                self.prewarm_render()
            if step % interval == 0:
                warm = step < cfg.optim.warmup_steps
                k = jax.random.fold_in(jax.random.PRNGKey(cfg.seed ^ 0x5EED), step)
                occ = self._occ_update[warm](self.state.occ, self.state.params, k)
                self.state = self.state._replace(occ=occ)
            boot = step < cfg.render.bootstrap_steps
            if self.native_sampler is not None:
                if step % interval == 0 and step + interval <= total:
                    batches = self._next_host_batches(interval)
                    self.state, metrics = self._train_chunk_hostb[boot](
                        self.state, self.scene_dev, batches)
                    step += interval
                else:
                    b = self._next_host_batches(1)
                    b = jax.tree_util.tree_map(lambda x: x[0], b)
                    self.state, metrics = self._train_step_hostb[boot](
                        self.state, self.scene_dev, b)
                    step += 1
            else:
                step_fn, chunk_fn = self.step_fns(step)
                if step % interval == 0 and step + interval <= total:
                    # full inter-refresh chunk: one fused scan dispatch
                    self.state, metrics = chunk_fn(self.state, self.scene_dev)
                    step += interval
                else:
                    self.state, metrics = step_fn(self.state, self.scene_dev)
                    step += 1
            if log_every and step - last_log >= log_every:
                last_log = step
                m = {k: float(v) for k, v in metrics.items()}
                rate = step / max(time.time() - t0, 1e-9)
                log_fn(
                    f"step {step}/{total} "
                    f"loss={m.get('loss_total', float('nan')):.4f} "
                    f"psnr={m.get('psnr', float('nan')):.2f} "
                    f"rm/ray={m.get('rm_samples_per_ray', 0):.1f} "
                    f"vr/ray={m.get('vr_samples_per_ray', 0):.1f} "
                    f"trunc={m.get('trunc_ray_frac', 0):.4f} "
                    f"({rate:.1f} it/s)"
                )
                if logger is not None:
                    logger.log_scalars(m, step, prefix="train/")
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------- validate
    def render_image(self, pose, directions=None):
        """Full-image inference render (train_nerf.py:381-401)."""
        return self.render_images([pose], directions)[0]

    def render_images(self, poses, directions=None):
        """Batched multi-image inference render: rays from ALL poses are
        concatenated into one ray stream and rendered through shared
        chunks, so the bucket renderer's per-dispatch overhead and its
        tail rounds (few alive rays) amortise over every image at once
        instead of being paid per image. Returns a list of per-image
        result dicts (same keys as render_image)."""
        cfg = self.cfg
        scene = self.scene_test or self.scene_train
        W, H = scene.img_wh
        if directions is None:
            directions = jnp.asarray(scene.directions)
        ros, rds = [], []
        for pose in poses:
            ro, rd = get_rays(directions, jnp.asarray(np.asarray(pose)))
            ros.append(ro)
            rds.append(rd)
        rays_o = jnp.concatenate(ros)
        rays_d = jnp.concatenate(rds)
        chunk = cfg.render.test_chunk
        outs = []
        for i in range(0, rays_o.shape[0], chunk):
            outs.append(render_test(
                self.model, self.state.params["model"],
                self.state.occ.density_bitfield,
                rays_o[i:i + chunk], rays_d[i:i + chunk], cfg.render,
                sv_mask=self.state.occ.sv_mask,
                sv_payload=self.state.occ.sv_payload,
            ))
        # ONE device->host transfer per chunk: per-key np.asarray paid a
        # tunnel round-trip per (chunk, key) — ~0.3 s of the 0.6 s warm
        # render was host fetches (r5 trace). Pack every per-ray output
        # into a single (N, C_total) device array and fetch once.
        keys = sorted(k for k in outs[0] if k != "total_samples")
        packed = []
        for o in outs:
            n = o[keys[0]].shape[0]
            cols = [o[k].reshape(n, -1).astype(jnp.float32) for k in keys]
            # total_samples rides as one extra column's first element:
            # a separate scalar int() fetch cost its own tunnel RTT
            ts_col = jnp.zeros((n, 1), jnp.float32).at[0, 0].set(
                o["total_samples"].astype(jnp.float32))
            packed.append(jnp.concatenate(cols + [ts_col], axis=1))
        widths = [int(np.prod(outs[0][k].shape[1:])) or 1 for k in keys]
        host = [np.asarray(p) for p in packed]
        total_samples = int(sum(h[0, -1] for h in host))
        cat = {"total_samples": total_samples}
        for i, k in enumerate(keys):
            start = sum(widths[:i])
            cols = [h[:, start:start + widths[i]] for h in host]
            v = np.concatenate(cols)
            cat[k] = v[:, 0] if widths[i] == 1 and outs[0][k].ndim == 1 else v
        n_px = H * W
        results = []
        for j in range(len(poses)):
            res = {}
            for k, v in cat.items():
                if k == "total_samples":
                    res[k] = v // len(poses)
                    continue
                sl = v[j * n_px:(j + 1) * n_px]
                if k in ("rgb", "norm_nn", "sem"):
                    res[k] = sl.reshape(H, W, -1)
                elif k in ("depth", "opacity"):
                    res[k] = sl.reshape(H, W)
                else:
                    res[k] = sl
            results.append(res)
        return results

    def validate(self, save_vis_dir: Optional[str] = None,
                 save_preds_dir: Optional[str] = None,
                 logger=None) -> Dict[str, float]:
        """Render the test split, compute the metric suite, optionally
        export vis PNGs / raw-pred tarballs and recover the Manhattan
        rotation (train_nerf.py:381-528)."""
        cfg = self.cfg
        scene = self.scene_test or self.scene_train
        agg = NeRFMTMetricsPerIm(
            pred_norm_nn=cfg.model.pred_norm_nn,
            pred_norm_depth=cfg.model.pred_norm_depth,
            pred_sem=cfg.model.pred_sem,
            load_depth_gt=cfg.data.load_depth_gt or "depth" in scene.labels,
            load_norm_gt=cfg.data.load_norm_gt or "normals" in scene.labels,
            load_sem_gt="semantics" in scene.labels,
            load_sem_WF_gt="semantics_WF" in scene.labels,
            eval_lpips=cfg.eval.eval_lpips,
            n_classes=scene.n_classes,
        )
        W, H = scene.img_wh
        depths, preds = [], []
        all_res = self.render_images(list(scene.poses))
        for i in range(scene.n_images):
            res = all_res[i]
            pred = {"rgb": res["rgb"], "depth": res["depth"]}
            if "norm_nn" in res:
                pred["norm_nn"] = res["norm_nn"]
            if cfg.model.pred_norm_depth:
                nd = extract_normals_from_depth_batch(
                    jnp.asarray(res["depth"])[None],
                    jnp.asarray(scene.directions),
                    jnp.asarray(scene.poses[i:i + 1]),
                )
                pred["norm_depth"] = np.asarray(nd[0])
            if "sem" in res:
                pred["sem"] = res["sem"]
            gt = {"rgb": scene.rays[i, :, :3].reshape(H, W, 3)}
            for k in scene.labels:
                v = scene.labels[k][i]
                gt_key = {"depth": "depth", "normals": "normals",
                          "semantics": "semantics",
                          "semantics_WF": "semantics_WF"}.get(k)
                if gt_key:
                    gt[gt_key] = v.reshape(H, W, -1) if v.ndim == 2 and v.shape[-1] == 3 else v.reshape(H, W)
            agg.update(pred, gt)
            depths.append(res["depth"])
            preds.append(pred)
            if save_vis_dir:
                from .visualize import pack_vis_panel, save_vis_png
                panel = pack_vis_panel(
                    pred, n_classes=max(scene.n_classes, 3),
                    downsample=cfg.eval.downsample_vis)
                save_vis_png(os.path.join(
                    save_vis_dir, f"{scene.img_ids[i] or i}_pred.png"), panel)
                gt_panel = pack_vis_panel(
                    {k: v for k, v in gt.items()},
                    n_classes=max(scene.n_classes, 3),
                    downsample=cfg.eval.downsample_vis)
                save_vis_png(os.path.join(
                    save_vis_dir, f"{scene.img_ids[i] or i}_gt.png"), gt_panel)
            if logger is not None:
                from .visualize import pack_vis_panel
                logger.log_image(
                    f"val/{scene.img_ids[i] or i}",
                    pack_vis_panel(pred, n_classes=max(scene.n_classes, 3),
                                   downsample=cfg.eval.downsample_vis),
                    int(self.state.step))
        out = agg.compute()

        # Manhattan-frame rotation recovery from all test depth-normals
        # (train_nerf.py:489-528)
        if cfg.model.pred_norm_depth and preds and "norm_depth" in preds[0]:
            from .rotation_recovery import rotation_recovery_errors
            all_nd = np.concatenate(
                [p["norm_depth"].reshape(-1, 3) for p in preds])
            try:
                out.update(rotation_recovery_errors(
                    all_nd, self.R_offset,
                    jax.random.PRNGKey(cfg.seed ^ 0xA11)))
            except (ValueError, np.linalg.LinAlgError) as e:
                # degenerate clustering early in training (SVD of a
                # rank-deficient centroid triplet); anything else raises
                import warnings
                warnings.warn(f"rotation recovery failed: {e}", RuntimeWarning)
                out["ang/clust/failed"] = 1.0

        if save_preds_dir:
            from .visualize import save_preds_tar_gz
            pred_stack = {
                k: [p[k] for p in preds] for k in preds[0]
            }
            save_preds_tar_gz(
                save_preds_dir, pred_stack, scene.img_ids, "test", "pred")
        if logger is not None:
            logger.log_scalars(out, int(self.state.step), prefix="test/")
        self._last_val_preds = preds
        return out

    def save_train_preds(self, save_dir: str):
        """Render the train split and export pred+gt tarballs
        (reference: train_nerf.py:747-779 _save_train_preds)."""
        from .visualize import save_preds_tar_gz
        scene = self.scene_train
        W, H = scene.img_wh
        preds, gts = [], []
        for i in range(scene.n_images):
            res = self.render_image(scene.poses[i], jnp.asarray(scene.directions))
            pred = {"rgb": np.asarray(res["rgb"]),
                    "depth": np.asarray(res["depth"])}
            for k in ("norm_nn", "sem"):
                if k in res:
                    pred[k] = np.asarray(res[k])
            preds.append(pred)
            gt = {"rgb": scene.rays[i, :, :3].reshape(H, W, 3)}
            for k, v in scene.labels.items():
                gt[k] = (v[i].reshape(H, W, -1) if v[i].ndim == 2
                         else v[i].reshape(H, W))
            gts.append(gt)
        pred_stack = {k: [p[k] for p in preds] for k in preds[0]}
        gt_stack = {k: [g[k] for g in gts] for k in gts[0]}
        save_preds_tar_gz(save_dir, pred_stack, scene.img_ids, "train", "pred")
        save_preds_tar_gz(save_dir, gt_stack, scene.img_ids, "train", "gt")
