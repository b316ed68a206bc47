"""Training engine: thin host loop around fully-jitted device steps.

TPU-native rebuild of the reference Trainer
(/root/reference/lidarnerf/nerf/utils.py:533-1568). Same contract — workspace
layout (checkpoints/, validation/, results/, log_{name}.txt, tensorboard run/),
epoch loop with the per-epoch patch-size schedule, once-per-epoch EMA, eval
every `eval_interval` epochs with the meter suite, keep-2 checkpoint ring +
best-by-Chamfer checkpoint, test rendering with pano outputs and predicted
point clouds — but the hot path is different by design:

- the whole optimisation step (pixel sampling -> render -> losses -> Adam) is
  one jitted program (nerf/train_step.py); the host loop only flips the
  frame index and PRNG key,
- frame data lives on device permanently (no per-step H2D),
- loss scalars are fetched every `log_every` steps instead of per step
  (the reference's per-step loss.item() forces a device sync: utils.py:1228),
- bf16 matmuls replace torch AMP fp16 — no GradScaler needed on TPU,
- eval rendering is `lax.map` over fixed ray chunks (renderer.render staged
  equivalent).
"""

import glob
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import cv2

from lidarnerf_tpu.dataset.base import get_lidar_rays
from lidarnerf_tpu.dataset.convert import pano_to_lidar
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays_staged
from lidarnerf_tpu.nerf.train_step import (
    TrainConfig,
    ema_update,
    make_optimizer,
    make_train_step,
)
from lidarnerf_tpu.ops import losses as L
from lidarnerf_tpu.utils import checkpoint_io
from lidarnerf_tpu.utils.geometry import filter_bbox_dataset


def is_ali_cluster():
    """Cluster sniff for the alternate summary path (utils.py:31-35)."""
    import socket

    return "auto-drive" in socket.gethostname()


def _patch_tuple(p):
    if isinstance(p, int):
        return p
    return tuple(p)


class Trainer:
    def __init__(
        self,
        name,
        opt,
        module,
        device=None,
        mute=False,
        metrics=None,
        depth_metrics=None,
        ema_decay=None,
        eval_interval=1,
        ckpt_interval=1,
        max_keep_ckpt=2,
        workspace="workspace",
        best_mode="min",
        use_checkpoint="latest",
        use_tensorboardX=True,
        ckpt_format="pickle",
    ):
        self.name = name
        self.opt = opt
        self.module = module
        self.mute = mute
        self.metrics = metrics or []
        self.depth_metrics = depth_metrics or []
        self.ema_decay = ema_decay
        self.eval_interval = eval_interval
        # reference parity is a full checkpoint EVERY epoch (utils.py:1069);
        # >1 amortizes the ~300 MB device_get+write when epochs are tiny
        # (small frame counts make epochs a handful of steps)
        self.ckpt_interval = max(1, ckpt_interval)
        self.max_keep_ckpt = max_keep_ckpt
        self.workspace = workspace
        self.best_mode = best_mode
        self.use_tensorboardX = use_tensorboardX
        self.ckpt_format = ckpt_format
        self.time_stamp = time.strftime("%Y-%m-%d_%H-%M-%S")

        self.train_cfg = TrainConfig(
            alpha_d=opt.alpha_d,
            alpha_r=opt.alpha_r,
            alpha_i=opt.alpha_i,
            alpha_grad_norm=opt.alpha_grad_norm,
            alpha_spatial=opt.alpha_spatial,
            alpha_tv=opt.alpha_tv,
            alpha_grad=opt.alpha_grad,
            depth_loss=opt.depth_loss,
            depth_grad_loss=opt.depth_grad_loss,
            intensity_loss=opt.intensity_loss,
            raydrop_loss=opt.raydrop_loss,
            spatial_smooth=opt.spatial_smooth,
            grad_norm_smooth=opt.grad_norm_smooth,
            tv_loss=opt.tv_loss,
            grad_loss=opt.grad_loss,
            sobel_grad=opt.sobel_grad,
            scale=opt.scale,
            num_rays_lidar=opt.num_rays_lidar,
            H_lidar=getattr(opt, "H_lidar", 66),
            W_lidar=getattr(opt, "W_lidar", 1030),
            intrinsics_lidar=getattr(opt, "intrinsics_lidar", (2.0, 26.9)),
            lr=opt.lr,
            iters=opt.iters,
            alpha_seam=getattr(opt, "alpha_seam", 0.0),
        )
        # occupancy-prior sampling (--occ_sampling / --fast): the TPU-native
        # density_grid (models/occupancy.py) reweights the coarse sampling CDF
        occ_cfg = None
        if getattr(opt, "occ_sampling", False):
            from lidarnerf_tpu.models.occupancy import OccConfig

            occ_cfg = OccConfig(
                grid_size=getattr(opt, "occ_grid_size", 128),
                update_interval=getattr(opt, "occ_update_interval", 16),
                density_thresh=getattr(opt, "density_thresh", 10.0),
                floor=getattr(opt, "occ_floor", 0.05),
                bins=getattr(opt, "occ_bins", 128),
                dilate=getattr(opt, "occ_dilate", 1),
            )
        self.render_cfg = RenderConfig(
            num_steps=opt.num_steps,
            upsample_steps=opt.upsample_steps,
            min_near_lidar=opt.min_near_lidar,
            min_near=opt.min_near,
            density_scale=1.0,
            bound=opt.bound,
            occ=occ_cfg,
        )
        self.occ_grid = None
        if occ_cfg is not None:
            from lidarnerf_tpu.models.occupancy import init_occ_grid

            self.occ_grid = init_occ_grid(occ_cfg)

        # model/optimizer state
        key = jax.random.PRNGKey(getattr(opt, "seed", 0))
        self.params = module.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
        self.optimizer = make_optimizer(self.train_cfg)
        self.opt_state = self.optimizer.init(self.params)
        # deep copy: params buffers are donated into the jitted step, so the EMA
        # shadow must own distinct device memory
        self.ema_params = (
            jax.tree.map(jnp.copy, self.params) if ema_decay is not None else None
        )
        self.ema_num_updates = 0
        self.rng = jax.random.PRNGKey(getattr(opt, "seed", 0) + 1)
        self._np_rng = np.random.RandomState(getattr(opt, "seed", 0))

        self._step_fns = {}
        self._mesh_cache = None
        self.writer = None
        self._profiling = False

        self.epoch = 0
        self.global_step = 0
        self.local_step = 0
        self.stats = {
            "loss": [],
            "valid_loss": [],
            "results": [],
            "checkpoints": [],
            "best_result": None,
        }

        self.log_ptr = None
        if self.workspace is not None:
            os.makedirs(self.workspace, exist_ok=True)
            self.log_path = os.path.join(workspace, f"log_{self.name}.txt")
            self.log_ptr = open(self.log_path, "a+")
            self.ckpt_path = os.path.join(self.workspace, "checkpoints")
            self.best_path = f"{self.ckpt_path}/{self.name}.ckpt"
            os.makedirs(self.ckpt_path, exist_ok=True)

        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        self.log(
            f"[INFO] Trainer: {self.name} | {self.time_stamp} | "
            f"{jax.devices()[0].platform} | {self.workspace}"
        )
        self.log(f"[INFO] #parameters: {n_params}")

        if self.workspace is not None:
            if use_checkpoint == "scratch":
                self.log("[INFO] Training from scratch ...")
            elif use_checkpoint == "latest":
                self.log("[INFO] Loading latest checkpoint ...")
                self.load_checkpoint()
            elif use_checkpoint == "latest_model":
                self.log("[INFO] Loading latest checkpoint (model only)...")
                self.load_checkpoint(model_only=True)
            elif use_checkpoint == "best":
                if os.path.exists(self.best_path):
                    self.log("[INFO] Loading best checkpoint ...")
                    self.load_checkpoint(self.best_path)
                else:
                    self.log(f"[INFO] {self.best_path} not found, loading latest ...")
                    self.load_checkpoint()
            else:
                self.log(f"[INFO] Loading {use_checkpoint} ...")
                self.load_checkpoint(use_checkpoint)

    # ------------------------------------------------------------------ utils

    def log(self, *args, **kwargs):
        if not self.mute:
            print(*args)
        if self.log_ptr:
            print(*args, file=self.log_ptr)
            self.log_ptr.flush()

    def _mesh(self):
        """Data-parallel mesh over all available devices (1-device = no-op).

        Replaces the reference's DDP scaffolding (utils.py:589-593): the ray
        batch shards over the `data` axis and XLA all-reduces the grads.
        """
        if self._mesh_cache is None:
            from lidarnerf_tpu.parallel.sharding import make_mesh

            # "auto": shard on multi-chip TPU; explicit opt.data_parallel=True
            # forces it (e.g. for virtual-mesh testing); False disables.
            dp = getattr(self.opt, "data_parallel", "auto")
            if dp == "auto":
                dp = jax.default_backend() in ("tpu", "axon")
            n = len(jax.devices()) if dp else 1
            while n > 1 and self.train_cfg.num_rays_lidar % n != 0:
                n -= 1
            self._mesh_cache = make_mesh(n)
            if n > 1:
                from lidarnerf_tpu.parallel.sharding import replicate

                self.params = replicate(self.params, self._mesh_cache)
                self.opt_state = replicate(self.opt_state, self._mesh_cache)
                if self.ema_params is not None:
                    self.ema_params = replicate(self.ema_params, self._mesh_cache)
                self.log(f"[INFO] data-parallel over {n} devices")
        return self._mesh_cache

    def _get_step_fn(self, patch_size, masked_sampling):
        key = (_patch_tuple(patch_size), masked_sampling)
        if key not in self._step_fns:
            mesh = self._mesh()
            if mesh.devices.size > 1:
                from lidarnerf_tpu.parallel.sharding import make_sharded_train_step

                self._step_fns[key] = make_sharded_train_step(
                    self.module,
                    self.train_cfg,
                    self.render_cfg,
                    mesh,
                    patch_size=patch_size,
                    masked_sampling=masked_sampling,
                )
            else:
                self._step_fns[key] = make_train_step(
                    self.module,
                    self.train_cfg,
                    self.render_cfg,
                    patch_size=patch_size,
                    masked_sampling=masked_sampling,
                )
        return self._step_fns[key]

    def _get_epoch_fn(self, patch_size, masked_sampling):
        key = ("epoch", _patch_tuple(patch_size), masked_sampling)
        if key not in self._step_fns:
            mesh = self._mesh()
            if mesh.devices.size > 1:
                from lidarnerf_tpu.parallel.sharding import (
                    make_sharded_epoch_step,
                )

                self._step_fns[key] = make_sharded_epoch_step(
                    self.module,
                    self.train_cfg,
                    self.render_cfg,
                    mesh,
                    patch_size=patch_size,
                    masked_sampling=masked_sampling,
                )
            else:
                from lidarnerf_tpu.nerf.train_step import make_epoch_step

                self._step_fns[key] = make_epoch_step(
                    self.module,
                    self.train_cfg,
                    self.render_cfg,
                    patch_size=patch_size,
                    masked_sampling=masked_sampling,
                )
        return self._step_fns[key]

    def _device_data(self, dataset):
        arrs = dataset.device_arrays()
        if len(arrs) == 2:  # dense dataset: dummy valid tables
            poses, images = arrs
            F = poses.shape[0]
            vi = jnp.zeros((F, 1), jnp.int32)
            vc = jnp.full((F,), images.shape[1] * images.shape[2], jnp.int32)
            masked = False
        else:
            poses, images, vi, vc = arrs
            masked = True
        mesh = self._mesh()
        if mesh.devices.size > 1:
            from lidarnerf_tpu.parallel.sharding import replicate

            poses, images, vi, vc = (
                replicate(x, mesh) for x in (poses, images, vi, vc)
            )
        return poses, images, vi, vc, masked

    def _eval_params(self):
        """EMA weights for validation (utils.py:1297-1299 ema.store/copy_to).

        Note test()/save_mesh() deliberately use the raw loaded weights — the
        reference never swaps EMA there (utils.py:1084-1175, 1011-1040); the
        best checkpoint already *stores* EMA weights as the model.
        """
        return self.ema_params if self.ema_params is not None else self.params

    # ------------------------------------------------------------------ train

    def train(self, train_dataset, valid_dataset, max_epochs):
        writer = None
        if self.use_tensorboardX:
            try:
                import tensorboardX

                if is_ali_cluster() and getattr(self.opt, "cluster_summary_path", None):
                    summary_path = self.opt.cluster_summary_path
                else:
                    summary_path = os.path.join(self.workspace, "run", self.name)
                writer = tensorboardX.SummaryWriter(summary_path)
            except ImportError:
                pass
        self.writer = writer

        # optional device tracing: --profile dumps a jax.profiler trace of the
        # first profiled epoch under workspace/profile (SURVEY.md §5 tracing)
        profile_dir = getattr(self.opt, "profile", None)
        if profile_dir:
            import jax.profiler

            jax.profiler.start_trace(os.path.join(self.workspace, "profile"))
            self._profiling = True
        else:
            self._profiling = False

        change_dataloader = self.opt.change_patch_size_lidar[0] > 1
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            if change_dataloader:
                if self.epoch % self.opt.change_patch_size_epoch == 0:
                    patch = self.opt.change_patch_size_lidar
                else:
                    patch = 1
            else:
                patch = self.opt.patch_size_lidar

            self.train_one_epoch(train_dataset, patch)

            if self._profiling:
                import jax.profiler

                jax.profiler.stop_trace()
                self._profiling = False
                self.log(f"[INFO] profiler trace written to {self.workspace}/profile")

            if self.workspace is not None and (
                self.epoch % self.ckpt_interval == 0 or self.epoch == max_epochs
            ):
                self.save_checkpoint(full=True, best=False)

            if self.epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_dataset)
                self.save_checkpoint(full=False, best=True)

        if writer is not None:
            writer.close()

    def _seam_sync_fn(self, n_per_axis):
        """Cached jitted hashed-level seam projection (blockhash only)."""
        fn = getattr(self, "_seam_sync_cache", None)
        if fn is None:
            import functools

            from lidarnerf_tpu.ops.block_hash import (
                make_block_hash_spec,
                sync_hashed_seams,
            )

            # rebuild the spec from module attrs (setup()-bound attributes
            # are not reachable on the unbound module)
            spec = make_block_hash_spec(
                num_levels=self.module.num_levels,
                base_resolution=self.module.base_resolution,
                log2_hashmap_size=self.module.log2_hashmap_size,
                desired_resolution=self.module.desired_resolution,
            )

            @functools.partial(jax.jit, static_argnames=("n",))
            def _sync(table, key, n):
                return sync_hashed_seams(table, spec, key, n_per_axis=n)

            fn = self._seam_sync_cache = _sync
        return lambda table, key: fn(table, key, n=n_per_axis)

    def train_one_epoch(self, dataset, patch_size):
        lr_now = self.train_cfg.lr * 0.1 ** min(
            self.global_step / self.train_cfg.iters, 1.0
        )
        self.log(f"==> Start Training Epoch {self.epoch}, lr={lr_now:.6f} ...")
        poses, images, vi, vc, masked = self._device_data(dataset)

        order = self._np_rng.permutation(len(dataset))
        self.local_step = 0
        total_loss = 0.0
        pending = []
        t0 = time.perf_counter()
        occ_cfg = self.render_cfg.occ
        n_sync_opt = getattr(self.opt, "seam_sync_hashed", 0)
        # fused-epoch path: one lax.scan dispatch per epoch (train_step.
        # make_epoch_step single-device, parallel.make_sharded_epoch_step on
        # a mesh) — saves the measured ~25 ms/step host/tunnel dispatch
        # latency. Per-step fallback remains when the host-side hashed seam
        # sync is on (it mutates params between steps).
        fuse = bool(getattr(self.opt, "fuse_epoch", 1)) and n_sync_opt == 0
        if fuse:
            epoch_fn = self._get_epoch_fn(patch_size, masked)
            K = len(order)
            self.rng, k_epoch = jax.random.split(self.rng)
            step_keys = jax.random.split(jax.random.fold_in(k_epoch, 0), K)
            occ_keys = jax.random.split(jax.random.fold_in(k_epoch, 1), K)
            occ_in = (
                self.occ_grid
                if self.occ_grid is not None
                else jnp.zeros((1, 1, 1), jnp.float32)
            )
            self.params, self.opt_state, occ_out, ms = epoch_fn(
                self.params,
                self.opt_state,
                occ_in,
                poses,
                images,
                vi,
                vc,
                jnp.asarray(order, jnp.int32),
                step_keys,
                occ_keys,
                self.global_step,
            )
            if self.occ_grid is not None:
                self.occ_grid = occ_out
            self.global_step += K
            self.local_step = K
            ms = {k: np.asarray(v) for k, v in ms.items()}  # one D2H fetch
            pending = [
                {k: v[i] for k, v in ms.items()} for i in range(K)
            ]
        step_fn = None if fuse else self._get_step_fn(patch_size, masked)
        for frame_idx in [] if fuse else order:
            if occ_cfg is not None and self.global_step % occ_cfg.update_interval == 0:
                from lidarnerf_tpu.models.occupancy import update_occ_grid

                self.rng, sub_occ = jax.random.split(self.rng)
                self.occ_grid = update_occ_grid(
                    self.module,
                    self.params,
                    self.occ_grid,
                    sub_occ,
                    occ_cfg,
                    self.render_cfg.bound,
                )
            n_sync = getattr(self.opt, "seam_sync_hashed", 0)
            if (
                n_sync > 0
                and getattr(self.module, "encoding", "") == "blockhash"
                and self.global_step % 16 == 0
            ):
                # stochastic hard-average of duplicated hashed-level boundary
                # corners every 16 steps (ops/block_hash.sync_hashed_seams) —
                # own cadence, independent of the --fast occupancy grid;
                # dense levels have the in-forward tie (network.seam_tie)
                self.rng, sub_seam = jax.random.split(self.rng)
                table = self._seam_sync_fn(n_sync)(
                    self.params["params"]["hash_table"], sub_seam
                )
                self.params = {
                    **self.params,
                    "params": {**self.params["params"], "hash_table": table},
                }
            self.local_step += 1
            self.global_step += 1
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, m = step_fn(
                self.params,
                self.opt_state,
                poses,
                images,
                vi,
                vc,
                int(frame_idx),
                sub,
                self.global_step - 1,
                occ_grid=self.occ_grid,
            )
            pending.append(m)

        # fetch metrics once per epoch (no per-step device sync)
        losses = [float(m["loss"]) for m in pending]
        total_loss = float(np.sum(losses))
        skips = [float(m.get("skipped_nonfinite", 0.0)) for m in pending]
        if any(skips):
            bad = [
                self.global_step - len(skips) + 1 + i
                for i, s in enumerate(skips) if s
            ]
            self.log(
                f"[WARN] guarded_update skipped non-finite step(s) at global "
                f"step(s) {bad}; losses {[losses[b - (self.global_step - len(skips) + 1)] for b in bad]} "
                f"(params/opt state kept; see tools/repro_nonfinite.py)"
            )
        if self.writer is not None:
            for i, lv in enumerate(losses):
                self.writer.add_scalar(
                    "train/loss", lv, self.global_step - len(losses) + 1 + i
                )
            self.writer.add_scalar("train/lr", lr_now, self.global_step)

        if self.ema_params is not None:
            self.ema_params = ema_update(
                self.ema_params, self.params, self.ema_decay, self.ema_num_updates
            )
            self.ema_num_updates += 1

        dt = time.perf_counter() - t0
        average_loss = total_loss / max(self.local_step, 1)
        self.stats["loss"].append(average_loss)
        rays = self.local_step * self.train_cfg.num_rays_lidar
        samples = rays * (self.render_cfg.num_steps + self.render_cfg.upsample_steps)
        self.log(
            f"==> Finished Epoch {self.epoch}. loss={average_loss:.4f} "
            f"({rays / dt:.0f} rays/s, {samples / dt / 1e6:.2f}M samples/s)"
        )

    # ------------------------------------------------------------------- eval

    def evaluate(self, dataset, name=None):
        use_tb, self.use_tensorboardX = self.use_tensorboardX, False
        self.writer = None
        self.evaluate_one_epoch(dataset, name)
        self.use_tensorboardX = use_tb

    def _render_full_frame(self, params, dataset, frame_idx):
        """Staged render of all H*W rays of one frame -> numpy panos."""
        H, W = dataset.H_lidar, dataset.W_lidar
        pose = jnp.asarray(dataset.poses_lidar[frame_idx : frame_idx + 1])
        rays = get_lidar_rays(pose, dataset.intrinsics_lidar, H, W, N=-1)
        out = render_rays_staged(
            self.module,
            params,
            rays["rays_o"][0],
            rays["rays_d"][0],
            self.render_cfg,
            chunk=self.opt.max_ray_batch,
            occ_grid=self.occ_grid,
        )
        image = np.asarray(out["image"]).reshape(H, W, -1)
        depth = np.asarray(out["depth"]).reshape(H, W)
        return image[..., 0], image[..., 1], depth  # raydrop, intensity, depth

    def _criterion_means(self, pred_depth, gt_depth, pred_raydrop, gt_raydrop,
                         pred_int, gt_int):
        cfg = self.train_cfg
        cd = L.make_criterion(cfg.depth_loss, cfg.scale)
        cr = L.make_criterion(cfg.raydrop_loss, cfg.scale)
        ci = L.make_criterion(cfg.intensity_loss, cfg.scale)
        return float(
            cfg.alpha_d * np.mean(np.asarray(cd(pred_depth, gt_depth)))
            + cfg.alpha_r * np.mean(np.asarray(cr(pred_raydrop, gt_raydrop)))
            + cfg.alpha_i * np.mean(np.asarray(ci(pred_int, gt_int)))
        )

    def evaluate_one_epoch(self, dataset, name=None):
        self.log(f"++> Evaluate at epoch {self.epoch} ...")
        t_eval0 = time.perf_counter()
        if name is None:
            name = f"{self.name}_ep{self.epoch:04d}"

        for metric in self.depth_metrics:
            metric.clear()

        params = self._eval_params()
        is_mvl = getattr(self.opt, "dataloader", "kitti360") == "nerf_mvl"
        total_loss = 0.0
        self.local_step = 0

        for i in range(len(dataset)):
            self.local_step += 1
            gt = dataset.images_lidar[i]  # [H, W, 3]
            gt_raydrop = gt[..., 0].copy()

            if is_mvl:
                valid_crop = gt_raydrop != -1
                ys, xs = np.nonzero(valid_crop)
                crop_h = ys.max() - ys.min() + 1
                crop_w = xs.max() - xs.min() + 1
                valid_mask = np.where(gt_raydrop == -1, 0.0, 1.0)
                gt_raydrop = gt_raydrop * valid_mask

            gt_intensity = gt[..., 1] * gt_raydrop
            gt_depth = gt[..., 2] * gt_raydrop

            pred_raydrop, pred_intensity, pred_depth = self._render_full_frame(
                params, dataset, i
            )
            raydrop_mask = np.where(pred_raydrop > 0.5, 1.0, 0.0)
            if is_mvl:
                raydrop_mask = raydrop_mask * valid_mask
            if self.opt.alpha_r > 0 and raydrop_mask.any():
                pred_intensity = pred_intensity * raydrop_mask
                pred_depth = pred_depth * raydrop_mask

            total_loss += self._criterion_means(
                pred_depth, gt_depth, pred_raydrop, gt_raydrop,
                pred_intensity, gt_intensity,
            )

            if is_mvl:
                pi = pred_intensity[valid_crop].reshape(1, crop_h, crop_w)
                gi = gt_intensity[valid_crop].reshape(1, crop_h, crop_w)
                pd_crop = pred_depth[valid_crop].reshape(1, crop_h, crop_w)
                gd_crop = gt_depth[valid_crop].reshape(1, crop_h, crop_w)
            else:
                pi, gi = pred_intensity[None], gt_intensity[None]
                pd_crop, gd_crop = None, None
            pd, gd = pred_depth[None], gt_depth[None]

            for mi, metric in enumerate(self.depth_metrics):
                if mi < 2:  # MAE, RMSE on intensity (utils.py:1357-1359)
                    metric.update(pi, gi)
                elif is_mvl and mi == 2:  # DepthMeter on crop (utils.py:1361-1364)
                    metric.update(pd_crop, gd_crop)
                else:
                    metric.update(pd, gd)

            if self.workspace is not None:
                vdir = os.path.join(self.workspace, "validation")
                os.makedirs(vdir, exist_ok=True)
                tag = f"{name}_{self.local_step:04d}"
                rd_img = (np.where(pred_raydrop > 0.5, 1.0, 0.0) * 255).astype(np.uint8)
                it_img = (pred_intensity * 255).astype(np.uint8)
                dp_img = (pred_depth * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(vdir, f"{tag}_rarydrop.png"), rd_img)
                cv2.imwrite(
                    os.path.join(vdir, f"{tag}_intensity.png"),
                    cv2.applyColorMap(it_img, 1),
                )
                cv2.imwrite(
                    os.path.join(vdir, f"{tag}_depth.png"),
                    cv2.applyColorMap(dp_img, 9),
                )
                pred_lidar = pano_to_lidar(
                    pred_depth / self.opt.scale, dataset.intrinsics_lidar
                )
                np.save(os.path.join(vdir, f"{tag}_lidar.npy"), pred_lidar)

        average_loss = total_loss / max(self.local_step, 1)
        self.stats["valid_loss"].append(average_loss)

        if len(self.depth_metrics) > 0:
            result = self.depth_metrics[-1].measure()[0]  # Chamfer (utils.py:1429)
            self.stats["results"].append(
                result if self.best_mode == "min" else -result
            )
        else:
            self.stats["results"].append(average_loss)

        for metric in self.depth_metrics:
            self.log(metric.report())
            if self.use_tensorboardX and getattr(self, "writer", None) is not None:
                metric.write(self.writer, self.epoch, prefix="LiDAR_evaluate")
            metric.clear()

        self.log(
            f"++> Evaluate epoch {self.epoch} Finished "
            f"({time.perf_counter() - t_eval0:.1f}s, {self.local_step} frames)."
        )

    # ------------------------------------------------------------------- test

    def test(self, dataset, save_path=None, name=None, write_video=True):
        if save_path is None:
            save_path = os.path.join(self.workspace, "results")
        if name is None:
            name = f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        self.log(f"==> Start Test, save results to {save_path}")

        params = self.params  # raw/loaded weights (see _eval_params note)
        is_mvl = getattr(self.opt, "dataloader", "kitti360") == "nerf_mvl"
        all_preds, all_preds_depth = [], []

        for i in range(len(dataset)):
            pred_raydrop, pred_intensity, pred_depth = self._render_full_frame(
                params, dataset, i
            )
            raydrop_mask = np.where(pred_raydrop > 0.5, 1.0, 0.0)
            if self.opt.alpha_r > 0:
                pred_intensity = pred_intensity * raydrop_mask
                pred_depth = pred_depth * raydrop_mask

            rd_img = (raydrop_mask * 255).astype(np.uint8)
            it_img = (pred_intensity * 255).astype(np.uint8)

            pred_lidar = pano_to_lidar(
                pred_depth / self.opt.scale, dataset.intrinsics_lidar
            )
            if is_mvl:
                pred_lidar = filter_bbox_dataset(
                    pred_lidar, dataset.OBB_local[i][:, :3]
                )
            np.save(
                os.path.join(save_path, f"test_{name}_{i:04d}_depth_lidar.npy"),
                pred_lidar,
            )

            dp_img = (pred_depth * 255).astype(np.uint8)
            if write_video:
                all_preds.append(cv2.applyColorMap(it_img, 1))
                all_preds_depth.append(cv2.applyColorMap(dp_img, 9))
            else:
                cv2.imwrite(
                    os.path.join(save_path, f"test_{name}_{i:04d}_raydrop.png"),
                    rd_img,
                )
                cv2.imwrite(
                    os.path.join(save_path, f"test_{name}_{i:04d}_intensity.png"),
                    cv2.applyColorMap(it_img, 1),
                )
                cv2.imwrite(
                    os.path.join(save_path, f"test_{name}_{i:04d}_depth.png"),
                    cv2.applyColorMap(dp_img, 9),
                )

        if write_video and all_preds:
            try:
                import imageio

                imageio.mimwrite(
                    os.path.join(save_path, f"{name}_lidar_rgb.mp4"),
                    np.stack(all_preds, axis=0),
                    fps=25,
                    quality=8,
                    macro_block_size=1,
                )
                imageio.mimwrite(
                    os.path.join(save_path, f"{name}_depth.mp4"),
                    np.stack(all_preds_depth, axis=0),
                    fps=25,
                    quality=8,
                    macro_block_size=1,
                )
            except (ValueError, ImportError, OSError) as e:
                # no ffmpeg backend available: fall back to per-frame PNGs
                self.log(f"[WARN] mp4 export unavailable ({e}); writing PNG frames")
                for i, (im, dp) in enumerate(zip(all_preds, all_preds_depth)):
                    cv2.imwrite(
                        os.path.join(save_path, f"test_{name}_{i:04d}_intensity.png"), im
                    )
                    cv2.imwrite(
                        os.path.join(save_path, f"test_{name}_{i:04d}_depth.png"), dp
                    )
        self.log("==> Finished Test.")

    # ------------------------------------------------------------------- mesh

    def save_mesh(self, save_path=None, resolution=256, threshold=10):
        from lidarnerf_tpu.utils.mesh import extract_geometry, export_ply

        if save_path is None:
            save_path = os.path.join(
                self.workspace, "meshes", f"{self.name}_{self.epoch}.ply"
            )
        self.log(f"==> Saving mesh to {save_path}")
        os.makedirs(os.path.dirname(save_path), exist_ok=True)

        params = self.params  # raw/loaded weights (see _eval_params note)

        def query_func(pts):
            sigma, _ = self.module.apply(
                params, jnp.asarray(pts), method=self.module.density
            )
            return np.asarray(sigma)

        bound = self.opt.bound
        vertices, triangles = extract_geometry(
            np.full(3, -bound),
            np.full(3, bound),
            resolution=resolution,
            threshold=threshold,
            query_func=query_func,
        )
        export_ply(save_path, vertices, triangles)
        self.log("==> Finished saving mesh.")

    # ------------------------------------------------------------- checkpoint

    def _state_dict(self, full):
        state = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "stats": self.stats,
            "ema_num_updates": self.ema_num_updates,
            # PRNG streams so a resumed run continues the exact sample sequence
            "rng": np.asarray(jax.device_get(self.rng)),
            "np_rng": self._np_rng.get_state(),
        }
        state["model"] = jax.device_get(self.params)
        if self.ema_params is not None:
            state["ema"] = jax.device_get(self.ema_params)
        if self.occ_grid is not None:
            # sampling prior travels with the model (reference stores
            # density_grid in its ckpt too, dropped only for "best":
            # utils.py:1481-1506); eval-only flows never refresh it
            state["occ_grid"] = np.asarray(jax.device_get(self.occ_grid))
        if full:
            state["optimizer"] = jax.device_get(self.opt_state)
        return state

    def save_checkpoint(self, name=None, full=False, best=False, remove_old=True):
        if name is None:
            name = f"{self.name}_ep{self.epoch:04d}"

        if not best:
            file_path = f"{self.ckpt_path}/{name}.ckpt"
            if remove_old:
                self.stats["checkpoints"].append(file_path)
                if len(self.stats["checkpoints"]) > self.max_keep_ckpt:
                    checkpoint_io.remove(self.stats["checkpoints"].pop(0))
            self._atomic_dump(self._state_dict(full), file_path)
        else:
            if len(self.stats["results"]) > 0:
                if (
                    self.stats["best_result"] is None
                    or self.stats["results"][-1] < self.stats["best_result"]
                ):
                    self.log(
                        f"[INFO] New best result: {self.stats['best_result']} --> "
                        f"{self.stats['results'][-1]}"
                    )
                    self.stats["best_result"] = self.stats["results"][-1]
                    state = self._state_dict(full)
                    # best ckpt stores EMA weights as the model (utils.py:1492-1506)
                    if self.ema_params is not None:
                        state["model"] = jax.device_get(self.ema_params)
                    self._atomic_dump(state, self.best_path)
            else:
                self.log("[WARN] no evaluated results found, skip saving best checkpoint.")

    def _atomic_dump(self, state, path):
        """Atomic persist in the configured format (pickle file / orbax dir)."""
        checkpoint_io.dump_state(state, path, self.ckpt_format)

    def load_checkpoint(self, checkpoint=None, model_only=False):
        if checkpoint is None:
            ckpts = sorted(glob.glob(f"{self.ckpt_path}/{self.name}_ep*.ckpt"))
            # walk back over unreadable checkpoints (e.g. pre-atomic-write
            # files truncated by a kill): idempotent-restart contract
            while ckpts:
                checkpoint = ckpts.pop()
                if checkpoint_io.probe(checkpoint):
                    break
                self.log(f"[WARN] corrupt checkpoint {checkpoint}, skipping.")
                checkpoint = None
            if checkpoint:
                self.log(f"[INFO] Latest checkpoint is {checkpoint}")
            else:
                self.log("[WARN] No checkpoint found, model randomly initialized.")
                return

        ckpt = checkpoint_io.load_state(checkpoint)

        def to_device(tree):
            return jax.tree.map(jnp.asarray, tree)

        if "model" not in ckpt:
            self.params = to_device(ckpt)
            self.log("[INFO] loaded model.")
            return

        self.params = to_device(ckpt["model"])
        self.log("[INFO] loaded model.")
        if self.ema_params is not None and "ema" in ckpt:
            self.ema_params = to_device(ckpt["ema"])
        if self.occ_grid is not None and "occ_grid" in ckpt:
            self.occ_grid = jnp.asarray(ckpt["occ_grid"])
        if model_only:
            return

        self.stats = ckpt["stats"]
        self.epoch = ckpt["epoch"]
        self.global_step = ckpt["global_step"]
        self.ema_num_updates = ckpt.get("ema_num_updates", 0)
        if "rng" in ckpt:
            self.rng = jnp.asarray(ckpt["rng"])
        if "np_rng" in ckpt:
            self._np_rng.set_state(ckpt["np_rng"])
        self.log(f"[INFO] load at epoch {self.epoch}, global step {self.global_step}")

        if "optimizer" in ckpt:
            try:
                ref = jax.tree.structure(self.opt_state)
                self.opt_state = jax.tree.unflatten(
                    ref, [jnp.asarray(x) for x in jax.tree.leaves(ckpt["optimizer"])]
                )
                self.log("[INFO] loaded optimizer.")
            except Exception:
                self.log("[WARN] Failed to load optimizer.")
