"""Fused training step: ray sampling -> render -> loss stack -> optax update.

The reference splits one optimisation step across host collate
(kitti360_dataset.py:123-159), renderer.run, Trainer.train_step loss code
(utils.py:697-876) and torch AMP/optimizer plumbing (utils.py:1206-1226). Here
the whole thing is ONE jitted program per (patch-size, dataset) configuration:
pixel sampling, ray generation, both density passes, compositing, the
alpha_d/alpha_r/alpha_i losses, the patch-based structural regularisers, and
the Adam update all compile together, so each step is a single device launch
with no host round-trips.

Loss-stack parity map (all vs utils.py:697-876):
- gt_raydrop/gt_intensity/gt_depth construction           :712-714
- pred masking by gt_raydrop                              :726-728
- weighted depth/raydrop/intensity criteria               :729-734
- patch reshape + /scale                                  :760-766
- sobel vs finite-difference gradients                    :767-794
- grad_norm_smooth / spatial_smooth / tv_loss             :799-812
- grad_loss with 0.01 gt-gradient clip mask and
  raydrop gating (x-gradient only; cos variant 1-cos)     :814-876
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from lidarnerf_tpu.dataset.base import rays_from_indices, sample_ray_indices
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays
from lidarnerf_tpu.ops import losses as L


@dataclass(frozen=True)
class TrainConfig:
    # loss weights (main_lidarnerf.py:46-52)
    alpha_d: float = 1e3
    alpha_r: float = 1.0
    alpha_i: float = 1.0
    alpha_grad_norm: float = 1.0
    alpha_spatial: float = 0.1
    alpha_tv: float = 1.0
    alpha_grad: float = 1e2
    # loss selection
    depth_loss: str = "l1"
    depth_grad_loss: str = "l1"
    intensity_loss: str = "mse"
    raydrop_loss: str = "mse"
    # structural regularizer switches
    spatial_smooth: bool = False
    grad_norm_smooth: bool = False
    tv_loss: bool = False
    grad_loss: bool = False
    sobel_grad: bool = False
    # geometry / sampling
    scale: float = 1.0
    num_rays_lidar: int = 4096
    H_lidar: int = 66
    W_lidar: int = 1030
    intrinsics_lidar: tuple = (2.0, 26.9)
    # optimisation (main_lidarnerf.py:389-410)
    lr: float = 1e-2
    iters: int = 30000
    ema_decay: float = 0.95
    # blockhash seam-consistency regularizer (ops/block_hash.py
    # block_hash_seam_loss) — a TPU-layout extra, 0 = off
    alpha_seam: float = 0.0


import numpy as _np

_SOBEL_X = _np.array(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], _np.float32
)
_SOBEL_Y = _np.array(
    [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], _np.float32
)


def _conv2d_same(img, kernel):
    """[P, 1, H, W] conv with 3x3 kernel, padding=1 (F.conv2d equivalent).

    torch's conv2d is cross-correlation — no kernel flip.
    """
    return jax.lax.conv_general_dilated(
        img,
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def make_optimizer(cfg: TrainConfig):
    """Adam(b=(0.9,0.99), eps=1e-15) with 0.1**(it/iters) decay, per-step.

    Matches main_lidarnerf.py:389-410 + scheduler_update_every_step=True.
    """
    schedule = lambda step: cfg.lr * 0.1 ** jnp.minimum(step / cfg.iters, 1.0)
    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.99, eps=1e-15)


def lidar_losses(cfg: TrainConfig, pred_depth, pred_image, gt):
    """Depth/raydrop/intensity loss terms [N] plus masked preds for metrics."""
    crit_d = L.make_criterion(cfg.depth_loss, cfg.scale)
    crit_r = L.make_criterion(cfg.raydrop_loss, cfg.scale)
    crit_i = L.make_criterion(cfg.intensity_loss, cfg.scale)

    gt_raydrop = gt[..., 0]
    gt_intensity = gt[..., 1] * gt_raydrop
    gt_depth = gt[..., 2] * gt_raydrop

    pred_raydrop = pred_image[..., 0]
    pred_intensity = pred_image[..., 1] * gt_raydrop
    pred_depth = pred_depth * gt_raydrop

    lidar_loss = (
        cfg.alpha_d * crit_d(pred_depth, gt_depth)
        + cfg.alpha_r * crit_r(pred_raydrop, gt_raydrop)
        + cfg.alpha_i * crit_i(pred_intensity, gt_intensity)
    )
    return lidar_loss, pred_depth, gt_depth, gt_raydrop


def patch_regularizers(cfg: TrainConfig, patch_size, pred_depth, gt_depth, gt_raydrop):
    """Structural losses over [N] = P*px*py patch-flattened depths (utils.py:748-876)."""
    if isinstance(patch_size, int):
        px, py = patch_size, patch_size
    elif len(patch_size) == 1:
        px, py = patch_size[0], patch_size[0]
    else:
        px, py = patch_size
    if px <= 1:
        return 0.0

    d = pred_depth.reshape(-1, px, py, 1).transpose(0, 3, 1, 2) / cfg.scale  # [P,1,px,py]

    if cfg.sobel_grad:
        pred_gx = _conv2d_same(d, _SOBEL_X)
        pred_gy = _conv2d_same(d, _SOBEL_Y)
    else:
        pred_gy = jnp.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
        pred_gx = jnp.abs(d[:, :, :, :-1] - d[:, :, :, 1:])

    dy = jnp.abs(pred_gy)
    dx = jnp.abs(pred_gx)

    loss = 0.0
    if cfg.grad_norm_smooth:
        loss += cfg.alpha_grad_norm * (jnp.mean(jnp.exp(-dx)) + jnp.mean(jnp.exp(-dy)))
    if cfg.spatial_smooth:
        loss += cfg.alpha_spatial * (jnp.mean(dx**2) + jnp.mean(dy**2))
    if cfg.tv_loss:
        loss += cfg.alpha_tv * (jnp.mean(dx) + jnp.mean(dy))

    if cfg.grad_loss:
        g = gt_depth.reshape(-1, px, py, 1).transpose(0, 3, 1, 2) / cfg.scale
        rd = gt_raydrop.reshape(-1, px, py, 1).transpose(0, 3, 1, 2)
        if cfg.sobel_grad:
            gt_gy = _conv2d_same(g, _SOBEL_Y)
            gt_gx = _conv2d_same(g, _SOBEL_X)
        else:
            gt_gy = g[:, :, :-1, :] - g[:, :, 1:, :]  # signed (utils.py:851-852)
            gt_gx = g[:, :, :, :-1] - g[:, :, :, 1:]

        grad_mask_x = jnp.where(jnp.abs(gt_gx) < 0.01, 1.0, 0.0)
        grad_mask_y = jnp.where(jnp.abs(gt_gy) < 0.01, 1.0, 0.0)
        if cfg.sobel_grad:
            mask_dx = rd * grad_mask_x
        else:
            mask_dx = rd[:, :, :, :-1] * grad_mask_x
        del grad_mask_y  # reference computes but only uses x (utils.py:865-876)

        crit_g = L.make_criterion(cfg.depth_grad_loss, cfg.scale)
        if cfg.depth_grad_loss == "cos":
            P = pred_gx.shape[0]
            grad_loss = 1.0 - crit_g(
                (pred_gx * mask_dx).reshape(P, -1), (gt_gx * mask_dx).reshape(P, -1)
            )
        else:
            grad_loss = crit_g(pred_gx * mask_dx, gt_gx * mask_dx)
        loss += cfg.alpha_grad * jnp.mean(grad_loss)
    return loss


def make_loss_fn(
    module,
    cfg: TrainConfig,
    render_cfg: RenderConfig,
    patch_size: Any = 1,
    masked_sampling: bool = False,
    sample_without_replacement: bool = False,
    constrain=None,
):
    """Build the per-step loss closure shared by the single-device and
    data-parallel step factories.

    ONE implementation of the full feature matrix (pixel sampling incl. the
    without-replacement option, rendering, loss stack, seam regularizer,
    metrics) so the two step builders cannot drift — the reference's DDP path
    rotted precisely because it was a second code path (utils.py:1326-1350).

    `constrain`, when given, is applied to every ray-batch-shaped array right
    after it is formed (the sharded builder passes a data-axis
    with_sharding_constraint; single-device passes nothing).
    """
    H, W = cfg.H_lidar, cfg.W_lidar
    N = cfg.num_rays_lidar
    patch_tuple = tuple(patch_size) if not isinstance(patch_size, int) else patch_size
    if constrain is None:
        constrain = lambda x: x

    seam_active = (
        getattr(cfg, "alpha_seam", 0.0) > 0.0
        and getattr(module, "encoding", None) == "blockhash"
    )
    if seam_active:
        from lidarnerf_tpu.ops import block_hash as _bh

        seam_spec = _bh.make_block_hash_spec(
            num_levels=module.num_levels,
            base_resolution=module.base_resolution,
            log2_hashmap_size=module.log2_hashmap_size,
            desired_resolution=module.desired_resolution,
        )

    def loss_fn(params, pose, image_flat, valid_idx_f, valid_count_f, key, occ_grid):
        if seam_active:
            # 3-way split only when active so the default path's RNG stream
            # (and hence any bitwise-reproducibility baseline) is unchanged
            key, k_seam = jax.random.split(key)
        k_pix, k_render = jax.random.split(key)
        if masked_sampling and sample_without_replacement:
            # reference-exact semantics (nerfmvl_dataset.py:153-168 uses a
            # randperm, i.e. WITHOUT replacement) via static-shape
            # gumbel-top-k: perturb every pool slot with a gumbel key, mask
            # padding slots to -inf, keep the N best. Measured immaterial vs
            # the with-replacement default at MVL pool sizes
            # (tests/test_train.py::TestSamplingReplacement) — kept as an
            # option for exactness studies.
            pool = valid_idx_f.shape[0]
            if pool < N:
                raise ValueError(
                    "sample_without_replacement needs a valid-index pool of at "
                    f"least num_rays_lidar slots (pool={pool} < N={N})"
                )
            g = jax.random.gumbel(k_pix, (pool,))
            g = jnp.where(jnp.arange(pool) < valid_count_f, g, -jnp.inf)
            _, top = jax.lax.top_k(g, N)
            # if the frame has fewer than N valid pixels, top_k exhausts the
            # valid slots and starts returning -inf padding positions — remap
            # those to with-replacement draws over the valid prefix so padding
            # pixel indices are never trained on
            vc = jnp.maximum(valid_count_f, 1)
            top = jnp.where(top < vc, top, top % vc)
            inds = jnp.take(valid_idx_f, top)
        elif masked_sampling:
            draws = jax.random.randint(k_pix, (N,), 0, valid_count_f)
            inds = jnp.take(valid_idx_f, draws)
        else:
            inds = sample_ray_indices(k_pix, H, W, N, patch_tuple)
        inds = constrain(inds)
        gt = constrain(jnp.take(image_flat, inds, axis=0))  # [N, 3]
        rays_o, rays_d = rays_from_indices(pose, inds, H, W, cfg.intrinsics_lidar)
        rays_o, rays_d = constrain(rays_o), constrain(rays_d)

        out = render_rays(
            module, params, rays_o, rays_d, k_render, render_cfg, True, occ_grid
        )
        lidar_loss, pred_depth_m, gt_depth, gt_raydrop = lidar_losses(
            cfg, out["depth"], out["image"], gt
        )
        loss = jnp.mean(lidar_loss)
        loss += patch_regularizers(cfg, patch_tuple, pred_depth_m, gt_depth, gt_raydrop)
        if seam_active:
            loss += cfg.alpha_seam * _bh.block_hash_seam_loss(
                params["params"]["hash_table"], seam_spec, k_seam
            )
        aux = {
            "depth_mae": jnp.mean(jnp.abs(pred_depth_m - gt_depth)),
            "raydrop_err": jnp.mean(jnp.abs(out["image"][..., 0] - gt_raydrop)),
        }
        return loss, aux

    return loss_fn


def guarded_update(optimizer, params, opt_state, grads, loss):
    """Apply an optimizer update unless loss/grads contain non-finite values.

    GradScaler-equivalent non-finite guard (the reference's AMP scaler.step
    silently skips the update when grads contain inf/nan, utils.py:1221-1223):
    a rare non-finite step must not poison the parameters. Forensics of one
    such event showed small, healthy params with fully-NaN sigma-path grads —
    a transient, not a blowup. Note one deliberate divergence: on a skipped
    step the optax schedule count rolls back with the opt_state, whereas the
    reference's LambdaLR steps regardless (utils.py:1225) — immaterial at
    observed skip rates (~1 step / 30k).

    Returns (params, opt_state, finite) where finite is a traced bool.
    """
    finite = jnp.isfinite(loss)
    for g in jax.tree.leaves(grads):
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    params = jax.tree.map(lambda n, o: jnp.where(finite, n, o), new_params, params)
    opt_state = jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state
    )
    return params, opt_state, finite


def make_train_step(
    module,
    cfg: TrainConfig,
    render_cfg: RenderConfig,
    patch_size: Any = 1,
    masked_sampling: bool = False,
    sample_without_replacement: bool = False,
):
    """Build the jitted train step for one (patch_size, sampling-mode) config.

    Returned step signature:
        step_fn(params, opt_state, poses, images, valid_idx, valid_counts,
                frame_idx, key, step)
            -> (params, opt_state, metrics dict)

    poses: [F,4,4]; images: [F,H,W,3] resident on device; valid_idx/
    valid_counts: [F,P]/[F] for NeRF-MVL masked sampling (pass zeros+HW for
    dense datasets); frame_idx/step: traced scalars.
    """
    optimizer = make_optimizer(cfg)
    loss_fn = make_loss_fn(
        module, cfg, render_cfg, patch_size, masked_sampling,
        sample_without_replacement,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(
        params,
        opt_state,
        poses,
        images,
        valid_idx,
        valid_counts,
        frame_idx,
        key,
        step,
        occ_grid=None,
    ):
        pose = jnp.take(poses, frame_idx, axis=0)
        image_flat = jnp.take(images, frame_idx, axis=0).reshape(-1, images.shape[-1])
        vi = jnp.take(valid_idx, frame_idx, axis=0)
        vc = jnp.take(valid_counts, frame_idx, axis=0)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pose, image_flat, vi, vc, key, occ_grid
        )
        params, opt_state, finite = guarded_update(
            optimizer, params, opt_state, grads, loss
        )
        metrics = {
            "loss": loss,
            **aux,
            "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
        }
        return params, opt_state, metrics

    return step_fn


def make_epoch_step(
    module,
    cfg: TrainConfig,
    render_cfg: RenderConfig,
    patch_size: Any = 1,
    masked_sampling: bool = False,
    sample_without_replacement: bool = False,
):
    """Build a jitted FUSED-EPOCH step: `lax.scan` over a whole epoch's
    (frame, key) arrays — K optimisation steps (plus the occupancy-grid
    refreshes that fall inside them, via `lax.cond` on the step counter) in
    ONE device dispatch.

    Why: the per-step dispatch path costs ~25 ms/step of host/tunnel latency
    at the flagship config (measured round 5: 136 ms compiled step vs 167 ms
    observed per-step wall in the trainer loop) — with 16-step epochs that is
    ~18% of training wall-clock. The reference cannot fuse this way (its loop
    interleaves host-side dataloader work per step, utils.py:1195-1230); the
    static-shape design here makes the epoch a pure function of
    (params, opt, occ_grid, frame_order, keys).

    Returned signature:
        epoch_fn(params, opt_state, occ_grid, poses, images, valid_idx,
                 valid_counts, frame_order [K], step_keys [K], occ_keys [K],
                 step0)
            -> (params, opt_state, occ_grid, metrics dict of [K]-stacked)

    `occ_grid` must be a concrete array; pass a dummy (and it is returned
    unchanged) when render_cfg.occ is None. PRNG: the trainer derives the
    per-epoch key arrays from its checkpointed stream, so kill/resume at an
    epoch boundary replays bitwise, same as the per-step path (its stream
    differs from the per-step path's — the two modes are internally, not
    mutually, reproducible).
    """
    optimizer = make_optimizer(cfg)
    loss_fn = make_loss_fn(
        module, cfg, render_cfg, patch_size, masked_sampling,
        sample_without_replacement,
    )
    occ_cfg = render_cfg.occ

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_fn(
        params,
        opt_state,
        occ_grid,
        poses,
        images,
        valid_idx,
        valid_counts,
        frame_order,
        step_keys,
        occ_keys,
        step0,
    ):
        def body(carry, xs):
            params, opt_state, occ_grid = carry
            fi, key, okey, step = xs
            if occ_cfg is not None:
                from lidarnerf_tpu.models.occupancy import update_occ_grid

                occ_grid = jax.lax.cond(
                    step % occ_cfg.update_interval == 0,
                    lambda g: update_occ_grid(
                        module, params, g, okey, occ_cfg, render_cfg.bound
                    ),
                    lambda g: g,
                    occ_grid,
                )
                grid_in = occ_grid
            else:
                grid_in = None
            pose = jnp.take(poses, fi, axis=0)
            image_flat = jnp.take(images, fi, axis=0).reshape(
                -1, images.shape[-1]
            )
            vi = jnp.take(valid_idx, fi, axis=0)
            vc = jnp.take(valid_counts, fi, axis=0)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, pose, image_flat, vi, vc, key, grid_in
            )
            params, opt_state, finite = guarded_update(
                optimizer, params, opt_state, grads, loss
            )
            metrics = {
                "loss": loss,
                **aux,
                "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
            }
            return (params, opt_state, occ_grid), metrics

        K = frame_order.shape[0]
        steps = step0 + jnp.arange(K, dtype=jnp.int32)
        (params, opt_state, occ_grid), ms = jax.lax.scan(
            body, (params, opt_state, occ_grid), (frame_order, step_keys, occ_keys, steps)
        )
        return params, opt_state, occ_grid, ms

    return epoch_fn


def ema_update(ema_params, params, decay, num_updates):
    """torch_ema semantics: effective decay = min(decay, (1+n)/(10+n))."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema_params, params)
