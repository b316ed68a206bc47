"""Bisect the round-4 non-finite-grad regression (A/B arms skip from ~step 140).

Round-2 soaks were clean past step 240 (VALIDATION.md); round-4's 2000-step
A/B arms skip hundreds of steps starting ~138-144 with FINITE losses and
non-finite grads. The code delta since the clean soak is the round-3 kernel
commit (quad forward + scratch-S8/MXU-scatter backward, b1a5fe7). This tool
reruns the flagship config with:

  --leaf_stats          print per-leaf non-finite grad counts at every
                        skipped step (patched guarded_update + debug.print)
  --enc {pallas,xla,pfwd_xbwd,xfwd_pbwd}
                        swap the encoder fwd/bwd implementations between the
                        Pallas kernels and XLA-equivalent math to isolate
                        which pass injects the non-finites

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bisect_nonfinite.py \
         --steps 200 --enc pfwd_xbwd --leaf_stats
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def xla_bwd_from_prep(rows, lf, g, spec):
    """XLA scatter-add twin of block_hash_pallas._bwd_from_prep (same math,
    no Pallas): grad_table[row] += lane_weights(lf) * g_lane."""
    import jax
    import jax.numpy as jnp

    Qp = lf.shape[-1]
    Q = g.shape[0]
    L, B = spec.num_levels, spec.blocks_per_level
    gp = jnp.pad(g.astype(jnp.float32), ((0, Qp - Q), (0, 0)))
    rows_l = rows.reshape(L, Qp)
    grad_table = jnp.zeros((L * B, 128), jnp.float32)
    for l in range(L):
        pos = jnp.transpose(lf[l, :4, :], (1, 0))  # [Qp, 4]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Qp, 128), 1)
        sx = (lane >> 5).astype(jnp.float32)
        sy = ((lane >> 3) & 3).astype(jnp.float32)
        sz = ((lane >> 1) & 3).astype(jnp.float32)
        w = jnp.ones((Qp, 128), jnp.float32)
        for a, s in ((0, sx), (1, sy), (2, sz)):
            p = pos[:, a : a + 1]
            w = w * jnp.maximum(1.0 - jnp.abs(s - p), 0.0)
        g_l = gp[:, 2 * l : 2 * l + 2]
        g_lane = jnp.tile(g_l, (1, 64))
        grad_table = grad_table.at[rows_l[l] + l * B].add(w * g_lane)
    return grad_table


def xla_fwd_from_prep(rows, lf, table, Q, spec):
    """XLA gather twin of block_hash_pallas._fwd_from_prep."""
    import jax
    import jax.numpy as jnp

    Qp = lf.shape[-1]
    L, B = spec.num_levels, spec.blocks_per_level
    rows_l = rows.reshape(L, Qp)
    outs = []
    for l in range(L):
        pos = jnp.transpose(lf[l, :4, :], (1, 0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (Qp, 128), 1)
        sx = (lane >> 5).astype(jnp.float32)
        sy = ((lane >> 3) & 3).astype(jnp.float32)
        sz = ((lane >> 1) & 3).astype(jnp.float32)
        w = jnp.ones((Qp, 128), jnp.float32)
        for a, s in ((0, sx), (1, sy), (2, sz)):
            p = pos[:, a : a + 1]
            w = w * jnp.maximum(1.0 - jnp.abs(s - p), 0.0)
        r = jnp.take(table, rows_l[l] + l * B, axis=0)  # [Qp, 128]
        prod = r * w
        even = jnp.sum(prod * ((lane & 1) == 0), axis=1)
        odd = jnp.sum(prod * ((lane & 1) == 1), axis=1)
        outs.append(jnp.stack([even, odd], axis=1))
    return jnp.concatenate(outs, axis=1)[:Q]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data_synth_drive")
    ap.add_argument("--steps", type=int, default=200,
                    help="steps to actually run")
    ap.add_argument("--iters_total", type=int, default=None,
                    help="iters value for the LR schedule (defaults to "
                    "--steps; set 2000 to replicate the A/B arms)")
    ap.add_argument("--enc", default="pallas",
                    choices=["pallas", "xla", "pfwd_xbwd", "xfwd_pbwd"])
    ap.add_argument("--leaf_stats", action="store_true")
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.enc != "pallas":
        from lidarnerf_tpu.ops import block_hash_pallas as bhp

        if args.enc in ("xla", "pfwd_xbwd"):
            bhp.encode_bwd_from_prep = xla_bwd_from_prep
            bhp._bwd_from_prep = xla_bwd_from_prep
        if args.enc in ("xla", "xfwd_pbwd"):
            bhp.encode_fwd_from_prep = xla_fwd_from_prep
            bhp._fwd_from_prep = xla_fwd_from_prep
        print(f"[bisect] encoder arm: {args.enc}", flush=True)

    METRIC_LOG = []
    if args.leaf_stats:
        # The tunneled (axon) backend has no host-callback support, so leaf
        # stats ride in the step's metrics dict instead of debug.print: wrap
        # make_train_step with a twin whose metrics include per-leaf
        # non-finite grad counts + max-abs, and log every step's metrics.
        from functools import partial
        from lidarnerf_tpu.nerf import train_step as ts

        def make_step_leafstats(module, cfg, render_cfg, patch_size=1,
                                masked_sampling=False,
                                sample_without_replacement=False):
            optimizer = ts.make_optimizer(cfg)
            loss_fn = ts.make_loss_fn(
                module, cfg, render_cfg, patch_size, masked_sampling,
                sample_without_replacement,
            )

            @partial(jax.jit, donate_argnums=(0, 1))
            def step_fn(params, opt_state, poses, images, valid_idx,
                        valid_counts, frame_idx, key, step, occ_grid=None):
                pose = jnp.take(poses, frame_idx, axis=0)
                image_flat = jnp.take(images, frame_idx, axis=0).reshape(
                    -1, images.shape[-1]
                )
                vi = jnp.take(valid_idx, frame_idx, axis=0)
                vc = jnp.take(valid_counts, frame_idx, axis=0)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, pose, image_flat, vi, vc, key, occ_grid)
                params, opt_state, finite = ts.guarded_update(
                    optimizer, params, opt_state, grads, loss
                )
                metrics = {
                    "loss": loss, **aux,
                    "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
                }
                flat, _ = jax.tree_util.tree_flatten_with_path(grads)
                for kp, g in flat:
                    nm = jax.tree_util.keystr(kp)
                    metrics[f"nf{nm}"] = jnp.sum(~jnp.isfinite(g))
                    metrics[f"ma{nm}"] = jnp.max(jnp.abs(g))
                return params, opt_state, metrics

            return step_fn

        import lidarnerf_tpu.nerf.trainer as tr_mod

        tr_mod.make_train_step = make_step_leafstats

        orig_epoch = tr_mod.Trainer.train_one_epoch

        def logged_epoch(self, dataset, patch):
            n0 = self.global_step
            orig = self._get_step_fn

            def capture(*a, **k):
                fn = orig(*a, **k)

                def wrapped(*sa, **sk):
                    p, o, m = fn(*sa, **sk)
                    METRIC_LOG.append(m)
                    return p, o, m

                return wrapped

            self._get_step_fn = capture
            try:
                return orig_epoch(self, dataset, patch)
            finally:
                self._get_step_fn = orig

        tr_mod.Trainer.train_one_epoch = logged_epoch
        print("[bisect] leaf-stats step patched in", flush=True)

    import main_lidarnerf as cli
    from lidarnerf_tpu.nerf.trainer import Trainer

    parser = cli.get_arg_parser()
    opt = parser.parse_args([
        "--config", "configs/kitti360_1908.txt",
        "--path", args.data,
        "--workspace", "/tmp/bisect_ws",
        "--iters", str(args.iters_total or args.steps),
        "--eval_interval", "100000",
        "--scale", "0.009913937624654217",
        "--offset", "28.67044005924491", "0.0", "2.154948902130127",
        "--ckpt", "scratch",
    ] + (["--fast"] if args.fast else []))
    opt.enable_lidar = True
    if opt.fast:
        opt.occ_sampling = True
        opt.num_steps = min(opt.num_steps, 192)
    opt.min_near = opt.scale
    opt.min_near_lidar = opt.scale

    shutil.rmtree("/tmp/bisect_ws", ignore_errors=True)
    model = cli.build_model(opt)
    train_dataset = cli.build_dataset(opt, "train")
    opt.H_lidar = train_dataset.H_lidar
    opt.W_lidar = train_dataset.W_lidar
    opt.intrinsics_lidar = train_dataset.intrinsics_lidar

    trainer = Trainer(
        "lidar_nerf", opt, model, workspace="/tmp/bisect_ws",
        depth_metrics=[], ema_decay=0.95, use_checkpoint="scratch",
        use_tensorboardX=False,
    )

    steps_per_epoch = len(train_dataset)
    n_epochs = max(1, -(-args.steps // steps_per_epoch))
    change = opt.change_patch_size_lidar[0] > 1
    for epoch in range(1, n_epochs + 1):
        trainer.epoch = epoch
        patch = (
            opt.change_patch_size_lidar
            if change and epoch % opt.change_patch_size_epoch == 0
            else 1
        )
        trainer.train_one_epoch(train_dataset, patch)
        if args.leaf_stats:
            base = trainer.global_step - len(METRIC_LOG)
            for i, m in enumerate(METRIC_LOG):
                if float(m["skipped_nonfinite"]) > 0:
                    bad = {
                        k[2:]: int(m[k]) for k in m
                        if k.startswith("nf") and int(m[k]) > 0
                    }
                    mx = {
                        k[2:]: float(m[k]) for k in m
                        if k.startswith("ma")
                        and not np.isfinite(float(m[k]))
                    }
                    print(
                        f"[leafstats] step {base + i + 1}: loss "
                        f"{float(m['loss']):.4f} nonfinite {bad} "
                        f"inf-max {sorted(mx)}",
                        flush=True,
                    )
            METRIC_LOG.clear()
    print("[bisect] run complete", flush=True)


if __name__ == "__main__":
    main()
