"""Forensics for the step-~170 non-finite transient (VALIDATION.md, TODO.md).

The rebuild is bitwise deterministic (tests/test_determinism.py), so the
round-1 event reproduces exactly: same synthetic drive (seed 0), same config,
same PRNG stream. This tool runs the flagship KITTI config over the failing
step range on the real chip, in one of two arms:

  --noclip: trunc_exp forward clip at 80 DISABLED (the round-1 pre-fix
      behaviour, patched in-process). Expected: guarded_update reports
      skipped non-finite step(s) in the ~90-300 range, with the density
      probe showing the max sigma crossing the f32 exp overflow regime.
  default: the shipped clip. Expected: zero skipped steps over the same
      range, probe saturating at (or staying below) logit 80.

If the default arm skips any step, there is a second NaN source beyond the
pre-clip overflow; the logged global step + deterministic PRNG stream make
it attackable. The probe evaluates max density over a fixed point batch
after every epoch (outside the training stream, so it perturbs nothing).

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/repro_nonfinite.py --steps 320
  PYTHONPATH=/root/repo:/root/.axon_site python tools/repro_nonfinite.py --steps 320 --noclip
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data_synth_drive")
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--noclip", action="store_true",
                    help="disable the trunc_exp forward clip (round-1 behaviour)")
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.noclip:
        # patch the forward clip out BEFORE the network module binds the name
        from lidarnerf_tpu.ops import activation as act

        @jax.custom_jvp
        def trunc_exp_noclip(x):
            return jnp.exp(jnp.asarray(x, jnp.float32))

        @trunc_exp_noclip.defjvp
        def _jvp(primals, tangents):
            (x,) = primals
            (dx,) = tangents
            x = jnp.asarray(x, jnp.float32)
            return jnp.exp(x), jnp.asarray(dx, jnp.float32) * jnp.exp(
                jnp.clip(x, -15.0, 15.0)
            )

        act.trunc_exp = trunc_exp_noclip
        import lidarnerf_tpu.models.network as network

        network.trunc_exp = trunc_exp_noclip
        print("[forensics] trunc_exp forward clip DISABLED", flush=True)

    import main_lidarnerf as cli
    from lidarnerf_tpu.nerf.trainer import Trainer

    parser = cli.get_arg_parser()
    opt = parser.parse_args([
        "--config", "configs/kitti360_1908.txt",
        "--path", args.data,
        "--workspace", "/tmp/nonfinite_ws",
        "--iters", str(args.steps),
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

    shutil.rmtree("/tmp/nonfinite_ws", ignore_errors=True)
    model = cli.build_model(opt)
    train_dataset = cli.build_dataset(opt, "train")
    opt.H_lidar = train_dataset.H_lidar
    opt.W_lidar = train_dataset.W_lidar
    opt.intrinsics_lidar = train_dataset.intrinsics_lidar

    trainer = Trainer(
        "lidar_nerf", opt, model, workspace="/tmp/nonfinite_ws",
        depth_metrics=[], ema_decay=0.95, use_checkpoint="scratch",
        use_tensorboardX=False,
    )

    module = trainer.module
    probe_x = jnp.asarray(
        np.random.RandomState(7).rand(8192, 3).astype(np.float32) * 2 - 1
    )

    @jax.jit
    def probe(params):
        sigma, _ = module.apply(params, probe_x, method=module.density)
        return jnp.max(sigma)

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
        s = float(probe(trainer.params))
        logit = float(np.log(s)) if np.isfinite(s) and s > 0 else float("inf")
        flag = ""
        if not np.isfinite(s):
            flag = "  << OVERFLOWED (inf sigma)"
        elif logit > 78.0:
            flag = "  << at/near the clip boundary"
        print(
            f"[probe] epoch {epoch} (global step {trainer.global_step}): "
            f"max sigma {s:.3e} (logit {logit:.2f}){flag}",
            flush=True,
        )
    print("[forensics] run complete", flush=True)


if __name__ == "__main__":
    main()
