"""CLI: train the UNet ray-drop model from collected meshing pickles.

Surface-parity wrapper over lidarnerf_tpu.lidarnvs.raydrop_unet; mirrors
/root/reference/lidarnvs/raydrop_train_poisson.py:262-354's flag surface
(epochs, batch size, lr, load, scale, amp, bilinear, classes) and its
train loop semantics (:75-259 — RMSprop + plateau-on-dice + BCE+dice,
per-epoch checkpoints). Trains from the ``{train,test}_data.pkl`` files
written by ``run.py --enable_collect_raydrop_dataset``.

Differences from the reference, by design:
- no wandb (egress-gated; epoch metrics print to stdout instead),
- ``--amp`` is accepted but a no-op: the JAX trainer runs the TPU-native
  mixed-precision policy and needs no GradScaler,
- ``--scale`` is accepted for flag parity; the reference passes it into
  train_model as ``img_scale`` where it is logged but never applied
  (raydrop_dataset_poisson.py collates full-size panos), so it is a
  no-op there too,
- ``--classes`` must be 1: the ray-drop task is single-class and the
  reference's multiclass branch is unreachable from its own pipeline.
"""
import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# Hosted TPU environments force-register the TPU backend ahead of
# JAX_PLATFORMS (sitecustomize); honour the same explicit override as
# main_lidarnerf.py so debug runs are genuinely CPU-local.
if os.environ.get("LIDARNERF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LIDARNERF_PLATFORM"])

from lidarnerf_tpu.lidarnvs.raydrop_unet import UNetRaydropTrainer


def get_args():
    parser = argparse.ArgumentParser(
        description="Train the UNet on images and target masks"
    )
    parser.add_argument(
        "--data_dir", type=str, default="N/A", help="Path to the raydrop dataset."
    )
    parser.add_argument(
        "--ckpt_dir", type=str, default="N/A", help="Path to the checkpoint directory."
    )
    parser.add_argument("--epochs", "-e", type=int, default=10, help="Number of epochs")
    parser.add_argument(
        "--batch-size", "-b", dest="batch_size", type=int, default=2, help="Batch size"
    )
    parser.add_argument(
        "--learning-rate",
        "-l",
        type=float,
        default=1e-5,
        help="Learning rate",
        dest="lr",
    )
    parser.add_argument(
        "--load", "-f", type=str, default=False, help="Load model from a .ckpt file"
    )
    parser.add_argument(
        "--scale",
        "-s",
        type=float,
        default=0.5,
        help="Downscaling factor of the images (accepted for parity; unused)",
    )
    parser.add_argument(
        "--amp", action="store_true", default=False,
        help="Use mixed precision (no-op on TPU; kept for flag parity)",
    )
    parser.add_argument(
        "--bilinear", action="store_true", default=False, help="Use bilinear upsampling"
    )
    parser.add_argument(
        "--classes", "-c", type=int, default=1, help="Number of classes"
    )
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    if args.classes != 1:
        raise SystemExit(
            "raydrop_train_poisson: only --classes 1 is supported (the ray-drop "
            "pipeline is single-class; see module docstring)"
        )

    trainer = UNetRaydropTrainer(
        n_channels=10, learning_rate=args.lr, bilinear=args.bilinear
    )
    logging.info(
        "Network:\n\t%d input channels\n\t%d output channels (classes)\n\t%s upscaling",
        trainer.model.n_channels,
        trainer.model.n_classes,
        "Bilinear" if args.bilinear else "Transposed conv",
    )
    if args.load:
        trainer.load_checkpoint(args.load)
        logging.info("Model loaded from %s", args.load)

    history = trainer.train(
        data_dir=args.data_dir,
        ckpt_dir=args.ckpt_dir,
        epochs=args.epochs,
        batch_size=args.batch_size,
    )
    if history:  # --epochs 0 is a no-op the reference CLI tolerates
        best = max(history, key=lambda h: h["dice"])
        logging.info(
            "done: %d epochs, best dice %.4f (epoch %d)",
            args.epochs, best["dice"], best["epoch"],
        )
    else:
        logging.info("done: 0 epochs, nothing trained")


if __name__ == "__main__":
    main()
