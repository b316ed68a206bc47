"""UNet ray-drop trainer for the meshing baselines (JAX/optax).

Rebuild of /root/reference/lidarnvs/raydrop_train_poisson.py:75-259 and
raydrop_dataset_poisson.py:8-67:

- pickle-backed dataset of per-frame feature dicts, collated into a
  10-channel image (hit_mask, hit_depth, hit_normal xyz, incidence,
  intensity, ray_dir xyz) + binary ray-drop target,
- RMSprop(momentum=0.999, weight_decay=1e-8) with gradient clipping 1.0,
- BCE-with-logits + dice loss, ReduceLROnPlateau(max, patience=5) on the
  validation dice score,
- per-epoch checkpoints.

NHWC layout (TPU conv native) instead of torch's NCHW; the collate produces
channels-last directly.
"""

import os
import pickle
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from lidarnerf_tpu.lidarnvs.unet import UNet, dice_coeff, dice_loss
from lidarnerf_tpu.ops.losses import bce_with_logits


class RaydropDataset:
    """Pickle-backed per-frame dataset (raydrop_dataset_poisson.py:8-67)."""

    def __init__(self, data_dir, split):
        self.data_dir = Path(data_dir)
        if split not in ("train", "test"):
            raise ValueError(f"Split {split} not supported.")
        pkl_path = self.data_dir / f"{split}_data.pkl"
        if not pkl_path.is_file():
            raise ValueError(f"File {pkl_path} does not exist.")
        with open(pkl_path, "rb") as f:
            self.raydrop_data = pickle.load(f)

    def __len__(self):
        return len(self.raydrop_data)

    def __getitem__(self, idx):
        return self.raydrop_data[idx]

    @staticmethod
    def collate(samples):
        """list of frame dicts -> (images [N,H,W,10], masks [N,H,W])."""
        def stack(key):
            return np.stack([np.asarray(s[key]) for s in samples])

        images = np.concatenate(
            [
                stack("hit_masks")[..., None],
                stack("hit_depths")[..., None],
                stack("hit_normals"),
                stack("hit_incidences")[..., None],
                stack("intensities")[..., None],
                stack("rays_d"),
            ],
            axis=3,
        ).astype(np.float32)
        masks = stack("raydrop_masks").astype(np.float32)
        return images, masks


class ReduceLROnPlateau:
    """torch-equivalent plateau scheduler (mode='max', factor=0.1)."""

    def __init__(self, factor=0.1, patience=5, mode="max"):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric):
        better = self.best is None or (
            metric > self.best if self.mode == "max" else metric < self.best
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


class UNetRaydropTrainer:
    def __init__(
        self,
        n_channels=10,
        learning_rate=1e-5,
        weight_decay=1e-8,
        momentum=0.999,
        gradient_clipping=1.0,
        seed=0,
        bilinear=False,
    ):
        self.model = UNet(n_channels=n_channels, n_classes=1, bilinear=bilinear)
        self.lr = learning_rate
        self.plateau = ReduceLROnPlateau()
        self._lr_scale = 1.0

        dummy = jnp.zeros((1, 32, 64, n_channels))
        variables = self.model.init(jax.random.PRNGKey(seed), dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]

        # lr=1.0 here; the actual (plateau-scaled) lr multiplies the updates in
        # the step — exactly torch RMSprop's p -= lr * buf semantics, so the
        # momentum buffer stays lr-independent across plateau drops
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(gradient_clipping),
            optax.rmsprop(1.0, momentum=momentum, decay=0.99),
        )
        # torch RMSprop applies weight decay as L2 into the gradient
        self.weight_decay = weight_decay
        self.opt_state = self.optimizer.init(self.params)
        self._step = self._build_step()
        self._eval = self._build_eval()

    def _build_step(self):
        model = self.model
        optimizer = self.optimizer
        wd = self.weight_decay

        def loss_fn(params, batch_stats, images, masks):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            logits = logits[..., 0]  # [N, H, W]
            loss = jnp.mean(bce_with_logits(logits, masks))
            loss += dice_loss(jax.nn.sigmoid(logits), masks)
            return loss, mutated["batch_stats"]

        lr = self.lr

        @jax.jit
        def step(params, batch_stats, opt_state, images, masks, lr_scale):
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, images, masks
            )
            grads = jax.tree.map(lambda g, p: g + wd * p, grads, params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * (lr * lr_scale), updates)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        return step

    def _build_eval(self):
        model = self.model

        @jax.jit
        def evaluate(params, batch_stats, images, masks):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, images, train=False
            )[..., 0]
            pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
            return dice_coeff(pred, masks, reduce_batch_first=False)

        return evaluate

    def train(self, data_dir, ckpt_dir, epochs=5, batch_size=1, verbose=True):
        train_ds = RaydropDataset(data_dir, "train")
        test_ds = RaydropDataset(data_dir, "test")
        rng = np.random.RandomState(0)
        os.makedirs(ckpt_dir, exist_ok=True)
        history = []
        for epoch in range(1, epochs + 1):
            order = rng.permutation(len(train_ds))
            epoch_loss = 0.0
            n_batches = 0
            for start in range(0, len(order), batch_size):
                idxs = order[start : start + batch_size]
                images, masks = RaydropDataset.collate([train_ds[i] for i in idxs])
                self.params, self.batch_stats, self.opt_state, loss = self._step(
                    self.params,
                    self.batch_stats,
                    self.opt_state,
                    jnp.asarray(images),
                    jnp.asarray(masks),
                    self._lr_scale,
                )
                epoch_loss += float(loss)
                n_batches += 1

            dice = self.evaluate(test_ds, batch_size)
            self._lr_scale = self.plateau.step(dice)
            history.append({"epoch": epoch, "loss": epoch_loss / n_batches, "dice": dice})
            if verbose:
                print(f"[unet-raydrop] epoch {epoch}: loss {epoch_loss/n_batches:.4f} dice {dice:.4f}")
            self.save_checkpoint(os.path.join(ckpt_dir, f"checkpoint_epoch{epoch}.ckpt"))
        return history

    def evaluate(self, dataset, batch_size=1):
        scores = []
        for start in range(0, len(dataset), batch_size):
            images, masks = RaydropDataset.collate(
                [dataset[i] for i in range(start, min(start + batch_size, len(dataset)))]
            )
            scores.append(
                float(self._eval(self.params, self.batch_stats, jnp.asarray(images), jnp.asarray(masks)))
            )
        return float(np.mean(scores)) if scores else 0.0

    def predict(self, images):
        """images [N, H, W, 10] -> raydrop probability [N, H, W]."""
        logits = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            jnp.asarray(images),
            train=False,
        )[..., 0]
        return np.asarray(jax.nn.sigmoid(logits))

    def save_checkpoint(self, path):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "params": jax.device_get(self.params),
                    "batch_stats": jax.device_get(self.batch_stats),
                },
                f,
            )

    def load_checkpoint(self, path):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, ckpt["params"])
        self.batch_stats = jax.tree.map(jnp.asarray, ckpt["batch_stats"])
