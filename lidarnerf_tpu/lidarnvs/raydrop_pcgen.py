"""PCGen ray-drop MLP + trainer (JAX/flax/optax).

Rebuild of /root/reference/lidarnvs/raydrop_train_pcgen.py: the
nerf-pytorch-style `RayDrop` MLP (D=4, W=128, kaiming-normal init,
raydrop_train_pcgen.py:41-68), the positional `Embedder`
(:241-272), `run_network`'s input packing (dirs + depth + intensity
embeddings, :275-283), flattened-ray batching with exponential or cosine LR
(:205-219, 441-446), and pickle-backed dataset loading (:285-295). The
per-batch torch loop becomes one jitted optax step.
"""

import os
import pickle

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


def kaiming_normal_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class RayDrop(nn.Module):
    """D fully-connected ReLU layers + linear head (raydrop_train_pcgen.py:41-63)."""

    D: int = 4
    W: int = 128
    output_ch: int = 1

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(self.D):
            h = nn.Dense(self.W, kernel_init=kaiming_normal_init)(h)
            h = nn.relu(h)
        return nn.Dense(self.output_ch, kernel_init=kaiming_normal_init)(h)


def get_embedder(multires, input_dims=3, i=0):
    """(embed_fn, out_dim); i=-1 -> identity (raydrop_train_pcgen.py:224-238)."""
    if i == -1:
        return (lambda x: x), input_dims
    freq_bands = 2.0 ** np.linspace(0.0, multires - 1, multires)

    def embed(x):
        outs = [x]
        for f in freq_bands:
            outs.append(jnp.sin(x * f))
            outs.append(jnp.cos(x * f))
        return jnp.concatenate(outs, axis=-1)

    return embed, input_dims * (1 + 2 * multires)


def run_network(inputs, model, params, embed_fn, embeddirs_fn):
    """inputs [N, 5] = (dir xyz, depth, intensity) -> raydrop logits [N, 1]."""
    dirs, depth, intensity = inputs[:, :3], inputs[:, 3:4], inputs[:, 4:5]
    packed = jnp.concatenate(
        [embeddirs_fn(dirs), embed_fn(depth), embed_fn(intensity)], axis=1
    )
    return model.apply(params, packed)


def pack_rays(directions, panos, intensities, raydrop_masks):
    """Flatten frame lists to [N, 6] = (dir, depth, intensity, target).

    Pixels with mask == -1 (MVL bbox) are removed; targets binarised
    (raydrop_train_pcgen.py train(): rays_all filtering).
    """
    rays = np.concatenate(
        [
            np.asarray(directions).reshape(-1, 3),
            np.asarray(panos).reshape(-1, 1),
            np.asarray(intensities).reshape(-1, 1),
        ],
        axis=-1,
    )
    masks = np.asarray(raydrop_masks).reshape(-1)
    keep = masks > -1
    rays = rays[keep]
    targets = np.where(masks[keep] == 0.0, 0.0, 1.0)
    return np.concatenate([rays, targets.reshape(-1, 1)], axis=-1).astype(np.float32)


def load_pkl_data(data_dir, split):
    data_dir = Path(data_dir)
    pkl_path = data_dir / f"{split}_data.pkl"
    if not pkl_path.is_file():
        raise ValueError(f"File {pkl_path} does not exist.")
    with open(pkl_path, "rb") as f:
        return pickle.load(f)


def cosine_scheduler(base_value, final_value, global_step, warmup_iters=0, start_warmup_value=0):
    """raydrop_train_pcgen.py:205-219."""
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) if warmup_iters else np.array([])
    iters = np.arange(global_step - warmup_iters)
    sched = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    return np.concatenate([warmup, sched])


class RayDropTrainer:
    """Minimal trainer: Adam + exp/cos LR + MSE-on-sigmoid, .ckpt save/load."""

    def __init__(
        self,
        netdepth=4,
        netwidth=128,
        multires=4,
        multires_views=10,
        i_embed=0,
        lrate=5e-4,
        lrate_decay=500,
        n_iters=10000,
        cos_lr=False,
        loss="mseloss",
        basedir="./log",
        expname="raysdrop",
        seed=0,
    ):
        self.embed_fn, ch = get_embedder(multires, input_dims=1, i=i_embed)
        self.embeddirs_fn, ch_views = get_embedder(multires_views, input_dims=3, i=i_embed)
        self.input_ch = ch * 2 + ch_views
        self.model = RayDrop(D=netdepth, W=netwidth)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, self.input_ch))
        )
        if cos_lr:
            sched = cosine_scheduler(lrate, lrate * 0.01, n_iters)
            lr_fn = lambda step: jnp.asarray(sched)[jnp.minimum(step, len(sched) - 1)]
        else:
            # torch: new_lrate = lrate * 0.1 ** (step / (lrate_decay*1000))
            lr_fn = lambda step: lrate * 0.1 ** (step / (lrate_decay * 1000))
        self.optimizer = optax.adam(lr_fn)
        self.opt_state = self.optimizer.init(self.params)
        self.loss_name = loss
        self.basedir = basedir
        self.expname = expname
        self.n_iters = n_iters
        self._step = self._build_step()

    def _build_step(self):
        model, embed_fn, embeddirs_fn = self.model, self.embed_fn, self.embeddirs_fn
        optimizer = self.optimizer
        loss_name = self.loss_name

        def loss_fn(params, batch):
            pred = run_network(batch[:, :5], model, params, embed_fn, embeddirs_fn)
            pred = jax.nn.sigmoid(pred[:, 0])
            target = batch[:, 5]
            if loss_name == "l1loss":
                return jnp.mean(jnp.abs(pred - target))
            return jnp.mean((pred - target) ** 2)

        @jax.jit
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train(self, rays_all, N_rand=2048, n_iters=None, log_every=1000, verbose=True):
        """rays_all: [N, 6] packed rays; shuffled epochs of N_rand batches."""
        n_iters = n_iters or self.n_iters
        rng = np.random.RandomState(0)
        order = rng.permutation(len(rays_all))
        rays = jnp.asarray(rays_all[order])
        ptr = 0
        losses = []
        for it in range(n_iters):
            if ptr + N_rand > len(rays):
                order = rng.permutation(len(rays_all))
                rays = jnp.asarray(rays_all[order])
                ptr = 0
            batch = jax.lax.dynamic_slice_in_dim(rays, ptr, N_rand)
            ptr += N_rand
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, batch
            )
            if verbose and (it % log_every == 0):
                print(f"[raydrop] iter {it}: loss {float(loss):.6f}")
            losses.append(loss)
        return [float(l) for l in losses[-10:]]

    def predict(self, rays_val):
        """rays_val [N, 5] -> raydrop probability [N]."""
        logits = run_network(
            jnp.asarray(rays_val), self.model, self.params, self.embed_fn, self.embeddirs_fn
        )
        return np.asarray(jax.nn.sigmoid(logits[:, 0]))

    def save_checkpoint(self, step):
        path = os.path.join(self.basedir, self.expname, f"{step:06d}.ckpt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "global_step": step,
                    "network_fn_state_dict": jax.device_get(self.params),
                },
                f,
            )
        return path

    def load_checkpoint(self, path):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, ckpt["network_fn_state_dict"])
        return ckpt.get("global_step", 0)
