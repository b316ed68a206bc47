"""Data-parallel scaling over the ray batch via jax.sharding + jit.

The reference's scaffolded (and bitrotted) DDP path
(/root/reference/lidarnerf/nerf/utils.py:589-593, 1326-1350) is replaced by the
TPU-native recipe: build a `Mesh` over the chips, keep model/optimizer state
replicated, shard the per-step ray batch along the mesh's `data` axis, and let
XLA insert the gradient `psum` over ICI. There is no communication code to
maintain — the collective falls out of the sharding annotations.

The ray axis is this workload's long sequence axis (SURVEY.md §5): sharding it
across devices is the analogue of sequence parallelism for attention models.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidarnerf_tpu.models.renderer import RenderConfig
from lidarnerf_tpu.nerf.train_step import (
    TrainConfig,
    guarded_update,
    make_loss_fn,
    make_optimizer,
)


def make_mesh(n_devices=None, devices=None):
    """1-D `data` mesh over the available chips."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("data",))


def make_mesh_2d(n_data, n_model, devices=None):
    """(data, model) mesh: rays shard over `data`, the hash table over `model`.

    The model axis exists for log2_hashmap_size > 21 tables that outgrow a
    single chip's HBM share (SURVEY §2.6 TP row): the [L*B, 128] table's row
    axis is level-block-contiguous, so a `model`-axis row sharding splits
    whole levels across chips and the per-sample cross-chip traffic is the
    all-gather of 2 features/level — 32 floats/sample — over ICI.
    """
    if devices is None:
        devices = jax.devices()[: n_data * n_model]
    return Mesh(np.array(devices).reshape(n_data, n_model), ("data", "model"))


def _is_table_path(path):
    return any(getattr(p, "key", getattr(p, "name", None)) == "hash_table" for p in path)


def table_shardings(tree, mesh):
    """Sharding pytree: hash-table leaves row-sharded over `model`, rest replicated.

    Works for params and for optimizer state (adam mu/nu mirror the params
    dict, so the same path match finds the table moments).
    """
    repl = NamedSharding(mesh, P())
    tab = NamedSharding(mesh, P("model", None))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tab if _is_table_path(path) else repl, tree
    )


def shard_params(tree, mesh):
    """Place params/opt-state on the mesh with the table model-sharded."""
    return jax.device_put(tree, table_shardings(tree, mesh))


def replicate(tree, mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays(array, mesh):
    """Shard the leading (ray) axis of an array across the data axis."""
    spec = P("data", *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def make_sharded_train_step(
    module,
    cfg: TrainConfig,
    render_cfg: RenderConfig,
    mesh: Mesh,
    patch_size=1,
    masked_sampling: bool = False,
    sample_without_replacement: bool = False,
    shard_table: bool = False,
):
    """Data-parallel variant of nerf.train_step.make_train_step.

    Parameters/optimizer state are replicated; the sampled ray batch is
    annotated with a `data`-axis sharding constraint, so the two density
    passes, the color pass and the compositing partition across chips, and the
    parameter gradients are all-reduced by XLA (psum over ICI). Patch
    regularizers operate on the patch axis which subdivides the ray axis, so
    they shard the same way.

    The per-step loss itself is nerf.train_step.make_loss_fn — the SAME
    closure the single-device step uses (full feature matrix incl. seam loss
    and without-replacement sampling), differing only in the data-axis
    sharding constraint injected via its `constrain` hook.
    """
    N = cfg.num_rays_lidar
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
    if N % n_data != 0:
        raise ValueError(
            f"num_rays_lidar={N} must divide evenly over {n_data} data-axis devices"
        )
    if shard_table and "model" not in mesh.axis_names:
        raise ValueError("shard_table=True needs a mesh with a 'model' axis")
    optimizer = make_optimizer(cfg)

    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    loss_fn = make_loss_fn(
        module, cfg, render_cfg, patch_size, masked_sampling,
        sample_without_replacement, constrain=constrain,
    )

    repl = NamedSharding(mesh, P())

    def constrain_table(tree):
        """Pin hash-table leaves (and their adam moments) to the model axis."""
        tab = NamedSharding(mesh, P("model", None))
        return jax.tree_util.tree_map_with_path(
            lambda path, x: jax.lax.with_sharding_constraint(x, tab)
            if _is_table_path(path)
            else jax.lax.with_sharding_constraint(x, repl),
            tree,
        )

    jit_kwargs = dict(donate_argnums=(0, 1))
    if not shard_table:
        jit_kwargs["out_shardings"] = ((repl, repl), repl)

    @partial(jax.jit, **jit_kwargs)
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
        if shard_table:
            params = constrain_table(params)
            opt_state = constrain_table(opt_state)
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
        if shard_table:
            params = constrain_table(params)
            opt_state = constrain_table(opt_state)
        metrics = {
            "loss": loss,
            **aux,
            "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
        }
        return (params, opt_state), metrics

    def wrapped(
        params, opt_state, poses, images, vi, vc, frame_idx, key, step, occ_grid=None
    ):
        (params, opt_state), metrics = step_fn(
            params, opt_state, poses, images, vi, vc, frame_idx, key, step, occ_grid
        )
        return params, opt_state, metrics

    # exposed for HLO inspection (collective-size scaling tests)
    wrapped.jitted = step_fn
    return wrapped


def make_sharded_epoch_step(
    module,
    cfg: TrainConfig,
    render_cfg: RenderConfig,
    mesh: Mesh,
    patch_size=1,
    masked_sampling: bool = False,
    sample_without_replacement: bool = False,
    shard_table: bool = False,
):
    """Data-parallel variant of nerf.train_step.make_epoch_step: one
    `lax.scan` dispatch per epoch over the mesh.

    Same motivation as the single-device fused epoch (the measured
    ~25 ms/step host dispatch latency — which a multi-chip launch pays per
    step just the same), same semantics: the occupancy refresh rides inside
    the scan via `lax.cond`, the ray batch carries the `data`-axis sharding
    constraint each iteration, parameters stay replicated (or the hash
    table `model`-sharded with shard_table), and XLA keeps the gradient
    psum inside the scan body. Signature matches make_epoch_step with the
    carry (params, opt_state, occ_grid) donated.
    """
    N = cfg.num_rays_lidar
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
    if N % n_data != 0:
        raise ValueError(
            f"num_rays_lidar={N} must divide evenly over {n_data} data-axis devices"
        )
    if shard_table and "model" not in mesh.axis_names:
        raise ValueError("shard_table=True needs a mesh with a 'model' axis")
    optimizer = make_optimizer(cfg)

    def constrain(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    loss_fn = make_loss_fn(
        module, cfg, render_cfg, patch_size, masked_sampling,
        sample_without_replacement, constrain=constrain,
    )
    occ_cfg = render_cfg.occ

    repl = NamedSharding(mesh, P())

    def constrain_table(tree):
        tab = NamedSharding(mesh, P("model", None))
        return jax.tree_util.tree_map_with_path(
            lambda path, x: jax.lax.with_sharding_constraint(x, tab)
            if _is_table_path(path)
            else jax.lax.with_sharding_constraint(x, repl),
            tree,
        )

    jit_kwargs = dict(donate_argnums=(0, 1, 2))
    if not shard_table:
        jit_kwargs["out_shardings"] = (repl, repl, repl, repl)

    @partial(jax.jit, **jit_kwargs)
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
            if shard_table:
                params = constrain_table(params)
                opt_state = constrain_table(opt_state)
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
            if shard_table:
                params = constrain_table(params)
                opt_state = constrain_table(opt_state)
            metrics = {
                "loss": loss,
                **aux,
                "skipped_nonfinite": 1.0 - finite.astype(jnp.float32),
            }
            return (params, opt_state, occ_grid), metrics

        K = frame_order.shape[0]
        steps = step0 + jnp.arange(K, dtype=jnp.int32)
        (params, opt_state, occ_grid), ms = jax.lax.scan(
            body,
            (params, opt_state, occ_grid),
            (frame_order, step_keys, occ_keys, steps),
        )
        return params, opt_state, occ_grid, ms

    return epoch_fn
