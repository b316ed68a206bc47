"""LiDAR-NeRF field network: hash-grid sigma net + direction-conditioned heads.

TPU-native equivalent of BOTH reference backends in one module:
- /root/reference/lidarnerf/nerf/network.py:10-253 (torch-ngp CUDA encoders +
  nn.Linear MLPs), and
- /root/reference/lidarnerf/nerf/network_tcnn.py (tiny-cuda-nn HashGrid +
  FullyFusedMLP) — the capability tcnn provides (fused hash encode + small
  MLPs) is covered natively by `lidarnerf_tpu.ops.hash_grid` (+ Pallas kernel)
  and plain `jnp.dot` chains that XLA fuses onto the MXU; there is no external
  dependency to port.

Architecture parity (network.py:33-99):
- sigma net: encoder(x) -> num_layers(2) bias-free Linear(hidden 64) ->
  [1 sigma | geo_feat(15)]; sigma = trunc_exp(h[...,0]).
- RGB color net: SH(degree 4) dir encoding ++ geo_feat -> 3 layers -> sigmoid 3.
- LiDAR color net: frequency(degree 12) dir encoding ++ geo_feat -> 3 layers ->
  sigmoid 2 = (ray-drop prob, intensity).

Matmuls run in (configurable) bfloat16 with float32 params and float32
accumulation; positions, sigma and compositing stay float32.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from lidarnerf_tpu.ops.activation import trunc_exp
from lidarnerf_tpu.ops.encoders import (
    frequency_encode,
    frequency_encoding_dim,
    sh_encode,
)
from lidarnerf_tpu.ops import hash_grid as hg


def torch_linear_init(key, shape, dtype=jnp.float32):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class MLP(nn.Module):
    """Bias-free ReLU MLP (matches the reference nn.Linear(bias=False) stacks).

    On TPU a width-64 MLP is a chain of small matmuls XLA fuses into the
    surrounding ops; this is the native stand-in for tcnn FullyFusedMLP /
    ffmlp.cu (whose wmma scheduling has no TPU analogue — the MXU pipeline +
    XLA fusion plays that role).
    """

    num_layers: int
    hidden_dim: int
    out_dim: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.compute_dtype)
        for l in range(self.num_layers):
            out = self.out_dim if l == self.num_layers - 1 else self.hidden_dim
            h = nn.Dense(
                out,
                use_bias=False,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                kernel_init=torch_linear_init,
            )(h)
            if l != self.num_layers - 1:
                h = nn.relu(h)
        return h


class NeRFNetwork(nn.Module):
    encoding: str = "hashgrid"  # blockhash|hashgrid|tiledgrid|periodic_volume|frequency|None
    encoding_dir: str = "sphere_harmonics"
    multires: int = 6  # frequency degree when encoding == "frequency"
    desired_resolution: int = 2048
    log2_hashmap_size: int = 19
    n_features_per_level: int = 2
    num_levels: int = 16
    base_resolution: int = 16
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    out_color_dim: int = 3
    out_lidar_color_dim: int = 2
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_radius: float = -1.0
    bound: float = 1.0
    compute_dtype: Any = jnp.float32
    # blockhash only: differentiable boundary-corner sharing across dense-
    # level block seams (ops/block_hash.tie_dense_seams). True corner
    # sharing like the reference's per-corner storage (gridencoder.cu:53-67)
    # — MEASURED HARMFUL on the 2000-step matched-budget A/B (round 5,
    # VALIDATION.md: test Chamfer 0.845 vs 0.702 untied): the duplicated
    # corners are load-bearing per-block capacity, not just a defect.
    # Off by default; kept as a measured option.
    seam_tie: bool = False

    def setup(self):
        if self.encoding == "blockhash":
            # TPU-native block-hash grid (ops/block_hash.py) — the fast path
            # covering the tcnn-HashGrid capability with tile-shaped lookups
            from lidarnerf_tpu.ops import block_hash as bhash

            self.block_spec = bhash.make_block_hash_spec(
                num_levels=self.num_levels,
                base_resolution=self.base_resolution,
                log2_hashmap_size=self.log2_hashmap_size,
                desired_resolution=self.desired_resolution,
            )
            self.grid_spec = None
            self.hash_table = self.param(
                "hash_table", lambda k: bhash.block_hash_init(k, self.block_spec)
            )
            in_dim = self.block_spec.output_dim
        elif self.encoding in ("hashgrid", "tiledgrid"):
            self.grid_spec = hg.make_hash_grid_spec(
                input_dim=3,
                num_levels=self.num_levels,
                level_dim=self.n_features_per_level,
                base_resolution=self.base_resolution,
                log2_hashmap_size=self.log2_hashmap_size,
                desired_resolution=self.desired_resolution,
                gridtype="hash" if self.encoding == "hashgrid" else "tiled",
            )
            self.hash_table = self.param(
                "hash_table", lambda k: hg.hash_grid_init(k, self.grid_spec)
            )
            in_dim = self.grid_spec.output_dim
        elif self.encoding == "periodic_volume":
            # the reference's PeriodicVolumeEncoding (encoding.py:123-296,
            # DORMANT there) as a first-class model encoding; its TV
            # regularizer lives in ops.periodic_volume_total_variation
            # (the analogue of the reference's get_total_variation_loss,
            # encoding.py:278 — never wired into training there either)
            from lidarnerf_tpu.ops import periodic_volume as pv

            self.pv_spec = pv.make_periodic_volume_spec(
                num_levels=self.num_levels,
                min_res=self.base_resolution,
                max_res=self.desired_resolution,
                log2_hashmap_size=self.log2_hashmap_size,
                features_per_level=self.n_features_per_level,
            )
            self.grid_spec = None
            self.hash_table = self.param(
                "hash_table", lambda k: pv.periodic_volume_init(k, self.pv_spec)
            )
            in_dim = self.pv_spec.output_dim
        elif self.encoding == "frequency":
            self.grid_spec = None
            in_dim = frequency_encoding_dim(3, self.multires)
        elif self.encoding in ("None", "none", None):
            self.grid_spec = None
            in_dim = 3
        else:
            raise NotImplementedError(f"encoding '{self.encoding}'")
        self.in_dim = in_dim

        self.sigma_net = MLP(
            num_layers=self.num_layers,
            hidden_dim=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
            compute_dtype=self.compute_dtype,
            name="sigma_net",
        )
        self.color_net = MLP(
            num_layers=self.num_layers_color,
            hidden_dim=self.hidden_dim_color,
            out_dim=self.out_color_dim,
            compute_dtype=self.compute_dtype,
            name="color_net",
        )
        self.lidar_color_net = MLP(
            num_layers=self.num_layers_color,
            hidden_dim=self.hidden_dim_color,
            out_dim=self.out_lidar_color_dim,
            compute_dtype=self.compute_dtype,
            name="lidar_color_net",
        )

        # optional background model (network.py:102-129): a much smaller
        # 2-D hash grid over sphere coords + an MLP conditioned on SH dirs
        if self.bg_radius > 0:
            self.bg_grid_spec = hg.make_hash_grid_spec(
                input_dim=2,
                num_levels=4,
                level_dim=self.n_features_per_level,
                base_resolution=self.base_resolution,
                log2_hashmap_size=19,
                desired_resolution=2048,
            )
            self.bg_table = self.param(
                "bg_table", lambda k: hg.hash_grid_init(k, self.bg_grid_spec)
            )
            self.bg_net = MLP(
                num_layers=self.num_layers_bg,
                hidden_dim=self.hidden_dim_bg,
                out_dim=3,
                compute_dtype=self.compute_dtype,
                name="bg_net",
            )

    def encode_pos(self, x):
        """x in [-bound, bound]^3 -> feature vector."""
        if self.encoding == "blockhash":
            from lidarnerf_tpu.ops import block_hash as bhash

            x01 = (x + self.bound) / (2.0 * self.bound)
            table = self.hash_table
            if self.seam_tie:
                table = bhash.tie_dense_seams(table, self.block_spec)
            return bhash.block_hash_encode(x01, table, self.block_spec)
        if self.encoding == "periodic_volume":
            from lidarnerf_tpu.ops import periodic_volume as pv

            x01 = (x + self.bound) / (2.0 * self.bound)
            return pv.periodic_volume_encode(x01, self.hash_table, self.pv_spec)
        if self.grid_spec is not None:
            x01 = (x + self.bound) / (2.0 * self.bound)  # grid.py:213
            # chunked + remat above 128k queries: the exact encoder otherwise
            # materialises [Q, 8, C] residuals per level and compile-OOMs at
            # the flagship 4096x832 step (ops/hash_grid.py)
            return hg.hash_grid_encode_chunked(x01, self.hash_table, self.grid_spec)
        if self.encoding == "frequency":
            return frequency_encode(x, self.multires)
        return x

    def density(self, x):
        """x: [..., 3] in [-bound, bound] -> (sigma [...], geo_feat [..., G])."""
        feat = self.encode_pos(x)
        h = self.sigma_net(feat).astype(jnp.float32)
        sigma = trunc_exp(h[..., 0])
        geo_feat = h[..., 1:]
        return sigma, geo_feat

    def lidar_color(self, d, geo_feat):
        """(raydrop, intensity) in [0,1]; d: [..., 3] directions."""
        d_enc = frequency_encode(d, 12)  # network.py:83 (multires=12)
        h = self.lidar_color_net(jnp.concatenate([d_enc, geo_feat], axis=-1))
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def rgb_color(self, d, geo_feat):
        d_enc = sh_encode(d, 4)  # network.py:64 (sphere_harmonics degree 4)
        h = self.color_net(jnp.concatenate([d_enc, geo_feat], axis=-1))
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def color(self, d, geo_feat, cal_lidar_color: bool = True):
        if cal_lidar_color:
            return self.lidar_color(d, geo_feat)
        return self.rgb_color(d, geo_feat)

    def encode_dir(self, d, cal_lidar_color: bool = True):
        """Direction encoding alone — the renderer computes this once per RAY
        and broadcasts over samples (directions are constant along a ray;
        encoding per sample would redo 24x3 transcendentals 832 times)."""
        if cal_lidar_color:
            return frequency_encode(d, 12)
        return sh_encode(d, 4)

    def color_from_enc(self, d_enc, geo_feat, cal_lidar_color: bool = True):
        """Color heads on a precomputed direction encoding."""
        net = self.lidar_color_net if cal_lidar_color else self.color_net
        h = net(jnp.concatenate([d_enc, geo_feat], axis=-1))
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def background(self, x_sph, d):
        """Background RGB from sphere coords (network.py:181-196).

        x_sph: [..., 2] in [-1, 1] (theta/phi of the bg-sphere hit point).
        """
        x01 = (x_sph + 1.0) / 2.0
        h = hg.hash_grid_encode(x01, self.bg_table, self.bg_grid_spec)
        d_enc = sh_encode(d, 4)
        h = self.bg_net(jnp.concatenate([d_enc, h], axis=-1))
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def __call__(self, x, d):
        """Joint forward like network.py:131-160 (used for init/shape-check).

        Touches every head so flax materialises all parameters at init.
        """
        sigma, geo_feat = self.density(x)
        color = self.lidar_color(d, geo_feat)
        _ = self.rgb_color(d, geo_feat)
        if self.bg_radius > 0:
            _ = self.background(jnp.zeros(x.shape[:-1] + (2,)), d)
        return sigma, color
