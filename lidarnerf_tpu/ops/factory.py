"""Encoder factory — API twin of the reference's get_encoder.

Mirrors /root/reference/lidarnerf/encoding.py:50-120: returns
(encode_fn, params_init_fn, output_dim) for each encoding name. Functional
style instead of nn.Modules: `params_init_fn(key)` returns the (possibly
empty) parameter pytree and `encode_fn(x, params)` the features.

Encodings: None | frequency | sphere_harmonics | hashgrid | tiledgrid |
blockhash (the TPU-native fast hash, extra vs the reference) — `ash` is an
external research encoder in the reference and intentionally descoped.
"""


from lidarnerf_tpu.ops import block_hash as bhash
from lidarnerf_tpu.ops import hash_grid as hg
from lidarnerf_tpu.ops import periodic_volume as pv
from lidarnerf_tpu.ops.encoders import (
    frequency_encode,
    frequency_encoding_dim,
    sh_encode,
    sh_encoding_dim,
)


def get_encoder(
    encoding,
    input_dim=3,
    multires=6,
    degree=4,
    num_levels=16,
    level_dim=2,
    base_resolution=16,
    log2_hashmap_size=19,
    desired_resolution=2048,
    align_corners=False,
    **kwargs,
):
    """Returns (encode_fn(x, params), init_fn(key) -> params, output_dim)."""
    if encoding in ("None", "none", None):
        return (lambda x, params=None: x), (lambda key: None), input_dim

    if encoding == "frequency":
        out_dim = frequency_encoding_dim(input_dim, multires)
        return (
            lambda x, params=None: frequency_encode(x, multires),
            lambda key: None,
            out_dim,
        )

    if encoding == "sphere_harmonics":
        return (
            lambda x, params=None: sh_encode(x, degree),
            lambda key: None,
            sh_encoding_dim(degree),
        )

    if encoding in ("hashgrid", "tiledgrid"):
        spec = hg.make_hash_grid_spec(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
        )
        return (
            lambda x, params: hg.hash_grid_encode(x, params, spec),
            lambda key: hg.hash_grid_init(key, spec),
            spec.output_dim,
        )

    if encoding == "periodic_volume":
        # the reference's dormant PeriodicVolumeEncoding (encoding.py:123-296),
        # exposed as a first-class factory name; log2_hashmap_size must be
        # divisible by 3 (same assert as the reference ctor)
        pspec = pv.make_periodic_volume_spec(
            num_levels=num_levels,
            min_res=base_resolution,
            max_res=desired_resolution,
            log2_hashmap_size=log2_hashmap_size,
            features_per_level=level_dim,
            smoothstep=kwargs.get("smoothstep", False),
        )
        return (
            lambda x, params: pv.periodic_volume_encode(x, params, pspec),
            lambda key: pv.periodic_volume_init(key, pspec),
            pspec.output_dim,
        )

    if encoding == "blockhash":
        spec = bhash.make_block_hash_spec(
            num_levels=num_levels,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
        )
        return (
            lambda x, params: bhash.block_hash_encode(x, params, spec),
            lambda key: bhash.block_hash_init(key, spec),
            spec.output_dim,
        )

    raise NotImplementedError(
        "Unknown encoding mode, choose from [None, frequency, "
        "sphere_harmonics, hashgrid, tiledgrid, blockhash, periodic_volume]"
    )
