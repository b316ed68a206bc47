"""lidarnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for novel LiDAR view synthesis.

Re-implements the full capability surface of LiDAR-NeRF (tangtaogo/lidar-nerf,
reference mounted at /root/reference) with a TPU-first architecture:

- the CUDA hash-grid / SH / frequency encoders and fused MLPs become pure-JAX +
  Pallas kernels sized for the MXU (`lidarnerf_tpu.ops`),
- the irregular CUDA ray marching becomes fixed-count stratified + importance
  sampling with static shapes under one fused jit'd train step
  (`lidarnerf_tpu.models.renderer`, `lidarnerf_tpu.nerf.trainer`),
- data-parallel scaling uses `jax.sharding.Mesh` + NamedSharding over the ray
  batch axis (`lidarnerf_tpu.parallel`),
- datasets, range-view preprocessing, metrics (Chamfer/F-score/depth
  RMSE/SSIM), and the classical lidarnvs baselines are kept API- and
  protocol-compatible with the reference.
"""

__version__ = "0.1.0"
