from lidarnerf_tpu.lidarnvs.base import LidarNVSBase
from lidarnerf_tpu.lidarnvs.pcgen import LidarNVSPCGen
from lidarnerf_tpu.lidarnvs.eval import eval_points_and_pano

__all__ = ["LidarNVSBase", "LidarNVSPCGen", "eval_points_and_pano"]
