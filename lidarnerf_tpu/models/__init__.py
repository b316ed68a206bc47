from lidarnerf_tpu.models.network import NeRFNetwork
from lidarnerf_tpu.models.renderer import RenderConfig, render_rays, render_rays_staged

__all__ = ["NeRFNetwork", "RenderConfig", "render_rays", "render_rays_staged"]
