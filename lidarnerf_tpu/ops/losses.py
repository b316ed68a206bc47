"""Per-element loss criteria matching the reference's torch loss dict.

Mirrors main_lidarnerf.py:330-342 ({mse,l1,bce,huber,cos} with reduction='none',
huber delta = 0.2*scale) plus the extra losses in
/root/reference/lidarnerf/loss.py (mape, eff_distloss — dormant there, live
here for completeness).
"""

import jax.numpy as jnp


def mse(pred, gt):
    return (pred - gt) ** 2


def l1(pred, gt):
    return jnp.abs(pred - gt)


def bce_with_logits(pred, gt):
    """Numerically stable BCEWithLogitsLoss, reduction='none'."""
    return jnp.maximum(pred, 0.0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def huber(pred, gt, delta=1.0):
    """torch.nn.HuberLoss semantics (the CLI criterion, main_lidarnerf.py:334)."""
    err = jnp.abs(pred - gt)
    quad = 0.5 * err**2
    lin = delta * (err - 0.5 * delta)
    return jnp.where(err < delta, quad, lin)


def huber_loss_ngp(pred, gt, delta=0.1):
    """The torch-ngp huber variant in loss.py:18-27 (0.5/delta scaling)."""
    rel = jnp.abs(pred - gt)
    sqr = 0.5 / delta * rel * rel
    return jnp.where(rel > delta, rel - 0.5 * delta, sqr)


def linear_to_srgb(x):
    """utils.py:38-40."""
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x**0.41666 - 0.055)


def srgb_to_linear(x):
    """utils.py:43-45."""
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def cosine_similarity(pred, gt, axis=1, eps=1e-8):
    """torch.nn.CosineSimilarity semantics along ``axis``."""
    num = jnp.sum(pred * gt, axis=axis)
    na = jnp.linalg.norm(pred, axis=axis)
    nb = jnp.linalg.norm(gt, axis=axis)
    return num / jnp.maximum(na * nb, eps)


def mape(pred, gt, eps=1e-2):
    """Mean-absolute-percentage style loss (loss.py:6-15), per-element."""
    return jnp.abs(pred - gt) / (jnp.abs(gt) + eps)


def eff_distloss(weights, midpoints, intervals):
    """O(N) distortion loss of mip-nerf-360 (loss.py:30-88).

    Args:
        weights: [..., S] compositing weights.
        midpoints: [..., S] sorted interval midpoints.
        intervals: [..., S] interval lengths.
    """
    wm = weights * midpoints
    w_cum = jnp.cumsum(weights, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    w_prefix = jnp.concatenate([jnp.zeros_like(w_cum[..., :1]), w_cum[..., :-1]], -1)
    wm_prefix = jnp.concatenate([jnp.zeros_like(wm_cum[..., :1]), wm_cum[..., :-1]], -1)
    loss_uni = (1.0 / 3.0) * jnp.sum(intervals * weights**2, axis=-1)
    loss_bi = 2.0 * jnp.sum(wm * w_prefix - weights * wm_prefix, axis=-1)
    return loss_uni + loss_bi


def make_criterion(name: str, scale: float = 1.0):
    """Loss factory matching main_lidarnerf.py:330-342."""
    if name == "mse":
        return mse
    if name == "l1":
        return l1
    if name == "bce":
        return bce_with_logits
    if name == "huber":
        delta = 0.2 * scale
        return lambda p, g: huber(p, g, delta=delta)
    if name == "cos":
        return cosine_similarity
    raise ValueError(f"unknown loss '{name}' (choose from mse,l1,bce,huber,cos)")
