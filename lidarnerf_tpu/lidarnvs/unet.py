"""UNet ray-drop segmenter + dice metrics (flax).

Rebuild of /root/reference/lidarnvs/unet.py:7-158 in flax.linen (NHWC, the
TPU-native conv layout): the classic UNet encoder/decoder with BatchNorm
DoubleConv blocks, transposed-conv (or bilinear) upsampling with skip
concatenation, and the dice coefficient/loss used by the ray-drop trainer.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class Down(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels)(x, train)


class Up(nn.Module):
    out_channels: int
    bilinear: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        in_ch = x1.shape[-1]
        if self.bilinear:
            B, H, W, C = x1.shape
            x1 = jax.image.resize(x1, (B, H * 2, W * 2, C), "bilinear")
            conv = DoubleConv(self.out_channels, mid_channels=in_ch // 2)
        else:
            x1 = nn.ConvTranspose(in_ch // 2, (2, 2), strides=(2, 2))(x1)
            conv = DoubleConv(self.out_channels)
        # pad to match the skip connection (odd input sizes)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
        )
        return conv(jnp.concatenate([x2, x1], axis=-1), train)


class UNet(nn.Module):
    """unet.py:87-117: 64-128-256-512-1024 encoder, skip-connected decoder."""

    n_channels: int = 10
    n_classes: int = 1
    bilinear: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        factor = 2 if self.bilinear else 1
        x1 = DoubleConv(64)(x, train)
        x2 = Down(128)(x1, train)
        x3 = Down(256)(x2, train)
        x4 = Down(512)(x3, train)
        x5 = Down(1024 // factor)(x4, train)
        x = Up(512 // factor, self.bilinear)(x5, x4, train)
        x = Up(256 // factor, self.bilinear)(x, x3, train)
        x = Up(128 // factor, self.bilinear)(x, x2, train)
        x = Up(64, self.bilinear)(x, x1, train)
        return nn.Conv(self.n_classes, (1, 1))(x)


def dice_coeff(pred, target, reduce_batch_first=False, epsilon=1e-6):
    """unet.py:120-143 (inputs [..., H, W] with channel layout agnostic)."""
    assert pred.shape == target.shape
    if pred.ndim == 2 or not reduce_batch_first:
        sum_dim = (-1, -2)
    else:
        sum_dim = (-1, -2, -3)
    inter = 2 * (pred * target).sum(axis=sum_dim)
    sets_sum = pred.sum(axis=sum_dim) + target.sum(axis=sum_dim)
    sets_sum = jnp.where(sets_sum == 0, inter, sets_sum)
    return ((inter + epsilon) / (sets_sum + epsilon)).mean()


def dice_loss(pred, target, multiclass=False):
    if multiclass:
        pred = pred.reshape((-1,) + pred.shape[2:])
        target = target.reshape((-1,) + target.shape[2:])
    return 1 - dice_coeff(pred, target, reduce_batch_first=True)
