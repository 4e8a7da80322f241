"""Texture decoder networks for neural baking (model/unet/arch.py:7-173
equivalents in flax.linen, NHWC layout for TPU conv efficiency).

* :class:`UNet` — 4-down/4-up bilinear U-Net, 11ch -> 11ch at 512^2.
* :class:`UNetDecoder` — const 8x8x512 -> 256^2 upsampling decoder.
* :class:`FeatureMap` — a directly-optimized 512^2 texture.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class DoubleConv(nn.Module):
    out_ch: int
    mid_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class Down(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch)(x, train)


class Up(nn.Module):
    out_ch: int
    mid_ch: int

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = _upsample2x(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.out_ch, self.mid_ch)(x, train)


class UpNoSkip(nn.Module):
    out_ch: int
    mid_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _upsample2x(x)
        return DoubleConv(self.out_ch, self.mid_ch)(x, train)


class UNet(nn.Module):
    """arch.py:7-37 (bilinear variant)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x1 = DoubleConv(64)(x, train)
        x2 = Down(128)(x1, train)
        x3 = Down(256)(x2, train)
        x4 = Down(512)(x3, train)
        x5 = Down(512)(x4, train)            # 1024 // 2 (bilinear factor)
        x = Up(256, 512)(x5, x4, train)      # 512 // 2, mid 512
        x = Up(128, 256)(x, x3, train)
        x = Up(64, 128)(x, x2, train)
        x = Up(64, 64)(x, x1, train)
        return nn.Conv(self.out_ch, (1, 1))(x)


class UNetDecoder(nn.Module):
    """arch.py:41-66: const 8x8x512 -> 256x256xout."""

    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = UpNoSkip(512, 256)(x, train)     # 8 -> 16
        x = UpNoSkip(256, 256)(x, train)     # 16 -> 32
        x = UpNoSkip(128, 128)(x, train)     # 32 -> 64
        x = UpNoSkip(64, 64)(x, train)       # 64 -> 128
        x = UpNoSkip(32, 32)(x, train)       # 128 -> 256
        return nn.Conv(self.out_ch, (1, 1))(x)


class FeatureMap(nn.Module):
    """arch.py:70-80: the texture IS the parameter."""

    out_ch: int
    tex_size: int = 512

    @nn.compact
    def __call__(self, x, train: bool = True):
        tex = self.param(
            "optim_texture",
            lambda key: jax.random.uniform(
                key, (1, self.tex_size, self.tex_size, self.out_ch),
                minval=-1.0, maxval=1.0,
            ),
        )
        return tex
