"""Native JAX face restoration for the completion pipeline's stage ④.

The reference restores each FFHQ-aligned crop with GFPGAN before GAN
inversion (train/completion.py:500-562, tools/sr_utils/__init__.py). This
module re-implements the **GFPGANv1Clean** inference graph (the pure-PyTorch
"clean" architecture of the public v1.3/v1.4 checkpoints — no custom CUDA
ops): a U-Net degradation-removal encoder over the 512² crop, a style code
from the bottleneck, and a StyleGAN2(clean) decoder modulated per-resolution
by CS-SFT (channel-split spatial feature transform) conditions from the
U-Net's upsampling trunk.

Parameters are a flat ``{torch_param_name: array}`` dict following the
official ``state_dict`` layout (conv_body_first, conv_body_down.N.*,
final_linear, conv_body_up.N.*, condition_scale.N.*, condition_shift.N.*,
stylegan_decoder.*); :func:`load_gfpgan_from_torch` converts the public
checkpoint (params_ema) and audits names/shapes. Without weights the
pipeline keeps its identity fallback (crops pass through unrestored).

Semantics notes (clean-arch, basicsr):
  * ModulatedConv2d stores the 1/sqrt(fan_in) scale INSIDE the weight at
    init, so runtime applies the stored tensor directly (unlike the ada
    convention in completion/eg3d/networks.py).
  * Up/downsampling is bilinear ``F.interpolate`` (align_corners=False),
    not FIR filtering.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclass(frozen=True)
class GFPGANConfig:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    num_mlp: int = 8
    narrow: float = 1.0
    sft_half: bool = True

    def decoder_channels(self, res: int) -> int:
        base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}[res]
        if res >= 64:
            base = base * self.channel_multiplier
        return int(min(base * self.narrow, 512))

    def unet_channels(self, res: int) -> int:
        base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}[res]
        if res >= 64:
            base = base * self.channel_multiplier
        return int(min(base * self.narrow * 0.5, 512))

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2


def tiny_gfpgan_config() -> GFPGANConfig:
    return GFPGANConfig(out_size=32, num_style_feat=32, channel_multiplier=1,
                        num_mlp=2, narrow=0.125)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _conv(p, name, x, stride=1):
    w = jnp.transpose(p[f"{name}.weight"], (2, 3, 1, 0))   # OIHW -> HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p.get(f"{name}.bias")
    return y + b[None, None, None, :] if b is not None else y


def _linear(p, name, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _resize(x, factor):
    """torch F.interpolate(bilinear, align_corners=False) semantics —
    NO antialiasing on downscale (torch doesn't; jax.image.resize defaults
    to antialias=True, which diverges at factor < 1)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, int(h * factor), int(w * factor), c),
                            "linear", antialias=False)


def _modulated_conv(p, name, x, style, demodulate=True):
    """basicsr clean ModulatedConv2d: stored weight [1,O,I,k,k] already
    carries 1/sqrt(fan_in); modulation is a Linear(num_style_feat -> I)."""
    weight = p[f"{name}.weight"][0]                       # [O,I,k,k]
    s = _linear(p, f"{name}.modulation", style)           # [N,I]
    o, i, kh, kw = weight.shape
    n = x.shape[0]
    w = weight[None] * s[:, None, :, None, None]
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)
        w = w * d[:, :, None, None, None]
    w = jnp.transpose(w, (3, 4, 2, 0, 1)).reshape(kh, kw, i, n * o)
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, x.shape[1], x.shape[2],
                                                n * i)
    y = jax.lax.conv_general_dilated(
        xg, w, (1, 1), "SAME", feature_group_count=n,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(x.shape[1], x.shape[2], n, o)
    return jnp.transpose(y, (2, 0, 1, 3))


def _style_conv(p, name, x, style, sample_mode=None):
    if sample_mode == "upsample":
        x = _resize(x, 2)
    y = _modulated_conv(p, f"{name}.modulated_conv", x, style)
    # clean StyleConv: learned noise strength `weight`, bias [1,O,1,1];
    # noise disabled at inference (deterministic restoration)
    y = y + jnp.transpose(p[f"{name}.bias"], (0, 2, 3, 1))
    return _lrelu(y) * math.sqrt(2.0)


def _to_rgb(p, name, x, style, skip=None):
    y = _modulated_conv(p, f"{name}.modulated_conv", x, style,
                        demodulate=False)
    y = y + jnp.transpose(p[f"{name}.bias"], (0, 2, 3, 1))
    if skip is not None:
        y = y + _resize(skip, 2)
    return y


def _res_block(p, name, x, direction):
    """clean ResBlock/ResUpBlock: conv1 (same ch), resize, conv2 (ch
    change), 1x1 skip on the resized input, /sqrt(2)."""
    out = _lrelu(_conv(p, f"{name}.conv1", x))
    factor = 2.0 if direction == "up" else 0.5
    out = _resize(out, factor)
    out = _lrelu(_conv(p, f"{name}.conv2", out))
    skip = _conv(p, f"{name}.skip", _resize(x, factor))
    return (out + skip) / math.sqrt(2.0)


# ---------------------------------------------------------------------------
# StyleGAN2 clean decoder with CS-SFT
# ---------------------------------------------------------------------------

def _decoder(p, cfg: GFPGANConfig, latents, conditions):
    """stylegan_decoder forward. latents [N, num_latent, S];
    conditions: list of (scale, shift) per up-resolution."""
    pre = "stylegan_decoder"
    n = latents.shape[0]
    const = p[f"{pre}.constant_input.weight"]             # [1,C,4,4]
    x = jnp.transpose(const, (0, 2, 3, 1)).repeat(n, axis=0)
    x = _style_conv(p, f"{pre}.style_conv1", x, latents[:, 0])
    skip = _to_rgb(p, f"{pre}.to_rgb1", x, latents[:, 1])
    i = 1
    for li in range(0, (cfg.log_size - 2) * 2, 2):
        x = _style_conv(p, f"{pre}.style_convs.{li}", x, latents[:, i],
                        sample_mode="upsample")
        # CS-SFT on half (or all) channels after the upsampling conv
        ci = li // 2
        if ci < len(conditions):
            scale, shift = conditions[ci]
            if cfg.sft_half:
                half = x.shape[-1] // 2
                x = jnp.concatenate(
                    [x[..., :half], x[..., half:] * scale + shift], axis=-1)
            else:
                x = x * scale + shift
        x = _style_conv(p, f"{pre}.style_convs.{li + 1}", x, latents[:, i + 1])
        skip = _to_rgb(p, f"{pre}.to_rgbs.{ci}", x, latents[:, i + 2],
                       skip=skip)
        i += 2
    return skip                                            # [-1,1] image


def gfpgan_restore(p: Params, cfg: GFPGANConfig, x: jax.Array) -> jax.Array:
    """Restore a batch of aligned crops. x [N,S,S,3] in [-1,1] -> same."""
    feat = _lrelu(_conv(p, "conv_body_first", x))
    unet_skips = []
    for idx in range(cfg.log_size - 2):
        feat = _res_block(p, f"conv_body_down.{idx}", feat, "down")
        unet_skips.insert(0, feat)
    feat = _lrelu(_conv(p, "final_conv", feat))

    # style code from the 4x4 bottleneck (NCHW flatten order for parity)
    flat = jnp.transpose(feat, (0, 3, 1, 2)).reshape(feat.shape[0], -1)
    style = _linear(p, "final_linear", flat)
    latents = style.reshape(style.shape[0], -1, cfg.num_style_feat)
    if latents.shape[1] == 1:
        latents = jnp.repeat(latents, cfg.num_latent, axis=1)

    conditions: List[Tuple[jax.Array, jax.Array]] = []
    for idx in range(cfg.log_size - 2):
        feat = feat + unet_skips[idx]
        feat = _res_block(p, f"conv_body_up.{idx}", feat, "up")
        sc = _conv(p, f"condition_scale.{idx}.0", feat)
        sc = _conv(p, f"condition_scale.{idx}.2", _lrelu(sc))
        sh = _conv(p, f"condition_shift.{idx}.0", feat)
        sh = _conv(p, f"condition_shift.{idx}.2", _lrelu(sh))
        conditions.append((sc, sh))

    return _decoder(p, cfg, latents, conditions)


# ---------------------------------------------------------------------------
# converter + random init
# ---------------------------------------------------------------------------

def load_gfpgan_from_torch(path: str, cfg: Optional[GFPGANConfig] = None):
    """Load the public GFPGANv1.3/v1.4 checkpoint (dict with 'params_ema')
    or a bare state_dict. Returns (params, cfg, audit) where audit lists
    checkpoint keys the graph will not consume."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("params_ema", "params", "state_dict", "generator"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
            break
    raw = {k: v.detach().cpu().numpy() for k, v in sd.items()
           if hasattr(v, "detach")}
    cfg = cfg or GFPGANConfig()
    params = {k: jnp.asarray(v, jnp.float32) for k, v in raw.items()}
    unused = sorted(k for k in raw
                    if ".noise" in k or k.startswith("toRGB")
                    or "stylegan_decoder.noises" in k)
    return params, cfg, unused


def gfpgan_random_params(key, cfg: GFPGANConfig, dtype=jnp.float32) -> Params:
    """Random parameters with checkpoint-exact names/shapes (tests)."""
    p: Params = {}
    keys = iter(jax.random.split(key, 4096))

    def randn(shape, scale=1.0):
        return jax.random.normal(next(keys), shape, dtype) * scale

    def conv(name, i, o, k=3, bias=True):
        p[f"{name}.weight"] = randn((o, i, k, k), 1.0 / math.sqrt(i * k * k))
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype)

    def linear(name, i, o):
        p[f"{name}.weight"] = randn((o, i), 1.0 / math.sqrt(i))
        p[f"{name}.bias"] = jnp.zeros((o,), dtype)

    def mod_conv(name, i, o, k):
        p[f"{name}.weight"] = randn((1, o, i, k, k), 1.0 / math.sqrt(i * k * k))
        linear(f"{name}.modulation", cfg.num_style_feat, i)
        p[f"{name}.modulation.bias"] = jnp.ones((i,), dtype)

    def style_conv(name, i, o, k=3):
        mod_conv(f"{name}.modulated_conv", i, o, k)
        p[f"{name}.bias"] = jnp.zeros((1, o, 1, 1), dtype)

    def to_rgb(name, i):
        mod_conv(f"{name}.modulated_conv", i, 3, 1)
        p[f"{name}.bias"] = jnp.zeros((1, 3, 1, 1), dtype)

    # encoder
    conv("conv_body_first", 3, cfg.unet_channels(cfg.out_size), 1)
    res = cfg.out_size
    for idx in range(cfg.log_size - 2):
        i, o = cfg.unet_channels(res), cfg.unet_channels(res // 2)
        conv(f"conv_body_down.{idx}.conv1", i, i)
        conv(f"conv_body_down.{idx}.conv2", i, o)
        conv(f"conv_body_down.{idx}.skip", i, o, 1, bias=False)
        res //= 2
    conv("final_conv", cfg.unet_channels(4), cfg.unet_channels(4))
    linear("final_linear", cfg.unet_channels(4) * 16,
           cfg.num_latent * cfg.num_style_feat)

    # U-Net up trunk + SFT conditions
    res = 4
    for idx in range(cfg.log_size - 2):
        i, o = cfg.unet_channels(res), cfg.unet_channels(res * 2)
        conv(f"conv_body_up.{idx}.conv1", i, i)
        conv(f"conv_body_up.{idx}.conv2", i, o)
        conv(f"conv_body_up.{idx}.skip", i, o, 1, bias=False)
        dec_o = cfg.decoder_channels(res * 2)
        sft_o = dec_o // 2 if cfg.sft_half else dec_o
        conv(f"condition_scale.{idx}.0", o, o)
        conv(f"condition_scale.{idx}.2", o, sft_o)
        conv(f"condition_shift.{idx}.0", o, o)
        conv(f"condition_shift.{idx}.2", o, sft_o)
        res *= 2

    # stylegan decoder
    pre = "stylegan_decoder"
    for mi in range(cfg.num_mlp):
        linear(f"{pre}.style_mlp.{2 * mi + 1}", cfg.num_style_feat,
               cfg.num_style_feat)
    p[f"{pre}.constant_input.weight"] = randn((1, cfg.decoder_channels(4), 4, 4))
    style_conv(f"{pre}.style_conv1", cfg.decoder_channels(4),
               cfg.decoder_channels(4))
    to_rgb(f"{pre}.to_rgb1", cfg.decoder_channels(4))
    res = 4
    li = 0
    for _ in range(cfg.log_size - 2):
        i, o = cfg.decoder_channels(res), cfg.decoder_channels(res * 2)
        style_conv(f"{pre}.style_convs.{li}", i, o)
        style_conv(f"{pre}.style_convs.{li + 1}", o, o)
        to_rgb(f"{pre}.to_rgbs.{li // 2}", o)
        li += 2
        res *= 2
    return p


class GFPGANRestorer:
    """Stage-④ enhancer plugin: callable on [N,H,W,3] crops in [0,1]."""

    def __init__(self, params: Params, cfg: GFPGANConfig = GFPGANConfig()):
        self.params = params
        self.cfg = cfg
        self._fn = jax.jit(lambda x: gfpgan_restore(self.params, self.cfg, x))

    def __call__(self, crops: np.ndarray) -> np.ndarray:
        x = jnp.asarray(crops, jnp.float32)
        size = self.cfg.out_size
        orig = x.shape[1:3]
        if orig != (size, size):
            x = jax.image.resize(x, (x.shape[0], size, size, 3), "linear")
        y = self._fn(x * 2.0 - 1.0) * 0.5 + 0.5
        if orig != (size, size):
            y = jax.image.resize(y, (y.shape[0], *orig, 3), "linear")
        return np.asarray(jnp.clip(y, 0.0, 1.0))
