"""EG3D-family 3D-aware generator (tri-plane / tri-grid) in pure JAX.

This is the real generative prior behind the completion pipeline's stage ⑤
(GAN inversion) — the reference drives SphereHead/PanoHead, an EG3D-style
generator, through PTI (train/completion.py:564-655, tools/eg3d_utils/pti.py).
Here the full generator graph is re-implemented TPU-natively:

  mapping  : z (512) + camera label c (25) -> w (512) -> broadcast num_ws
  backbone : StyleGAN2 synthesis -> feature planes
             [3*C, H, W] tri-plane (EG3D) or [3*D*C, H, W] tri-grid
             (PanoHead/SphereHead generalization, ``triplane_depth`` > 1)
  decoder  : per-sample 2-layer MLP (softplus hidden) -> sigma + feature
  renderer : two-pass importance-sampled volume rendering along camera rays
  superres : StyleGAN2 blocks upsampling the neural-resolution feature image

Parameters live in a flat ``{torch_name: array}`` dict whose names follow the
official StyleGAN2-ADA / EG3D ``state_dict`` layout (backbone.mapping.fc*,
backbone.synthesis.b{res}.conv*, decoder.net.*, superresolution.block*), so
:func:`fateavatar_tpu.completion.eg3d.convert.load_eg3d_from_torch` is a
name-preserving tensor copy and parity against the torch graph is auditable
(the same convention as the native BiSeNet port, completion/segmentation.py).

All compute-heavy pieces are jit-friendly: static shapes, `lax`-only control
flow, bilinear plane sampling as gathers (MXU-batched matmuls dominate in the
synthesis/decoder). Convolution upsampling uses zero-stuff + [1,3,3,1] FIR
blur, interior-equivalent to torch's conv_transpose+filter ordering.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EG3DConfig:
    z_dim: int = 512
    c_dim: int = 25                  # 16 cam2world + 9 intrinsics (EG3D label)
    w_dim: int = 512
    num_mapping_layers: int = 8
    backbone_resolution: int = 256   # tri-plane texture resolution
    plane_channels: int = 32
    triplane_depth: int = 1          # 1 = EG3D tri-plane, >1 = tri-grid
    channel_base: int = 32768
    channel_max: int = 512
    decoder_hidden: int = 64
    decoder_out: int = 32            # feature channels fed to superres
    neural_resolution: int = 128     # volume-rendering resolution
    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    ray_start: float = 2.25
    ray_end: float = 3.3
    box_warp: float = 1.0
    sr_resolution: int = 512         # final image resolution
    sr_channels: int = 128
    sigma_bias: float = -1.0         # softplus(sigma + bias), EG3D uses -1

    @property
    def backbone_img_channels(self) -> int:
        return 3 * self.triplane_depth * self.plane_channels

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        return tuple(2 ** i for i in range(2, int(math.log2(self.backbone_resolution)) + 1))

    def nf(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        # StyleGAN2: 1 conv at 4x4, 2 per later block, +1 final torgb.
        return 1 + 2 * (len(self.block_resolutions) - 1) + 1

    @property
    def sr_block_resolutions(self) -> Tuple[int, ...]:
        res, out = [], self.neural_resolution
        while out < self.sr_resolution:
            out *= 2
            res.append(out)
        return tuple(res)


def tiny_test_config() -> EG3DConfig:
    """A CPU-fast configuration used by the test suite."""
    return EG3DConfig(
        z_dim=32, w_dim=32, num_mapping_layers=2, backbone_resolution=32,
        plane_channels=8, channel_base=512, channel_max=64, decoder_hidden=16,
        decoder_out=8, neural_resolution=16, depth_resolution=12,
        depth_resolution_importance=12, sr_resolution=32, sr_channels=16,
    )


# ---------------------------------------------------------------------------
# primitive layers (StyleGAN2-ADA runtime semantics)
# ---------------------------------------------------------------------------

def _fc(p: Params, name: str, x: jax.Array, act: str = "linear",
        lr_mult: float = 1.0) -> jax.Array:
    """FullyConnectedLayer: weight [out,in] stored unit-variance, runtime
    gain lr_mult/sqrt(in), bias gain lr_mult, optional lrelu(gain sqrt2)."""
    w = p[f"{name}.weight"]
    gain = lr_mult / math.sqrt(w.shape[1])
    y = x @ (w.T * gain)
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b * lr_mult
    if act == "lrelu":
        y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2.0)
    elif act == "softplus":
        y = jax.nn.softplus(y)
    return y


def _normalize_2nd_moment(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


_FIR = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
_FIR = np.outer(_FIR, _FIR)
_FIR /= _FIR.sum()


def _upsample2x(x: jax.Array) -> jax.Array:
    """upfirdn2d up=2 with the [1,3,3,1] filter, gain 4. x is NHWC."""
    c = x.shape[-1]
    f = jnp.asarray(_FIR * 4.0, x.dtype)
    kern = jnp.tile(f[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    # lhs_dilation yields length 2H-1 (no trailing stuffed zero), so the
    # trailing pad is 1 (torch upfirdn) + 1 (the missing zero) = 2.
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _modulated_conv2d(x: jax.Array, weight: jax.Array, styles: jax.Array,
                      demodulate: bool = True, up: bool = False) -> jax.Array:
    """StyleGAN2 modulated conv. x [N,H,W,Cin], weight [O,I,kh,kw] (torch
    layout), styles [N,I]. Batch-1 fast path is the common case here."""
    if up:
        x = _upsample2x(x)
    o, i, kh, kw = weight.shape
    n = x.shape[0]
    w = weight[None] * styles[:, None, :, None, None]          # [N,O,I,kh,kw]
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)
        w = w * d[:, :, None, None, None]
    # grouped conv over batch: fold batch into channels (batch-major groups)
    w = jnp.transpose(w, (3, 4, 2, 0, 1)).reshape(kh, kw, i, n * o)  # HWIO
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, x.shape[1], x.shape[2], n * i)
    y = jax.lax.conv_general_dilated(
        xg, w, (1, 1), "SAME", feature_group_count=n,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(x.shape[1], x.shape[2], n, o)
    return jnp.transpose(y, (2, 0, 1, 3))


def _synthesis_layer(p: Params, name: str, x: jax.Array, w: jax.Array,
                     up: bool = False, noise: bool = True) -> jax.Array:
    styles = _fc(p, f"{name}.affine", w)  # affine bias stored (init 1)
    y = _modulated_conv2d(x, p[f"{name}.weight"], styles, demodulate=True, up=up)
    if noise and f"{name}.noise_const" in p:
        y = y + p[f"{name}.noise_const"][None, :, :, None] * p[f"{name}.noise_strength"]
    y = y + p[f"{name}.bias"][None, None, None, :]
    y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2.0)
    return jnp.clip(y, -256.0, 256.0)


def _torgb(p: Params, name: str, x: jax.Array, w: jax.Array) -> jax.Array:
    weight = p[f"{name}.weight"]
    styles = _fc(p, f"{name}.affine", w) * (1.0 / math.sqrt(weight.shape[1]))
    y = _modulated_conv2d(x, weight, styles, demodulate=False)
    return y + p[f"{name}.bias"][None, None, None, :]


# ---------------------------------------------------------------------------
# mapping + backbone synthesis
# ---------------------------------------------------------------------------

def mapping_network(p: Params, cfg: EG3DConfig, z: jax.Array, c: jax.Array,
                    truncation_psi: float = 1.0) -> jax.Array:
    """z [N,z_dim], c [N,c_dim] -> ws [N,num_ws,w_dim]
    (StyleGAN2-ADA MappingNetwork with EG3D camera conditioning)."""
    x = _normalize_2nd_moment(z)
    if cfg.c_dim > 0 and "backbone.mapping.embed.weight" in p:
        y = _normalize_2nd_moment(_fc(p, "backbone.mapping.embed", c))
        x = jnp.concatenate([x, y], axis=-1)
    for i in range(cfg.num_mapping_layers):
        x = _fc(p, f"backbone.mapping.fc{i}", x, act="lrelu", lr_mult=0.01)
    if truncation_psi != 1.0 and "backbone.mapping.w_avg" in p:
        x = p["backbone.mapping.w_avg"] + truncation_psi * (x - p["backbone.mapping.w_avg"])
    return jnp.repeat(x[:, None, :], cfg.num_ws, axis=1)


def synthesis_backbone(p: Params, cfg: EG3DConfig, ws: jax.Array) -> jax.Array:
    """ws [N,num_ws,w_dim] -> planes [N,H,W,3*D*C] (NHWC feature texture)."""
    n = ws.shape[0]
    img = None
    x = None
    w_idx = 0
    for res in cfg.block_resolutions:
        bname = f"backbone.synthesis.b{res}"
        if res == 4:
            const = p[f"{bname}.const"]                  # [C,4,4] torch layout
            x = jnp.transpose(const, (1, 2, 0))[None].repeat(n, axis=0)
            x = _synthesis_layer(p, f"{bname}.conv1", x, ws[:, w_idx])
            w_idx += 1
        else:
            x = _synthesis_layer(p, f"{bname}.conv0", x, ws[:, w_idx], up=True)
            x = _synthesis_layer(p, f"{bname}.conv1", x, ws[:, w_idx + 1])
            w_idx += 2
        y = _torgb(p, f"{bname}.torgb", x, ws[:, w_idx])
        img = y if img is None else _upsample2x(img) + y
    return img


# ---------------------------------------------------------------------------
# tri-plane / tri-grid sampling + decoder
# ---------------------------------------------------------------------------

def _grid_sample_plane(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample with zeros padding, align_corners=False.
    plane [H,W,C], uv [M,2] in [-1,1] -> [M,C]."""
    h, w = plane.shape[:2]
    x = (uv[:, 0] + 1.0) * 0.5 * w - 0.5
    y = (uv[:, 1] + 1.0) * 0.5 * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def tap(yi, xi):
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[:, None]
        v = plane[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside, v, 0.0)

    return (tap(y0, x0) * (1 - fx) * (1 - fy) + tap(y0, x0 + 1) * fx * (1 - fy)
            + tap(y0 + 1, x0) * (1 - fx) * fy + tap(y0 + 1, x0 + 1) * fx * fy)


def sample_planes(cfg: EG3DConfig, planes: jax.Array, coords: jax.Array) -> jax.Array:
    """planes [H,W,3*D*C] (one sample), coords [M,3] world -> [M,3,C].

    Projections follow EG3D's generate_planes: (x,y), (x,z), (z,y)
    (training/volumetric_rendering/renderer.py in the EG3D release).
    For tri-grid (D>1) the third coordinate linearly interpolates between
    the D depth slices of each plane (PanoHead generalization)."""
    h, w = planes.shape[:2]
    d, c = cfg.triplane_depth, cfg.plane_channels
    pl = planes.reshape(h, w, 3, d, c)
    ndc = coords * (2.0 / cfg.box_warp)                 # [-1,1] inside box
    uvs = (
        ndc[:, (0, 1)],     # plane 0: XY
        ndc[:, (0, 2)],     # plane 1: XZ
        ndc[:, (2, 1)],     # plane 2: ZY
    )
    third = (ndc[:, 2], ndc[:, 1], ndc[:, 0])
    outs = []
    for i in range(3):
        if d == 1:
            outs.append(_grid_sample_plane(pl[:, :, i, 0], uvs[i]))
        else:
            t = jnp.clip((third[i] + 1.0) * 0.5, 0.0, 1.0) * (d - 1)
            lo = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, d - 2)
            frac = (t - lo)[:, None]
            stack = jnp.stack([_grid_sample_plane(pl[:, :, i, k], uvs[i])
                               for k in range(d)])      # [D,M,C]
            m = jnp.arange(uvs[i].shape[0])
            outs.append(stack[lo, m] * (1 - frac) + stack[lo + 1, m] * frac)
    return jnp.stack(outs, axis=1)                       # [M,3,C]


def decode_samples(p: Params, cfg: EG3DConfig, feats: jax.Array):
    """feats [M,3,C] -> (sigma [M,1], rgb_feat [M,decoder_out]).
    OSGDecoder: mean over planes, FC-softplus-FC, sigmoid color scaling."""
    x = jnp.mean(feats, axis=1)
    x = _fc(p, "decoder.net.0", x, act="softplus")
    x = _fc(p, "decoder.net.2", x)
    sigma = x[:, :1]
    rgb = jax.nn.sigmoid(x[:, 1:]) * (1 + 2 * 0.001) - 0.001
    return sigma, rgb


# ---------------------------------------------------------------------------
# ray sampling + two-pass importance volume rendering
# ---------------------------------------------------------------------------

def camera_rays(cam2world: jax.Array, intrinsics: jax.Array, resolution: int):
    """EG3D RaySampler: pixel-center rays in world space.
    cam2world [4,4], intrinsics [3,3] normalized (fx,fy,cx,cy in units of
    image size). Returns origins [R*R,3], directions [R*R,3]."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    uv = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    u, v = jnp.meshgrid(uv, uv, indexing="xy")           # u right, v down
    x_cam = (u.reshape(-1) - cx) / fx
    y_cam = (v.reshape(-1) - cy) / fy
    dirs_cam = jnp.stack([x_cam, y_cam, jnp.ones_like(x_cam)], axis=-1)
    dirs_world = dirs_cam @ cam2world[:3, :3].T
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam2world[:3, 3], dirs_world.shape)
    return origins, dirs_world


def _composite(cfg: EG3DConfig, sigmas, rgbs, depths):
    """MipRayMarcher2 mid-point compositing. sigmas [R,S,1], rgbs [R,S,C],
    depths [R,S,1] sorted ascending -> (feature [R,C], depth [R,1], wsum)."""
    deltas = depths[:, 1:] - depths[:, :-1]
    sig_mid = jax.nn.softplus((sigmas[:, :-1] + sigmas[:, 1:]) * 0.5 + cfg.sigma_bias)
    rgb_mid = (rgbs[:, :-1] + rgbs[:, 1:]) * 0.5
    dep_mid = (depths[:, :-1] + depths[:, 1:]) * 0.5
    alpha = 1.0 - jnp.exp(-sig_mid * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
    weights = alpha * trans
    feature = jnp.sum(weights * rgb_mid, axis=1)
    depth = jnp.sum(weights * dep_mid, axis=1)
    return feature, depth, jnp.sum(weights, axis=1), weights


def _sample_importance(key, weights: jax.Array, depths: jax.Array, n_new: int):
    """Inverse-CDF sampling of n_new depths from per-ray weight histograms.
    weights [R,S,1] over the midpoint bins, depths [R,S+1?,1]: here depths
    are the coarse sample positions [R,S,1]; bins are between them."""
    w = weights[:, :, 0] + 1e-5                           # [R,B]
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R,B+1]
    u = (jnp.arange(n_new, dtype=jnp.float32) + 0.5) / n_new
    if key is not None:
        u = u + jax.random.uniform(key, (weights.shape[0], n_new),
                                   minval=-0.5 / n_new, maxval=0.5 / n_new)
    else:
        u = jnp.broadcast_to(u, (weights.shape[0], n_new))
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, u) - 1, 0, w.shape[1] - 1)
    r = jnp.arange(weights.shape[0])[:, None]
    c0, c1 = cdf[r, idx], cdf[r, idx + 1]
    frac = jnp.where(c1 > c0, (u - c0) / (c1 - c0 + 1e-10), 0.5)
    d_lo = depths[r, idx, 0]
    d_hi = depths[r, jnp.clip(idx + 1, 0, depths.shape[1] - 1), 0]
    return (d_lo + frac * (d_hi - d_lo))[:, :, None]


def render_rays(p: Params, cfg: EG3DConfig, planes: jax.Array,
                origins: jax.Array, dirs: jax.Array, key=None):
    """Two-pass importance rendering of [R] rays against one plane set."""
    r = origins.shape[0]
    s = cfg.depth_resolution
    t = jnp.linspace(cfg.ray_start, cfg.ray_end, s, dtype=jnp.float32)
    depths = jnp.broadcast_to(t[None, :, None], (r, s, 1))

    def run(depths_):
        pts = origins[:, None, :] + dirs[:, None, :] * depths_
        feats = sample_planes(cfg, planes, pts.reshape(-1, 3))
        sig, rgb = decode_samples(p, cfg, feats)
        return (sig.reshape(r, -1, 1), rgb.reshape(r, -1, cfg.decoder_out))

    sig_c, rgb_c = run(depths)
    _, _, _, w_c = _composite(cfg, sig_c, rgb_c, depths)
    n_imp = cfg.depth_resolution_importance
    if n_imp > 0:
        d_fine = _sample_importance(key, jax.lax.stop_gradient(w_c),
                                    jax.lax.stop_gradient(depths), n_imp)
        sig_f, rgb_f = run(d_fine)
        all_d = jnp.concatenate([depths, d_fine], axis=1)
        order = jnp.argsort(all_d[:, :, 0], axis=-1)
        ridx = jnp.arange(r)[:, None]
        all_d = all_d[ridx, order]
        all_sig = jnp.concatenate([sig_c, sig_f], axis=1)[ridx, order]
        all_rgb = jnp.concatenate([rgb_c, rgb_f], axis=1)[ridx, order]
    else:
        all_d, all_sig, all_rgb = depths, sig_c, rgb_c
    feature, depth, wsum, _ = _composite(cfg, all_sig, all_rgb, all_d)
    return feature, depth, wsum


# ---------------------------------------------------------------------------
# super-resolution
# ---------------------------------------------------------------------------

def superresolution(p: Params, cfg: EG3DConfig, rgb: jax.Array,
                    features: jax.Array, w_last: jax.Array):
    """EG3D SuperresolutionHybrid: StyleGAN2 blocks lifting the neural
    feature image to sr_resolution. rgb [N,h,w,3], features [N,h,w,F]."""
    x = features
    for bi, res in enumerate(cfg.sr_block_resolutions):
        bname = f"superresolution.block{bi}"
        x = _synthesis_layer(p, f"{bname}.conv0", x, w_last, up=True, noise=False)
        x = _synthesis_layer(p, f"{bname}.conv1", x, w_last, noise=False)
        rgb = _upsample2x(rgb) + _torgb(p, f"{bname}.torgb", x, w_last)
    return rgb


# ---------------------------------------------------------------------------
# full synthesis
# ---------------------------------------------------------------------------

def synthesis(p: Params, cfg: EG3DConfig, ws: jax.Array, c: jax.Array,
              key=None, return_raw: bool = False):
    """ws [N,num_ws,w_dim], c [N,25] -> dict with 'image' [N,S,S,3] in
    [-1,1], 'image_raw' (neural res rgb), 'image_depth'.
    Mirrors TriPlaneGenerator.synthesis (EG3D) with batch vmapped.
    A single pivot ws broadcasts across a batch of camera labels (the
    multi-view PTI case)."""
    planes = synthesis_backbone(p, cfg, ws)              # [B0,H,W,3DC]
    if ws.shape[0] == 1 and c.shape[0] > 1:
        ws = jnp.broadcast_to(ws, (c.shape[0],) + ws.shape[1:])
        planes = jnp.broadcast_to(planes, (c.shape[0],) + planes.shape[1:])
    n = ws.shape[0]
    cam2world = c[:, :16].reshape(n, 4, 4)
    intr = c[:, 16:25].reshape(n, 3, 3)
    res = cfg.neural_resolution

    def one(plane_i, c2w_i, k_i):
        o, d = camera_rays(c2w_i, k_i, res)
        feat, depth, _ = render_rays(p, cfg, plane_i, o, d, key)
        feat = feat.reshape(res, res, cfg.decoder_out)
        depth = depth.reshape(res, res, 1)
        return feat, depth

    feats, depths = jax.vmap(one)(planes, cam2world, intr)
    rgb_raw = feats[..., :3]
    image = superresolution(p, cfg, rgb_raw, feats, ws[:, -1])
    out = {"image": image, "image_raw": rgb_raw, "image_depth": depths}
    if return_raw:
        out["planes"] = planes
    return out


def render_full(p: Params, cfg: EG3DConfig, z: jax.Array, c: jax.Array,
                truncation_psi: float = 1.0, key=None):
    """G(z, c) -> image dict (mapping + synthesis)."""
    ws = mapping_network(p, cfg, z, c, truncation_psi)
    return synthesis(p, cfg, ws, c, key=key)


# ---------------------------------------------------------------------------
# EG3D camera label (tools/crop_utils/affine_util.py:5-28 eg3dcamparams)
# ---------------------------------------------------------------------------

def eg3d_camera_label(cam2world: np.ndarray, focal: float = 4.2647) -> np.ndarray:
    """25-d label: flattened cam2world + normalized intrinsics."""
    k = np.array([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]], np.float32)
    return np.concatenate([np.asarray(cam2world, np.float32).reshape(16),
                           k.reshape(9)])


# ---------------------------------------------------------------------------
# random init (tests / weight-free experimentation)
# ---------------------------------------------------------------------------

def eg3d_random_params(key, cfg: EG3DConfig, dtype=jnp.float32) -> Params:
    """Random parameters with the exact checkpoint names/shapes the
    converter produces. StyleGAN2 stores unit-variance weights."""
    p: Params = {}
    keys = iter(jax.random.split(key, 4096))

    def randn(shape):
        return jax.random.normal(next(keys), shape, dtype)

    def fc(name, i, o, bias_init=0.0):
        p[f"{name}.weight"] = randn((o, i))
        p[f"{name}.bias"] = jnp.full((o,), bias_init, dtype)

    # mapping — torch init is randn/lr_multiplier (lr_mult 0.01), so the
    # runtime product weight*gain stays O(1/sqrt(in)) at init
    fc("backbone.mapping.embed", cfg.c_dim, cfg.w_dim)
    in_dim = cfg.z_dim + cfg.w_dim
    for i in range(cfg.num_mapping_layers):
        fc(f"backbone.mapping.fc{i}", in_dim, cfg.w_dim)
        p[f"backbone.mapping.fc{i}.weight"] = (
            p[f"backbone.mapping.fc{i}.weight"] / 0.01)
        in_dim = cfg.w_dim
    p["backbone.mapping.w_avg"] = jnp.zeros((cfg.w_dim,), dtype)

    # synthesis backbone
    def conv_layer(name, i, o, k, res):
        p[f"{name}.weight"] = randn((o, i, k, k))
        p[f"{name}.bias"] = jnp.zeros((o,), dtype)
        p[f"{name}.noise_const"] = randn((res, res))
        p[f"{name}.noise_strength"] = jnp.zeros((), dtype)
        fc(f"{name}.affine", cfg.w_dim, i, bias_init=1.0)

    def torgb_layer(name, i, o):
        p[f"{name}.weight"] = randn((o, i, 1, 1))
        p[f"{name}.bias"] = jnp.zeros((o,), dtype)
        fc(f"{name}.affine", cfg.w_dim, i, bias_init=1.0)

    img_ch = cfg.backbone_img_channels
    for res in cfg.block_resolutions:
        bname = f"backbone.synthesis.b{res}"
        o = cfg.nf(res)
        if res == 4:
            p[f"{bname}.const"] = randn((o, 4, 4))
            conv_layer(f"{bname}.conv1", o, o, 3, res)
        else:
            i = cfg.nf(res // 2)
            conv_layer(f"{bname}.conv0", i, o, 3, res)
            conv_layer(f"{bname}.conv1", o, o, 3, res)
        torgb_layer(f"{bname}.torgb", o, img_ch)

    # decoder
    fc("decoder.net.0", cfg.plane_channels, cfg.decoder_hidden)
    fc("decoder.net.2", cfg.decoder_hidden, 1 + cfg.decoder_out)

    # superresolution
    in_ch = cfg.decoder_out
    for bi, res in enumerate(cfg.sr_block_resolutions):
        bname = f"superresolution.block{bi}"
        conv_layer(f"{bname}.conv0", in_ch, cfg.sr_channels, 3, res)
        conv_layer(f"{bname}.conv1", cfg.sr_channels, cfg.sr_channels, 3, res)
        torgb_layer(f"{bname}.torgb", cfg.sr_channels, 3)
        in_ch = cfg.sr_channels
    return p
