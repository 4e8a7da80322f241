"""Native LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

Replaces the reference's dependency on the external ``lpips`` torch package
(train/metrics.py:65 uses net='alex' for the eval meter; train/loss.py:91
uses net='vgg' for the optional loss term). Both backbones are implemented
natively here; weights come from a converted ``.npz`` or straight from the
official torch state dicts via :func:`load_lpips_from_torch`.

LPIPS(x, y) = sum_l mean_hw || lin_l * (nx_l - ny_l)^2 ||_c  where
nx_l are channel-unit-normalized backbone features and lin_l are learned
non-negative per-channel weights (R. Zhang et al., CVPR 2018 — the
richzhang/PerceptualSimilarity reference implementation v0.1).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# scaling layer constants (PerceptualSimilarity lpips/lpips.py ScalingLayer)
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

# torchvision alexnet.features: (out_ch, kernel, stride, pad); M = maxpool 3/2
_ALEX_CFG: Tuple = ((64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
                    (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1))
# relu outputs tapped after convs 0..4 (lpips/pretrained_networks.py alexnet
# slices 1..5)
_ALEX_SLICE_ENDS = (1, 2, 3, 4, 5)
_ALEX_CHANS = (64, 192, 384, 256, 256)

# full torchvision VGG16 features (13 convs); slices end after convs
# 2/4/7/10/13 (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_VGG_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512)
_VGG_SLICE_ENDS = (2, 4, 7, 10, 13)
_VGG_CHANS = (64, 128, 256, 512, 512)


class LpipsParams(NamedTuple):
    backbone: str                       # 'alex' | 'vgg'
    convs: List[Tuple[jax.Array, jax.Array]]   # [(w OIHW, b)] per conv
    lins: List[jax.Array]               # [C_l] non-negative per-slice weights


def _conv_specs(backbone: str):
    if backbone == "alex":
        cin, specs = 3, []
        for v in _ALEX_CFG:
            if v == "M":
                continue
            out, k, s, p = v
            specs.append((out, cin, k, s, p))
            cin = out
        return specs, _ALEX_SLICE_ENDS, _ALEX_CHANS
    if backbone == "vgg":
        cin, specs = 3, []
        for v in _VGG_CFG:
            if v == "M":
                continue
            specs.append((v, cin, 3, 1, 1))
            cin = v
        return specs, _VGG_SLICE_ENDS, _VGG_CHANS
    raise ValueError(f"unknown LPIPS backbone {backbone!r}")


def lpips_random_params(key, backbone: str = "alex",
                        dtype=jnp.float32) -> LpipsParams:
    """Random-init LPIPS params (structure tests / FLOP-true benches)."""
    specs, _, chans = _conv_specs(backbone)
    convs = []
    for out, cin, k, _, _ in specs:
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (out, cin, k, k), dtype) * np.sqrt(
            2.0 / (cin * k * k))
        convs.append((w, jnp.zeros((out,), dtype)))
    key, k2 = jax.random.split(key)
    lins = [jnp.abs(jax.random.normal(jax.random.fold_in(k2, i), (c,), dtype))
            / c for i, c in enumerate(chans)]
    return LpipsParams(backbone, convs, lins)


def _features(params: LpipsParams, x: jax.Array) -> List[jax.Array]:
    """x: [B, 3, H, W] scaled. Returns the 5 tapped relu outputs."""
    _, slice_ends, _ = _conv_specs(params.backbone)
    feats = []
    # walk the cfg so maxpools land in the right spots
    cfg = _ALEX_CFG if params.backbone == "alex" else _VGG_CFG
    conv_i = 0
    for v in cfg:
        if v == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 1, 3, 3) if params.backbone == "alex" else (1, 1, 2, 2),
                (1, 1, 2, 2), "VALID")
            continue
        w, b = params.convs[conv_i]
        stride = v[2] if params.backbone == "alex" else 1
        pad = v[3] if params.backbone == "alex" else 1
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        conv_i += 1
        if conv_i in slice_ends:
            feats.append(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    """Channel-dim unit normalization (lpips normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: LpipsParams, pred: jax.Array, gt: jax.Array,
                   normalize: bool = True) -> jax.Array:
    """LPIPS distance between [H,W,3] or [B,H,W,3] images.

    ``normalize=True`` matches the reference meters (train/metrics.py:72):
    inputs are [0,1] RGB and get rescaled to [-1,1] first.
    """
    if pred.ndim == 3:
        pred, gt = pred[None], gt[None]
    if normalize:
        pred = 2.0 * pred - 1.0
        gt = 2.0 * gt - 1.0
    # scaling layer, then NCHW
    pred = ((pred - _SHIFT) / _SCALE).transpose(0, 3, 1, 2)
    gt = ((gt - _SHIFT) / _SCALE).transpose(0, 3, 1, 2)
    fx = _features(params, pred)
    fy = _features(params, gt)
    total = 0.0
    for a, b, lin in zip(fx, fy, params.lins):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # [B, C, H, W]
        # 1x1 conv with non-negative lin weights + spatial average
        val = jnp.einsum("bchw,c->b", d, lin) / (d.shape[2] * d.shape[3])
        total = total + val
    return jnp.squeeze(total)


# ---------------------------------------------------------------------------
# weight ingestion
# ---------------------------------------------------------------------------

def save_lpips_npz(path: str, params: LpipsParams) -> None:
    arrs = {"backbone": np.asarray(params.backbone)}
    for i, (w, b) in enumerate(params.convs):
        arrs[f"w{i}"] = np.asarray(w)
        arrs[f"b{i}"] = np.asarray(b)
    for i, l in enumerate(params.lins):
        arrs[f"lin{i}"] = np.asarray(l)
    np.savez(path, **arrs)


def load_lpips_npz(path: str) -> LpipsParams:
    data = np.load(path)
    backbone = str(data["backbone"])
    n = sum(1 for k in data.files if k.startswith("w"))
    convs = [(jnp.asarray(data[f"w{i}"]), jnp.asarray(data[f"b{i}"]))
             for i in range(n)]
    lins = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
    return LpipsParams(backbone, convs, lins)


def load_lpips_from_torch(
    path: str,
    backbone: str = "alex",
    backbone_path: Optional[str] = None,
) -> LpipsParams:
    """Build :class:`LpipsParams` from torch checkpoints.

    Two accepted layouts:
      * ``path`` = full LPIPS state dict (``torch.save(lpips.LPIPS(
        net='alex').state_dict(), ...)``): contains both
        ``net.slice{k}.{i}.weight`` backbone convs and
        ``lin{k}.model.1.weight`` heads.
      * ``path`` = the official lin-only file (lpips/weights/v0.1/alex.pth,
        keys ``lin{k}.model.1.weight``) plus ``backbone_path`` = a
        torchvision backbone state dict (``features.{i}.weight``).
    """
    if path.endswith(".npz"):
        return load_lpips_npz(path)

    import torch

    sd = {k: v for k, v in torch.load(
        path, map_location="cpu", weights_only=True).items()}
    lins = []
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        if key not in sd:
            raise ValueError(f"missing {key} in {path} — not an LPIPS ckpt")
        lins.append(jnp.asarray(sd[key].numpy().reshape(-1)))

    conv_sd = sd
    prefix = "net."
    if not any(k.startswith("net.") for k in sd):
        if backbone_path is None:
            raise ValueError(
                f"{path} carries only the lin heads; pass backbone_path="
                "<torchvision alexnet/vgg16 state dict>")
        conv_sd = {k: v for k, v in torch.load(
            backbone_path, map_location="cpu", weights_only=True).items()}
        prefix = ""

    specs, _, chans = _conv_specs(backbone)
    for lin, c in zip(lins, chans):
        if lin.shape[0] != c:
            raise ValueError(
                f"lin head width {lin.shape[0]} != backbone {backbone} "
                f"channels {c} — wrong backbone?")

    convs = []
    if prefix:  # lpips layout: net.slice{k}.{idx}.weight with idx global
        keys = sorted(
            (k for k in conv_sd if k.startswith("net.") and k.endswith(".weight")),
            key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])),
        )
        for k in keys:
            w = conv_sd[k]
            b = conv_sd[k[:-len("weight")] + "bias"]
            convs.append((jnp.asarray(w.numpy()), jnp.asarray(b.numpy())))
    else:  # torchvision layout: features.{i}.weight
        idxs = sorted(
            int(k.split(".")[1]) for k in conv_sd
            if k.startswith("features.") and k.endswith(".weight"))
        for i in idxs:
            convs.append((jnp.asarray(conv_sd[f"features.{i}.weight"].numpy()),
                          jnp.asarray(conv_sd[f"features.{i}.bias"].numpy())))

    if len(convs) != len(specs):
        raise ValueError(
            f"found {len(convs)} convs, expected {len(specs)} for {backbone}")
    for (w, _), (out, cin, k, _, _) in zip(convs, specs):
        if tuple(w.shape) != (out, cin, k, k):
            raise ValueError(f"conv shape {tuple(w.shape)} != {(out, cin, k, k)}")
    return LpipsParams(backbone, convs, lins)
