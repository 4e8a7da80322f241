"""Native JAX face parsing for the completion pipeline's mask stage.

The reference's stage ⑧ (train/completion.py:818-886) runs a BiSeNet
face-parsing CNN (the `79999_iter.pth` checkpoint of face-parsing.PyTorch)
to turn pasted pseudo views into head masks, plus MODNet matting
(completion.py:888-1028) for torso boundaries. This module re-implements the
BiSeNet inference graph in pure JAX (ResNet-18 context path + attention
refinement + feature fusion, 19 face classes) so the mask stage runs
natively on TPU; the user supplies the public torch checkpoint and
:func:`load_bisenet_from_torch` converts it. Without weights the pipeline
keeps its alpha-threshold fallback (fateavatar_tpu/completion/pseudo.py).

Parameters are a flat ``{torch_param_name: array}`` dict (conv kernels
stored HWIO); the forward pass indexes by name, which keeps the converter a
one-liner per tensor and makes parity against the torch graph auditable.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

N_CLASSES = 19
# face-parsing.PyTorch class ids
CLASS_NAMES = (
    "background", "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g",
    "l_ear", "r_ear", "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck",
    "neck_l", "cloth", "hair", "hat",
)
# default head-mask classes: everything that is head/neck, excluding
# background and cloth (completion.py:846-852 keeps face+hair+ears+neck)
HEAD_CLASSES = tuple(
    i for i, n in enumerate(CLASS_NAMES) if n not in ("background", "cloth")
)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# primitive layers (inference only; BN folded at runtime)
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, padding=None):
    """torch conv2d semantics: SYMMETRIC padding k//2. XLA's string "SAME"
    pads (0, 1) for stride-2 even inputs where torch pads (1, 1) — every
    ResNet18 downsampling conv would shift one pixel."""
    if padding is None:
        kh, kw = w.shape[0], w.shape[1]
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, prefix, x, eps=1e-5):
    scale = p[f"{prefix}.weight"]
    bias = p[f"{prefix}.bias"]
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    inv = scale * jax.lax.rsqrt(var + eps)
    return x * inv + (bias - mean * inv)


def _conv_bn_relu(p, prefix, x, stride=1):
    """ConvBNReLU of face-parsing.PyTorch (conv no-bias + BN + relu)."""
    x = _conv(x, p[f"{prefix}.conv.weight"], stride)
    return jax.nn.relu(_bn(p, f"{prefix}.bn", x))


def _basic_block(p, prefix, x, stride=1):
    out = _conv(x, p[f"{prefix}.conv1.weight"], stride)
    out = jax.nn.relu(_bn(p, f"{prefix}.bn1", out))
    out = _conv(out, p[f"{prefix}.conv2.weight"], 1)
    out = _bn(p, f"{prefix}.bn2", out)
    if f"{prefix}.downsample.0.weight" in p:
        x = _conv(x, p[f"{prefix}.downsample.0.weight"], stride)
        x = _bn(p, f"{prefix}.downsample.1", x)
    return jax.nn.relu(out + x)


def _resnet18_features(p, x):
    """conv1 -> layer4, returning the 1/8, 1/16 and 1/32 feature maps."""
    x = _conv(x, p["cp.resnet.conv1.weight"], 2)
    x = jax.nn.relu(_bn(p, "cp.resnet.bn1", x))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for i in range(2):
        x = _basic_block(p, f"cp.resnet.layer1.{i}", x, 1)
    for i in range(2):
        x = _basic_block(p, f"cp.resnet.layer2.{i}", x, 2 if i == 0 else 1)
    feat8 = x
    for i in range(2):
        x = _basic_block(p, f"cp.resnet.layer3.{i}", x, 2 if i == 0 else 1)
    feat16 = x
    for i in range(2):
        x = _basic_block(p, f"cp.resnet.layer4.{i}", x, 2 if i == 0 else 1)
    return feat8, feat16, x


def _arm(p, prefix, x):
    """AttentionRefinementModule: 3x3 ConvBNReLU then global-pool channel
    attention (1x1 conv + BN + sigmoid)."""
    feat = _conv_bn_relu(p, f"{prefix}.conv", x)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = _conv(atten, p[f"{prefix}.conv_atten.weight"])
    atten = jax.nn.sigmoid(_bn(p, f"{prefix}.bn_atten", atten))
    return feat * atten


def _upsample_to(x, ref_hw, method="nearest"):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, ref_hw[0], ref_hw[1], c), method)


def bisenet_forward(params: Dict[str, jax.Array], images: jax.Array):
    """Face-parsing logits.

    images: [B, H, W, 3] float in [0, 1] (RGB). Returns [B, H, W, 19].
    Mirrors BiSeNet.forward of face-parsing.PyTorch (context path with
    ARM16/ARM32 + global-pool tail, feat8 as the spatial path, FFM fuse,
    main output head; aux heads dropped — inference only).
    """
    p = params
    x = (images - _IMAGENET_MEAN) / _IMAGENET_STD

    feat8, feat16, feat32 = _resnet18_features(p, x)

    avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
    avg = _conv_bn_relu(p, "cp.conv_avg", avg)
    avg_up = jnp.broadcast_to(
        avg, (avg.shape[0], feat32.shape[1], feat32.shape[2], avg.shape[3])
    )
    feat32_sum = _arm(p, "cp.arm32", feat32) + avg_up
    feat32_up = _upsample_to(feat32_sum, feat16.shape[1:3])
    feat32_up = _conv_bn_relu(p, "cp.conv_head32", feat32_up)

    feat16_sum = _arm(p, "cp.arm16", feat16) + feat32_up
    feat16_up = _upsample_to(feat16_sum, feat8.shape[1:3])
    feat16_up = _conv_bn_relu(p, "cp.conv_head16", feat16_up)

    # FeatureFusionModule: concat spatial (feat8) + context, 1x1 ConvBNReLU,
    # SE-style residual attention
    fcat = jnp.concatenate([feat8, feat16_up], axis=-1)
    feat = _conv_bn_relu(p, "ffm.convblk", fcat)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = jax.nn.relu(_conv(atten, p["ffm.conv1.weight"]))
    atten = jax.nn.sigmoid(_conv(atten, p["ffm.conv2.weight"]))
    feat = feat * atten + feat

    out = _conv_bn_relu(p, "conv_out.conv", feat)
    out = _conv(out, p["conv_out.conv_out.weight"])
    out = out + p["conv_out.conv_out.bias"]
    return _upsample_to(out, images.shape[1:3], "bilinear")


# ---------------------------------------------------------------------------
# parameters: shape table, random init (tests), torch converter
# ---------------------------------------------------------------------------

def _shape_table(n_classes=N_CLASSES) -> Dict[str, tuple]:
    t: Dict[str, tuple] = {}

    def bn(prefix, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            t[f"{prefix}.{s}"] = (c,)

    def cbr(prefix, cin, cout, k):
        t[f"{prefix}.conv.weight"] = (k, k, cin, cout)
        bn(f"{prefix}.bn", cout)

    t["cp.resnet.conv1.weight"] = (7, 7, 3, 64)
    bn("cp.resnet.bn1", 64)
    chans = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer, (cin, cout) in chans.items():
        for i in range(2):
            ci = cin if i == 0 else cout
            pre = f"cp.resnet.layer{layer}.{i}"
            t[f"{pre}.conv1.weight"] = (3, 3, ci, cout)
            bn(f"{pre}.bn1", cout)
            t[f"{pre}.conv2.weight"] = (3, 3, cout, cout)
            bn(f"{pre}.bn2", cout)
            if i == 0 and layer > 1:
                t[f"{pre}.downsample.0.weight"] = (1, 1, cin, cout)
                bn(f"{pre}.downsample.1", cout)
    for name, cin in (("cp.arm16", 256), ("cp.arm32", 512)):
        cbr(f"{name}.conv", cin, 128, 3)
        t[f"{name}.conv_atten.weight"] = (1, 1, 128, 128)
        bn(f"{name}.bn_atten", 128)
    cbr("cp.conv_avg", 512, 128, 1)
    cbr("cp.conv_head32", 128, 128, 3)
    cbr("cp.conv_head16", 128, 128, 3)
    cbr("ffm.convblk", 256, 256, 1)
    t["ffm.conv1.weight"] = (1, 1, 256, 64)
    t["ffm.conv2.weight"] = (1, 1, 64, 256)
    cbr("conv_out.conv", 256, 256, 3)
    t["conv_out.conv_out.weight"] = (1, 1, 256, n_classes)
    t["conv_out.conv_out.bias"] = (n_classes,)
    return t


def init_bisenet(rng: np.random.Generator | int = 0,
                 n_classes: int = N_CLASSES) -> Dict[str, jax.Array]:
    """Random parameters with the real shapes (tests / shape checks)."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    params = {}
    for name, shape in _shape_table(n_classes).items():
        if name.endswith("running_var"):
            arr = np.abs(rng.normal(1.0, 0.1, shape)) + 0.5
        elif name.endswith((".weight",)) and len(shape) == 1:
            arr = np.ones(shape)
        elif name.endswith(("running_mean", ".bias")):
            arr = np.zeros(shape)
        else:
            fan_in = int(np.prod(shape[:-1])) if len(shape) == 4 else shape[0]
            arr = rng.normal(0, (2.0 / max(fan_in, 1)) ** 0.5, shape)
        params[name] = jnp.asarray(arr, jnp.float32)
    return params


def load_bisenet_from_torch(path: str) -> Dict[str, jax.Array]:
    """Convert the public face-parsing.PyTorch checkpoint (79999_iter.pth,
    a plain state_dict) to this module's flat param dict. Conv kernels are
    transposed OIHW -> HWIO; aux heads (conv_out16/32) and BN
    num_batches_tracked counters are dropped."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict) or "cp.resnet.conv1.weight" not in sd:
        raise ValueError(
            f"{path} does not look like a face-parsing.PyTorch state_dict"
        )
    table = _shape_table()
    params: Dict[str, jax.Array] = {}
    for name, shape in table.items():
        if name not in sd:
            raise KeyError(f"missing tensor in checkpoint: {name}")
        arr = sd[name].detach().numpy()
        if arr.ndim == 4:  # OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        if arr.shape != shape:
            raise ValueError(f"{name}: expected {shape}, got {arr.shape}")
        params[name] = jnp.asarray(arr, jnp.float32)
    return params


# ---------------------------------------------------------------------------
# mask derivation (the matting_fn contract of PseudoGenerator)
# ---------------------------------------------------------------------------

def parse_faces(params, images: jax.Array) -> jax.Array:
    """[B, H, W, 3] in [0,1] -> per-pixel class ids [B, H, W] int32."""
    return jnp.argmax(bisenet_forward(params, images), axis=-1)


def make_bisenet_matting_fn(params,
                            include: Sequence[int] = HEAD_CLASSES,
                            infer_size: int = 512):
    """Build a ``matting_fn(img [H,W,3] float) -> mask [H,W] float`` for
    :class:`fateavatar_tpu.completion.pseudo.PseudoGenerator`. The image is
    resized to ``infer_size`` for the network (the checkpoint's training
    resolution) and the mask is resized back."""
    include_arr = jnp.asarray(sorted(include), jnp.int32)

    @jax.jit
    def _infer(img):
        x = jax.image.resize(img[None], (1, infer_size, infer_size, 3),
                             "bilinear")
        cls = parse_faces(params, x)[0]
        m = jnp.isin(cls, include_arr).astype(jnp.float32)
        return jax.image.resize(m[None, ..., None],
                                (1,) + img.shape[:2] + (1,),
                                "nearest")[0, ..., 0]

    def matting_fn(img: np.ndarray) -> np.ndarray:
        return np.asarray(_infer(jnp.asarray(img, jnp.float32)))

    return matting_fn
