"""Torch-checkpoint -> JAX converter for the EG3D-family generator.

The reference loads SphereHead/PanoHead as a StyleGAN legacy pickle through
`legacy.load_network_pkl` (train/completion.py:592), which needs the original
repo's class definitions. In this framework the exchange format is the plain
``state_dict`` of ``G_ema`` (exportable from the original repo with
``torch.save(G_ema.state_dict(), 'g_ema.pth')``) or an ``.npz`` of the same
mapping. Names are preserved verbatim (backbone.mapping.*,
backbone.synthesis.b{res}.*, decoder.net.*, superresolution.block*.*);
tensor layouts already match the JAX graph (conv [O,I,kh,kw], fc [out,in]),
so conversion is a dtype/array copy plus a shape audit against
:class:`EG3DConfig`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.completion.eg3d.networks import EG3DConfig, Params

_PREFIXES = ("backbone.mapping.", "backbone.synthesis.", "decoder.",
             "superresolution.")


def infer_config(raw: Dict[str, np.ndarray]) -> EG3DConfig:
    """Derive an :class:`EG3DConfig` from checkpoint tensor shapes."""
    w_dim = raw["backbone.mapping.fc0.weight"].shape[0]
    n_map = len([k for k in raw
                 if k.startswith("backbone.mapping.fc") and k.endswith(".weight")])
    z_dim = raw["backbone.mapping.fc0.weight"].shape[1]
    c_dim = 0
    if "backbone.mapping.embed.weight" in raw:
        c_dim = raw["backbone.mapping.embed.weight"].shape[1]
        z_dim -= raw["backbone.mapping.embed.weight"].shape[0]
    res = max(int(k.split(".b")[1].split(".")[0]) for k in raw
              if k.startswith("backbone.synthesis.b") and ".conv1.weight" in k)
    img_ch = raw[f"backbone.synthesis.b{res}.torgb.weight"].shape[0]
    dec_in = raw["decoder.net.0.weight"].shape[1]
    dec_out = raw["decoder.net.2.weight"].shape[0] - 1
    depth = img_ch // (3 * dec_in)
    hidden = raw["decoder.net.0.weight"].shape[0]
    sr_blocks = len([k for k in raw
                     if k.startswith("superresolution.block")
                     and k.endswith(".torgb.weight")])
    ch_max = raw["backbone.synthesis.b4.const"].shape[0]
    # channel_base from the highest-res block's output channels
    ch_top = raw[f"backbone.synthesis.b{res}.conv1.weight"].shape[0]
    # SR blocks upsample from the NEURAL-rendering resolution (EG3D: 128)
    neural = 128 if res >= 128 else res // 2
    return EG3DConfig(
        z_dim=z_dim, c_dim=c_dim, w_dim=w_dim, num_mapping_layers=n_map,
        backbone_resolution=res, plane_channels=dec_in, triplane_depth=depth,
        channel_base=ch_top * res, channel_max=ch_max, decoder_hidden=hidden,
        decoder_out=dec_out,
        sr_resolution=neural * (2 ** sr_blocks),
        sr_channels=(raw["superresolution.block0.conv0.weight"].shape[0]
                     if sr_blocks else 128),
        neural_resolution=neural,
    )


def load_eg3d_from_torch(path: str,
                         cfg: Optional[EG3DConfig] = None):
    """Load a G_ema state_dict (.pth/.pt via torch, or .npz) into the flat
    JAX param dict. Returns (params, config) — config inferred from shapes
    unless given. Unknown keys are kept (name-indexed lookups ignore them);
    missing keys surface as KeyError at first forward, by design."""
    if path.endswith(".npz"):
        raw = {k: np.asarray(v) for k, v in np.load(path).items()}
    else:
        import torch  # CPU torch is available in-env; lazy import
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        raw = {k: v.detach().cpu().numpy() for k, v in sd.items()
               if hasattr(v, "detach")}
    raw = {k: v for k, v in raw.items() if k.startswith(_PREFIXES)}
    if not raw:
        raise ValueError(f"{path}: no EG3D generator tensors found "
                         f"(expected keys starting with {_PREFIXES})")
    params: Params = {k: jnp.asarray(v, jnp.float32) for k, v in raw.items()}
    if cfg is None:
        cfg = infer_config({k: np.asarray(v) for k, v in raw.items()})
    return params, cfg
