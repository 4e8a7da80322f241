"""FlashAvatar baseline: UV-embedded canonical splats + MLP deformation.

TPU-native re-design of model/baseline/flashavatar.py:46-464 (Xiang et al.,
CVPR 2024, re-implemented by the reference behind its shared trainer).
Canonical splats come from a non-strict 128^2 UV sampling; a 6-layer
MLP(256) conditioned on [PE(xyz_canonical), expression, jaw, eyes] predicts
10 deltas (pos 3, rot 4, scale 3) applied before rendering. The entire
deformer is a batched matmul stack — the best possible fit for the MXU.

Semantics preserved:
* positional encoding with 8 octaves incl. identity (flashavatar.py:404-440)
* deltas tanh-squashed; rot real part exp()'d; scale delta exp()'d and
  MULTIPLIED onto the log-scaling (flashavatar.py:253-276 — quirky but
  faithful)
* quaternion composition splat ⊗ delta (flashavatar.py:382-394)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from fateavatar_tpu.flame.flame import FlameModel, flame_forward
from fateavatar_tpu.ops import sampling
from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.ops.knn import mean_knn_distance
from fateavatar_tpu.ops.mesh import reweight_verts_by_barycoords
from fateavatar_tpu.ops.quaternion import quat_multiply
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians, inverse_sigmoid
from fateavatar_tpu.utils.obj_io import ObjMesh


def positional_encoding(x: jax.Array, n_freqs: int = 8) -> jax.Array:
    """[..., d] -> [..., d * (1 + 2*n_freqs)] with log-spaced octaves."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


class DeformMLP(nn.Module):
    """6 hidden layers of 256, ReLU, linear head (flashavatar.py:443-464)."""

    hidden_dim: int = 256
    hidden_layers: int = 6
    output_dim: int = 10

    @nn.compact
    def __call__(self, x):
        for _ in range(self.hidden_layers):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


@struct.dataclass
class FlashConfig:
    tex_size: int = struct.field(pytree_node=False, default=128)
    pts_freq: int = struct.field(pytree_node=False, default=8)
    img_height: int = struct.field(pytree_node=False, default=512)
    img_width: int = struct.field(pytree_node=False, default=512)


@struct.dataclass
class FlashModel:
    flame: FlameModel
    faces: jax.Array
    face_index: jax.Array        # [N]
    bary_coords: jax.Array       # [N, 3]
    cano_embedded: jax.Array     # [N, pe_dim] PE of canonical template points
    bg_color: jax.Array
    cfg: FlashConfig = struct.field(pytree_node=False)


@struct.dataclass
class FlashParams:
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    deformer: dict               # flax param tree


def init_flashavatar(template: ObjMesh, flame: FlameModel, cfg: FlashConfig,
                     bg_color=(1.0, 1.0, 1.0), seed: int = 0):
    """Non-strict UV sampling (actual texel count, flashavatar.py:160-165),
    KNN scale init, neutral splat attributes, deformer init."""
    f_idx, bary = sampling.uniform_sampling_barycoords(
        cfg.tex_size * cfg.tex_size,
        template.uvcoords, template.uvfaces, strict=False,
    )
    face_index = jnp.asarray(f_idx)
    bary_coords = jnp.asarray(bary)
    faces = jnp.asarray(template.faces, jnp.int32)

    verts_sampling = reweight_verts_by_barycoords(
        jnp.asarray(template.verts), faces, face_index, bary_coords
    )
    scale_init = jnp.log(jnp.mean(mean_knn_distance(verts_sampling)))
    cano_embedded = positional_encoding(verts_sampling, cfg.pts_freq)

    n = face_index.shape[0]
    params_attrs = dict(
        features_dc=jnp.zeros((n, 1, 3), jnp.float32),
        features_rest=jnp.zeros((n, 1, 3), jnp.float32),
        scaling=jnp.full((n, 3), scale_init),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        opacity=jnp.full((n, 1), inverse_sigmoid(jnp.float32(0.1))),
    )

    net = DeformMLP()
    pe_dim = cano_embedded.shape[-1]
    cond_dim = pe_dim + flame.n_exp + 3 + 6
    variables = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, cond_dim))
    )

    model = FlashModel(
        flame=flame, faces=faces, face_index=face_index,
        bary_coords=bary_coords, cano_embedded=cano_embedded,
        bg_color=jnp.asarray(bg_color, jnp.float32), cfg=cfg,
    )
    params = FlashParams(deformer=variables["params"], **params_attrs)
    return model, params, net


def flash_forward(model: FlashModel, params: FlashParams, net,
                  expression, flame_pose, camera: Camera,
                  bg_color=None, render_cfg: RenderConfig = RenderConfig(),
                  means2d_probe=None):
    """flashavatar.py:224-295: condition the deformer on [PE(cano), exp,
    jaw, eyes], apply tanh'd deltas, render."""
    jaw = flame_pose[6:9]
    eyes = flame_pose[9:15]
    n = model.face_index.shape[0]
    cond = jnp.concatenate([expression, jaw, eyes])
    inp = jnp.concatenate(
        [model.cano_embedded, jnp.broadcast_to(cond, (n, cond.shape[0]))],
        axis=-1,
    )
    deforms = jnp.tanh(net.apply({"params": params.deformer}, inp))

    pos_delta = deforms[:, :3]
    rot_delta = jnp.concatenate(
        [jnp.exp(deforms[:, 3:4]), deforms[:, 4:7]], axis=-1
    )
    scale_delta = jnp.exp(deforms[:, 7:10])

    verts, _, _ = flame_forward(model.flame, expression[None], flame_pose[None])
    pos = reweight_verts_by_barycoords(
        verts[0], model.faces, model.face_index, model.bary_coords
    )

    gaussians = Gaussians(
        xyz=pos + pos_delta,
        scaling=params.scaling * scale_delta,
        rotation=quat_multiply(params.rotation, rot_delta),
        opacity=params.opacity,
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        alive=jnp.ones((n,), bool),
        sh_degree=0,
    )
    bg = model.bg_color if bg_color is None else bg_color
    out = render(camera, gaussians, bg, config=render_cfg,
                 means2d_probe=means2d_probe)
    return {
        "rgb_image": out["render"],
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "overflow": out["overflow"],
    }
