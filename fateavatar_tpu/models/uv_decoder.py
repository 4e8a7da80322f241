"""Neural baking: discrete Gaussians -> continuous UV attribute maps.

Functional re-design of model/uv_decoder.py:36-690. The decoder turns a
learned constant into an 11-channel texture (color 3 / opacity 1 / scaling 3
/ rotation 3 / offset 1), activates each slice, samples it at every splat's
UV coordinate, and drives the usual FLAME->render path. Baked textures are
directly editable (stickers / style transfer, train/baker.py:487-777).

Key semantics preserved (with file:line refs to the reference):
* color activation tanh * (0.5 / C0)                     (uv_decoder.py:133-138)
* scaling softplus-capped at mean+std of the prior      (uv_decoder.py:140-149)
* offset tanh                                            (uv_decoder.py:151-156)
* rotation tanh*2pi axis-angle -> wxyz quaternion        (uv_decoder.py:158-174)
* texture lookup = bilinear grid-sample, border clamp,
  align_corners                                          (uv_decoder.py:179-202)
* prior splat set DOUBLED with a fresh 256^2 UV sampling (uv_decoder.py:303-308)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    FateAvatarParams,
    FateAvatarState,
)
from fateavatar_tpu.models.unet import FeatureMap, UNet, UNetDecoder
from fateavatar_tpu.ops import sampling
from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.ops.knn import mean_knn_distance
from fateavatar_tpu.ops.mesh import (
    compute_face_normals,
    compute_face_orientation,
    reweight_uvcoords_by_barycoords,
    reweight_verts_by_barycoords,
)
from fateavatar_tpu.ops.quaternion import (
    axis_angle_to_quat,
    matrix_to_quat,
    quat_multiply,
    quat_to_axis_angle,
)
from fateavatar_tpu.ops.sh import C0
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians

TEXTURE_CHANNELS = {
    "color": 3, "opacity": 1, "scaling": 3, "rotation": 3, "offset": 1,
}
ATTRIBUTES = tuple(TEXTURE_CHANNELS)


# ---------------------------------------------------------------------------
# activations + texture lookup
# ---------------------------------------------------------------------------

def color_activation(x):
    return jnp.tanh(x) * (0.5 / C0)


def scaling_activation(x, mean_scaling, max_scaling):
    return max_scaling - jax.nn.softplus(-(x + mean_scaling) + max_scaling)


def offset_activation(x):
    return jnp.tanh(x)


def rotation_activation(x):
    """tanh*2pi axis-angle -> wxyz quaternion (no xyzw shuffle needed — our
    quaternion util is already real-first)."""
    aa = jnp.tanh(x) * (2.0 * jnp.pi)
    return axis_angle_to_quat(aa)


def activate_texture(name: str, tex: jax.Array, mean_scaling, max_scaling):
    if name == "color":
        return color_activation(tex)
    if name == "scaling":
        return scaling_activation(tex, mean_scaling, max_scaling)
    if name == "offset":
        return offset_activation(tex)
    if name == "rotation":
        return rotation_activation(tex)
    return tex


def texture_lookup(texture: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample with border padding and align_corners semantics
    (uv_decoder.py:179-202). texture [H, W, C], uv [N, 2] in [0, 1]."""
    h, w = texture.shape[:2]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(uv[:, 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    v00 = texture[y0, x0]
    v01 = texture[y0, x1]
    v10 = texture[y1, x0]
    v11 = texture[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )


def slice_texture(tex: jax.Array) -> Dict[str, jax.Array]:
    """Split the 11-channel decoder output [H, W, 11] per attribute."""
    out = {}
    start = 0
    for name, ch in TEXTURE_CHANNELS.items():
        out[name] = tex[..., start:start + ch]
        start += ch
    return out


# ---------------------------------------------------------------------------
# decoder bundle
# ---------------------------------------------------------------------------

@struct.dataclass
class UVDecoderModel:
    """Frozen context for baking: the avatar's priors + the doubled UV
    sampling (uv_decoder.py:286-340)."""

    avatar: FateAvatarModel
    # priors (raw parameter space, rotation normalized)
    prior_features_dc: jax.Array    # [N, 1, 3]
    prior_opacity: jax.Array        # [N, 1]
    prior_offset: jax.Array         # [N, 1]
    prior_rotation: jax.Array       # [N, 4] normalized
    prior_scaling: jax.Array        # [N, 3]
    # doubled binding: N = avatar capacity + 256^2 fresh samples
    face_index: jax.Array           # [M]
    bary_coords: jax.Array          # [M, 3]
    uv_sample: jax.Array            # [M, 2]
    alive: jax.Array                # [M]
    mean_scaling: jax.Array
    std_scaling: jax.Array
    max_scaling: jax.Array
    sample_radius: jax.Array
    # frozen FLAME deltas of the trained avatar
    delta_shapedirs: jax.Array
    delta_posedirs: jax.Array
    delta_vertex: jax.Array
    decode_type: str = struct.field(pytree_node=False, default="UNet")
    bake_attribute: tuple = struct.field(pytree_node=False,
                                         default=("color", "opacity"))


def build_uv_decoder(
    avatar: FateAvatarModel,
    params: FateAvatarParams,
    state: FateAvatarState,
    decode_type: str = "UNet",
    bake_attribute=("color", "opacity"),
    fresh_samples: int = 256 * 256,
    seed: int = 0,
) -> Tuple[UVDecoderModel, Any, Any]:
    """Snapshot priors + double the sampling density + init the net.

    Returns (decoder_model, net_def, net_vars) where net_vars holds flax
    {'params', 'batch_stats'}."""
    # fresh uniform samples over the chart (uv_decoder.py:52-56)
    f_idx, f_bary = sampling.uniform_sampling_barycoords(
        fresh_samples, np.asarray(avatar.uvcoords), np.asarray(avatar.uvfaces),
        seed=seed,
    )
    face_index = jnp.concatenate([state.face_index, jnp.asarray(f_idx)])
    bary = jnp.concatenate([state.bary_coords, jnp.asarray(f_bary)])
    alive = jnp.concatenate(
        [state.alive, jnp.ones((fresh_samples,), bool)]
    )

    uv_sample = reweight_uvcoords_by_barycoords(
        avatar.uvcoords, avatar.uvfaces, face_index, bary
    )[..., :2]

    # sample radius from UV-space KNN over ALIVE points (uv_decoder.py:319-323)
    d = mean_knn_distance(
        jnp.concatenate([uv_sample, jnp.zeros_like(uv_sample[:, :1])], axis=-1)
    )
    sample_radius = jnp.mean(jnp.where(alive, d, 0.0)) / jnp.maximum(
        jnp.mean(alive.astype(jnp.float32)), 1e-6
    )

    rot_norm = params.rotation / jnp.linalg.norm(
        params.rotation, axis=-1, keepdims=True
    ).clip(1e-8)
    alive_f = state.alive.astype(jnp.float32)
    mean_scaling = jnp.sum(
        params.scaling * alive_f[:, None]
    ) / jnp.maximum(jnp.sum(alive_f) * 3, 1.0)
    var = jnp.sum(
        (params.scaling - mean_scaling) ** 2 * alive_f[:, None]
    ) / jnp.maximum(jnp.sum(alive_f) * 3 - 1, 1.0)
    std_scaling = jnp.sqrt(var)

    model = UVDecoderModel(
        avatar=avatar,
        prior_features_dc=params.features_dc,
        prior_opacity=params.opacity,
        prior_offset=params.offset,
        prior_rotation=rot_norm,
        prior_scaling=params.scaling,
        face_index=face_index.astype(jnp.int32),
        bary_coords=bary,
        uv_sample=uv_sample,
        alive=alive,
        mean_scaling=mean_scaling,
        std_scaling=std_scaling,
        max_scaling=mean_scaling + std_scaling,
        sample_radius=sample_radius,
        delta_shapedirs=params.delta_shapedirs,
        delta_posedirs=params.delta_posedirs,
        delta_vertex=params.delta_vertex,
        decode_type=decode_type,
        bake_attribute=tuple(bake_attribute),
    )

    out_ch = sum(TEXTURE_CHANNELS.values())
    key = jax.random.PRNGKey(seed)
    k_const, k_net = jax.random.split(key)
    if decode_type == "UNet":
        net = UNet(out_ch)
        const = jax.random.uniform(k_const, (1, 512, 512, 11), minval=-1, maxval=1)
    elif decode_type == "decode_only":
        net = UNetDecoder(out_ch)
        const = jax.random.uniform(k_const, (1, 8, 8, 512), minval=-1, maxval=1)
    elif decode_type == "feature_map":
        net = FeatureMap(out_ch)
        const = jax.random.uniform(k_const, (1, 512, 512, 11), minval=-1, maxval=1)
    else:
        raise NotImplementedError(decode_type)

    variables = net.init(k_net, const, train=False)
    net_vars = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "const": const,
    }
    return model, net, net_vars


def decode_textures(model: UVDecoderModel, net, net_vars, train: bool = True):
    """Run the decoder -> raw + activated texture dicts [H, W, C]."""
    out, updates = net.apply(
        {"params": net_vars["params"], "batch_stats": net_vars["batch_stats"]},
        net_vars["const"], train=train,
        mutable=["batch_stats"] if train else [],
    )
    tex = out[0]  # drop batch dim
    raw = slice_texture(tex)
    act = {
        name: activate_texture(name, t, model.mean_scaling, model.max_scaling)
        for name, t in raw.items()
    }
    new_vars = dict(net_vars)
    if train and updates:
        new_vars["batch_stats"] = updates["batch_stats"]
    return raw, act, new_vars


def sample_attributes(model: UVDecoderModel, act_textures: Dict[str, jax.Array]):
    """Activated textures -> per-splat value dict at the prior UVs."""
    return {
        name: texture_lookup(t, model.uv_sample)
        for name, t in act_textures.items()
    }


def _assemble_gaussians(model: UVDecoderModel, values: Dict[str, jax.Array],
                        expression, flame_pose):
    """FLAME-drive the baked splats (uv_decoder.py:413-498). ``values``
    holds the chosen per-splat attributes: color [M,3] (activated SH dc),
    opacity logits [M,1], scaling log [M,3], rotation wxyz [M,4],
    offset pre-tanh-ALREADY-ACTIVATED [M,1] (see note below)."""
    from fateavatar_tpu.flame.flame import flame_forward

    avatar = model.avatar
    cfg = avatar.cfg
    verts, _, _ = flame_forward(
        avatar.flame, expression[None], flame_pose[None],
        delta_shapedirs=model.delta_shapedirs if cfg.delta_blendshape else None,
        delta_posedirs=model.delta_posedirs if cfg.delta_blendshape else None,
        delta_vertex=model.delta_vertex if cfg.delta_vertex else None,
    )
    verts_orig, _, _ = flame_forward(avatar.flame, expression[None], flame_pose[None])
    v = verts[0]

    face_orien, face_scaling = compute_face_orientation(
        v, avatar.faces, return_scale=True
    )
    face_normals = compute_face_normals(v, avatar.faces)
    ratio = face_scaling / avatar.face_scaling_canonical
    g_ratio = jnp.take(ratio, model.face_index, axis=0)
    g_orien = jnp.take(face_orien, model.face_index, axis=0)
    g_normal = jnp.take(face_normals, model.face_index, axis=0)
    pos = reweight_verts_by_barycoords(
        v, avatar.faces, model.face_index, model.bary_coords
    )

    xyz = pos + g_normal * cfg.normal_offset * values["offset_act"]
    rot = quat_multiply(matrix_to_quat(g_orien), values["rotation"])
    scaling = values["scaling"]
    if cfg.resize_scale:
        scaling = scaling + jnp.log(jnp.maximum(g_ratio, 1e-12))

    m = model.face_index.shape[0]
    gaussians = Gaussians(
        xyz=xyz,
        scaling=scaling,
        rotation=rot,
        opacity=values["opacity"],
        features_dc=values["color"][:, None, :],
        features_rest=jnp.zeros((m, 1, 3), jnp.float32),
        alive=model.alive,
        sh_degree=0,
    )
    return gaussians, verts, verts_orig


def _merge_with_priors(model: UVDecoderModel, decoded: Dict[str, jax.Array]):
    """Per-attribute choice: baked value vs prior (uv_decoder.py:477-484).
    Decoded values cover the doubled splat set; the prior half reuses the
    avatar's trained attributes, the fresh half ALWAYS uses decoded values
    (the avatar has no priors for them)."""
    n = model.prior_opacity.shape[0]
    m = model.face_index.shape[0]

    def pick(name, decoded_v, prior_v, act_fn=None):
        if name in model.bake_attribute:
            return decoded_v
        prior_full = jnp.concatenate(
            [prior_v, decoded_v[n:]], axis=0
        ) if prior_v.shape[0] == n else prior_v
        return prior_full

    values = {
        "color": pick("color", decoded["color"],
                      model.prior_features_dc[:, 0, :]),
        "opacity": pick("opacity", decoded["opacity"], model.prior_opacity),
        "scaling": pick("scaling", decoded["scaling"], model.prior_scaling),
        "rotation": pick("rotation", decoded["rotation"], model.prior_rotation),
    }
    off = pick("offset", decoded["offset"], jnp.tanh(model.prior_offset))
    # decoded offset is already tanh-activated; a prior offset needs tanh
    values["offset_act"] = off
    return values


def uv_decoder_forward(
    model: UVDecoderModel,
    net,
    net_vars,
    expression: jax.Array,
    flame_pose: jax.Array,
    camera: Camera,
    bg_color: Optional[jax.Array] = None,
    render_cfg: RenderConfig = RenderConfig(),
    train: bool = True,
):
    """Decode -> sample -> FLAME-drive -> render (uv_decoder.py:387-542).
    Returns (output dict, new_net_vars)."""
    raw, act, new_vars = decode_textures(model, net, net_vars, train=train)
    decoded = sample_attributes(model, act)
    values = _merge_with_priors(model, decoded)
    gaussians, verts, verts_orig = _assemble_gaussians(
        model, values, expression, flame_pose
    )
    bg = model.avatar.bg_color if bg_color is None else bg_color
    out = render(camera, gaussians, bg, config=render_cfg)

    n = model.prior_opacity.shape[0]
    output = {
        "rgb_image": out["render"],
        "scale": jnp.exp(decoded["scaling"]),
        "raw_rot": quat_to_axis_angle(decoded["rotation"]),
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "overflow": out["overflow"],
        "verts": verts,
        "verts_orig": verts_orig,
        "faces": model.avatar.faces,
        "alive": model.alive,
        "texture_dict": raw,
        "act_texture_dict": act,
        # decode-vs-prior pairs for the reg loss (uv_decoder.py:530-539),
        # restricted to the prior half of the splat set
        "decode_color": decoded["color"][:n],
        "decode_opacity": decoded["opacity"][:n],
        "decode_scaling": decoded["scaling"][:n],
        "decode_rotation": decoded["rotation"][:n],
        "decode_offset": decoded["offset"][:n],
        "prior_features_dc": model.prior_features_dc[:, 0, :],
        "prior_opacity": model.prior_opacity,
        "prior_scaling": model.prior_scaling,
        "prior_rotation": model.prior_rotation,
        "prior_offset": jnp.tanh(model.prior_offset),
        "prior_alive": jnp.concatenate([
            model.alive[:n, None].astype(jnp.float32),
        ], axis=-1),
    }
    return output, new_vars


def render_from_texture_dict(
    model: UVDecoderModel,
    textures: Dict[str, jax.Array],
    expression, flame_pose, camera,
    bg_color=None,
    render_cfg: RenderConfig = RenderConfig(),
    activated: bool = True,
):
    """Animate EDITED textures (uv_decoder.py:564-690).

    ``activated=True``: textures are fully activated already (the editor
    operates in activated space). ``activated=False``: raw decoder dumps —
    activate everything except color, which the reference's editing pipeline
    pre-activates outside (uv_decoder.py:109-131)."""
    if activated:
        act = dict(textures)
    else:
        act = {
            name: tex if name == "color" else activate_texture(
                name, tex, model.mean_scaling, model.max_scaling
            )
            for name, tex in textures.items()
        }
    decoded = sample_attributes(model, act)
    values = _merge_with_priors(model, decoded)
    gaussians, _, _ = _assemble_gaussians(model, values, expression, flame_pose)
    bg = model.avatar.bg_color if bg_color is None else bg_color
    out = render(camera, gaussians, bg, config=render_cfg)
    return {"rgb_image": out["render"]}


def export_avatar_params(
    model: UVDecoderModel, net, net_vars,
) -> Tuple[FateAvatarParams, FateAvatarState]:
    """Write decoded attributes back into FateAvatar-shaped params/state at
    the doubled capacity (uv_decoder.py:342-385)."""
    raw, act, _ = decode_textures(model, net, net_vars, train=False)
    decoded = sample_attributes(model, act)
    m = model.face_index.shape[0]

    # decoded offset is activated; FateAvatarParams stores pre-tanh values
    off = jnp.clip(decoded["offset"], -0.999, 0.999)
    params = FateAvatarParams(
        offset=jnp.arctanh(off),
        features_dc=decoded["color"][:, None, :],
        features_rest=jnp.zeros((m, 1, 3), jnp.float32),
        scaling=decoded["scaling"],
        rotation=decoded["rotation"],
        opacity=decoded["opacity"],
        delta_shapedirs=model.delta_shapedirs,
        delta_posedirs=model.delta_posedirs,
        delta_vertex=model.delta_vertex,
    )
    state = FateAvatarState(
        face_index=model.face_index,
        bary_coords=model.bary_coords,
        alive=model.alive,
        xyz_gradient_accum=jnp.zeros((m,), jnp.float32),
        denom=jnp.zeros((m,), jnp.float32),
        sample_flag=jnp.zeros((m,), jnp.float32),
        max_radii2d=jnp.zeros((m,), jnp.float32),
    )
    return params, state
