"""FateAvatar: FLAME-rigged Gaussian head avatar with UV-sampled splats.

Functional TPU-native re-design of the reference model/fateavatar.py:38-812.
Instead of an nn.Module with in-place Parameter surgery, the model splits
into three pytrees:

* :class:`FateAvatarModel`   — frozen assets (FLAME, template, canonical
  face scales, init stats) + static config,
* :class:`FateAvatarParams`  — trainable leaves (per-splat attributes at
  static capacity + FLAME personalization deltas),
* :class:`FateAvatarState`   — non-trainable mutable state (splat binding,
  alive mask, densification statistics).

``forward`` is a pure function (model, params, state, frame) -> output dict,
jit/vmap/pjit-friendly; splat count changes are masked writes handled in
models/maintenance.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fateavatar_tpu.flame.flame import FlameModel, flame_forward
from fateavatar_tpu.ops import sampling
from fateavatar_tpu.ops.camera import Camera, make_camera
from fateavatar_tpu.ops.gathers import gather_rows
from fateavatar_tpu.ops.knn import mean_knn_distance
from fateavatar_tpu.ops.mesh import (
    compute_face_normals,
    compute_face_orientation,
    reweight_uvcoords_by_barycoords,
    reweight_verts_by_barycoords,
)
from fateavatar_tpu.ops.quaternion import (
    matrix_to_quat,
    quat_multiply,
    quat_to_axis_angle,
)
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians, inverse_sigmoid
from fateavatar_tpu.utils.obj_io import ObjMesh


@struct.dataclass
class FateAvatarConfig:
    tex_size: int = struct.field(pytree_node=False, default=256)
    normal_offset: float = struct.field(pytree_node=False, default=0.05)
    delta_blendshape: bool = struct.field(pytree_node=False, default=True)
    delta_vertex: bool = struct.field(pytree_node=False, default=True)
    resize_scale: bool = struct.field(pytree_node=False, default=True)
    sh_degree: int = struct.field(pytree_node=False, default=0)
    capacity: int = struct.field(pytree_node=False, default=200_000)
    img_height: int = struct.field(pytree_node=False, default=512)
    img_width: int = struct.field(pytree_node=False, default=512)


@struct.dataclass
class FateAvatarModel:
    """Frozen assets (reference model/fateavatar.py:96-194)."""

    flame: FlameModel
    faces: jax.Array                   # [F, 3] int32 (template == FLAME topology)
    uvcoords: jax.Array                # [Vt, 2]
    uvfaces: jax.Array                 # [F, 3] int32
    face_scaling_canonical: jax.Array  # [F, 1]
    uvcoords_sample: jax.Array         # [N_init, 2] UV of each initial splat
    mean_scaling: jax.Array            # [] knn init stats (fateavatar.py:596-608)
    max_scaling: jax.Array
    scale_init: jax.Array
    bg_color: jax.Array                # [3]
    cfg: FateAvatarConfig = struct.field(pytree_node=False)


@struct.dataclass
class FateAvatarParams:
    """Trainable leaves (fateavatar.py:166-194 + 87-94)."""

    offset: jax.Array           # [N, 1]  normal offset (tanh-activated)
    features_dc: jax.Array      # [N, 1, 3]
    features_rest: jax.Array    # [N, K-1, 3]
    scaling: jax.Array          # [N, 3] log scale
    rotation: jax.Array         # [N, 4] wxyz
    opacity: jax.Array          # [N, 1] logit
    delta_shapedirs: jax.Array  # [V, 3, S]
    delta_posedirs: jax.Array   # [36, V*3]
    delta_vertex: jax.Array     # [V, 3]


@struct.dataclass
class FateAvatarState:
    """Mutable non-trainable state (splat binding + densify stats)."""

    face_index: jax.Array          # [N] int32
    bary_coords: jax.Array         # [N, 3]
    alive: jax.Array               # [N] bool
    xyz_gradient_accum: jax.Array  # [N]
    denom: jax.Array               # [N]
    sample_flag: jax.Array         # [N] (1.0 for densification-added splats)
    max_radii2d: jax.Array         # [N]


def init_fateavatar(
    template: ObjMesh,
    flame: FlameModel,
    cfg: FateAvatarConfig,
    bg_color=(1.0, 1.0, 1.0),
    seed: int = 0,
):
    """Build model/params/state the way FateAvatar.__init__ does
    (fateavatar.py:39-194): UV-uniform sampling of tex_size^2 splats on the
    template chart, KNN-based scale init, neutral attribute init, canonical
    face scales."""
    faces = jnp.asarray(template.faces, jnp.int32)
    assert template.verts.shape[0] == flame.num_verts, (
        "template topology must match FLAME"
    )

    n_init = cfg.tex_size * cfg.tex_size
    face_index_np, bary_np = sampling.uniform_sampling_barycoords(
        n_init, template.uvcoords, template.uvfaces, seed=seed
    )
    face_index = jnp.asarray(face_index_np)
    bary = jnp.asarray(bary_np)

    uv_sample = reweight_uvcoords_by_barycoords(
        jnp.asarray(template.uvcoords), jnp.asarray(template.uvfaces, jnp.int32),
        face_index, bary,
    )[..., :2]

    verts_sampling = reweight_verts_by_barycoords(
        jnp.asarray(template.verts), faces, face_index, bary
    )

    # scale init from mean 1-NN distance (fateavatar.py:596-608)
    mean_scaling = jnp.mean(mean_knn_distance(verts_sampling))
    max_scaling = 10.0 * mean_scaling
    scale_init = jnp.log(mean_scaling)

    # canonical face scale (fateavatar.py:84-85)
    cano_verts, _, _ = flame_forward(
        flame, flame.canonical_exp, flame.canonical_pose
    )
    _, face_scaling_cano = compute_face_orientation(
        cano_verts[0], faces, return_scale=True
    )

    N = cfg.capacity
    assert N >= n_init, "capacity must hold the initial UV samples"
    k = (cfg.sh_degree + 1) ** 2

    def cap(x, fill=0.0):
        pad = [(0, N - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    alive = cap(jnp.ones((n_init,), bool), False)
    params = FateAvatarParams(
        offset=jnp.zeros((N, 1), jnp.float32),
        # logit(0.5) == 0 -> renders 0.5 grey through SH deg 0 (+0.5 shift)
        features_dc=jnp.zeros((N, 1, 3), jnp.float32),
        # at least one rest column even for sh_degree 0: zero-size arrays
        # cannot be checkpointed; eval_sh never reads past (deg+1)^2 coeffs
        features_rest=jnp.zeros((N, max(k - 1, 1), 3), jnp.float32),
        scaling=jnp.full((N, 3), scale_init, jnp.float32),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (N, 1)),
        opacity=jnp.full((N, 1), inverse_sigmoid(jnp.float32(0.1))),
        delta_shapedirs=jnp.zeros_like(flame.shapedirs),
        delta_posedirs=jnp.zeros_like(flame.posedirs),
        delta_vertex=jnp.zeros_like(flame.v_template),
    )
    state = FateAvatarState(
        face_index=cap(face_index, 0).astype(jnp.int32),
        bary_coords=cap(bary),
        alive=alive,
        xyz_gradient_accum=jnp.zeros((N,), jnp.float32),
        denom=jnp.zeros((N,), jnp.float32),
        sample_flag=jnp.zeros((N,), jnp.float32),
        max_radii2d=jnp.zeros((N,), jnp.float32),
    )
    model = FateAvatarModel(
        flame=flame,
        faces=faces,
        uvcoords=jnp.asarray(template.uvcoords),
        uvfaces=jnp.asarray(template.uvfaces, jnp.int32),
        face_scaling_canonical=face_scaling_cano,
        uvcoords_sample=cap(uv_sample),
        mean_scaling=mean_scaling,
        max_scaling=max_scaling,
        scale_init=scale_init,
        bg_color=jnp.asarray(bg_color, jnp.float32),
        cfg=cfg,
    )
    return model, params, state


def build_gaussians(
    model: FateAvatarModel,
    params: FateAvatarParams,
    state: FateAvatarState,
    expression: jax.Array,   # [n_exp]
    flame_pose: jax.Array,   # [15]
    world_transform=None,    # [7] optional model-to-world (euler, t, scale)
):
    """FLAME-drive the splats (the math of FateAvatar.forward,
    fateavatar.py:210-258): verts -> per-face frame/scale/normal -> gather
    per splat -> barycentric position + shell offset; quaternion compose;
    log-scale shift by the face scale ratio.

    ``world_transform`` applies the NeRSemble tracking's model-to-world
    similarity to the posed vertices (benchmark/nersemble/
    fateavatar.py:206-230 — both the delta and original FLAME passes).

    Returns (gaussians, verts, verts_orig)."""
    cfg = model.cfg
    wt = None if world_transform is None else world_transform[None]
    verts, _, _ = flame_forward(
        model.flame, expression[None], flame_pose[None],
        delta_shapedirs=params.delta_shapedirs if cfg.delta_blendshape else None,
        delta_posedirs=params.delta_posedirs if cfg.delta_blendshape else None,
        delta_vertex=params.delta_vertex if cfg.delta_vertex else None,
        world_transform=wt,
    )
    verts_orig, _, _ = flame_forward(model.flame, expression[None],
                                     flame_pose[None], world_transform=wt)
    v = verts[0]

    face_orien, face_scaling = compute_face_orientation(v, model.faces, return_scale=True)
    face_normals = compute_face_normals(v, model.faces)

    # All face-level quantities (incl. the orientation quaternion — F faces,
    # not N splats: ~34x less transcendental work) are packed into ONE
    # [F, 17] matrix and gathered per splat with gather_rows, whose VJP is
    # an MXU one-hot matmul. The naive per-quantity jnp.take transposes are
    # collision-heavy 70k-update scatter-adds that serialize on TPU
    # (~3.7 ms EACH in the device profile — docs/STATUS_ROUND1.md).
    ratio = face_scaling / model.face_scaling_canonical       # [F, 1]
    face_quat = matrix_to_quat(face_orien)                    # [F, 4]
    tri = v[model.faces]                                      # [F, 3, 3]
    F = tri.shape[0]
    face_packed = jnp.concatenate([
        face_quat, face_normals, ratio, tri.reshape(F, 9),
    ], axis=1)                                                # [F, 17]
    gp = gather_rows(face_packed, state.face_index)           # [N, 17]
    g_quat = gp[:, 0:4]
    g_normal = gp[:, 4:7]
    g_ratio = gp[:, 7:8]
    tri_n = gp[:, 8:17].reshape(-1, 3, 3)
    pos = jnp.einsum("nk,nkd->nd", state.bary_coords, tri_n)  # [N, 3]

    xyz = pos + g_normal * cfg.normal_offset * jnp.tanh(params.offset)
    rot = quat_multiply(g_quat, params.rotation)
    scaling = params.scaling
    if cfg.resize_scale:
        scaling = scaling + jnp.log(jnp.maximum(g_ratio, 1e-12))

    gaussians = Gaussians(
        xyz=xyz,
        scaling=scaling,
        rotation=rot,
        opacity=params.opacity,
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        alive=state.alive,
        sh_degree=cfg.sh_degree,
    )
    return gaussians, verts, verts_orig


def fateavatar_forward(
    model: FateAvatarModel,
    params: FateAvatarParams,
    state: FateAvatarState,
    expression: jax.Array,
    flame_pose: jax.Array,
    camera: Camera,
    bg_color: Optional[jax.Array] = None,
    render_cfg: RenderConfig = RenderConfig(),
    means2d_probe: Optional[jax.Array] = None,
    world_transform: Optional[jax.Array] = None,
):
    """One frame forward (fateavatar.py:196-295). Returns the output dict:
    rgb_image [H,W,3], scale, raw_rot, viewspace_points, visibility_filter,
    radii, verts, verts_orig, faces."""
    bg = model.bg_color if bg_color is None else bg_color
    gaussians, verts, verts_orig = build_gaussians(
        model, params, state, expression, flame_pose,
        world_transform=world_transform,
    )
    out = render(
        camera, gaussians, bg,
        config=render_cfg, means2d_probe=means2d_probe,
    )
    return {
        "rgb_image": out["render"],
        "scale": jnp.exp(params.scaling),
        "raw_rot": quat_to_axis_angle(params.rotation),
        "viewspace_points": out["viewspace_points"],
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "overflow": out["overflow"],
        "verts": verts,
        "verts_orig": verts_orig,
        "faces": model.faces,
        "alive": state.alive,
    }


def fateavatar_inference(
    model, params, state, expression, flame_pose, camera,
    render_cfg: RenderConfig = RenderConfig(),
):
    """GUI/reenactment path (fateavatar.py:297-366): same forward, image only.
    Skips the gradient slot table (forward-only)."""
    out = fateavatar_forward(
        model, params, state, expression, flame_pose, camera,
        render_cfg=render_cfg.replace(bwd_slots=False),
    )
    return out["rgb_image"]


def fateavatar_visualization(
    model, params, state, expression, flame_pose, camera: Camera,
    render_cfg: RenderConfig = RenderConfig(),
):
    """Diagnostic renders (fateavatar.py:368-594): posed, canonical-pose
    (front camera), densification-sample highlight, gradient heat."""
    cfg = model.cfg
    render_cfg = render_cfg.replace(bwd_slots=False)  # forward-only renders
    out = fateavatar_forward(
        model, params, state, expression, flame_pose, camera,
        render_cfg=render_cfg,
    )

    # canonical camera: identity-ish frontal view at the same distance
    R_cano = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    T_cano = camera.view[:3, 3] * jnp.array([0.0, 0.0, 1.0])
    cam_cano = make_camera(
        R_cano, T_cano, camera.fovx, camera.fovy, camera.width, camera.height
    )

    gaussians_cano, _, _ = build_gaussians(
        model, params, state,
        model.flame.canonical_exp[0], model.flame.canonical_pose[0],
    )
    cano_img = render(cam_cano, gaussians_cano, model.bg_color, config=render_cfg)

    # gradient heat: densification pressure as red intensity (fateavatar.py:505-538)
    grad_accum = state.xyz_gradient_accum / jnp.maximum(state.denom, 1e-6)
    grad_accum = jnp.nan_to_num(grad_accum)
    thresh = jnp.quantile(grad_accum, 0.95)
    below = grad_accum <= thresh
    denom = jnp.maximum(jnp.max(jnp.where(below, grad_accum, 0.0)), 1e-12)
    norm_grad = jnp.where(below, grad_accum / denom, 1.0)
    red = jnp.stack([0.99 * norm_grad, jnp.zeros_like(norm_grad),
                     jnp.zeros_like(norm_grad)], axis=-1)
    from fateavatar_tpu.ops.sh import rgb_to_sh

    grad_gaussians = gaussians_cano.replace(
        features_dc=rgb_to_sh(red)[:, None, :],
        opacity=params.opacity + 5.0,
    )
    grad_img = render(cam_cano, grad_gaussians, jnp.zeros(3), config=render_cfg)

    # densification-sample highlight (fateavatar.py:540-563)
    sampled = state.sample_flag > 0.5
    point_gaussians = gaussians_cano.replace(
        features_dc=jnp.broadcast_to(
            jnp.array([(180 / 255 - 0.5) / 0.282]) * jnp.array([0.0, 0.0, 1.0]),
            gaussians_cano.features_dc.shape[:1] + (3,),
        )[:, None, :],
        opacity=jnp.ones_like(params.opacity) + 5.0,
        scaling=-jnp.ones_like(params.scaling) * 8.0,
        alive=state.alive & sampled,
    )
    point_img = render(cam_cano, point_gaussians, model.bg_color, config=render_cfg)

    return {
        "rgb_image": out["rgb_image"],
        "cano_image": cano_img["render"],
        "grad_image": grad_img["render"],
        "point_image": point_img["render"],
        "scale": out["scale"],
        "raw_rot": out["raw_rot"],
        "verts": out["verts"],
        "faces": model.faces,
    }
