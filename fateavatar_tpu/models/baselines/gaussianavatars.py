"""GaussianAvatars baseline: rigged 3D Gaussians, one splat per FLAME face.

TPU-native re-design of model/baseline/gaussianavatars.py:19-498 (Qian et
al., CVPR 2024 — re-implemented by the reference behind its shared trainer).
Splat positions are LEARNED LOCAL coordinates in each bound face's tangent
frame; the classic 3DGS clone/split/prune densification with binding
bookkeeping becomes masked writes at static capacity (same design as
models/maintenance.py):

* clone  (gaussianavatars.py:298-352): grad >= threshold & small scale ->
  copy into free slots, same binding.
* split  (gaussianavatars.py:354-417): grad >= threshold & large scale ->
  2 samples from N(0, scale) rotated into the local frame, scale / 1.6,
  original killed.
* prune  (gaussianavatars.py:419-466): low opacity / oversized splats, but
  never the LAST splat bound to a face (binding_counter guard).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fateavatar_tpu.flame.flame import FlameModel, flame_forward
from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.ops.mesh import compute_face_orientation, face_vertices
from fateavatar_tpu.ops.quaternion import (
    matrix_to_quat,
    quat_multiply,
    quat_to_matrix,
)
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians, inverse_sigmoid


@struct.dataclass
class GAConfig:
    sh_degree: int = struct.field(pytree_node=False, default=3)
    capacity: int = struct.field(pytree_node=False, default=200_000)
    img_height: int = struct.field(pytree_node=False, default=512)
    img_width: int = struct.field(pytree_node=False, default=512)
    percent_dense: float = struct.field(pytree_node=False, default=0.01)


@struct.dataclass
class GAModel:
    flame: FlameModel
    bg_color: jax.Array
    cfg: GAConfig = struct.field(pytree_node=False)


@struct.dataclass
class GAParams:
    xyz: jax.Array            # [N, 3] LOCAL face-frame coordinates
    features_dc: jax.Array    # [N, 1, 3]
    features_rest: jax.Array  # [N, K-1, 3]
    scaling: jax.Array        # [N, 3] log (local units)
    rotation: jax.Array       # [N, 4] wxyz (local)
    opacity: jax.Array        # [N, 1] logit


@struct.dataclass
class GAState:
    binding: jax.Array             # [N] int32 face index
    alive: jax.Array               # [N] bool
    xyz_gradient_accum: jax.Array  # [N]
    denom: jax.Array               # [N]
    max_radii2d: jax.Array         # [N]


def init_gaussianavatars(flame: FlameModel, cfg: GAConfig,
                         bg_color=(1.0, 1.0, 1.0), seed: int = 0):
    """One splat per FLAME face, random dim colour, unit local scale
    (gaussianavatars.py:99-128)."""
    F = flame.faces.shape[0]
    N = cfg.capacity
    assert N >= F
    rng = np.random.default_rng(seed)
    k = (cfg.sh_degree + 1) ** 2

    def cap(x, fill=0.0):
        pad = [(0, N - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    fdc = jnp.asarray(rng.random((F, 1, 3)) / 255.0, jnp.float32)
    params = GAParams(
        xyz=jnp.zeros((N, 3), jnp.float32),
        features_dc=cap(fdc),
        features_rest=jnp.zeros((N, max(k - 1, 1), 3), jnp.float32),
        scaling=jnp.zeros((N, 3), jnp.float32),   # log(1) local units
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (N, 1)),
        opacity=jnp.full((N, 1), inverse_sigmoid(jnp.float32(0.1))),
    )
    state = GAState(
        binding=cap(jnp.arange(F, dtype=jnp.int32), 0).astype(jnp.int32),
        alive=cap(jnp.ones((F,), bool), False),
        xyz_gradient_accum=jnp.zeros((N,), jnp.float32),
        denom=jnp.zeros((N,), jnp.float32),
        max_radii2d=jnp.zeros((N,), jnp.float32),
    )
    model = GAModel(
        flame=flame, bg_color=jnp.asarray(bg_color, jnp.float32), cfg=cfg
    )
    return model, params, state


def build_gaussians(model: GAModel, params: GAParams, state: GAState,
                    expression, flame_pose, active_sh_degree: int):
    """Local -> world splat transform (gaussianavatars.py:140-172):
    xyz_world = R_face @ xyz_local * face_scale + face_center."""
    verts, _, _ = flame_forward(model.flame, expression[None], flame_pose[None])
    v = verts[0]
    faces = model.flame.faces
    tri = face_vertices(v, faces)                 # [F, 3, 3]
    face_center = tri.mean(axis=-2)
    face_orien, face_scaling = compute_face_orientation(v, faces, return_scale=True)
    face_quat = matrix_to_quat(face_orien)

    g_orien = jnp.take(face_orien, state.binding, axis=0)
    g_scale = jnp.take(face_scaling, state.binding, axis=0)
    g_center = jnp.take(face_center, state.binding, axis=0)
    g_quat = jnp.take(face_quat, state.binding, axis=0)

    xyz = jnp.einsum("nij,nj->ni", g_orien, params.xyz) * g_scale + g_center
    rot = quat_multiply(g_quat, params.rotation)
    scaling = params.scaling + jnp.log(jnp.maximum(g_scale, 1e-12))

    return Gaussians(
        xyz=xyz, scaling=scaling, rotation=rot,
        opacity=params.opacity,
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        alive=state.alive,
        sh_degree=active_sh_degree,
    ), face_scaling


def ga_forward(model: GAModel, params: GAParams, state: GAState,
               expression, flame_pose, camera: Camera,
               active_sh_degree: int = 0,
               bg_color=None,
               render_cfg: RenderConfig = RenderConfig(),
               means2d_probe=None):
    gaussians, _ = build_gaussians(
        model, params, state, expression, flame_pose, active_sh_degree
    )
    bg = model.bg_color if bg_color is None else bg_color
    out = render(camera, gaussians, bg, config=render_cfg,
                 means2d_probe=means2d_probe)
    return {
        "rgb_image": out["render"],
        "scale": jnp.exp(params.scaling),
        "xyz": params.xyz,
        "alive": state.alive,
        "viewspace_points": out["viewspace_points"],
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "overflow": out["overflow"],
    }


# ---------------------------------------------------------------------------
# densification (static capacity)
# ---------------------------------------------------------------------------

def _select_slots(mask: jax.Array, budget: int) -> Tuple[jax.Array, jax.Array]:
    """First ``budget`` indices where mask is True (stable), padded with an
    out-of-range index for dropped writes."""
    n = mask.shape[0]
    budget = min(budget, n)
    order = jnp.argsort(~mask)       # True first
    idx = order[:budget]
    count = jnp.sum(mask)
    valid = jnp.arange(budget) < count
    return jnp.where(valid, idx, n).astype(jnp.int32), valid


def _free_slots(alive: jax.Array, budget: int):
    return _select_slots(~alive, budget)


def _copy_rows(params: GAParams, src, dst, new_xyz=None, new_scaling=None):
    def cp(arr, override=None):
        vals = arr[src] if override is None else override
        return arr.at[dst].set(vals, mode="drop")

    return GAParams(
        xyz=cp(params.xyz, new_xyz),
        features_dc=cp(params.features_dc),
        features_rest=cp(params.features_rest),
        scaling=cp(params.scaling, new_scaling),
        rotation=cp(params.rotation),
        opacity=cp(params.opacity),
    )


@partial(jax.jit, static_argnames=("budget", "percent_dense"))
def densify_and_prune(
    key: jax.Array,
    params: GAParams,
    state: GAState,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[jax.Array] = None,
    budget: int = 8192,
    percent_dense: float = 0.01,
):
    """Clone + split + prune (gaussianavatars.py:275-466). ``budget`` caps
    new splats per event (static). Returns (params, state, touched)."""
    n = state.alive.shape[0]
    budget = min(budget, n)
    grads = state.xyz_gradient_accum / jnp.maximum(state.denom, 1e-12)
    grads = jnp.nan_to_num(grads)
    big_grad = (grads >= max_grad) & state.alive
    max_scale = jnp.max(jnp.exp(params.scaling), axis=1)

    touched = jnp.zeros((n,), bool)

    # ---- clone: small splats are duplicated in place ----
    clone_mask = big_grad & (max_scale <= percent_dense * extent)
    src_c, valid_c = _select_slots(clone_mask, budget)
    dst_c, free_ok = _free_slots(state.alive, budget)
    write_c = valid_c & free_ok
    dst_c = jnp.where(write_c, dst_c, n)
    params = _copy_rows(params, src_c, dst_c)
    alive = state.alive.at[dst_c].set(write_c, mode="drop")
    binding = state.binding.at[dst_c].set(state.binding[src_c], mode="drop")
    touched = touched.at[dst_c].set(write_c, mode="drop")

    # ---- split: large splats -> 2 resampled children, original killed ----
    split_mask = big_grad & (max_scale > percent_dense * extent)
    src_s, valid_s = _select_slots(split_mask, budget // 2)
    half = budget // 2
    k1, k2 = jax.random.split(key)

    def one_child(k, alive_now):
        dst, free = _free_slots(alive_now, half)
        write = valid_s & free
        dst = jnp.where(write, dst, n)
        stds = jnp.exp(params.scaling[src_s])
        noise = jax.random.normal(k, (half, 3)) * stds
        R = quat_to_matrix(params.rotation[src_s])
        child_xyz = jnp.einsum("nij,nj->ni", R, noise) + params.xyz[src_s]
        child_scaling = params.scaling[src_s] - jnp.log(0.8 * 2)
        return dst, write, child_xyz, child_scaling

    dst1, w1, x1, s1 = one_child(k1, alive)
    params = _copy_rows(params, src_s, dst1, new_xyz=x1, new_scaling=s1)
    alive = alive.at[dst1].set(w1, mode="drop")
    binding = binding.at[dst1].set(binding[src_s], mode="drop")
    touched = touched.at[dst1].set(w1, mode="drop")

    dst2, w2, x2, s2 = one_child(k2, alive)
    params = _copy_rows(params, src_s, dst2, new_xyz=x2, new_scaling=s2)
    alive = alive.at[dst2].set(w2, mode="drop")
    binding = binding.at[dst2].set(binding[src_s], mode="drop")
    touched = touched.at[dst2].set(w2, mode="drop")

    # kill the split originals (only those actually selected within budget)
    killed = jnp.zeros((n,), bool).at[src_s].set(valid_s, mode="drop")
    alive = alive & ~killed

    # ---- prune ----
    prune = jax.nn.sigmoid(params.opacity[:, 0]) < min_opacity
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = max_scale > 0.1 * extent
        prune = prune | big_vs | big_ws
    prune = prune & alive

    # binding guard: keep the last splat of each face
    # (gaussianavatars.py:421-425)
    counter = jnp.zeros((n,), jnp.int32).at[binding].add(
        alive.astype(jnp.int32), mode="drop"
    )
    prune_counter = jnp.zeros((n,), jnp.int32).at[binding].add(
        prune.astype(jnp.int32), mode="drop"
    )
    face_survives = (counter - prune_counter) > 0
    prune = prune & face_survives[binding]

    alive = alive & ~prune

    new_state = state.replace(
        binding=binding,
        alive=alive,
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    return params, new_state, touched


@jax.jit
def reset_opacity(params: GAParams) -> GAParams:
    cur = jax.nn.sigmoid(params.opacity)
    return params.replace(opacity=inverse_sigmoid(jnp.minimum(cur, 0.01)))


def expon_lr_schedule(lr_init, lr_final, max_steps, lr_delay_mult=1.0,
                      lr_delay_steps=0):
    """The 3DGS xyz learning-rate schedule (tools/gs_utils/general_utils.py:29)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return delay * log_lerp

    return schedule
