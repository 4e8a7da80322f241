"""MonoGaussianAvatar baseline: point-MLP Gaussian head avatar.

TPU-native re-design of model/baseline/monogaussianavatar.py:19-883 (Chen et
al., SIGGRAPH 2024, re-implemented behind the reference's shared trainer).
A learnable point cloud (sphere-initialized, growing 400 -> 100k points)
carries no per-splat attributes: three MLPs predict everything —

* GeometryNetwork  (8x256, softplus(100), skip at 3, PE-6) -> colour feature
  + scale + rotation + opacity            (monogaussianavatar.py:569-658)
* ForwardDeformer  (4x128) -> per-point blendshapes / posedirs / lbs weights
  (softmax * 20) + canonical offset       (monogaussianavatar.py:784-869)
* GaussianNetwork  (2x64) -> deformation-conditioned attribute offsets
  (monogaussianavatar.py:717-782)

Points morph with FLAME's per-point inverse/forward path
(flame/lbs.py:103-188), exactly the pipeline the reference drives through
functorch (the jacfwd there is vestigial — only the primal is consumed —
so it is dropped here). All three networks are dense matmul stacks batched
over all points: pure MXU work.

Static-capacity maintenance replaces epoch-level prune/upsample
(monogaussianavatar.py:430-467 + train/trainer.py:204-227).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from fateavatar_tpu.flame import flame as flame_mod
from fateavatar_tpu.flame.flame import FlameModel, flame_forward
from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians

# positional encoding identical to baselines/flashavatar.positional_encoding
from fateavatar_tpu.models.baselines.flashavatar import positional_encoding


def softplus100(x):
    """Softplus with beta=100 (sharp, as used throughout the reference)."""
    return jax.nn.softplus(100.0 * x) / 100.0


class GeometryNetwork(nn.Module):
    """monogaussianavatar.py:569-658 (weight_norm omitted; init simplified —
    the geometric SDF init is irrelevant for the colour/attr head role the
    network plays here)."""

    multires: int = 6
    width: int = 256
    depth: int = 8
    skip_at: int = 3

    @nn.compact
    def __call__(self, pts):
        inp = positional_encoding(pts, self.multires) if self.multires > 0 else pts
        x = inp
        for l in range(self.depth - 1):
            if l == self.skip_at:
                x = jnp.concatenate([x, inp], axis=-1) / np.sqrt(2.0)
            x = softplus100(nn.Dense(self.width)(x))
        color = nn.Dense(3)(nn.Dense(self.width)(softplus100(nn.Dense(self.width)(x))))
        scales = nn.Dense(3)(softplus100(nn.Dense(self.width)(x)))
        rots = nn.Dense(4)(softplus100(nn.Dense(self.width)(x)))
        opacity = nn.Dense(1)(softplus100(nn.Dense(self.width)(x)))
        return color, scales, rots, opacity


class GaussianNetwork(nn.Module):
    """Offset-conditioned attribute deltas (monogaussianavatar.py:717-782)."""

    width: int = 64

    @nn.compact
    def __call__(self, offset):
        x = offset
        for _ in range(2):
            x = nn.relu(nn.Dense(self.width)(x))
        scale = nn.Dense(3)(nn.relu(nn.Dense(self.width)(x)))
        rot = nn.Dense(4)(nn.relu(nn.Dense(self.width)(x)))
        opacity = nn.Dense(1)(nn.relu(nn.Dense(self.width)(x)))
        color = nn.Dense(3)(nn.relu(nn.Dense(self.width)(x)))
        return scale, rot, opacity, color


class RenderingNetwork(nn.Module):
    """Normal-conditioned colour net (monogaussianavatar.py:662-713).
    Registered for parity; the reference fork never calls it in forward."""

    width: int = 64

    @nn.compact
    def __call__(self, normals):
        x = normals
        x = nn.relu(nn.Dense(self.width)(x))
        x = nn.relu(nn.Dense(self.width)(x))
        return jax.nn.sigmoid(nn.Dense(3)(x))


class ForwardDeformer(nn.Module):
    """Per-point blendshape/skinning predictor (monogaussianavatar.py:784-864).
    Blendshape and skinning heads are ZERO-initialized so training starts
    from exact FLAME skinning with uniform weights."""

    n_exp: int
    width: int = 128
    depth: int = 4
    ghostbone: bool = True
    deform_c: bool = True

    @nn.compact
    def __call__(self, pts):
        x = pts
        for _ in range(self.depth):
            x = softplus100(nn.Dense(self.width)(x))
        d_out = 36 * 3 + self.n_exp * 3 + (3 if self.deform_c else 0)
        blend = nn.Dense(d_out, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(x)
        skin_feat = softplus100(nn.Dense(self.width)(x))
        n_bones = 6 if self.ghostbone else 5
        skin = nn.Dense(n_bones, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(skin_feat)
        lbs_weights = jax.nn.softmax(20.0 * skin, axis=-1)

        posedirs = blend[:, : 36 * 3].reshape(-1, 36, 3)
        shapedirs = blend[:, 36 * 3: 36 * 3 + self.n_exp * 3].reshape(
            -1, 3, self.n_exp
        )
        if self.deform_c:
            pnts_c_flame = pts + blend[:, -3:]
        else:
            pnts_c_flame = pts
        return shapedirs, posedirs, lbs_weights, pnts_c_flame


@struct.dataclass
class MonoConfig:
    n_init_points: int = struct.field(pytree_node=False, default=400)
    max_points: int = struct.field(pytree_node=False, default=100_000)
    prune_thresh: float = struct.field(pytree_node=False, default=0.1)
    cam_scale: float = struct.field(pytree_node=False, default=3.0)   # insta
    scene_scale: float = struct.field(pytree_node=False, default=1.0)
    img_height: int = struct.field(pytree_node=False, default=512)
    img_width: int = struct.field(pytree_node=False, default=512)
    ghostbone: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class MonoModel:
    flame: FlameModel                     # built with factor=4 (scene x4)
    canonical_pose_feature: jax.Array
    canonical_transformations: jax.Array  # ghostbone-extended [1, 6, 4, 4]
    canonical_verts: jax.Array            # [V, 3]
    bg_color: jax.Array
    cfg: MonoConfig = struct.field(pytree_node=False)


@struct.dataclass
class MonoParams:
    points: jax.Array          # [N_max, 3]
    geometry: dict
    deformer: dict
    gaussian: dict
    rendering: dict


@struct.dataclass
class MonoState:
    alive: jax.Array           # [N_max]
    visible: jax.Array         # [N_max] accumulated visibility
    radius: jax.Array          # [] current splat radius (host-scheduled decay)


def init_monogaussianavatar(flame: FlameModel, cfg: MonoConfig,
                            bg_color=(1.0, 1.0, 1.0), seed: int = 0):
    """Sphere point init (monogaussianavatar.py:538-545) + network init.
    ``flame`` must be built with factor=4 (the reference scales the scene,
    FLAME.py:54 + monogaussianavatar.py:101)."""
    rng = np.random.default_rng(seed)
    N = cfg.max_points
    n0 = cfg.n_init_points
    init_radius = 0.5 / cfg.scene_scale
    pts = rng.random((n0, 3)) * 2 - 1
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True).clip(1e-8) * init_radius

    points = jnp.zeros((N, 3), jnp.float32).at[:n0].set(jnp.asarray(pts, jnp.float32))
    alive = jnp.zeros((N,), bool).at[:n0].set(True)

    cano_verts, cano_pf, cano_tf = flame_forward(
        flame, flame.canonical_exp, flame.canonical_pose
    )
    if cfg.ghostbone:
        eye = jnp.eye(4)[None, None]
        cano_tf = jnp.concatenate([eye, cano_tf], axis=1)

    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    geometry = GeometryNetwork()
    deformer = ForwardDeformer(n_exp=flame.n_exp, ghostbone=cfg.ghostbone)
    gaussian = GaussianNetwork()
    rendering = RenderingNetwork()
    dummy = jnp.zeros((1, 3))
    params = MonoParams(
        points=points,
        geometry=geometry.init(k1, dummy)["params"],
        deformer=deformer.init(k2, dummy)["params"],
        gaussian=gaussian.init(k3, dummy)["params"],
        rendering=rendering.init(k4, dummy)["params"],
    )
    state = MonoState(
        alive=alive,
        visible=jnp.zeros((N,), bool),
        radius=jnp.asarray(
            0.15 * (0.75 ** math.log2(n0 / 100)) / cfg.scene_scale, jnp.float32
        ),
    )
    model = MonoModel(
        flame=flame,
        canonical_pose_feature=cano_pf,
        canonical_transformations=cano_tf,
        canonical_verts=cano_verts[0],
        bg_color=jnp.asarray(bg_color, jnp.float32),
        cfg=cfg,
    )
    nets = {"geometry": geometry, "deformer": deformer,
            "gaussian": gaussian, "rendering": rendering}
    return model, params, state, nets


def mono_forward(model: MonoModel, params: MonoParams, state: MonoState,
                 nets: dict, expression, flame_pose, camera: Camera,
                 bg_color=None, render_cfg: RenderConfig = RenderConfig(),
                 means2d_probe=None):
    """monogaussianavatar.py:150-254."""
    cfg = model.cfg
    pts = params.points
    n = pts.shape[0]

    # FLAME drive (batch of 1)
    _, pose_feature, transformations = flame_forward(
        model.flame, expression[None], flame_pose[None]
    )
    if cfg.ghostbone:
        eye = jnp.eye(4)[None, None]
        transformations = jnp.concatenate([eye, transformations], axis=1)

    # geometry attributes
    color_f, scale_f, rot_f, opac_f = nets["geometry"].apply(
        {"params": params.geometry}, jax.lax.stop_gradient(pts)
    )

    # per-point deformation weights + canonical flame points
    shapedirs, posedirs, lbs_weights, pnts_c_flame = nets["deformer"].apply(
        {"params": params.deformer}, pts
    )

    # canonical -> posed morph (flame.forward_pts, FLAME.py:207-237)
    canonical_exp = model.flame.canonical_exp
    pnts_c_orig = flame_mod.inverse_pts(
        pnts_c_flame,
        jnp.broadcast_to(canonical_exp, (n, canonical_exp.shape[1])),
        jnp.broadcast_to(model.canonical_transformations,
                         (n,) + model.canonical_transformations.shape[1:]),
        jnp.broadcast_to(model.canonical_pose_feature, (n, 36)),
        shapedirs, posedirs, lbs_weights,
    )
    pnts_d = flame_mod.forward_pts(
        pnts_c_orig,
        jnp.broadcast_to(expression, (n, expression.shape[0])),
        jnp.broadcast_to(transformations, (n,) + transformations.shape[1:]),
        jnp.broadcast_to(pose_feature, (n, 36)),
        shapedirs, posedirs, lbs_weights,
    )

    # deformation-conditioned offsets
    offset = jax.lax.stop_gradient(pnts_d) - jax.lax.stop_gradient(pnts_c_flame)
    d_scale, d_rot, d_opac, d_color = nets["gaussian"].apply(
        {"params": params.gaussian}, offset
    )

    color = jax.nn.sigmoid(color_f + d_color)
    scale = jax.nn.sigmoid(scale_f + d_scale) * 0.025 / cfg.scene_scale
    rot = rot_f + d_rot
    opacity_logit = opac_f + d_opac

    # our container stores log-scale; radius padding matches
    # monogaussianavatar.py:417 (scales + radius passed activated)
    scaling_log = jnp.log(jnp.maximum(scale + state.radius, 1e-12))

    gaussians = Gaussians(
        xyz=pnts_d,
        scaling=scaling_log,
        rotation=rot,
        opacity=opacity_logit,
        features_dc=jnp.zeros((n, 1, 3), jnp.float32),
        features_rest=jnp.zeros((n, 1, 3), jnp.float32),
        alive=state.alive,
        sh_degree=0,
    )

    # camera translation scaled (monogaussianavatar.py:157-160)
    cam = camera.replace(
        view=camera.view.at[:3, 3].mul(cfg.cam_scale),
    )
    cam = cam.replace(
        full_proj=cam.proj @ cam.view,
        campos=-cam.view[:3, :3].T @ cam.view[:3, 3],
    )

    bg = model.bg_color if bg_color is None else bg_color
    out = render(cam, gaussians, bg, config=render_cfg,
                 override_color=color, means2d_probe=means2d_probe)

    visible_now = (jax.nn.sigmoid(opacity_logit[:, 0]) >= cfg.prune_thresh) & state.alive

    # nearest canonical FLAME vertex for the lbs distillation loss
    d2 = (
        jnp.sum(pnts_c_flame**2, -1, keepdims=True)
        - 2 * pnts_c_flame @ model.canonical_verts.T
        + jnp.sum(model.canonical_verts**2, -1)[None, :]
    )
    index_batch = jnp.argmin(d2, axis=-1)

    return {
        "rgb_image": out["render"],
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "overflow": out["overflow"],
        "visible_now": visible_now,
        "index_batch": index_batch,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "lbs_weights": lbs_weights,
        "alive": state.alive,
    }


# ---------------------------------------------------------------------------
# epoch-level point maintenance (monogaussianavatar.py:430-467 + PointCloud)
# ---------------------------------------------------------------------------

UPSAMPLE_SCHEDULE = (
    (5, 400), (10, 800), (15, 1600), (20, 3200), (25, 6400),
    (30, 10000), (40, 20000), (50, 40000), (60, 80000),
)


def target_points_for_epoch(epoch: int, max_points: int) -> int:
    for limit, target in UPSAMPLE_SCHEDULE:
        if epoch < limit:
            return min(target, max_points)
    return max_points


def radius_decay(epoch: int, radius: float) -> float:
    if epoch in (5, 10, 15, 20, 25, 30, 40, 50):
        return 0.75 * radius
    if epoch == 60:
        return 0.9 * radius
    if epoch > 60 and epoch % 5 == 0:
        return 0.75 * radius
    return radius


@partial(jax.jit, static_argnames=("target",))
def prune_and_upsample(key, params: MonoParams, state: MonoState,
                       target: int, noise_scale: jax.Array):
    """Prune invisible points, then clone random survivors with noise until
    ``target`` points are alive (PointCloud.prune/upsample_points)."""
    n = state.alive.shape[0]
    alive = state.alive & state.visible

    num_alive = jnp.sum(alive)
    need = jnp.maximum(target - num_alive, 0)

    k1, k2 = jax.random.split(key)
    probs = jnp.where(alive, 1.0, 0.0)
    probs = jnp.where(jnp.sum(probs) > 0, probs, jnp.ones_like(probs))
    src = jax.random.categorical(
        k1, jnp.log(jnp.maximum(probs, 1e-30)), shape=(target,)
    )
    noise = (jax.random.uniform(k2, (target, 3)) - 0.5) * noise_scale
    new_pts = params.points[src] + noise

    order = jnp.argsort(alive)            # dead first
    slots = order[:target]
    write = jnp.arange(target) < need
    slots = jnp.where(write, slots, n)

    points = params.points.at[slots].set(new_pts, mode="drop")
    alive = alive.at[slots].set(write, mode="drop")

    return (
        params.replace(points=points),
        state.replace(alive=alive, visible=jnp.zeros_like(state.visible)),
        jnp.zeros((n,), bool).at[slots].set(write, mode="drop"),
    )
