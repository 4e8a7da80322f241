"""FLAME head model: linear blend skinning in pure JAX.

Functional re-design of flame/FLAME.py + flame/lbs.py from the reference.
The model is a frozen pytree of arrays (:class:`FlameModel`); all forward
passes are pure functions, jittable, vmappable and differentiable — including
w.r.t. the personalization deltas (delta_shapedirs / delta_posedirs /
delta_vertex, reference flame/FLAME.py:156-204).

FLAME joint layout (5 joints): 0 root/global, 1 neck, 2 jaw, 3 left eye,
4 right eye. ``full_pose`` is [B, 15] axis-angle stacked in that order
(reference FLAME.py:131-154).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fateavatar_tpu.ops.quaternion import axis_angle_to_matrix


@struct.dataclass
class FlameModel:
    """Frozen FLAME assets. All arrays float32 unless noted.

    v_template already includes the subject's identity shape (the reference
    bakes ``shape_params`` into v_template at load, FLAME.py:102).
    """

    v_template: jax.Array          # [V, 3]
    shapedirs: jax.Array           # [V, 3, n_shape + n_exp]
    posedirs: jax.Array            # [36, V*3]  (P x V*3 layout, lbs.py:78)
    j_regressor: jax.Array         # [J, V]
    lbs_weights: jax.Array         # [V, J]
    parents: jax.Array             # [J] int32, parents[0] == -1
    faces: jax.Array               # [F, 3] int32
    n_shape: int = struct.field(pytree_node=False)
    n_exp: int = struct.field(pytree_node=False)
    # canonical conditioning (FLAME.py:104-106)
    canonical_exp: jax.Array = None       # [1, n_exp]
    canonical_pose: jax.Array = None      # [1, 15]
    # 68-point landmark embedding (FLAME.py:66-93 loads
    # landmark_embedding.npy: a static full-68 set plus a yaw-binned dynamic
    # jaw-contour table). lmk_faces_idx/lmk_bary_coords hold the static
    # full-68 embedding; the dynamic tables (79 yaw bins x 17 contour
    # points, benchmark/nersemble/FLAME.py:213-260) drive
    # :func:`flame_landmarks_dynamic` for dlib-style contour behaviour at
    # profile views.
    lmk_faces_idx: jax.Array = None       # [L] int32 face per landmark
    lmk_bary_coords: jax.Array = None     # [L, 3] barycentric weights
    dynamic_lmk_faces_idx: jax.Array = None    # [79, 17] int32
    dynamic_lmk_bary_coords: jax.Array = None  # [79, 17, 3]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents
) -> Tuple[jax.Array, jax.Array]:
    """Forward-kinematic chain (flame/lbs.py:285-342).

    rot_mats [B, J, 3, 3], joints [B, J, 3] -> (posed_joints [B, J, 3],
    rel_transforms [B, J, 4, 4]). ``parents`` must be a static python
    list/tuple — the FLAME chain is tiny (J=5) so the loop unrolls in jit.
    """
    parents = [int(p) for p in parents]
    B, J = joints.shape[:2]
    rel_joints = joints.at[:, 1:].add(-joints[:, [p for p in parents[1:]]])

    def tmat(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)        # [B, 3, 4]
        bot = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bot], axis=-2)

    transforms = [tmat(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        transforms.append(transforms[parents[j]] @ tmat(rot_mats[:, j], rel_joints[:, j]))
    A = jnp.stack(transforms, axis=1)                            # [B, J, 4, 4]

    posed_joints = A[:, :, :3, 3]
    # subtract the rest-pose joint contribution: rel = A - pad(A @ [j;0])
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1), joints.dtype)], axis=-1)
    correction = jnp.einsum("bjmn,bjn->bjm", A, joints_h)        # [B, J, 4]
    rel = A.at[:, :, :, 3].add(-correction)
    return posed_joints, rel


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    j_regressor: jax.Array,
    parents,
    lbs_weights: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Linear blend skinning (flame/lbs.py:24-100).

    Args:
      betas [B, n_shape+n_exp], pose [B, J*3] axis-angle,
      v_template [B, V, 3] or [V, 3].

    Returns (verts [B, V, 3], pose_feature [B, (J-1)*9], rel_transforms
    [B, J, 4, 4]).
    """
    B = max(betas.shape[0], pose.shape[0])
    if v_template.ndim == 2:
        v_template = jnp.broadcast_to(v_template, (B,) + v_template.shape)

    # shape blendshapes — one big [B, S] x [V*3, S] matmul (MXU)
    v_shaped = v_template + jnp.einsum("bl,mkl->bmk", betas, shapedirs)

    # joints from the regressor
    J = jnp.einsum("bik,ji->bjk", v_shaped, j_regressor)

    # pose blendshapes
    rot_mats = axis_angle_to_matrix(pose.reshape(B, -1, 3))      # [B, J, 3, 3]
    ident = jnp.eye(3, dtype=pose.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)      # [B, 36]
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    # kinematic chain + skinning
    _, A = batch_rigid_transform(rot_mats, J, parents)
    num_joints = j_regressor.shape[0]
    W = lbs_weights                                              # [V, J]
    T = jnp.einsum("vj,bjmn->bvmn", W, A)                        # [B, V, 4, 4]
    verts = jnp.einsum("bvmn,bvn->bvm", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    return verts, pose_feature, A


def euler_xyz_matrix(euler: jax.Array) -> jax.Array:
    """Intrinsic-XYZ euler angles [..., 3] -> rotation matrices [..., 3, 3]
    (scipy 'XYZ' order — the convention of the NeRSemble tracking's
    model-to-world pose, benchmark/nersemble/FLAME.py:262-275)."""
    cx, cy, cz = (jnp.cos(euler[..., i]) for i in range(3))
    sx, sy, sz = (jnp.sin(euler[..., i]) for i in range(3))
    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], -1).reshape(*cx.shape, 3, 3)
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], -1).reshape(*cx.shape, 3, 3)
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], -1).reshape(*cx.shape, 3, 3)
    return rx @ ry @ rz


def apply_world_transform(verts: jax.Array, wt: jax.Array) -> jax.Array:
    """Model-to-world similarity transform of posed vertices.

    ``wt`` [B, 7] = (euler_xyz[3], translation[3], scale[1]); verts
    [B, V, 3]. The scale multiplies the ROTATION block only — translation
    is unscaled (benchmark/nersemble/FLAME.py:262-275: the tracking's
    4x4 has its rotation block scaled in place)."""
    R = euler_xyz_matrix(wt[:, :3]) * wt[:, 6][:, None, None]
    return jnp.einsum("bvk,bjk->bvj", verts, R) + wt[:, None, 3:6]


def flame_forward(
    model: FlameModel,
    expression: jax.Array,
    full_pose: jax.Array,
    delta_shapedirs: Optional[jax.Array] = None,
    delta_posedirs: Optional[jax.Array] = None,
    delta_vertex: Optional[jax.Array] = None,
    world_transform: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FLAME morphing, with optional learned deltas
    (FLAME.py:131-204, forward / forward_with_delta_blendshape unified).

    expression [B, n_exp], full_pose [B, 15]. ``world_transform`` [B, 7]
    (euler_xyz, translation, scale) applies the tracking's model-to-world
    similarity AFTER posing — the NeRSemble-benchmark variant, where the
    global head pose lives outside FLAME (benchmark/nersemble/
    fateavatar.py:174-230 passes rotation/translation/scale separately and
    zeroes the global-rotation slot of full_pose).
    """
    B = expression.shape[0]
    betas = jnp.concatenate(
        [jnp.zeros((B, model.n_shape), expression.dtype), expression[:, : model.n_exp]],
        axis=1,
    )
    v_template = model.v_template
    if delta_vertex is not None:
        v_template = v_template + delta_vertex
    shapedirs = model.shapedirs
    if delta_shapedirs is not None:
        shapedirs = shapedirs + delta_shapedirs
    posedirs = model.posedirs
    if delta_posedirs is not None:
        posedirs = posedirs + delta_posedirs
    parents = tuple(int(p) for p in jax.device_get(model.parents))
    verts, joints, pose_feature = lbs(
        betas, full_pose, v_template, shapedirs, posedirs,
        model.j_regressor, parents, model.lbs_weights,
    )
    if world_transform is not None:
        verts = apply_world_transform(verts, world_transform)
    return verts, joints, pose_feature


def vertices2landmarks(
    vertices: jax.Array,
    faces: jax.Array,
    lmk_faces_idx: jax.Array,
    lmk_bary_coords: jax.Array,
) -> jax.Array:
    """Barycentric landmark extraction (flame/lbs.py:352-385).

    vertices [B, V, 3], faces [F, 3], lmk_faces_idx [L], lmk_bary [L, 3]
    -> [B, L, 3].
    """
    lmk_verts = vertices[:, faces[lmk_faces_idx]]        # [B, L, 3, 3]
    return jnp.einsum("blfk,lf->blk", lmk_verts, lmk_bary_coords)


def flame_landmarks(model: FlameModel, vertices: jax.Array) -> jax.Array:
    """68-point landmarks of already-posed FLAME vertices [B, V, 3].

    The native replacement for the completion pipeline's dlib keypoint
    stage (train/completion.py:253-303): on the avatar's own renders the
    camera AND the driving mesh are known, so exact FLAME landmarks beat a
    detector."""
    assert model.lmk_faces_idx is not None, "model has no landmark embedding"
    return vertices2landmarks(
        vertices, model.faces, model.lmk_faces_idx, model.lmk_bary_coords
    )


def _neck_kin_chain(model: FlameModel, neck_idx: int = 1):
    """Joint chain neck -> root (FLAME.py:87-93). Static python tuple."""
    parents = [int(p) for p in jax.device_get(model.parents)]
    chain, cur = [], neck_idx
    while cur != -1:
        chain.append(cur)
        cur = parents[cur]
    return tuple(chain)


def rot_mat_to_euler_y(rot_mats: jax.Array) -> jax.Array:
    """Yaw angle from a rotation matrix (flame/lbs.py:344-350):
    atan2(-R[2,0], hypot(R[0,0], R[1,0]))."""
    sy = jnp.sqrt(rot_mats[..., 0, 0] ** 2 + rot_mats[..., 1, 0] ** 2)
    return jnp.arctan2(-rot_mats[..., 2, 0], sy)


def find_dynamic_lmk_idx_and_bcoords(
    model: FlameModel, full_pose: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Yaw-binned jaw-contour selection
    (benchmark/nersemble/FLAME.py:213-260, from smplx).

    Composes the neck-chain rotations from ``full_pose`` [B, 15], converts
    the relative yaw to a rounded degree bin clamped to [-39, 39] (negative
    yaws map to rows 40..78), and gathers that row of the 79x17 dynamic
    contour table. Pure gather — jit/vmap safe.
    """
    B = full_pose.shape[0]
    chain = _neck_kin_chain(model)
    aa = full_pose.reshape(B, -1, 3)[:, jnp.asarray(chain)]      # [B, C, 3]
    rot_mats = axis_angle_to_matrix(aa)                          # [B, C, 3, 3]
    rel = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype), (B, 3, 3))
    for i in range(len(chain)):
        rel = rot_mats[:, i] @ rel
    return dynamic_lmk_rows_from_rot(model, rel)


def dynamic_lmk_rows_from_rot(
    model: FlameModel, rel: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Contour-row selection from an already-composed relative rotation
    [B, 3, 3] — lets callers fold camera orbit into the apparent yaw (a
    dlib detector on an orbit render sees camera azimuth as head yaw)."""
    y_deg = jnp.round(
        jnp.clip(-rot_mat_to_euler_y(rel) * 180.0 / jnp.pi, None, 39.0)
    ).astype(jnp.int32)                                          # [B]
    neg_mask = (y_deg < 0).astype(jnp.int32)
    big_neg = (y_deg < -39).astype(jnp.int32)
    neg_vals = big_neg * 78 + (1 - big_neg) * (39 - y_deg)
    y_idx = neg_mask * neg_vals + (1 - neg_mask) * y_deg         # [B] in [0,78]
    return (model.dynamic_lmk_faces_idx[y_idx],
            model.dynamic_lmk_bary_coords[y_idx])


def flame_landmarks_dynamic(
    model: FlameModel, vertices: jax.Array, full_pose: jax.Array
) -> jax.Array:
    """68 landmarks with the yaw-dependent jaw contour: [17 dynamic contour
    ++ 51 static] per batch row (benchmark/nersemble/FLAME.py:319-325).

    Falls back to the static full-68 set when the model carries no dynamic
    table. ``lmk_faces_idx`` must then hold the full 68 embedding whose
    last 51 rows are the static (non-contour) landmarks."""
    if model.dynamic_lmk_faces_idx is None:
        return flame_landmarks(model, vertices)
    B = vertices.shape[0]
    dyn_faces, dyn_bary = find_dynamic_lmk_idx_and_bcoords(model, full_pose)
    static_faces = jnp.broadcast_to(model.lmk_faces_idx[-51:], (B, 51))
    static_bary = jnp.broadcast_to(model.lmk_bary_coords[-51:], (B, 51, 3))
    faces_idx = jnp.concatenate([dyn_faces, static_faces], axis=1)   # [B, 68]
    bary = jnp.concatenate([dyn_bary, static_bary], axis=1)          # [B, 68, 3]
    lmk_verts = vertices[
        jnp.arange(B)[:, None, None], model.faces[faces_idx]
    ]                                                                # [B, 68, 3, 3]
    return jnp.einsum("blfk,blf->blk", lmk_verts, bary)


# ---------------------------------------------------------------------------
# Per-point morphing (MonoGaussianAvatar path, flame/lbs.py:103-188)
# ---------------------------------------------------------------------------

def blend_shapes_pts(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """[N, S] x [N, 3, S] -> [N, 3] (lbs.py:210-230)."""
    return jnp.einsum("ml,mkl->mk", betas, shape_disps)


def pose_correctives_pts(pose_feature: jax.Array, posedirs: jax.Array) -> jax.Array:
    """[N, 36] x [N, 36, 3] -> [N, 3] (lbs.py:232-235)."""
    return jnp.einsum("mi,mik->mk", pose_feature, posedirs)


def forward_skinning_pts(pnts: jax.Array, transformations: jax.Array,
                         lbs_weights: jax.Array) -> jax.Array:
    """Skin individual points with per-point joint weights (lbs.py:125-151)."""
    n = pnts.shape[0]
    J = lbs_weights.shape[-1]
    T = jnp.einsum("mj,mjpq->mpq", lbs_weights, transformations.reshape(n, J, 4, 4))
    return jnp.einsum("mpq,mq->mp", T[:, :3, :3], pnts) + T[:, :3, 3]


def inverse_skinning_pts(pnts: jax.Array, transformations: jax.Array,
                         lbs_weights: jax.Array) -> jax.Array:
    """Inverse of :func:`forward_skinning_pts` (lbs.py:154-178)."""
    n = pnts.shape[0]
    J = lbs_weights.shape[-1]
    T = jnp.einsum("mj,mjpq->mpq", lbs_weights, transformations.reshape(n, J, 4, 4))
    Tinv = jnp.linalg.inv(T)
    return jnp.einsum("mpq,mq->mp", Tinv[:, :3, :3], pnts) + Tinv[:, :3, 3]


def forward_pts(pnts_c, betas, transformations, pose_feature,
                shapedirs, posedirs, lbs_weights):
    """Canonical points -> posed points (lbs.py:103-121)."""
    pnts = pnts_c + blend_shapes_pts(betas, shapedirs)
    pnts = pnts + pose_correctives_pts(pose_feature, posedirs)
    return forward_skinning_pts(pnts, transformations, lbs_weights)


def inverse_pts(pnts_p, betas, transformations, pose_feature,
                shapedirs, posedirs, lbs_weights):
    """Posed points -> canonical points (lbs.py:180-188)."""
    pnts = inverse_skinning_pts(pnts_p, transformations, lbs_weights)
    pnts = pnts - blend_shapes_pts(betas, shapedirs)
    return pnts - pose_correctives_pts(pose_feature, posedirs)
