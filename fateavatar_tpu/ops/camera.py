"""Perspective camera model (pure JAX pytree).

Reproduces the 3DGS camera conventions of the reference
(volume_rendering/camera_3dgs.py:22-87, tools/gs_utils/graphics_utils.py:51-124)
but stores matrices in plain math convention (column vectors, ``M @ p``)
instead of the torch code's transposed row-vector layout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: jax.Array, T: jax.Array) -> jax.Array:
    """Build the world->view matrix from the 3DGS (R, T) convention.

    In the 3DGS convention (graphics_utils.py:51-62) ``R`` is the rotation
    block of the *camera-to-world* frame stored transposed, i.e. W2V[:3,:3]
    = R^T and W2V[:3,3] = T.
    """
    Rt = jnp.eye(4, dtype=jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(T)
    return Rt


def projection_matrix(
    znear: float,
    zfar: float,
    fovx: jax.Array,
    fovy: jax.Array,
    shift: Optional[tuple] = None,
) -> jax.Array:
    """OpenGL-style asymmetric-frustum projection (graphics_utils.py:64-118).

    ``shift``, when given, is ``(focal_x, focal_y, cx, cy, width, height)``
    for non-centred principal points (getProjectionMatrixShift).
    """
    tan_half_fovy = jnp.tan(fovy / 2.0)
    tan_half_fovx = jnp.tan(fovx / 2.0)

    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    if shift is not None:
        focal_x, focal_y, cx, cy, width, height = shift
        off_x = (cx - width / 2.0) / focal_x * znear
        off_y = (cy - height / 2.0) / focal_y * znear
        top = top + off_y
        bottom = bottom + off_y
        left = left + off_x
        right = right + off_x

    z_sign = 1.0
    zero = jnp.zeros(())
    P = jnp.stack([
        jnp.stack([2.0 * znear / (right - left), zero, (right + left) / (right - left), zero]),
        jnp.stack([zero, 2.0 * znear / (top - bottom), (top + bottom) / (top - bottom), zero]),
        jnp.stack([zero, zero, jnp.full((), z_sign * zfar / (zfar - znear)),
                   jnp.full((), -(zfar * znear) / (zfar - znear))]),
        jnp.stack([zero, zero, jnp.full((), z_sign), zero]),
    ])
    return P.astype(jnp.float32)


@struct.dataclass
class Camera:
    """A pinhole camera, jit/vmap friendly.

    Attributes:
      view:      [4,4] world->view.
      proj:      [4,4] view->clip.
      full_proj: [4,4] world->clip (proj @ view).
      campos:    [3]   camera centre in world space.
      fovx/fovy: scalars (radians).
      width/height: static ints (pixel resolution).
    """

    view: jax.Array
    proj: jax.Array
    full_proj: jax.Array
    campos: jax.Array
    fovx: jax.Array
    fovy: jax.Array
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @property
    def tan_fovx(self) -> jax.Array:
        return jnp.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self) -> jax.Array:
        return jnp.tan(self.fovy * 0.5)

    @property
    def focal_x(self) -> jax.Array:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jax.Array:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(
    R: jax.Array,
    T: jax.Array,
    fovx,
    fovy,
    width: int,
    height: int,
    intrinsics: Optional[jax.Array] = None,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a :class:`Camera` the way volume_rendering/camera_3dgs.py:22-72 does.

    ``intrinsics`` (3x3 K) triggers the principal-point-shift projection used
    by the NeRSemble benchmark variant (benchmark/nersemble/fateavatar.py:182).
    """
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    fovx = jnp.asarray(fovx, jnp.float32)
    fovy = jnp.asarray(fovy, jnp.float32)
    view = world_to_view(R, T)
    shift = None
    if intrinsics is not None:
        K = jnp.asarray(intrinsics, jnp.float32)
        shift = (K[0, 0], K[1, 1], K[0, 2], K[1, 2], width, height)
    proj = projection_matrix(znear, zfar, fovx, fovy, shift)
    full_proj = proj @ view
    # camera centre = inverse(view)[:3, 3]; for a rigid transform this is
    # -R_view^T t_view which avoids a general 4x4 inverse under jit.
    campos = -view[:3, :3].T @ view[:3, 3]
    return Camera(
        view=view,
        proj=proj,
        full_proj=full_proj,
        campos=campos,
        fovx=fovx,
        fovy=fovy,
        width=width,
        height=height,
        znear=znear,
        zfar=zfar,
    )


def make_camera_np(
    R,
    T,
    fovx,
    fovy,
    width: int,
    height: int,
    intrinsics=None,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Host-side :func:`make_camera`: identical math in NUMPY, zero device
    dispatches. On a remote-TPU (tunnelled) backend every eager jnp op in
    the trainer's per-frame loop costs a ~ms round trip — ~10 of them made
    the Trainer 7x slower than the bare jitted step. The numpy Camera's
    leaves upload once, inside the train-step dispatch itself."""
    import numpy as np

    R = np.asarray(R, np.float32)
    T = np.asarray(T, np.float32)
    fovx = np.float32(fovx)
    fovy = np.float32(fovy)

    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = R.T
    view[:3, 3] = T

    tan_half_fovy = np.tan(fovy / 2.0)
    tan_half_fovx = np.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    if intrinsics is not None:
        K = np.asarray(intrinsics, np.float32)
        off_x = (K[0, 2] - width / 2.0) / K[0, 0] * znear
        off_y = (K[1, 2] - height / 2.0) / K[1, 1] * znear
        top += off_y
        bottom += off_y
        left += off_x
        right += off_x
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[0, 2] = (right + left) / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0

    return Camera(
        view=view,
        proj=P,
        full_proj=P @ view,
        campos=-view[:3, :3].T @ view[:3, 3],
        fovx=np.asarray(fovx, np.float32),
        fovy=np.asarray(fovy, np.float32),
        width=width,
        height=height,
        znear=znear,
        zfar=zfar,
    )


def look_at_camera(
    eye,
    target,
    up,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
) -> Camera:
    """Orbit/look-at helper used for novel-view rendering and the GUI
    (tools/eg3d_utils/camera_eg3d.py:26-75 equivalent, OpenCV convention:
    +z forward, +y down is NOT applied here — matches the 3DGS convention
    where the camera looks down +z in view space)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    down = jnp.cross(fwd, right)
    # camera-to-world rotation (columns are the camera axes in world space)
    R_c2w = jnp.stack([right, down, fwd], axis=1)
    # 3DGS convention: Camera(R, T) with R = c2w rotation, T = w2v translation
    T = -R_c2w.T @ eye
    return make_camera(R_c2w, T, fovx, fovy, width, height)
