"""Per-Gaussian preprocessing: projection, covariance, conic, radius, colour.

Pure-JAX, fully vectorized equivalent of the CUDA ``preprocessCUDA`` kernel
(diff-gaussian-rasterization cuda_rasterizer/forward.cu:154-256). These are
elementwise/small-matrix ops that XLA fuses into a handful of VPU loops; no
Pallas needed at this stage. All semantics below intentionally mirror the
CUDA reference so trained checkpoints transfer:

* near-cull at view-space z <= 0.2           (auxiliary.h:139-164)
* EWA projection with 1.3*tanfov clamping    (forward.cu:82-87)
* +0.3 px low-pass on the 2D covariance      (forward.cu:110-111)
* radius = ceil(3 sigma_max) from eigenvalues (forward.cu:229-232)
* ndc2Pix(v, S) = ((v+1)*S - 1)/2            (auxiliary.h:41-44)
* SH -> RGB with +0.5 shift and clamp        (forward.cu:20-71)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.ops.quaternion import quat_to_matrix
from fateavatar_tpu.ops.sh import sh_to_color


class Preprocessed(NamedTuple):
    mean2d: jax.Array       # [N, 2] pixel coords
    depth: jax.Array        # [N] view-space z
    conic: jax.Array        # [N, 3] inverse 2D covariance (a, b, c)
    color: jax.Array        # [N, 3] RGB
    opacity: jax.Array      # [N]
    radius: jax.Array       # [N] int32 pixel radius (0 == culled)
    visible: jax.Array      # [N] bool (radius > 0)


def compute_cov3d(scale: jax.Array, rotation_q: jax.Array,
                  scale_modifier: float = 1.0) -> jax.Array:
    """3D covariance upper triangle (xx, xy, xz, yy, yz, zz) from activated
    scale and normalized quaternion (forward.cu:118-152)."""
    R = quat_to_matrix(rotation_q)                       # [N, 3, 3]
    S = scale * scale_modifier                            # [N, 3]
    M = R * S[..., None, :]                               # R @ diag(S)
    sigma = M @ jnp.swapaxes(M, -1, -2)                   # [N, 3, 3]
    return jnp.stack(
        [sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
         sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2]],
        axis=-1,
    )


def compute_cov2d(
    mean3d: jax.Array,
    cov3d: jax.Array,
    view: jax.Array,
    focal_x: jax.Array,
    focal_y: jax.Array,
    tan_fovx: jax.Array,
    tan_fovy: jax.Array,
) -> jax.Array:
    """EWA splatting 3D->2D covariance (forward.cu:74-113). Returns
    [N, 3] = (cov_xx, cov_xy, cov_yy) including the +0.3 low-pass."""
    t = mean3d @ view[:3, :3].T + view[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J: Jacobian of the perspective projection (2x3 active rows)
    zero = jnp.zeros_like(tz)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)
    J = jnp.stack(
        [jnp.stack([j00, zero, j02], -1),
         jnp.stack([zero, j11, j12], -1)],
        axis=-2,
    )                                                     # [N, 2, 3]

    W = view[:3, :3]                                      # [3, 3]
    T = J @ W                                             # [N, 2, 3]

    c = cov3d
    V = jnp.stack(
        [jnp.stack([c[..., 0], c[..., 1], c[..., 2]], -1),
         jnp.stack([c[..., 1], c[..., 3], c[..., 4]], -1),
         jnp.stack([c[..., 2], c[..., 4], c[..., 5]], -1)],
        axis=-2,
    )                                                     # [N, 3, 3]
    cov = T @ V @ jnp.swapaxes(T, -1, -2)                 # [N, 2, 2]
    return jnp.stack(
        [cov[..., 0, 0] + 0.3, cov[..., 0, 1], cov[..., 1, 1] + 0.3], axis=-1
    )


def preprocess(
    camera: Camera,
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    sh: jax.Array | None,
    sh_degree: int,
    colors_precomp: jax.Array | None = None,
    scale_modifier: float = 1.0,
    alive: jax.Array | None = None,
) -> Preprocessed:
    """Vectorized per-Gaussian preprocessing. ``alive`` masks dead capacity
    slots (our static-shape replacement for varying N; dead => radius 0)."""
    W, H = camera.width, camera.height

    # projection
    p_hom = means3d @ camera.full_proj[:, :3].T + camera.full_proj[:, 3]
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]
    p_view_z = means3d @ camera.view[2, :3] + camera.view[2, 3]

    in_frustum = p_view_z > 0.2

    cov3d = compute_cov3d(scales, rotations, scale_modifier)
    cov = compute_cov2d(
        means3d, cov3d, camera.view,
        camera.focal_x, camera.focal_y, camera.tan_fovx, camera.tan_fovy,
    )

    det = cov[..., 0] * cov[..., 2] - cov[..., 1] * cov[..., 1]
    valid_det = det != 0.0
    det_inv = jnp.where(valid_det, 1.0 / jnp.where(valid_det, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov[..., 2] * det_inv, -cov[..., 1] * det_inv, cov[..., 0] * det_inv],
        axis=-1,
    )

    mid = 0.5 * (cov[..., 0] + cov[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    mean2d = jnp.stack(
        [((p_proj[..., 0] + 1.0) * W - 1.0) * 0.5,
         ((p_proj[..., 1] + 1.0) * H - 1.0) * 0.5],
        axis=-1,
    )

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - camera.campos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(sh_degree, sh, dirs)

    visible = in_frustum & valid_det
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    return Preprocessed(
        mean2d=mean2d,
        depth=p_view_z,
        conic=conic,
        color=color,
        opacity=opacities.reshape(-1),
        radius=radius,
        visible=radius > 0,
    )
