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
from fateavatar_tpu.ops.sh import sh_to_color


class Preprocessed(NamedTuple):
    mean2d: jax.Array       # [N, 2] pixel coords (None when stacked=False)
    depth: jax.Array        # [N] view-space z
    conic: jax.Array        # [N, 3] inverse 2D covariance (None when stacked=False)
    color: jax.Array        # [N, 3] RGB (None when stacked=False)
    opacity: jax.Array      # [N]
    radius: jax.Array       # [N] int32 pixel radius (0 == culled)
    visible: jax.Array      # [N] bool (radius > 0)
    soa: tuple = ()         # 9 [N] channel vectors (mx, my, conic_a, conic_b,
                            # conic_c, r, g, b, opacity) — the lane-major form
                            # every [N, k] stack above is a relayout of. The
                            # TPU profile showed each such stack/slice costing
                            # ~0.06 ms in layout shuffles; the Pallas path
                            # consumes these directly (stacked=False) and
                            # builds its packed array with ONE transpose.


def compute_cov3d(scale: jax.Array, rotation_q: jax.Array,
                  scale_modifier: float = 1.0) -> jax.Array:
    """3D covariance upper triangle (xx, xy, xz, yy, yz, zz) from activated
    scale and normalized quaternion (forward.cu:118-152).

    Written in SoA scalar form — no [N,3,3] intermediates. The TPU profile
    (docs/STATUS_ROUND1.md) showed XLA lowering batched tiny-matrix algebra
    to T(4,128)-tiled convolution fusions plus strided slice/copy fusions
    (~7 ms/step across preprocess); expanding the algebra over [N] channel
    vectors keeps everything in plain VPU elementwise fusions, exactly like
    the CUDA kernel's per-thread scalar code."""
    q = rotation_q / jnp.linalg.norm(
        rotation_q, axis=-1, keepdims=True).clip(1e-8)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    # rotation entries (forward.cu:126-138 convention, = quat_to_matrix)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0, s1, s2 = jnp.moveaxis(scale * scale_modifier, -1, 0)
    v0, v1, v2 = s0 * s0, s1 * s1, s2 * s2
    # sigma_ab = sum_j R_aj R_bj s_j^2 — returned as a TUPLE of [N] vectors
    # (stacking to [N, 6] here just to unstack in compute_cov2d would cost
    # 12 lane<->sublane relayout passes)
    return (
        r00 * r00 * v0 + r01 * r01 * v1 + r02 * r02 * v2,
        r00 * r10 * v0 + r01 * r11 * v1 + r02 * r12 * v2,
        r00 * r20 * v0 + r01 * r21 * v1 + r02 * r22 * v2,
        r10 * r10 * v0 + r11 * r11 * v1 + r12 * r12 * v2,
        r10 * r20 * v0 + r11 * r21 * v1 + r12 * r22 * v2,
        r20 * r20 * v0 + r21 * r21 * v1 + r22 * r22 * v2,
    )


def compute_cov2d(
    mean3d: jax.Array,
    cov3d: jax.Array,
    view: jax.Array,
    focal_x: jax.Array,
    focal_y: jax.Array,
    tan_fovx: jax.Array,
    tan_fovy: jax.Array,
):
    """EWA splatting 3D->2D covariance (forward.cu:74-113). Takes/returns
    tuples of [N] vectors: (cov_xx, cov_xy, cov_yy) incl. the +0.3 low-pass."""
    t = mean3d @ view[:3, :3].T + view[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    # CUDA gradient semantics for the EWA clamp (backward.cu:168-176,
    # 262-264): when |t.x/t.z| exceeds the limit, the x gradient is GATED
    # to zero (x_grad_mul) and the clamped t.x = ±lim*t.z is treated as a
    # CONSTANT w.r.t. t.z — plain autodiff through clip(x/z)*z would add
    # a ±lim*dz term the CUDA backward does not have (z-grad divergence
    # found by tests/cuda_oracle.py on near-camera gaussians, round 3).
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    in_x = (txtz >= -limx) & (txtz <= limx)
    in_y = (tytz >= -limy) & (tytz <= limy)
    tx_c = jax.lax.stop_gradient(jnp.clip(txtz, -limx, limx) * tz)
    ty_c = jax.lax.stop_gradient(jnp.clip(tytz, -limy, limy) * tz)
    tx = tx_c + jnp.where(in_x, t[..., 0] - jax.lax.stop_gradient(t[..., 0]), 0.0)
    ty = ty_c + jnp.where(in_y, t[..., 1] - jax.lax.stop_gradient(t[..., 1]), 0.0)

    # SoA expansion of cov2d = (J W) V (J W)^T — see compute_cov3d docstring
    # for why no [N,2,3]/[N,3,3] intermediates are built.
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)
    w00, w01, w02 = view[0, 0], view[0, 1], view[0, 2]
    w10, w11, w12 = view[1, 0], view[1, 1], view[1, 2]
    w20, w21, w22 = view[2, 0], view[2, 1], view[2, 2]
    # T = J @ W; J rows are [j00, 0, j02], [0, j11, j12]
    t00 = j00 * w00 + j02 * w20
    t01 = j00 * w01 + j02 * w21
    t02 = j00 * w02 + j02 * w22
    t10 = j11 * w10 + j12 * w20
    t11 = j11 * w11 + j12 * w21
    t12 = j11 * w12 + j12 * w22

    c0, c1, c2, c3, c4, c5 = cov3d
    # U = T @ V (V symmetric from the upper triangle)
    u00 = t00 * c0 + t01 * c1 + t02 * c2
    u01 = t00 * c1 + t01 * c3 + t02 * c4
    u02 = t00 * c2 + t01 * c4 + t02 * c5
    u10 = t10 * c0 + t11 * c1 + t12 * c2
    u11 = t10 * c1 + t11 * c3 + t12 * c4
    u12 = t10 * c2 + t11 * c4 + t12 * c5
    # cov = U @ T^T
    cov00 = u00 * t00 + u01 * t01 + u02 * t02
    cov01 = u00 * t10 + u01 * t11 + u02 * t12
    cov11 = u10 * t10 + u11 * t11 + u12 * t12
    return cov00 + 0.3, cov01, cov11 + 0.3


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
    stacked: bool = True,
) -> Preprocessed:
    """Vectorized per-Gaussian preprocessing. ``alive`` masks dead capacity
    slots (our static-shape replacement for varying N; dead => radius 0).
    ``stacked=False`` skips the [N, k] stacks (mean2d/conic/color are None)
    and consumers read the lane-major ``soa`` vectors instead."""
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

    cov00, cov01, cov11 = cov
    det = cov00 * cov11 - cov01 * cov01
    valid_det = det != 0.0
    det_inv = jnp.where(valid_det, 1.0 / jnp.where(valid_det, det, 1.0), 0.0)
    conic_a = cov11 * det_inv
    conic_b = -cov01 * det_inv
    conic_c = cov00 * det_inv

    mid = 0.5 * (cov00 + cov11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    mean_x = ((p_proj[..., 0] + 1.0) * W - 1.0) * 0.5
    mean_y = ((p_proj[..., 1] + 1.0) * H - 1.0) * 0.5

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

    opacity = opacities.reshape(-1)
    soa = (mean_x, mean_y, conic_a, conic_b, conic_c,
           color[..., 0], color[..., 1], color[..., 2], opacity)
    return Preprocessed(
        mean2d=(jnp.stack([mean_x, mean_y], axis=-1) if stacked else None),
        depth=p_view_z,
        conic=(jnp.stack([conic_a, conic_b, conic_c], axis=-1)
               if stacked else None),
        color=color if stacked else None,
        opacity=opacity,
        radius=radius,
        visible=radius > 0,
        soa=soa,
    )
