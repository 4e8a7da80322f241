"""Reference (oracle) alpha-blend: pure JAX, differentiable by autodiff.

Mirrors the per-pixel front-to-back compositing of ``renderCUDA``
(diff-gaussian-rasterization cuda_rasterizer/forward.cu:261-374) with one
deliberate semantic change shared by the Pallas kernel: the CUDA early-exit
at transmittance T < 1e-4 is treated as the performance optimization it is —
we keep compositing (contributions past that point are bounded by 1e-4), so
the blend becomes a closed-form cumulative product that is fully
vectorizable and cleanly differentiable. The alpha clamps are kept exactly:
alpha = min(0.99, opacity * exp(power)), contributions with power > 0 or
alpha < 1/255 are skipped (forward.cu:335-345).

This module is the kernel oracle (SURVEY.md §4 layer (b)) and the CPU
fallback path. O(pixels x N) — use for small scenes and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fateavatar_tpu.render.binning import TILE, gaussian_rect, tile_grid
from fateavatar_tpu.render.preprocess import Preprocessed

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def blend_reference(
    prep: Preprocessed,
    width: int,
    height: int,
    bg_color: jax.Array,
    respect_tile_culling: bool = True,
) -> jax.Array:
    """Composite all Gaussians into an image. Returns [H, W, 3].

    ``respect_tile_culling``: when True, a Gaussian contributes to a pixel
    only if the pixel's 16x16 tile lies inside the Gaussian's screen rect —
    the exact CUDA visibility rule, so the oracle matches the tile kernel
    bit-for-bit (modulo float association).
    """
    n = prep.mean2d.shape[0]
    grid = tile_grid(width, height)

    # depth order, dead at the end
    order = jnp.argsort(jnp.where(prep.visible, prep.depth, jnp.inf))
    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    color = prep.color[order]
    opacity = prep.opacity[order]
    radius = prep.radius[order]
    visible = prep.visible[order]

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(px, py)            # [H, W]

    dx = mean2d[:, 0][:, None, None] - gx[None]   # [N, H, W]
    dy = mean2d[:, 1][:, None, None] - gy[None]

    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = (
        -0.5 * (a[:, None, None] * dx * dx + c[:, None, None] * dy * dy)
        - b[:, None, None] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None, None] * jnp.exp(power))
    contributes = (power <= 0.0) & (alpha >= ALPHA_MIN) & visible[:, None, None]

    if respect_tile_culling:
        rminx, rminy, rmaxx, rmaxy = gaussian_rect(mean2d, radius, grid)
        tile_x = (gx / TILE).astype(jnp.int32)
        tile_y = (gy / TILE).astype(jnp.int32)
        in_rect = (
            (tile_x[None] >= rminx[:, None, None])
            & (tile_x[None] < rmaxx[:, None, None])
            & (tile_y[None] >= rminy[:, None, None])
            & (tile_y[None] < rmaxy[:, None, None])
        )
        contributes = contributes & in_rect

    alpha = jnp.where(contributes, alpha, 0.0)

    # exclusive cumulative transmittance over depth order
    one_minus = 1.0 - alpha
    t_incl = jnp.cumprod(one_minus, axis=0)
    t_excl = jnp.concatenate([jnp.ones_like(t_incl[:1]), t_incl[:-1]], axis=0)

    w = alpha * t_excl                                    # [N, H, W]
    img = jnp.einsum("nhw,nc->hwc", w, color)
    t_final = t_incl[-1]
    return img + t_final[..., None] * bg_color
