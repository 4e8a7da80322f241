"""Reference (oracle) alpha-blend: pure JAX, differentiable by autodiff.

Mirrors the per-pixel front-to-back compositing of ``renderCUDA``
(diff-gaussian-rasterization cuda_rasterizer/forward.cu:261-374)
INCLUDING the T < 1e-4 termination semantics (forward.cu:346-351): the
instance whose blend would push transmittance below 1e-4 is DROPPED
(``done = true; continue`` fires before the color accumulation), and every
instance behind it is dropped too. This is part of the function the CUDA
rasterizer computes, not just an early-exit optimization — on saturated
pixels it changes t_final by orders of magnitude and cuts gradients to
occluded instances (divergence found by tests/cuda_oracle.py in round 3).

In closed form: the unmasked inclusive transmittance q_j = prod_{i<=j}
(1 - alpha_i) is monotone non-increasing, and before the first crossing
the masked and unmasked products coincide, so CUDA's sticky ``done`` flag
is exactly the stop-gradient mask q_j >= 1e-4. The alpha clamps are kept
exactly: alpha = min(0.99, opacity * exp(power)), contributions with
power > 0 or alpha < 1/255 are skipped (forward.cu:335-345).

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
T_EPS = 1e-4  # renderCUDA's termination threshold (forward.cu:347)


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
    # STRAIGHT-THROUGH 0.99 clamp: the CUDA backward does NOT gate
    # gradients through min(0.99, op*G) — it uses dL_dG = op * dL_dalpha
    # and dL_dop = G * dL_dalpha unconditionally (backward.cu:499,538,554),
    # so saturated splats keep receiving opacity/position gradients. Value
    # is clamped; gradient passes as if alpha = op * G.
    raw = opacity[:, None, None] * jnp.exp(power)
    alpha = raw + jax.lax.stop_gradient(jnp.minimum(ALPHA_MAX, raw) - raw)
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

    # CUDA termination (forward.cu:346-351): the instance that would push
    # T below 1e-4 is dropped, and everything behind it with it. The
    # UNMASKED cumulative product is monotone non-increasing and agrees
    # with the masked one up to the first crossing, so q >= T_EPS is
    # exactly the sticky done flag; the decision itself carries no
    # gradient (CUDA gives dropped instances none).
    q_incl = jnp.cumprod(1.0 - alpha, axis=0)
    keep = jax.lax.stop_gradient(q_incl) >= T_EPS
    alpha = jnp.where(keep, alpha, 0.0)

    # exclusive cumulative transmittance over depth order
    one_minus = 1.0 - alpha
    t_incl = jnp.cumprod(one_minus, axis=0)
    t_excl = jnp.concatenate([jnp.ones_like(t_incl[:1]), t_incl[:-1]], axis=0)

    w = alpha * t_excl                                    # [N, H, W]
    img = jnp.einsum("nhw,nc->hwc", w, color)
    t_final = t_incl[-1]
    return img + t_final[..., None] * bg_color
