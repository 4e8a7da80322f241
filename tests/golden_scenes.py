"""Golden-scene definitions for the rasterizer parity suite.

Five scenes target the CUDA reference's numerical edge semantics
(SURVEY.md hard-part #3/#4; diff-gaussian-rasterization forward.cu):

* ``sh0_basic``   — plain SH-0 scene (baseline).
* ``sh3_clamp``   — SH degree 3 with large coefficients so several colors
                    go negative pre-clamp (computeColorFromSH's
                    max(rgb+0.5, 0) clamp flags, forward.cu:58-66).
* ``aniso``       — ~100:1 anisotropic scales (covariance conditioning,
                    +0.3 low-pass, 3-sigma radius from eigenvalues,
                    forward.cu:110,229-232).
* ``depth_ties``  — groups of gaussians at bit-identical depths
                    overlapping the same pixels (radix-sort tie order,
                    rasterizer_impl.cu:104).
* ``alpha_edges`` — opacities straddling the 0.99 alpha clamp and the
                    1/255 skip threshold (forward.cu:335-345).

Shared by tests/test_rasterizer.py and scripts/record_goldens.py.
"""

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.splats import inverse_sigmoid, make_gaussians

W = H = 64


def _camera():
    return make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, W, H)


def _bg():
    return jnp.asarray([0.2, 0.3, 0.4], jnp.float32)


def _pack(xyz, scaling, rotation, opacity, fdc, frest, sh_degree):
    g = make_gaussians(xyz, scaling, rotation, np.asarray(opacity),
                       fdc, frest, sh_degree=sh_degree)
    return _camera(), g, _bg()


def sh0_basic(n=60, seed=7):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.uniform(-0.4, 0.4, (n, 2)), rng.uniform(0.5, 2.0, (n, 1))], 1)
    scaling = np.log(rng.uniform(0.01, 0.08, (n, 3)))
    rotation = rng.normal(size=(n, 4))
    opacity = inverse_sigmoid(jnp.asarray(rng.uniform(0.2, 0.95, (n, 1))))
    fdc = rng.uniform(-1, 1, (n, 1, 3))
    frest = np.zeros((n, 0, 3))
    return _pack(xyz, scaling, rotation, opacity, fdc, frest, 0)


def sh3_clamp(n=48, seed=11):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.uniform(-0.35, 0.35, (n, 2)), rng.uniform(0.6, 1.8, (n, 1))], 1)
    scaling = np.log(rng.uniform(0.02, 0.07, (n, 3)))
    rotation = rng.normal(size=(n, 4))
    opacity = inverse_sigmoid(jnp.asarray(rng.uniform(0.3, 0.9, (n, 1))))
    # large negative DC + strong higher bands: many view-dependent colors
    # clamp at zero (the clamp-flag branch of the SH backward)
    fdc = rng.uniform(-2.5, 0.5, (n, 1, 3))
    frest = rng.uniform(-1.5, 1.5, (n, 15, 3))
    return _pack(xyz, scaling, rotation, opacity, fdc, frest, 3)


def aniso(n=40, seed=13):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.uniform(-0.3, 0.3, (n, 2)), rng.uniform(0.6, 1.6, (n, 1))], 1)
    # needle/pancake splats: per-axis scales spanning two orders of
    # magnitude (conditioning of the 2D covariance + low-pass)
    s_big = rng.uniform(0.05, 0.15, (n, 1))
    s_small = rng.uniform(0.0005, 0.002, (n, 2))
    scaling = np.log(np.concatenate([s_big, s_small], 1))
    perm = rng.permuted(np.tile(np.arange(3), (n, 1)), axis=1)
    scaling = np.take_along_axis(scaling, perm, axis=1)
    rotation = rng.normal(size=(n, 4))
    opacity = inverse_sigmoid(jnp.asarray(rng.uniform(0.4, 0.95, (n, 1))))
    fdc = rng.uniform(-1, 1, (n, 1, 3))
    return _pack(xyz, scaling, rotation, opacity, fdc, np.zeros((n, 0, 3)), 0)


def depth_ties(seed=17):
    rng = np.random.default_rng(seed)
    # 4 groups of 5 gaussians each at BIT-IDENTICAL depth, overlapping
    groups = []
    for gi, z in enumerate((0.8, 1.0, 1.25, 1.6)):
        for k in range(5):
            groups.append([
                0.05 * (k - 2) + 0.02 * gi, 0.04 * (k % 3 - 1), z])
    xyz = np.asarray(groups, np.float64)
    n = len(xyz)
    scaling = np.log(rng.uniform(0.03, 0.06, (n, 3)))
    rotation = np.tile([1.0, 0, 0, 0], (n, 1)) + rng.normal(size=(n, 4)) * 0.1
    opacity = inverse_sigmoid(jnp.asarray(rng.uniform(0.4, 0.8, (n, 1))))
    fdc = rng.uniform(-1, 1, (n, 1, 3))
    return _pack(xyz, scaling, rotation, opacity, fdc, np.zeros((n, 0, 3)), 0)


def alpha_edges(seed=19):
    rng = np.random.default_rng(seed)
    n = 36
    xyz = np.concatenate(
        [rng.uniform(-0.3, 0.3, (n, 2)), rng.uniform(0.6, 1.5, (n, 1))], 1)
    scaling = np.log(rng.uniform(0.02, 0.08, (n, 3)))
    rotation = rng.normal(size=(n, 4))
    # third saturated (sigmoid ~0.999 -> hits the 0.99 alpha clamp), third
    # moderate, third minuscule (alpha straddles the 1/255 skip threshold
    # across each splat's footprint)
    op = np.concatenate([
        np.full((12, 1), 0.999),
        rng.uniform(0.3, 0.7, (12, 1)),
        np.full((12, 1), 1.5 / 255.0),
    ])
    opacity = inverse_sigmoid(jnp.asarray(op))
    fdc = rng.uniform(-1, 1, (n, 1, 3))
    return _pack(xyz, scaling, rotation, opacity, fdc, np.zeros((n, 0, 3)), 0)


SCENES = {
    "sh0_basic": sh0_basic,
    "sh3_clamp": sh3_clamp,
    "aniso": aniso,
    "depth_ties": depth_ties,
    "alpha_edges": alpha_edges,
}
