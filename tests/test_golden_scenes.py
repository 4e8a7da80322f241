"""Multi-scene rasterizer golden suite + CUDA tie-order semantics.

Five recorded scenes (tests/golden_scenes.py) pin the numerical edge
semantics of the reference CUDA rasterizer across every kernel/binning
variant: SH-3 color clamping (forward.cu:58-66), extreme anisotropy
(forward.cu:110,229-232), bit-identical depth ties (the stable radix sort,
rasterizer_impl.cu:104), and the 0.99 alpha clamp / 1/255 skip thresholds
(forward.cu:335-345). Each scene also carries recorded analytic gradients
for every differentiable field, and every field gets a finite-difference
check (jax.test_util.check_grads).

Tie-order: CUDA's duplicateWithKeys emits instances in gaussian input
order and sorts with a STABLE radix sort on (tile | depth-bits), so
bit-equal depths blend in ascending input-index order. Our pipeline gets
the same order from stable depth-argsort + stable tile sort; the test
proves it end-to-end by comparing tied scenes against epsilon-separated
strict orderings, both ways.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from golden_scenes import SCENES, _bg, _camera, _pack
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import inverse_sigmoid

GOLD_DIR = os.path.join(os.path.dirname(__file__), "goldens")

DIFF_FIELDS = ("xyz", "scaling", "rotation", "opacity",
               "features_dc", "features_rest")


def _budget(n):
    return n * 36


def variant_configs(n):
    return {
        "xla": RenderConfig(impl="xla", instance_budget=_budget(n)),
        "pallas_compact": RenderConfig(
            impl="pallas_interpret", kernel="instances",
            instance_budget=_budget(n)),
        "pallas_aligned_sort": RenderConfig(
            impl="pallas_interpret", kernel="instances", layout="aligned",
            binning="sort", instance_budget=_budget(n)),
        "pallas_twotier": RenderConfig(
            impl="pallas_interpret", kernel="instances", binning="twotier",
            tail_r0=4, tail_k=n, instance_budget=_budget(n)),
    }


@pytest.fixture(scope="module", params=sorted(SCENES))
def scene(request):
    name = request.param
    cam, g, bg = SCENES[name]()
    gold = np.load(os.path.join(GOLD_DIR, f"{name}.npz"))
    return name, cam, g, bg, gold


class TestGoldenScenes:
    def test_all_variants_match_golden(self, scene):
        name, cam, g, bg, gold = scene
        n = g.xyz.shape[0]
        for vname, cfg in variant_configs(n).items():
            out = render(cam, g, bg, config=cfg)
            np.testing.assert_allclose(
                np.asarray(out["render"]), gold["render"], atol=5e-5,
                err_msg=f"{name}/{vname} render")
            np.testing.assert_allclose(
                np.asarray(out["t_final"]), gold["t_final"], atol=5e-5,
                err_msg=f"{name}/{vname} t_final")
            np.testing.assert_array_equal(
                np.asarray(out["radii"]), gold["radii"],
                err_msg=f"{name}/{vname} radii")

    def test_cutoff_mode_within_tolerance(self, scene):
        """Early-exit mode (renderCUDA's T<1e-4 termination) stays within
        the cutoff bound of the exact recorded blend on every scene."""
        name, cam, g, bg, gold = scene
        n = g.xyz.shape[0]
        cfg = RenderConfig(impl="pallas_interpret", kernel="instances",
                           t_cutoff=1e-4, instance_budget=_budget(n))
        out = render(cam, g, bg, config=cfg)
        np.testing.assert_allclose(
            np.asarray(out["render"]), gold["render"], atol=2e-4,
            err_msg=f"{name}/cutoff render")

    def test_grads_match_golden(self, scene):
        name, cam, g, bg, gold = scene
        n = g.xyz.shape[0]
        cfg = RenderConfig(impl="pallas_interpret", kernel="instances",
                           instance_budget=_budget(n))
        sub = {f: getattr(g, f) for f in DIFF_FIELDS}

        def loss(d):
            o = render(cam, g.replace(**d), bg, config=cfg)
            return jnp.mean(o["render"] ** 2) + 0.1 * jnp.mean(o["t_final"])

        grads = jax.grad(loss)(sub)
        for f in DIFF_FIELDS:
            a = gold[f"grad_{f}"]
            b = np.asarray(grads[f])
            if a.size == 0:
                continue
            scale = max(1e-3, np.abs(a).max())
            np.testing.assert_allclose(
                b / scale, a / scale, atol=3e-4,
                err_msg=f"{name} grad_{f}")

    @pytest.mark.parametrize("field", DIFF_FIELDS)
    def test_numeric_grads_every_field(self, scene, field):
        name, cam, g, bg, gold = scene
        if getattr(g, field).size == 0:
            pytest.skip(f"{name} has no {field}")
        if name == "depth_ties" and field == "xyz":
            # moving xyz across a bit-identical depth tie reorders the
            # blend — a genuine jump discontinuity; finite differences
            # cannot agree with the (one-sided) analytic gradient there
            pytest.skip("depth-tie reordering is non-differentiable in xyz")
        n = g.xyz.shape[0]
        cfg = RenderConfig(impl="xla", instance_budget=_budget(n))

        def f(x):
            o = render(cam, g.replace(**{field: x}), bg, config=cfg)
            return jnp.mean(o["render"] ** 2) + 0.1 * jnp.mean(o["t_final"])

        check_grads(f, (getattr(g, field),), order=1, modes=["rev"],
                    atol=2e-2, rtol=2e-2)


class TestSceneProperties:
    """The edge scenes must actually exercise the edges they claim."""

    def test_sh3_clamp_fires(self):
        from fateavatar_tpu.ops.sh import eval_sh

        cam, g, bg = SCENES["sh3_clamp"]()
        dirs = g.xyz - cam.campos[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        shs = jnp.concatenate([g.features_dc, g.features_rest], axis=1)
        raw = eval_sh(3, shs, dirs) + 0.5
        frac = float(jnp.mean((raw < 0).astype(jnp.float32)))
        assert frac > 0.2, f"only {frac:.0%} of channels clamp"

    def test_alpha_edges_straddle_thresholds(self):
        cam, g, bg = SCENES["alpha_edges"]()
        op = np.asarray(jax.nn.sigmoid(g.opacity[:, 0]))
        assert (op > 0.99).sum() >= 8      # the 0.99 clamp branch
        assert ((op > 1.0 / 255.0) & (op < 3.0 / 255.0)).sum() >= 8

    def test_depth_ties_bit_identical(self):
        from fateavatar_tpu.render.preprocess import preprocess

        cam, g, bg = SCENES["depth_ties"]()
        prep = preprocess(cam, g.xyz, g.get_scaling, g.get_rotation,
                          g.get_opacity, g.get_features, g.sh_degree,
                          alive=g.alive, stacked=False)
        depth = np.asarray(prep.depth)
        vals, counts = np.unique(depth.view(np.uint32), return_counts=True)
        assert (counts >= 5).sum() >= 4, "expected 4 groups of >=5 ties"

    def test_aniso_extreme(self):
        cam, g, bg = SCENES["aniso"]()
        s = np.asarray(jnp.exp(g.scaling))
        ratio = s.max(axis=1) / s.min(axis=1)
        assert (ratio > 20).all() and ratio.max() > 100


def _tie_pair(swap=False, eps=0.0):
    """Two overlapping gaussians at (bit-identical or eps-separated) depth;
    index order red-then-blue unless ``swap``. ``eps`` pushes whichever
    gaussian sits at index 1 BEHIND index 0, so index order == depth order."""
    z = np.float32(1.0)
    xyz = np.asarray([[-0.02, 0.0, z], [0.02, 0.0, z]], np.float32)
    fdc = np.asarray([[[1.5, -1.0, -1.0]], [[-1.0, -1.0, 1.5]]], np.float32)
    if swap:
        xyz, fdc = xyz[::-1].copy(), fdc[::-1].copy()
    xyz[1, 2] = np.float32(z + eps)
    n = 2
    scaling = np.log(np.full((n, 3), 0.08, np.float32))
    rotation = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n, 1))
    opacity = inverse_sigmoid(jnp.full((n, 1), 0.8))
    return _pack(xyz, scaling, rotation, opacity, fdc,
                 np.zeros((n, 0, 3)), 0)


class TestTieOrder:
    """Bit-equal depths must blend in ascending input-index order (CUDA's
    stable radix sort over (tile | depth_bits), rasterizer_impl.cu:104,
    with instances emitted in gaussian order)."""

    @pytest.mark.parametrize("vname", ["xla", "pallas_compact",
                                       "pallas_aligned_sort"])
    def test_tied_equals_index_order(self, vname):
        cfg = variant_configs(2)[vname]

        def img(swap, eps):
            cam, g, bg = _tie_pair(swap=swap, eps=eps)
            return np.asarray(render(cam, g, bg, config=cfg)["render"])

        tied = img(False, 0.0)
        # strict ordering with a depth gap too small to move the footprint:
        # red (index 0) in front
        strict = img(False, 1e-5)
        np.testing.assert_allclose(tied, strict, atol=1e-4)

        # swapped input order: blue now index 0 -> blue wins the tie
        tied_sw = img(True, 0.0)
        strict_sw = img(True, 1e-5)
        np.testing.assert_allclose(tied_sw, strict_sw, atol=1e-4)

        # and the two orders genuinely differ (the scene discriminates)
        assert np.abs(tied - tied_sw).max() > 1e-3

    def test_tie_order_follows_float_bit_order(self):
        """Positive float depth bits sort like the floats themselves —
        nextafter(z) must land BEHIND z (one bit apart)."""
        cfg = variant_configs(2)["xla"]
        cam, g, bg = _tie_pair(eps=0.0)
        z = float(g.xyz[0, 2])
        z_next = np.nextafter(np.float32(z), np.float32(np.inf))
        g_eps = g.replace(xyz=g.xyz.at[1, 2].set(z_next))
        out_bit = np.asarray(render(cam, g_eps, bg, config=cfg)["render"])
        out_tie = np.asarray(render(cam, g, bg, config=cfg)["render"])
        # index order and bit order agree here (0 in front either way)
        np.testing.assert_allclose(out_bit, out_tie, atol=1e-4)


class TestTwoTier:
    """'twotier' binning: only the K largest-footprint gaussians expand
    past tail_r0 tiles; exceeding K drops instances VISIBLY (overflow)."""

    def test_small_k_reports_overflow(self):
        cam, g, bg = SCENES["sh0_basic"]()
        n = g.xyz.shape[0]
        full = render(cam, g, bg, config=variant_configs(n)["pallas_twotier"])
        assert int(full["overflow"]) == 0
        tight = render(cam, g, bg, config=RenderConfig(
            impl="pallas_interpret", kernel="instances", binning="twotier",
            tail_r0=1, tail_k=1, instance_budget=_budget(n)))
        assert int(tight["overflow"]) > 0

    def test_tail_grads_match(self):
        """Gradients through tail-expanded (big) gaussians equal the
        single-tier path's."""
        cam, g, bg = SCENES["aniso"]()   # needles -> wide rects
        n = g.xyz.shape[0]
        cfg_ref = variant_configs(n)["pallas_compact"]
        cfg_tt = RenderConfig(
            impl="pallas_interpret", kernel="instances", binning="twotier",
            tail_r0=2, tail_k=n, instance_budget=_budget(n))

        def loss(xyz, cfg):
            o = render(cam, g.replace(xyz=xyz), bg, config=cfg)
            return jnp.mean(o["render"] ** 2)

        g_ref = np.asarray(jax.grad(lambda x: loss(x, cfg_ref))(g.xyz))
        g_tt = np.asarray(jax.grad(lambda x: loss(x, cfg_tt))(g.xyz))
        scale = max(1e-3, np.abs(g_ref).max())
        np.testing.assert_allclose(g_tt / scale, g_ref / scale, atol=3e-4)
