"""Reconcile the repo rasterizer against the INDEPENDENT CUDA oracle.

tests/cuda_oracle.py is a literal NumPy transcription of the reference
CUDA rasterizer (forward.cu / backward.cu / auxiliary.h /
rasterizer_impl.cu), derived from the CUDA source alone. The recorded
goldens (tests/goldens/*.npz) were recorded from this repo's own XLA path;
these tests break that self-referential loop (VERDICT r2 item #1) by
asserting that BOTH independently-derived implementations agree — on the
five recorded golden scenes AND on fresh randomized scenes the goldens
never saw — for:

* forward: image (atol 5e-5), t_final (atol 5e-5), radii (EXACT int
  equality — the strongest cross-check: ceil(3*sqrt(max eigenvalue)) must
  round identically through two unrelated float pipelines);
* backward: analytic gradients for every differentiable field (xyz,
  scaling, rotation, opacity, features_dc/rest), chained from the oracle's
  post-activation gradients through the activation VJPs;
* the screen-space probe gradient that drives densification: the repo's
  pixel-space probe grad times the CUDA NDC scaling (ddelx_dx = 0.5*W,
  backward.cu:460-461) must equal the oracle's dL_dmean2D.

Gradient comparisons use the same normalized-atol scheme as the golden
suite (scale by the field's max magnitude, atol 3e-4).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import cuda_oracle as co
from golden_scenes import SCENES, sh0_basic, sh3_clamp, aniso, alpha_edges
from fateavatar_tpu.render.render import RenderConfig, render


def _load_oracle_f64():
    """Second instance of the transcription with exact (float64) arithmetic.

    The f32 oracle preserves CUDA's literal op ORDER, which on needle
    (100:1 aniso) gaussians is conditioning-limited in the cov-chain
    backward (~5e-4 normalized vs exact — measured round 3); gradient
    comparisons therefore arbitrate against the f64 oracle (same CUDA
    semantics, exact arithmetic) while forward/threshold comparisons use
    the f32 oracle (bit-level clamp/skip/termination behavior).
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cuda_oracle_f64", os.path.join(os.path.dirname(__file__),
                                        "cuda_oracle.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.f32 = np.float64
    return mod


co64 = _load_oracle_f64()

GOLD_DIR = os.path.join(os.path.dirname(__file__), "goldens")
DIFF_FIELDS = ("xyz", "scaling", "rotation", "opacity",
               "features_dc", "features_rest")

# fresh scenes with seeds the goldens never saw
FRESH = {
    "fresh_sh0": lambda: sh0_basic(n=44, seed=101),
    "fresh_sh3": lambda: sh3_clamp(n=36, seed=103),
    "fresh_aniso": lambda: aniso(n=28, seed=105),
    "fresh_alpha": lambda: alpha_edges(seed=107),
}


def oracle_inputs(cam, g):
    """Extract the CUDA-binding-boundary inputs (post-activation arrays +
    transposed-flattened matrices, rasterize_points.cu:35-115 layout)."""
    return dict(
        means3D=np.asarray(g.xyz, np.float32),
        scales=np.asarray(g.get_scaling, np.float32),
        rotations=np.asarray(g.get_rotation, np.float32),
        opacities=np.asarray(g.get_opacity, np.float32),
        shs=np.asarray(g.get_features, np.float32),
        deg=g.sh_degree,
        viewmatrix=np.asarray(cam.view, np.float32).T.flatten(),
        projmatrix=np.asarray(cam.full_proj, np.float32).T.flatten(),
        campos=np.asarray(cam.campos, np.float32),
        tan_fovx=float(np.tan(float(cam.fovx) * 0.5)),
        tan_fovy=float(np.tan(float(cam.fovy) * 0.5)),
        W=cam.width,
        H=cam.height,
    )


def chain_to_raw(g, ora):
    """Chain the oracle's post-activation gradients through the raw-field
    activations (exp / normalize / sigmoid / SH split) used by both the
    reference GaussianModel (gaussian_model.py:39-49) and this repo."""
    scales = np.asarray(g.get_scaling, np.float64)
    d_scaling = ora["dL_dscale"].astype(np.float64) * scales

    rot = np.asarray(g.rotation, np.float64)
    n = np.linalg.norm(rot, axis=-1, keepdims=True).clip(1e-8)
    u = rot / n
    du = ora["dL_drot"].astype(np.float64)
    d_rotation = (du - u * np.sum(u * du, axis=-1, keepdims=True)) / n

    sig = np.asarray(g.get_opacity, np.float64).reshape(-1)
    d_opacity = (ora["dL_dopacity"].astype(np.float64)
                 * sig * (1.0 - sig)).reshape(-1, 1)

    dsh = ora["dL_dsh"].astype(np.float64)
    k_rest = g.features_rest.shape[1]
    return dict(
        xyz=ora["dL_dmeans3D"].astype(np.float64),
        scaling=d_scaling,
        rotation=d_rotation,
        opacity=d_opacity,
        features_dc=dsh[:, :1],
        features_rest=dsh[:, 1:1 + k_rest],
    )


def assert_grads_close(expected, got, name, atol=3e-4):
    for f in DIFF_FIELDS:
        a = np.asarray(expected[f], np.float64)
        b = np.asarray(got[f], np.float64)
        if a.size == 0:
            continue
        scale = max(1e-3, np.abs(a).max())
        np.testing.assert_allclose(
            b / scale, a / scale, atol=atol, err_msg=f"{name} grad_{f}")


def _loss_cotangents(rendered, H, W):
    """d/dpixels and d/dt_final of the golden-suite loss
    mean(render^2) + 0.1 * mean(t_final)."""
    dpix = 2.0 * np.asarray(rendered, np.float32) / np.float32(rendered.size)
    dtf = np.full((H, W), 0.1 / (H * W), np.float32)
    return dpix, dtf


def variant_cfgs(n):
    return {
        "xla": RenderConfig(impl="xla", instance_budget=n * 36),
        "pallas_instances": RenderConfig(
            impl="pallas_interpret", kernel="instances",
            instance_budget=n * 36),
        "pallas_tiles": RenderConfig(
            impl="pallas_interpret", kernel="tiles",
            instance_budget=n * 36),
    }


@pytest.fixture(scope="module", params=sorted(SCENES))
def golden_scene(request):
    name = request.param
    cam, g, bg = SCENES[name]()
    gold = np.load(os.path.join(GOLD_DIR, f"{name}.npz"))
    return name, cam, g, bg, gold


@pytest.fixture(scope="module", params=sorted(FRESH))
def fresh_scene(request):
    name = request.param
    cam, g, bg = FRESH[name]()
    return name, cam, g, bg


class TestOracleForwardGoldens:
    """The independent oracle must reproduce every recorded golden."""

    def test_forward_matches_golden(self, golden_scene):
        name, cam, g, bg, gold = golden_scene
        out = co.rasterize_forward(bg_color=np.asarray(bg, np.float32),
                                   **oracle_inputs(cam, g))
        np.testing.assert_array_equal(
            out["radii"], gold["radii"], err_msg=f"{name} radii (oracle)")
        np.testing.assert_allclose(
            out["out_color"], gold["render"], atol=5e-5,
            err_msg=f"{name} render (oracle)")
        np.testing.assert_allclose(
            out["final_T"], gold["t_final"], atol=5e-5,
            err_msg=f"{name} t_final (oracle)")

    def test_backward_matches_golden(self, golden_scene):
        """Golden grads vs the EXACT-arithmetic (f64) oracle at strict
        tolerance, plus the f32 oracle within its measured conditioning
        envelope of the f64 one (the literal CUDA op order loses ~5e-4
        normalized on 100:1-aniso covariance chains)."""
        name, cam, g, bg, gold = golden_scene
        inp = oracle_inputs(cam, g)
        dpix, dtf = _loss_cotangents(gold["render"], cam.height, cam.width)

        saved64 = co64.rasterize_forward(
            bg_color=np.asarray(bg, np.float32), **inp)
        raw64 = chain_to_raw(g, co64.rasterize_backward(saved64, dpix, dtf))
        expected = {f: gold[f"grad_{f}"] for f in DIFF_FIELDS}
        assert_grads_close(raw64, expected, f"{name} (golden-vs-f64oracle)")

        saved32 = co.rasterize_forward(
            bg_color=np.asarray(bg, np.float32), **inp)
        raw32 = chain_to_raw(g, co.rasterize_backward(saved32, dpix, dtf))
        assert_grads_close(raw64, raw32, f"{name} (f32-vs-f64 oracle)",
                           atol=1.5e-3)


class TestOracleFreshScenes:
    """On scenes the goldens never saw, the oracle and ALL repo kernel
    variants must still agree (forward + backward)."""

    def test_forward_all_variants(self, fresh_scene):
        name, cam, g, bg = fresh_scene
        n = g.xyz.shape[0]
        out = co.rasterize_forward(bg_color=np.asarray(bg, np.float32),
                                   **oracle_inputs(cam, g))
        for vname, cfg in variant_cfgs(n).items():
            got = render(cam, g, bg, config=cfg)
            np.testing.assert_array_equal(
                np.asarray(got["radii"]), out["radii"],
                err_msg=f"{name}/{vname} radii")
            np.testing.assert_allclose(
                np.asarray(got["render"]), out["out_color"], atol=5e-5,
                err_msg=f"{name}/{vname} render")
            np.testing.assert_allclose(
                np.asarray(got["t_final"]), out["final_T"], atol=5e-5,
                err_msg=f"{name}/{vname} t_final")

    def test_backward_xla_and_pallas(self, fresh_scene):
        name, cam, g, bg = fresh_scene
        n = g.xyz.shape[0]
        saved = co64.rasterize_forward(bg_color=np.asarray(bg, np.float32),
                                       **oracle_inputs(cam, g))
        dpix, dtf = _loss_cotangents(
            saved["out_color"].astype(np.float32), cam.height, cam.width)
        ora = chain_to_raw(g, co64.rasterize_backward(saved, dpix, dtf))

        for vname in ("xla", "pallas_instances"):
            cfg = variant_cfgs(n)[vname]
            sub = {f: getattr(g, f) for f in DIFF_FIELDS}

            def loss(d):
                o = render(cam, g.replace(**d), bg, config=cfg)
                return (jnp.mean(o["render"] ** 2)
                        + 0.1 * jnp.mean(o["t_final"]))

            grads = jax.grad(loss)(sub)
            got = {f: np.asarray(grads[f]) for f in DIFF_FIELDS}
            assert_grads_close(ora, got, f"{name}/{vname} (vs oracle)")

    def test_probe_grad_matches_cuda_mean2d(self, fresh_scene):
        """repo pixel-space probe grad x (0.5*W, 0.5*H) == CUDA dL_dmean2D
        (the ddelx_dx/ddely_dy NDC scaling, backward.cu:460-461,545-546).
        This pins the densification-stats signal (model/fateavatar.py:734)
        to the reference's up to the documented pixel/NDC convention."""
        name, cam, g, bg = fresh_scene
        n = g.xyz.shape[0]
        saved = co.rasterize_forward(bg_color=np.asarray(bg, np.float32),
                                     **oracle_inputs(cam, g))
        dpix, dtf = _loss_cotangents(saved["out_color"], cam.height,
                                     cam.width)
        ora = co.rasterize_backward(saved, dpix, dtf)

        cfg = variant_cfgs(n)["xla"]

        def loss(probe):
            o = render(cam, g, bg, config=cfg, means2d_probe=probe)
            return jnp.mean(o["render"] ** 2) + 0.1 * jnp.mean(o["t_final"])

        probe_grad = np.asarray(
            jax.grad(loss)(jnp.zeros((2, n), jnp.float32)))
        scaled = np.stack([probe_grad[0] * 0.5 * cam.width,
                           probe_grad[1] * 0.5 * cam.height], axis=1)
        expect = ora["dL_dmean2D"][:, :2]
        scale = max(1e-3, np.abs(expect).max())
        np.testing.assert_allclose(
            scaled / scale, expect / scale, atol=3e-4,
            err_msg=f"{name} probe-vs-dL_dmean2D")


class TestOracleInternals:
    """Cheap invariants of the transcription itself."""

    def test_glm_mat3_is_column_major(self):
        m = co.Mat3(1, 2, 3, 4, 5, 6, 7, 8, 9)
        assert m[0][0] == 1 and m[0][2] == 3 and m[2][0] == 7
        # (A * B) is the ordinary math product
        a = co.Mat3(1, 0, 0, 0, 2, 0, 0, 0, 3)   # diag(1,2,3)
        b = co.Mat3(0, 1, 0, 1, 0, 0, 0, 0, 1)   # swap x/y as a map
        c = a * b
        np.testing.assert_allclose(c.math(), a.math() @ b.math())

    def test_getrect_truncation(self):
        # C int cast truncates toward zero; the -0.3 case must clamp to 0,
        # and (2 + 7 + 15) / 16 = 1.5 truncates to 1
        (x0, y0), (x1, y1) = co.getRect(2.0, 2.0, 7, 4, 4)
        assert (x0, y0) == (0, 0) and (x1, y1) == (1, 1)
        # a gaussian centred in tile (1, 1) with a small radius
        (x0, y0), (x1, y1) = co.getRect(24.0, 24.0, 3, 4, 4)
        assert (x0, y0) == (1, 1) and (x1, y1) == (2, 2)

    def test_stable_tie_order(self):
        # bit-equal depths keep ascending gaussian-index order per tile
        geom = dict(
            radii=np.asarray([3, 3], np.int32),
            points_xy_image=np.asarray([[8.0, 8.0], [8.0, 8.0]], np.float32),
            depths=np.asarray([1.0, 1.0], np.float32),
        )
        point_list, ranges = co.duplicate_and_sort(2, geom, 4, 4)
        assert list(point_list[ranges[0][0]:ranges[0][1]]) == [0, 1]
