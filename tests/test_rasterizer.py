"""Rasterizer tests (SURVEY.md §4 layers (b)-(c)): oracle sanity, binning
vs brute force, XLA tile blend vs oracle, Pallas kernel (interpret mode) vs
XLA blend, and analytic-vs-numeric gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render import binning
from fateavatar_tpu.render.blend_reference import blend_reference
from fateavatar_tpu.render.blend_tiles import (
    blend_tiles_pallas, blend_tiles_xla, tiles_to_image,
)
from fateavatar_tpu.render.preprocess import preprocess
from fateavatar_tpu.render.render import RenderConfig, render
from fateavatar_tpu.render.splats import Gaussians, inverse_sigmoid, make_gaussians


W = H = 64


def make_scene(n=40, seed=0, sh_degree=0):
    """Random gaussians in front of an identity camera at z in [0.5, 2]."""
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [rng.uniform(-0.4, 0.4, (n, 2)), rng.uniform(0.5, 2.0, (n, 1))], axis=1
    )
    scaling = np.log(rng.uniform(0.01, 0.08, (n, 3)))
    rotation = rng.normal(size=(n, 4))
    opacity = inverse_sigmoid(jnp.asarray(rng.uniform(0.2, 0.95, (n, 1))))
    k = (sh_degree + 1) ** 2
    fdc = rng.uniform(-1, 1, (n, 1, 3))
    frest = rng.uniform(-0.3, 0.3, (n, k - 1, 3))
    g = make_gaussians(
        xyz, scaling, rotation, np.asarray(opacity), fdc, frest,
        sh_degree=sh_degree,
    )
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, W, H)
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    return cam, g, bg


def run_preprocess(cam, g):
    return preprocess(
        cam, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_features, g.sh_degree, alive=g.alive,
    )


def gather_tiles(prep, lists):
    ids = jnp.maximum(lists.ids, 0)
    valid = lists.ids >= 0
    return (
        jnp.take(prep.mean2d, ids, axis=0),
        jnp.take(prep.conic, ids, axis=0),
        jnp.take(prep.color, ids, axis=0),
        jnp.take(prep.opacity, ids, axis=0),
        valid,
    )


class TestOracle:
    def test_empty_scene_is_background(self):
        cam, g, bg = make_scene(4)
        g = g.replace(alive=jnp.zeros_like(g.alive))
        prep = run_preprocess(cam, g)
        img = blend_reference(prep, W, H, bg)
        np.testing.assert_allclose(img, jnp.broadcast_to(bg, (H, W, 3)), atol=1e-6)

    def test_single_gaussian_blob(self):
        g = make_gaussians(
            xyz=[[0.0, 0.0, 1.0]],
            scaling=np.log([[0.05, 0.05, 0.05]]),
            rotation=[[1.0, 0, 0, 0]],
            opacity=[[inverse_sigmoid(jnp.float32(0.9))]],
            features_dc=[[[1.0, -1.0, 0.0]]],
        )
        cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, W, H)
        bg = jnp.zeros(3)
        prep = run_preprocess(cam, g)
        img = blend_reference(prep, W, H, bg)
        # blob is centred, brightest at centre, red channel > green
        c = np.asarray(img[H // 2 - 1 : H // 2 + 1, W // 2 - 1 : W // 2 + 1])
        assert c[..., 0].max() > 0.3
        assert img[0, 0, 0] < 0.01  # corner untouched
        # centre brighter than halfway out
        assert float(img[H // 2, W // 2, 0]) >= float(img[H // 2, W // 2 + 10, 0])

    def test_front_to_back_ordering(self):
        # an opaque near gaussian should occlude a far one
        common = dict(
            scaling=np.log([[0.08, 0.08, 0.08]] * 2),
            rotation=[[1.0, 0, 0, 0]] * 2,
        )
        from fateavatar_tpu.ops.sh import rgb_to_sh

        colors = rgb_to_sh(jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]))
        g = make_gaussians(
            xyz=[[0.0, 0.0, 0.8], [0.0, 0.0, 1.6]],
            opacity=[[15.0], [15.0]],  # sigmoid ~ 1 -> clamped 0.99
            features_dc=np.asarray(colors)[:, None, :],
            **common,
        )
        cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, W, H)
        prep = run_preprocess(cam, g)
        img = blend_reference(prep, W, H, jnp.zeros(3))
        centre = np.asarray(img[H // 2, W // 2])
        assert centre[0] > 10 * max(centre[1], 1e-6)  # red (near) wins


class TestBinning:
    def test_lists_match_bruteforce(self):
        cam, g, bg = make_scene(60, seed=1)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        lists = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_per_tile=64, max_tiles_per_gaussian=36,
        )
        mean2d = np.asarray(prep.mean2d)
        depth = np.asarray(prep.depth)
        radius = np.asarray(prep.radius)
        ty, tx = grid
        # brute force: for each tile, all visible gaussians whose rect
        # overlaps, sorted by depth
        for t in range(ty * tx):
            tyi, txi = divmod(t, tx)
            expected = []
            for i in range(len(mean2d)):
                if radius[i] <= 0:
                    continue
                rminx = min(tx, max(0, int((mean2d[i, 0] - radius[i]) / 16)))
                rminy = min(ty, max(0, int((mean2d[i, 1] - radius[i]) / 16)))
                rmaxx = min(tx, max(0, int((mean2d[i, 0] + radius[i] + 15) / 16)))
                rmaxy = min(ty, max(0, int((mean2d[i, 1] + radius[i] + 15) / 16)))
                if rminx <= txi < rmaxx and rminy <= tyi < rmaxy:
                    expected.append(i)
            expected.sort(key=lambda i: depth[i])
            got = [x for x in np.asarray(lists.ids[t]) if x >= 0]
            assert got == expected, f"tile {t}"

    def test_scan_binning_matches_sort_binning(self):
        """The sort-free scan binning must produce IDENTICAL per-tile lists
        to the sort-based reference implementation."""
        cam, g, bg = make_scene(120, seed=12)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        a = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_per_tile=64, max_tiles_per_gaussian=36,
            instance_budget=120 * 36,
        )
        b = binning.build_tile_lists_scan(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_per_tile=64, max_tiles_per_gaussian=36, block=32,
        )
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
        assert int(a.overflow) == int(b.overflow)

    def test_scan_binning_with_dead_gaussians(self):
        cam, g, bg = make_scene(64, seed=13)
        g = g.replace(alive=g.alive.at[32:].set(False))
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        a = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid, max_per_tile=64,
            max_tiles_per_gaussian=36, instance_budget=64 * 36,
        )
        b = binning.build_tile_lists_scan(
            prep.mean2d, prep.depth, prep.radius, grid, max_per_tile=64,
            max_tiles_per_gaussian=36, block=16,
        )
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))

    def test_overflow_counting(self):
        cam, g, bg = make_scene(50, seed=2)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        full = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_per_tile=64, max_tiles_per_gaussian=64,
        )
        tight = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_per_tile=2, max_tiles_per_gaussian=64,
        )
        assert int(full.overflow) == 0 or int(full.overflow) >= 0
        assert int(tight.overflow) > 0
        np.testing.assert_array_equal(full.counts, tight.counts)


class TestTileBlend:
    def test_xla_blend_matches_oracle(self):
        cam, g, bg = make_scene(80, seed=3)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        lists = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid, max_per_tile=128,
        )
        assert int(lists.overflow) == 0
        tiles = gather_tiles(prep, lists)
        img_tiles, _ = blend_tiles_xla(*tiles, bg, grid, chunk=32)
        img = tiles_to_image(img_tiles, grid, W, H)
        oracle = blend_reference(prep, W, H, bg)
        np.testing.assert_allclose(np.asarray(img), np.asarray(oracle), atol=2e-5)

    def test_pallas_interpret_matches_xla(self):
        cam, g, bg = make_scene(64, seed=4)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        lists = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid, max_per_tile=128,
        )
        tiles = gather_tiles(prep, lists)
        ref_tiles, ref_tfin = blend_tiles_xla(*tiles, bg, grid, chunk=32)
        counts = jnp.sum(tiles[4], axis=1).astype(jnp.int32)
        got_tiles, got_tfin = blend_tiles_pallas(
            tiles[0], tiles[1], tiles[2], tiles[3],
            tiles[4].astype(jnp.float32), counts, bg, grid, 32, True,
        )
        np.testing.assert_allclose(
            np.asarray(got_tiles), np.asarray(ref_tiles), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_tfin), np.asarray(ref_tfin), atol=2e-5
        )

    def test_instance_kernel_matches_xla(self):
        """The instance-range (CUDA-layout) Pallas kernel produces the same
        image as the XLA tile blend on the full render path."""
        cam, g, bg = make_scene(80, seed=20)
        out_ref = render(cam, g, bg, config=RenderConfig(
            impl="xla", max_per_tile=256, chunk=32))
        out_got = render(cam, g, bg, config=RenderConfig(
            impl="pallas_interpret", kernel="instances", chunk=32,
            instance_budget=80 * 36))
        np.testing.assert_allclose(
            np.asarray(out_got["render"]), np.asarray(out_ref["render"]),
            atol=3e-5,
        )

    def test_twokey_binning_matches_stable(self):
        """The two-key (tile, depth) sort variant orders instances like the
        argsort+stable-sort reference (unique depths)."""
        cam, g, bg = make_scene(60, seed=22)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        a = binning.build_instance_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_tiles_per_gaussian=36, instance_budget=60 * 36,
            sort_mode="stable",
        )
        b = binning.build_instance_lists(
            prep.mean2d, prep.depth, prep.radius, grid,
            max_tiles_per_gaussian=36, instance_budget=60 * 36,
            sort_mode="twokey",
        )
        np.testing.assert_array_equal(np.asarray(a.instances),
                                      np.asarray(b.instances))
        np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                      np.asarray(b.tile_starts))

    def test_count_binning_matches_stable(self):
        """The O(M) counting-sort binning produces the IDENTICAL instance
        array and tile starts as the stable-sort path (both are stable
        groupings of depth-ordered instances), including with dead
        gaussians and an overflowing budget."""
        for seed, budget in ((23, 60 * 36), (24, 256)):
            cam, g, bg = make_scene(60, seed=seed)
            if seed == 24:
                g = g.replace(alive=g.alive.at[::3].set(False))
            prep = run_preprocess(cam, g)
            grid = binning.tile_grid(W, H)
            kw = dict(max_tiles_per_gaussian=36, instance_budget=budget)
            a = binning.build_instance_lists(
                prep.mean2d, prep.depth, prep.radius, grid,
                sort_mode="stable", **kw)
            b = binning.build_instance_lists(
                prep.mean2d, prep.depth, prep.radius, grid,
                sort_mode="count", **kw)
            np.testing.assert_array_equal(np.asarray(a.instances),
                                          np.asarray(b.instances))
            np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                          np.asarray(b.tile_starts))
            assert int(a.overflow) == int(b.overflow)

    def test_gather_binning_matches_stable(self):
        """The scatter-free gather binning reproduces the stable path
        bit-exactly (incl. dead gaussians and budget overflow)."""
        for seed, budget in ((25, 60 * 36), (26, 256)):
            cam, g, bg = make_scene(60, seed=seed)
            if seed == 26:
                g = g.replace(alive=g.alive.at[::3].set(False))
            prep = run_preprocess(cam, g)
            grid = binning.tile_grid(W, H)
            kw = dict(max_tiles_per_gaussian=36, instance_budget=budget)
            a = binning.build_instance_lists(
                prep.mean2d, prep.depth, prep.radius, grid,
                sort_mode="stable", **kw)
            b = binning.build_instance_lists(
                prep.mean2d, prep.depth, prep.radius, grid,
                sort_mode="gather", **kw)
            c = binning.build_instance_lists(
                prep.mean2d, prep.depth, prep.radius, grid,
                sort_mode="onesort", **kw)
            np.testing.assert_array_equal(np.asarray(a.instances),
                                          np.asarray(c.instances))
            np.testing.assert_array_equal(np.asarray(a.tile_starts),
                                          np.asarray(c.tile_starts))
            assert int(a.overflow) == int(c.overflow)

    def test_compact_layout_matches_aligned(self):
        """layout='compact' (raw unaligned ranges + in-kernel position
        masking + boundary-chunk merge) reproduces the aligned layout's
        image and gradients, incl. under budget overflow."""
        for seed, budget in ((30, 60 * 36), (31, 256)):
            cam, g, bg = make_scene(60, seed=seed)
            if seed == 31:
                g = g.replace(alive=g.alive.at[::3].set(False))
            kw = dict(impl="pallas_interpret", kernel="instances",
                      instance_budget=budget)
            ref = render(cam, g, bg, config=RenderConfig(layout="aligned",
                                                         **kw))
            got = render(cam, g, bg, config=RenderConfig(layout="compact",
                                                         **kw))
            np.testing.assert_allclose(np.asarray(got["render"]),
                                       np.asarray(ref["render"]), atol=1e-6)

            diff_fields = ("xyz", "scaling", "rotation", "opacity",
                           "features_dc")
            sub = {f: getattr(g, f) for f in diff_fields}

            def loss(cfg, d):
                out = render(cam, g.replace(**d), bg, config=cfg)
                return (jnp.mean(out["render"] ** 2)
                        + jnp.mean(out["t_final"]))

            ga = jax.grad(lambda d: loss(
                RenderConfig(layout="compact", **kw), d))(sub)
            gb = jax.grad(lambda d: loss(
                RenderConfig(layout="aligned", **kw), d))(sub)
            for f in diff_fields:
                np.testing.assert_allclose(
                    np.asarray(ga[f]), np.asarray(gb[f]), atol=1e-6,
                    err_msg=f"budget={budget} field={f}")

    def test_slot_table_grads_match_scatter_add(self):
        """The scatter-free slot-table VJP (RenderConfig.bwd_slots) equals
        XLA's gather-transpose scatter-add, including under budget overflow
        (dropped instances -> sentinel slots)."""
        cam, g, bg = make_scene(60, seed=27)

        def loss(cfg, gg):
            return jnp.sum(render(cam, gg, bg, config=cfg)["render"] ** 2)

        diff_fields = ("xyz", "scaling", "rotation", "opacity", "features_dc")
        sub = {f: getattr(g, f) for f in diff_fields}

        def wrap(cfg):
            return jax.grad(lambda d: loss(cfg, g.replace(**d)))

        for budget in (64, 60 * 36):
            kw = dict(impl="pallas_interpret", kernel="instances",
                      instance_budget=budget)
            for mode in ("onesort", "sort"):
                kw["binning"] = mode
                ga = wrap(RenderConfig(bwd_slots=True, **kw))(sub)
                gb = wrap(RenderConfig(bwd_sorted_scatter=False, **kw))(sub)
                gc = wrap(RenderConfig(**kw))(sub)   # sorted-scatter default
                for f in diff_fields:
                    np.testing.assert_allclose(
                        np.asarray(ga[f]), np.asarray(gb[f]), atol=1e-6,
                        err_msg=f"slots {mode} budget={budget} field={f}")
                    np.testing.assert_allclose(
                        np.asarray(gc[f]), np.asarray(gb[f]), atol=1e-6,
                        err_msg=f"sorted {mode} budget={budget} field={f}")

    def test_grouped_grads_match_scatter_add(self):
        """The fully scatter-free grouped VJP (RenderConfig.bwd_grouped:
        one id-sort of the cotangent rows + structured [N, r0] (+tail)
        row gathers over binning's per-gaussian kept counts) equals XLA's
        gather-transpose scatter-add, for both 'onesort' and 'twotier'
        binning, including under budget overflow (dropped instances) and
        with dead gaussians."""
        diff_fields = ("xyz", "scaling", "rotation", "opacity", "features_dc")

        for seed, kill in ((27, False), (33, True)):
            cam, g, bg = make_scene(60, seed=seed)
            if kill:
                g = g.replace(alive=g.alive.at[::4].set(False))
            sub = {f: getattr(g, f) for f in diff_fields}

            def wrap(cfg):
                def loss(d):
                    out = render(cam, g.replace(**d), bg, config=cfg)
                    return (jnp.sum(out["render"] ** 2)
                            + jnp.mean(out["t_final"]))
                return jax.grad(loss)

            for budget in (64, 60 * 36):
                base = dict(impl="pallas_interpret", kernel="instances",
                            instance_budget=budget)
                variants = (
                    dict(binning="onesort", **base),
                    dict(binning="twotier", tail_r0=4, tail_k=8, **base),
                    # tail_k=0 is COERCED by build_instance_lists to
                    # K = max(256, n // 16) (clamped to n), so group_tail
                    # is non-empty here and the tail branch of the grouped
                    # backward still runs — this variant only covers the
                    # default-K path, not an empty tail (which is
                    # unreachable through binning: onesort r_max == r0
                    # skips the tail branch entirely)
                    dict(binning="twotier", tail_r0=6, tail_k=0, **base),
                )
                for kw in variants:
                    ga = wrap(RenderConfig(bwd_grouped=True, **kw))(sub)
                    gb = wrap(RenderConfig(bwd_sorted_scatter=False,
                                           **kw))(sub)
                    for f in diff_fields:
                        a, b = np.asarray(ga[f]), np.asarray(gb[f])
                        # masked-sum vs segmented scatter-add reassociates
                        # the fp32 reduction -> compare scale-normalized
                        scale = max(np.abs(b).max(), 1e-6)
                        np.testing.assert_allclose(
                            a / scale, b / scale, atol=1e-5,
                            err_msg=(f"grouped {kw.get('binning')} "
                                     f"tail_k={kw.get('tail_k')} "
                                     f"budget={budget} kill={kill} "
                                     f"field={f}"))

    def test_instance_kernel_grads_match_xla(self):
        cam, g, bg = make_scene(40, seed=21)

        def loss(impl_cfg, gg):
            out = render(cam, gg, bg, config=impl_cfg)
            return jnp.mean(out["render"] ** 2) + jnp.mean(out["t_final"])

        cfg_ref = RenderConfig(impl="xla", max_per_tile=128, chunk=32)
        cfg_got = RenderConfig(impl="pallas_interpret", kernel="instances",
                               chunk=32, instance_budget=40 * 36)
        diff_fields = ("xyz", "scaling", "rotation", "opacity", "features_dc")

        def wrap(cfg):
            def f(sub, gg):
                gg = gg.replace(**sub)
                return loss(cfg, gg)
            return f

        sub0 = {k: getattr(g, k) for k in diff_fields}
        g_ref = jax.grad(wrap(cfg_ref))(sub0, g)
        g_got = jax.grad(wrap(cfg_got))(sub0, g)
        for k in diff_fields:
            a, b = np.asarray(g_ref[k]), np.asarray(g_got[k])
            scale = max(1e-3, np.abs(a).max())
            np.testing.assert_allclose(
                b / scale, a / scale, atol=3e-4, err_msg=f"grad {k}"
            )

    def test_pallas_vjp_matches_xla_autodiff(self):
        cam, g, bg = make_scene(48, seed=5)
        prep = run_preprocess(cam, g)
        grid = binning.tile_grid(W, H)
        lists = binning.build_tile_lists(
            prep.mean2d, prep.depth, prep.radius, grid, max_per_tile=64,
        )
        mean2d_t, conic_t, color_t, opacity_t, valid = gather_tiles(prep, lists)
        rng = np.random.default_rng(0)
        g_img = jnp.asarray(rng.normal(size=(lists.ids.shape[0], 3, 256)), jnp.float32)
        g_tfin = jnp.asarray(rng.normal(size=(lists.ids.shape[0], 256)), jnp.float32)

        def loss_xla(m, c, cl, op, b):
            img, tfin = blend_tiles_xla(m, c, cl, op, valid, b, grid, chunk=32)
            return jnp.sum(img * g_img) + jnp.sum(tfin * g_tfin)

        counts = jnp.sum(valid, axis=1).astype(jnp.int32)

        def loss_pallas(m, c, cl, op, b):
            img, tfin = blend_tiles_pallas(
                m, c, cl, op, valid.astype(jnp.float32), counts, b,
                grid, 32, True
            )
            return jnp.sum(img * g_img) + jnp.sum(tfin * g_tfin)

        args = (mean2d_t, conic_t, color_t, opacity_t, bg)
        g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
        g_got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["mean2d", "conic", "color", "opacity", "bg"]
        for name, a, b in zip(names, g_ref, g_got):
            scale = max(1e-3, float(jnp.abs(a).max()))
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_xla_blend_numeric_grads(self):
        # finite-difference check of the full preprocess+blend chain
        cam, g, bg = make_scene(12, seed=6)

        def f(xyz):
            g2 = g.replace(xyz=xyz)
            out = render(cam, g2, bg, config=RenderConfig(
                impl="xla", max_per_tile=64, chunk=32))
            return jnp.mean(out["render"] ** 2)

        from jax.test_util import check_grads

        check_grads(f, (g.xyz,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


class TestRenderFacade:
    def test_render_outputs(self):
        cam, g, bg = make_scene(64, seed=7)
        out = render(cam, g, bg, config=RenderConfig(impl="xla", max_per_tile=128))
        assert out["render"].shape == (H, W, 3)
        assert out["radii"].shape == (g.capacity,)
        assert bool(jnp.any(out["visibility_filter"]))
        assert np.isfinite(np.asarray(out["render"])).all()

    def test_dead_slots_do_not_render(self):
        cam, g, bg = make_scene(32, seed=8)
        half_alive = g.alive.at[16:].set(False)
        out_full = render(cam, g, bg, config=RenderConfig(impl="xla"))
        out_half = render(cam, g.replace(alive=half_alive), bg,
                          config=RenderConfig(impl="xla"))
        g_trunc = jax.tree.map(lambda x: x[:16], g.replace(sh_degree=g.sh_degree))
        out_trunc = render(cam, g_trunc, bg, config=RenderConfig(impl="xla"))
        assert not np.allclose(out_full["render"], out_half["render"])
        np.testing.assert_allclose(
            np.asarray(out_half["render"]), np.asarray(out_trunc["render"]),
            atol=1e-5,
        )

    def test_means2d_probe_grad(self):
        cam, g, bg = make_scene(32, seed=9)
        probe = jnp.zeros((g.capacity, 2))

        def f(p):
            out = render(cam, g, bg, config=RenderConfig(impl="xla"),
                         means2d_probe=p)
            return jnp.sum(out["render"])

        grad = jax.grad(f)(probe)
        vis = np.asarray(render(cam, g, bg, config=RenderConfig(impl="xla"))["visibility_filter"])
        gnorm = np.linalg.norm(np.asarray(grad), axis=-1)
        assert (gnorm[vis] > 0).any()

    def test_sh_degree_3_renders(self):
        cam, g, bg = make_scene(24, seed=10, sh_degree=3)
        out = render(cam, g, bg, config=RenderConfig(impl="xla"))
        assert np.isfinite(np.asarray(out["render"])).all()

    def test_jit_render(self):
        cam, g, bg = make_scene(32, seed=11)
        f = jax.jit(lambda gg: render(cam, gg, bg,
                                      config=RenderConfig(impl="xla"))["render"])
        img = f(g)
        img2 = render(cam, g, bg, config=RenderConfig(impl="xla"))["render"]
        np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-5)


class TestGoldens:
    """Recorded golden outputs pin the rasterizer's numerical semantics
    across refactors (the stand-in for CUDA-recorded fixtures, which this
    environment cannot produce — see docs/STATUS_ROUND1.md gap 2). The
    golden was recorded from the XLA path; every kernel/binning variant
    must reproduce it."""

    def _scene(self):
        return make_scene(80, seed=1234, sh_degree=2)

    def test_image_and_grads_match_golden(self):
        import os

        gold = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                                    "rasterizer_scene80_sh2.npz"))
        cam, g, bg = self._scene()
        for cfg in (
            RenderConfig(impl="xla", instance_budget=80 * 36),
            RenderConfig(impl="pallas_interpret", kernel="instances",
                         instance_budget=80 * 36),
            RenderConfig(impl="pallas_interpret", kernel="instances",
                         layout="aligned", binning="sort",
                         instance_budget=80 * 36),
        ):
            out = render(cam, g, bg, config=cfg)
            np.testing.assert_allclose(np.asarray(out["render"]),
                                       gold["render"], atol=5e-5)
            np.testing.assert_allclose(np.asarray(out["t_final"]),
                                       gold["t_final"], atol=5e-5)
            np.testing.assert_array_equal(np.asarray(out["radii"]),
                                          gold["radii"])

        diff_fields = ("xyz", "scaling", "rotation", "opacity",
                       "features_dc", "features_rest")
        sub = {f: getattr(g, f) for f in diff_fields}
        cfg = RenderConfig(impl="pallas_interpret", kernel="instances",
                           instance_budget=80 * 36)

        def loss(d):
            o = render(cam, g.replace(**d), bg, config=cfg)
            return jnp.mean(o["render"] ** 2) + 0.1 * jnp.mean(o["t_final"])

        grads = jax.grad(loss)(sub)
        for f in diff_fields:
            np.testing.assert_allclose(
                np.asarray(grads[f]), gold[f"grad_{f}"], atol=1e-5,
                err_msg=f"grad_{f}")


class TestEarlyExit:
    """t_cutoff > 0: chunk-granular early termination (renderCUDA's
    T < 1e-4 semantics) must stay within cutoff of the exact blend, in
    both the primal and the gradients."""

    def test_cutoff_matches_exact_within_cutoff(self):
        cam, g, bg = make_scene(120, seed=31)
        base = dict(kernel="instances", chunk=32, instance_budget=120 * 36)
        out_exact = render(cam, g, bg, config=RenderConfig(
            impl="pallas_interpret", **base))
        out_cut = render(cam, g, bg, config=RenderConfig(
            impl="pallas_interpret", t_cutoff=1e-4, **base))
        np.testing.assert_allclose(
            np.asarray(out_cut["render"]), np.asarray(out_exact["render"]),
            atol=2e-4,
        )

    def test_cutoff_gradients_close(self):
        cam, g, bg = make_scene(60, seed=32)
        base = dict(kernel="instances", chunk=32, instance_budget=60 * 36)

        def loss(xyz, cfg):
            out = render(cam, g.replace(xyz=xyz), bg, config=cfg)
            return jnp.sum(out["render"] ** 2)

        g_exact = jax.grad(loss)(g.xyz, RenderConfig(
            impl="pallas_interpret", **base))
        g_cut = jax.grad(loss)(g.xyz, RenderConfig(
            impl="pallas_interpret", t_cutoff=1e-4, **base))
        scale = float(jnp.abs(g_exact).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(g_cut) / scale, np.asarray(g_exact) / scale, atol=5e-3)

    @staticmethod
    def _saturating_scene():
        """One tile, 4 CHUNKs of instances; chunk 0 is opaque wall (alpha
        0.9 at EVERY pixel of the tile), so with cutoff=1e-4 the backward
        while_loop exits after chunk 0 and chunks 1..3 are skipped."""
        from fateavatar_tpu.render.blend_instances import CHUNK, ROW

        rng = np.random.default_rng(7)
        m = 4 * CHUNK
        data = np.zeros((ROW, m), np.float32)
        data[0] = rng.uniform(2, 14, m)      # mean_x inside the 16px tile
        data[1] = rng.uniform(2, 14, m)
        data[2] = rng.uniform(0.05, 0.3, m)  # conic a
        data[3] = 0.0
        data[4] = rng.uniform(0.05, 0.3, m)  # conic c
        data[5:8] = rng.uniform(0, 1, (3, m))
        data[8] = rng.uniform(0.3, 0.8, m)   # opacity
        data[9] = 1.0                        # valid
        # chunk 0: huge flat Gaussians -> alpha ~= op = 0.9 everywhere
        data[0, :CHUNK] = 8.0
        data[1, :CHUNK] = 8.0
        data[2, :CHUNK] = 1e-6
        data[4, :CHUNK] = 1e-6
        data[8, :CHUNK] = 0.9
        starts = np.array([0, m], np.int32)
        bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        return jnp.asarray(data), jnp.asarray(starts), bg, (1, 1)

    def test_dirty_gout_init_cutoff_skipped_chunks_zeroed(self):
        """ADVICE r3 (medium): with cutoff > 0 the backward's early exit
        skips chunks >= i_exit; their gout windows must be WRITTEN (zeros),
        not left to the aliased init buffer (stale under lax.scan). Feed a
        DIRTY init buffer and require the result to be independent of it
        and exactly zero for every skipped instance."""
        from fateavatar_tpu.render import blend_instances as bi

        data, starts, bg, grid = self._saturating_scene()
        img, tfin = bi._call_fwd(data, starts, bg, grid, True, 1e-4)
        g_img = jnp.ones_like(img)
        g_tfin = jnp.zeros_like(tfin)
        dirty = jnp.full((bi.ROW, data.shape[1]), 123.0, jnp.float32)

        g_clean = bi._call_bwd(data, starts, bg, img, tfin, g_img, g_tfin,
                               grid, True, 1e-4)
        g_dirty = bi._call_bwd(data, starts, bg, img, tfin, g_img, g_tfin,
                               grid, True, 1e-4, gout_init=dirty)
        np.testing.assert_array_equal(np.asarray(g_dirty),
                                      np.asarray(g_clean))
        # chunks 1..3 were never reached: exact-zero gradients
        np.testing.assert_array_equal(
            np.asarray(g_dirty[:, bi.CHUNK:]),
            np.zeros((bi.ROW, 3 * bi.CHUNK), np.float32))

    def test_dirty_gout_init_exact_path(self):
        """cutoff = 0 (exact closed form): every window is DMA-overwritten
        or hole-zeroed, so a dirty aliased init must not leak either."""
        from fateavatar_tpu.render import blend_instances as bi

        data, starts, bg, grid = self._saturating_scene()
        img, tfin = bi._call_fwd(data, starts, bg, grid, True, 0.0)
        g_img = jnp.ones_like(img)
        g_tfin = jnp.zeros_like(tfin)
        dirty = jnp.full((bi.ROW, data.shape[1]), -77.0, jnp.float32)

        g_clean = bi._call_bwd(data, starts, bg, img, tfin, g_img, g_tfin,
                               grid, True, 0.0)
        g_dirty = bi._call_bwd(data, starts, bg, img, tfin, g_img, g_tfin,
                               grid, True, 0.0, gout_init=dirty)
        np.testing.assert_array_equal(np.asarray(g_dirty),
                                      np.asarray(g_clean))
