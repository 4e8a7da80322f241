"""Baseline model tests: GaussianAvatars, FlashAvatar, SplattingAvatar
(incl. the jitted triangle walk), MonoGaussianAvatar."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


def cam():
    return make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]), 0.8, 0.8, RES, RES)


@pytest.fixture(scope="module")
def flame():
    return synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)


class TestGaussianAvatars:
    @pytest.fixture(scope="class")
    def ga(self, flame):
        from fateavatar_tpu.models.baselines import gaussianavatars as G

        cfg = G.GAConfig(sh_degree=1, capacity=512, img_height=RES, img_width=RES)
        return G, *G.init_gaussianavatars(flame, cfg)

    def test_forward(self, ga):
        G, model, params, state = ga
        out = G.ga_forward(model, params, state, jnp.zeros(4), jnp.zeros(15),
                           cam(), active_sh_degree=0, render_cfg=RENDER_CFG)
        assert out["rgb_image"].shape == (RES, RES, 3)
        assert np.isfinite(np.asarray(out["rgb_image"])).all()

    def test_one_splat_per_face_init(self, ga, flame):
        G, model, params, state = ga
        F = flame.faces.shape[0]
        assert int(jnp.sum(state.alive)) == F
        np.testing.assert_array_equal(
            np.asarray(state.binding[:F]), np.arange(F)
        )

    def test_clone_densify(self, ga):
        G, model, params, state = ga
        # force: high grads, small scales -> clone path
        state2 = state.replace(
            xyz_gradient_accum=state.alive.astype(jnp.float32),
            denom=jnp.ones_like(state.denom),
        )
        p2, s2, touched = G.densify_and_prune(
            jax.random.PRNGKey(0), params, state2,
            max_grad=0.5, min_opacity=0.005, extent=100.0,  # huge extent -> clone
            budget=64,
        )
        n0 = int(jnp.sum(state.alive))
        assert int(jnp.sum(s2.alive)) > n0  # clones added
        # cloned splats share their source's binding
        assert (np.asarray(s2.binding)[np.asarray(touched)] <
                model.flame.faces.shape[0]).all()

    def test_split_densify_kills_originals(self, ga):
        G, model, params, state = ga
        state2 = state.replace(
            xyz_gradient_accum=state.alive.astype(jnp.float32),
            denom=jnp.ones_like(state.denom),
        )
        # tiny extent -> all selected gaussians exceed percent_dense*extent
        p2, s2, touched = G.densify_and_prune(
            jax.random.PRNGKey(1), params, state2,
            max_grad=0.5, min_opacity=0.005, extent=1e-6, budget=64,
        )
        n0 = int(jnp.sum(state.alive))
        # 32 originals split into 64 children: net +32 (budget//2 = 32)
        assert int(jnp.sum(s2.alive)) == n0 + 32

    def test_binding_guard_prevents_empty_faces(self, ga):
        G, model, params, state = ga
        # all opacities below threshold -> everything prunable, but each
        # face must keep its last splat
        p_low = params.replace(opacity=jnp.full_like(params.opacity, -10.0))
        p2, s2, _ = G.densify_and_prune(
            jax.random.PRNGKey(2), p_low, state,
            max_grad=1e9, min_opacity=0.05, extent=2.0, budget=64,
        )
        F = model.flame.faces.shape[0]
        counts = np.zeros(F, int)
        alive = np.asarray(s2.alive)
        binding = np.asarray(s2.binding)
        for i in np.nonzero(alive)[0]:
            counts[binding[i]] += 1
        assert (counts >= 1).all()

    def test_lr_schedule(self):
        from fateavatar_tpu.models.baselines.gaussianavatars import expon_lr_schedule

        sched = expon_lr_schedule(0.005, 0.00005, 1000)
        assert abs(float(sched(0)) - 0.005) < 1e-6
        assert abs(float(sched(1000)) - 0.00005) < 1e-6
        assert float(sched(500)) < 0.005


class TestFlashAvatar:
    def test_forward_and_grad(self, flame):
        from fateavatar_tpu.models.baselines import flashavatar as F
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

        cfg = F.FlashConfig(tex_size=8, img_height=RES, img_width=RES)
        model, params, net = F.init_flashavatar(sphere_obj_mesh(96), flame, cfg)
        out = F.flash_forward(model, params, net, jnp.zeros(4), jnp.zeros(15),
                              cam(), render_cfg=RENDER_CFG)
        assert np.isfinite(np.asarray(out["rgb_image"])).all()

        def loss(p):
            o = F.flash_forward(model, p, net, jnp.ones(4) * 0.3,
                                jnp.zeros(15), cam(), render_cfg=RENDER_CFG)
            return jnp.mean(o["rgb_image"] ** 2)

        g = jax.grad(loss)(params)
        # gradient reaches the deformer MLP
        leaf = jax.tree.leaves(g.deformer)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaf)

    def test_expression_changes_output(self, flame):
        from fateavatar_tpu.models.baselines import flashavatar as F
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

        cfg = F.FlashConfig(tex_size=8, img_height=RES, img_width=RES)
        model, params, net = F.init_flashavatar(sphere_obj_mesh(96), flame, cfg)
        a = F.flash_forward(model, params, net, jnp.zeros(4), jnp.zeros(15),
                            cam(), render_cfg=RENDER_CFG)["rgb_image"]
        b = F.flash_forward(model, params, net, jnp.ones(4) * 2, jnp.zeros(15),
                            cam(), render_cfg=RENDER_CFG)["rgb_image"]
        assert float(jnp.abs(a - b).max()) > 1e-5


class TestSplattingAvatar:
    @pytest.fixture(scope="class")
    def sa(self, flame):
        from fateavatar_tpu.models.baselines import splattingavatar as S

        cfg = S.SplatConfig(num_samples=256, capacity=512,
                            img_height=RES, img_width=RES)
        return S, *S.init_splattingavatar(flame, cfg)

    def test_forward(self, sa):
        S, model, params, state = sa
        out = S.splat_forward(model, params, state, jnp.zeros(4), jnp.zeros(15),
                              cam(), render_cfg=RENDER_CFG)
        assert np.isfinite(np.asarray(out["rgb_image"])).all()

    def test_per_vert_quaternion_identity(self, sa):
        S, model, params, state = sa
        vq = S.per_vert_quaternion(
            model.cano_verts, model.cano_verts, model.faces,
            model.cano_face_areas,
        )
        # cano -> cano rotation is identity
        expected = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (vq.shape[0], 1))
        np.testing.assert_allclose(np.abs(np.asarray(vq[:, 0])), 1.0, atol=1e-3)

    def test_triangle_walk_zero_delta(self, sa):
        S, model, params, state = sa
        f, b = S.triangle_walk(
            model.cano_verts, model.faces, model.face_adjacency,
            state.sample_fidxs, state.sample_bary,
            jnp.zeros((state.sample_fidxs.shape[0], 3)),
        )
        np.testing.assert_array_equal(np.asarray(f), np.asarray(state.sample_fidxs))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(state.sample_bary), atol=1e-5
        )

    def test_triangle_walk_moves_points(self, sa):
        S, model, params, state = sa
        n = state.sample_fidxs.shape[0]
        # walk along the surface by a distance comparable to one edge
        tri = model.cano_verts[model.faces[state.sample_fidxs]]
        edge = tri[:, 1] - tri[:, 0]
        delta = edge * 0.8
        f, b = S.triangle_walk(
            model.cano_verts, model.faces, model.face_adjacency,
            state.sample_fidxs, state.sample_bary, delta,
        )
        p_before = np.asarray(S.reweight_verts_by_barycoords(
            model.cano_verts, model.faces, state.sample_fidxs, state.sample_bary
        ))
        p_after = np.asarray(S.reweight_verts_by_barycoords(
            model.cano_verts, model.faces, f, b
        ))
        moved = np.linalg.norm(p_after - p_before, axis=-1)
        assert moved.mean() > 1e-4
        # points stay on the sphere surface (radius ~0.1)
        r = np.linalg.norm(p_after, axis=-1)
        assert (np.abs(r - 0.1) < 0.03).all()

    def test_walking_on_triangles_commits_uvd(self, sa):
        S, model, params, state = sa
        params2 = params.replace(
            uvd=params.uvd.at[:, 0].set(0.02)
        )
        p3, s3 = S.walking_on_triangles(model, params2, state)
        np.testing.assert_allclose(np.asarray(p3.uvd[:, :2]), 0.0, atol=1e-7)
        # bindings changed for at least some points
        assert not np.array_equal(
            np.asarray(s3.sample_bary), np.asarray(state.sample_bary)
        )


class TestMonoGaussianAvatar:
    @pytest.fixture(scope="class")
    def mono(self):
        from fateavatar_tpu.models.baselines import monogaussianavatar as M

        flame4 = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
        cfg = M.MonoConfig(n_init_points=64, max_points=256,
                           img_height=RES, img_width=RES, cam_scale=1.0)
        return M, *M.init_monogaussianavatar(flame4, cfg)

    def test_forward(self, mono):
        M, model, params, state, nets = mono
        out = M.mono_forward(model, params, state, nets,
                             jnp.zeros(4), jnp.zeros(15), cam(),
                             render_cfg=RENDER_CFG)
        assert np.isfinite(np.asarray(out["rgb_image"])).all()
        assert out["lbs_weights"].shape[-1] == 6  # ghostbone
        assert out["shapedirs"].shape[1:] == (3, 4)
        assert out["posedirs"].shape[1:] == (36, 3)

    def test_deformer_zero_init_uniform_lbs(self, mono):
        M, model, params, state, nets = mono
        _, _, lbs, pnts = nets["deformer"].apply(
            {"params": params.deformer}, params.points[:8]
        )
        np.testing.assert_allclose(np.asarray(lbs), 1.0 / 6.0, atol=1e-5)

    def test_grad_reaches_networks_and_points(self, mono):
        M, model, params, state, nets = mono

        def loss(p):
            o = M.mono_forward(model, p, state, nets, jnp.ones(4) * 0.2,
                               jnp.zeros(15), cam(), render_cfg=RENDER_CFG)
            return jnp.mean(o["rgb_image"] ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g.points).max()) > 0
        assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(g.geometry))

    def test_prune_and_upsample(self, mono):
        M, model, params, state, nets = mono
        state2 = state.replace(visible=state.alive)  # everything visible
        p2, s2, touched = M.prune_and_upsample(
            jax.random.PRNGKey(0), params, state2, target=128,
            noise_scale=jnp.asarray(0.01),
        )
        assert int(jnp.sum(s2.alive)) == 128

    def test_mono_loss(self, mono):
        M, model, params, state, nets = mono
        from fateavatar_tpu.train.losses import (
            MonoGaussianAvatarLoss, MonoGaussianAvatarLossConfig,
        )

        out = M.mono_forward(model, params, state, nets,
                             jnp.zeros(4), jnp.zeros(15), cam(),
                             render_cfg=RENDER_CFG)
        loss_fn = MonoGaussianAvatarLoss(
            MonoGaussianAvatarLossConfig(), model.flame,
        )
        rng = np.random.default_rng(0)
        gt = {"rgb": jnp.asarray(rng.random((RES, RES, 3)), jnp.float32)}
        losses = loss_fn(out, gt)
        for k in ("rgb_loss", "dssim_loss", "lbs_loss", "posedirs_loss",
                  "shapedirs_loss"):
            assert np.isfinite(float(losses[k])), k


class TestBaselineLosses:
    def test_flash_loss_mouth(self):
        from fateavatar_tpu.train.losses import FlashAvatarLoss

        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.random((RES, RES, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((RES, RES, 3)), jnp.float32)
        mouth = jnp.zeros((RES, RES, 1)).at[10:20, 10:20].set(1.0)
        fn = FlashAvatarLoss()
        base = fn({"rgb_image": pred}, {"rgb": gt})
        with_mouth = fn({"rgb_image": pred}, {"rgb": gt, "mouth_mask": mouth})
        assert float(with_mouth["loss"]) > float(base["loss"])

    def test_ga_loss_scale_penalty(self):
        from fateavatar_tpu.train.losses import (
            GaussianAvatarsLoss, GaussianAvatarsLossConfig,
        )

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((RES, RES, 3)), jnp.float32)
        out_small = {
            "rgb_image": img, "scale": jnp.full((10, 3), 0.1),
            "xyz": jnp.zeros((10, 3)), "alive": jnp.ones(10, bool),
        }
        out_big = dict(out_small, scale=jnp.full((10, 3), 2.0))
        fn = GaussianAvatarsLoss()
        l_small = fn(out_small, {"rgb": img})
        l_big = fn(out_big, {"rgb": img})
        assert float(l_big["scale_loss"]) > float(l_small["scale_loss"])
