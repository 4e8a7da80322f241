"""FateAvatar model + maintenance + training-step tests (SURVEY.md §4 layer
(d)): end-to-end smoke training on synthetic frames, densify/prune under
static shapes, moment surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import (
    FateAvatarConfig, fateavatar_forward, init_fateavatar,
)
from fateavatar_tpu.models import maintenance
from fateavatar_tpu.models.fateavatar import fateavatar_visualization
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.losses import FateAvatarLoss, FateAvatarLossConfig
from fateavatar_tpu.train.optim import (
    MultiAdam, fateavatar_optimizers, zero_moment_rows,
)
from fateavatar_tpu.train.step import (
    Frame, MaintenanceConfig, TrainState, init_train_state, make_train_step,
)
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 64
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=128, chunk=32)


@pytest.fixture(scope="module")
def avatar():
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    mesh = sphere_obj_mesh(96)
    cfg = FateAvatarConfig(
        tex_size=16, capacity=400, img_height=RES, img_width=RES,
        normal_offset=0.02,
    )
    model, params, state = init_fateavatar(mesh, flame, cfg)
    return model, params, state


def front_camera():
    return make_camera(
        jnp.eye(3), jnp.array([0.0, 0.0, 0.4]), 0.8, 0.8, RES, RES
    )


def make_frame(model, seed=0):
    rng = np.random.default_rng(seed)
    return Frame(
        expression=jnp.asarray(rng.normal(size=4) * 0.3, jnp.float32),
        flame_pose=jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32),
        camera=front_camera(),
        rgb=jnp.asarray(rng.random((RES, RES, 3)), jnp.float32),
        bg_color=jnp.ones(3),
    )


class TestForward:
    def test_forward_shapes(self, avatar):
        model, params, state = avatar
        out = fateavatar_forward(
            model, params, state,
            jnp.zeros(4), jnp.zeros(15), front_camera(),
            render_cfg=RENDER_CFG,
        )
        assert out["rgb_image"].shape == (RES, RES, 3)
        assert np.isfinite(np.asarray(out["rgb_image"])).all()
        assert bool(jnp.any(out["visibility_filter"]))

    def test_avatar_visible_on_screen(self, avatar):
        model, params, state = avatar
        out = fateavatar_forward(
            model, params, state, jnp.zeros(4), jnp.zeros(15), front_camera(),
            bg_color=jnp.zeros(3), render_cfg=RENDER_CFG,
        )
        # grey avatar on black bg: centre pixels must be non-trivially lit
        img = np.asarray(out["rgb_image"])
        assert img[RES // 2, RES // 2].mean() > 0.05

    def test_expression_moves_pixels(self, avatar):
        model, params, state = avatar
        base = fateavatar_forward(
            model, params, state, jnp.zeros(4), jnp.zeros(15), front_camera(),
            render_cfg=RENDER_CFG,
        )["rgb_image"]
        posed = fateavatar_forward(
            model, params, state, jnp.ones(4) * 3.0, jnp.zeros(15), front_camera(),
            render_cfg=RENDER_CFG,
        )["rgb_image"]
        assert float(jnp.abs(base - posed).max()) > 1e-4

    def test_visualization_outputs(self, avatar):
        model, params, state = avatar
        out = fateavatar_visualization(
            model, params, state, jnp.zeros(4), jnp.zeros(15), front_camera(),
            render_cfg=RENDER_CFG,
        )
        for key in ("rgb_image", "cano_image", "grad_image", "point_image"):
            assert out[key].shape == (RES, RES, 3)
            assert np.isfinite(np.asarray(out[key])).all()


class TestMaintenance:
    def test_densify_adds_points(self, avatar):
        model, params, state = avatar
        state = state.replace(
            xyz_gradient_accum=state.alive.astype(jnp.float32)
        )
        n0 = int(jnp.sum(state.alive))
        p2, s2, touched = maintenance.uv_densify(
            jax.random.PRNGKey(0), params, state, increase_num=32
        )
        assert int(jnp.sum(s2.alive)) == n0 + 32
        assert int(jnp.sum(touched)) == 32
        # new splats keep a valid binding
        fi = np.asarray(s2.face_index)
        assert (fi >= 0).all() and (fi < model.faces.shape[0]).all()
        bc = np.asarray(s2.bary_coords[np.asarray(touched)])
        np.testing.assert_allclose(bc.sum(-1), 1.0, atol=1e-5)
        # scale shrunk by 0.75 relative to some source splat
        assert float(jnp.max(p2.scaling[np.asarray(touched)])) <= float(
            jnp.max(params.scaling[np.asarray(state.alive)])) + np.log(0.75) + 1e-5

    def test_densify_respects_capacity(self, avatar):
        model, params, state = avatar
        cap = state.alive.shape[0]
        state_full = state.replace(
            alive=jnp.ones_like(state.alive).at[:10].set(False),
            xyz_gradient_accum=jnp.ones_like(state.xyz_gradient_accum),
        )
        p2, s2, touched = maintenance.uv_densify(
            jax.random.PRNGKey(1), params, state_full, increase_num=32
        )
        assert int(jnp.sum(s2.alive)) == cap  # only 10 free slots filled
        assert int(jnp.sum(touched)) == 10

    def test_prune_kills_transparent(self, avatar):
        model, params, state = avatar
        low = params.replace(
            opacity=params.opacity.at[:8].set(-10.0)  # sigmoid ~ 0
        )
        s2 = maintenance.prune_low_opacity(low, state, min_opacity=0.05)
        assert not bool(jnp.any(s2.alive[:8]))
        assert bool(jnp.all(s2.alive[8:16] == state.alive[8:16]))

    def test_reset_opacity_caps_at_001(self, avatar):
        model, params, state = avatar
        p2 = maintenance.reset_opacity(params)
        sig = np.asarray(jax.nn.sigmoid(p2.opacity))
        assert (sig <= 0.0101).all()

    def test_add_default_points(self, avatar):
        model, params, state = avatar
        dead_state = state.replace(alive=jnp.zeros_like(state.alive))
        p2, s2, touched = maintenance.add_default_points(model, params, dead_state)
        assert int(jnp.sum(s2.alive)) == model.cfg.tex_size**2


class TestOptim:
    def test_multi_adam_step_direction(self):
        opt = MultiAdam(lr_tree={"offset": 0.1, "scaling": 0.0})
        from fateavatar_tpu.models.fateavatar import FateAvatarParams

        def mkparams(v):
            return FateAvatarParams(
                offset=jnp.full((4, 1), v), features_dc=jnp.zeros((4, 1, 3)),
                features_rest=jnp.zeros((4, 0, 3)), scaling=jnp.zeros((4, 3)),
                rotation=jnp.zeros((4, 4)), opacity=jnp.zeros((4, 1)),
                delta_shapedirs=jnp.zeros((2, 3, 2)),
                delta_posedirs=jnp.zeros((4, 6)), delta_vertex=jnp.zeros((2, 3)),
            )

        p = mkparams(1.0)
        grads = jax.tree.map(jnp.ones_like, p)
        st = opt.init(p)
        updates, st = opt.update(grads, st, p)
        # lr 0.1 on offset moves ~ -0.1; scaling lr 0 -> no move
        np.testing.assert_allclose(np.asarray(updates.offset), -0.1, atol=1e-3)
        np.testing.assert_allclose(np.asarray(updates.scaling), 0.0, atol=1e-8)

    def test_zero_moment_rows(self):
        opt = MultiAdam(lr_tree={"offset": 0.1})
        from fateavatar_tpu.models.fateavatar import FateAvatarParams

        p = FateAvatarParams(
            offset=jnp.ones((4, 1)), features_dc=jnp.ones((4, 1, 3)),
            features_rest=jnp.ones((4, 0, 3)), scaling=jnp.ones((4, 3)),
            rotation=jnp.ones((4, 4)), opacity=jnp.ones((4, 1)),
            delta_shapedirs=jnp.ones((2, 3, 2)),
            delta_posedirs=jnp.ones((4, 6)), delta_vertex=jnp.ones((2, 3)),
        )
        st = opt.init(p)
        grads = jax.tree.map(jnp.ones_like, p)
        _, st = opt.update(grads, st, p)
        touched = jnp.array([True, False, True, False])
        st2 = zero_moment_rows(st, touched, ("offset", "opacity"))
        assert float(st2.mu.offset[0, 0]) == 0.0
        assert float(st2.mu.offset[1, 0]) != 0.0
        assert float(st2.mu.scaling[0, 0]) != 0.0  # untouched field


class TestTrainStep:
    def test_maintenance_statics_agree_while_no_event_fires(self, avatar):
        """Two train-step PROGRAM VARIANTS (maintenance conds compiled in
        vs out) must produce bit-identical trajectories while no event
        actually fires. This invariant localized the r3 stale-aliased-
        zeros gradient corruption on the chip (the two variants' buffer
        assignments differed, and one read a mutated 'zeros' buffer) —
        codified here so numerics-diverging program variants fail fast."""
        model, params, state = avatar
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
        opt = fateavatar_optimizers({})
        # events far away but CONDS COMPILED IN vs intervals so large the
        # builder can elide them
        step_live = make_train_step(
            model, loss_fn, opt,
            MaintenanceConfig(densify_interval=1000, prune_interval=1000,
                              opacity_reset_interval=1000),
            render_cfg=RENDER_CFG,
        )
        step_off = make_train_step(
            model, loss_fn, opt,
            MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                              opacity_reset_interval=10**9),
            render_cfg=RENDER_CFG,
        )
        ts_a = init_train_state(params, state, opt)
        ts_b = init_train_state(params, state, opt)
        frame = make_frame(model, seed=3)
        for i in range(4):
            ts_a, aux_a = step_live(ts_a, frame)
            ts_b, aux_b = step_off(ts_b, frame)
            assert float(aux_a["loss"]) == float(aux_b["loss"]), i
        for la, lb in zip(jax.tree_util.tree_leaves(ts_a.params),
                          jax.tree_util.tree_leaves(ts_b.params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_loss_decreases_overfitting_one_frame(self, avatar):
        model, params, state = avatar
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
        opt = fateavatar_optimizers({})
        step = make_train_step(
            model, loss_fn, opt,
            MaintenanceConfig(densify_interval=10**9, prune_interval=10**9,
                              opacity_reset_interval=10**9),
            render_cfg=RENDER_CFG,
        )
        ts = init_train_state(params, state, opt)
        frame = make_frame(model, seed=3)
        losses = []
        for _ in range(30):
            ts, aux = step(ts, frame)
            losses.append(float(aux["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]

    def test_maintenance_fires_in_jit(self, avatar):
        model, params, state = avatar
        state = state.replace(
            xyz_gradient_accum=state.alive.astype(jnp.float32)
        )
        loss_fn = FateAvatarLoss(FateAvatarLossConfig(rgb_weight=1.0))
        opt = fateavatar_optimizers({})
        step = make_train_step(
            model, loss_fn, opt,
            MaintenanceConfig(densify_interval=3, prune_interval=10**9,
                              opacity_reset_interval=10**9, increase_num=16,
                              max_points_num=400),
            render_cfg=RENDER_CFG,
        )
        ts = init_train_state(params, state, opt)
        n0 = int(jnp.sum(ts.state.alive))
        frame = make_frame(model, seed=4)
        for _ in range(3):
            ts, aux = step(ts, frame)
        assert int(aux["num_alive"]) == n0 + 16

    def test_full_loss_config(self, avatar):
        model, params, state = avatar
        from fateavatar_tpu.train.losses import vgg16_random_params

        loss_fn = FateAvatarLoss(
            FateAvatarLossConfig(
                rgb_weight=1.0, dssim_weight=0.25, scale_weight=0.1,
                scale_threshold=3.0, rot_weight=0.1, laplacian_weight=100.0,
                normal_weight=0.1, flame_weight=1.0, vgg_weight=0.1,
            ),
            faces=model.faces,
            vgg_params=vgg16_random_params(jax.random.PRNGKey(0)),
        )
        opt = fateavatar_optimizers({})
        step = make_train_step(model, loss_fn, opt, render_cfg=RENDER_CFG)
        ts = init_train_state(params, state, opt)
        ts, aux = step(ts, make_frame(model, seed=5))
        for k in ("rgb_loss", "dssim_loss", "scale_loss", "rot_loss",
                  "laplacian_loss", "normal_loss", "flame_loss", "vgg_loss"):
            assert k in aux and np.isfinite(float(aux[k])), k
