"""FLAME / LBS tests (SURVEY.md §4 layer (a)): internal consistency,
canonical identities, delta-blendshape gradients, per-point inverse/forward
roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from fateavatar_tpu.flame import (
    FlameModel, flame_forward, synthetic_flame,
)
from fateavatar_tpu.flame import flame as flame_mod


def model():
    return synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)


class TestFlameForward:
    def test_rest_pose_identity(self):
        m = model()
        verts, pose_feature, A = flame_forward(
            m, jnp.zeros((1, m.n_exp)), jnp.zeros((1, 15))
        )
        np.testing.assert_allclose(verts[0], m.v_template, atol=1e-5)
        np.testing.assert_allclose(pose_feature, 0.0, atol=1e-6)
        # rest-pose transforms are identity
        np.testing.assert_allclose(
            A[0], jnp.broadcast_to(jnp.eye(4), (5, 4, 4)), atol=1e-5
        )

    def test_global_rotation_is_rigid(self):
        m = model()
        pose = jnp.zeros((1, 15)).at[0, :3].set(jnp.array([0.0, 0.7, 0.0]))
        verts, _, _ = flame_forward(m, jnp.zeros((1, m.n_exp)), pose)
        v0, _, _ = flame_forward(m, jnp.zeros((1, m.n_exp)), jnp.zeros((1, 15)))
        # rigid: pairwise distances preserved
        d_posed = jnp.linalg.norm(verts[0, :10, None] - verts[0, None, :10], axis=-1)
        d_rest = jnp.linalg.norm(v0[0, :10, None] - v0[0, None, :10], axis=-1)
        np.testing.assert_allclose(d_posed, d_rest, atol=1e-4)

    def test_expression_changes_verts(self):
        m = model()
        expr = jnp.zeros((1, m.n_exp)).at[0, 0].set(2.0)
        verts, _, _ = flame_forward(m, expr, jnp.zeros((1, 15)))
        v0, _, _ = flame_forward(m, jnp.zeros((1, m.n_exp)), jnp.zeros((1, 15)))
        assert float(jnp.abs(verts - v0).max()) > 1e-4

    def test_delta_vertex_additive_at_rest(self):
        m = model()
        delta = jnp.ones_like(m.v_template) * 0.01
        verts, _, _ = flame_forward(
            m, jnp.zeros((1, m.n_exp)), jnp.zeros((1, 15)), delta_vertex=delta
        )
        np.testing.assert_allclose(verts[0], m.v_template + 0.01, atol=1e-5)

    def test_batch_consistency(self):
        m = model()
        rng = np.random.default_rng(0)
        expr = jnp.asarray(rng.normal(size=(3, m.n_exp)), jnp.float32)
        pose = jnp.asarray(rng.normal(size=(3, 15)) * 0.2, jnp.float32)
        batched, _, _ = flame_forward(m, expr, pose)
        for i in range(3):
            single, _, _ = flame_forward(m, expr[i : i + 1], pose[i : i + 1])
            np.testing.assert_allclose(batched[i], single[0], atol=1e-5)

    def test_grad_flows_to_deltas(self):
        m = model()

        def loss(dv, dsd, dpd):
            v, _, _ = flame_forward(
                m, jnp.ones((1, m.n_exp)) * 0.3,
                jnp.full((1, 15), 0.1),
                delta_shapedirs=dsd, delta_posedirs=dpd, delta_vertex=dv,
            )
            return jnp.sum(v**2)

        g = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.zeros_like(m.v_template),
            jnp.zeros_like(m.shapedirs),
            jnp.zeros_like(m.posedirs),
        )
        assert all(float(jnp.abs(x).max()) > 0 for x in g)

    def test_jit_compiles(self):
        m = model()
        f = jax.jit(lambda e, p: flame_forward(m, e, p)[0])
        out = f(jnp.zeros((1, m.n_exp)), jnp.zeros((1, 15)))
        assert out.shape == (1, m.num_verts, 3)


class TestPointMorphing:
    def test_forward_inverse_roundtrip(self):
        m = model()
        rng = np.random.default_rng(1)
        n = 20
        expr = jnp.asarray(rng.normal(size=(1, m.n_exp)) * 0.5, jnp.float32)
        pose = jnp.asarray(rng.normal(size=(1, 15)) * 0.3, jnp.float32)
        verts, pose_feature, A = flame_forward(m, expr, pose)

        betas = jnp.concatenate(
            [jnp.zeros((1, m.n_shape)), expr], axis=1
        )
        pnts_c = jnp.asarray(rng.normal(size=(n, 3)) * 0.05, jnp.float32)
        # per-point buffers gathered from nearest verts (use first n verts)
        shapedirs = m.shapedirs[:n]
        posedirs = m.posedirs.reshape(36, -1, 3).transpose(1, 0, 2)[:n]
        w = m.lbs_weights[:n]

        fwd = flame_mod.forward_pts(
            pnts_c, jnp.broadcast_to(betas, (n, betas.shape[1])),
            jnp.broadcast_to(A, (n, 5, 4, 4)),
            jnp.broadcast_to(pose_feature, (n, 36)),
            shapedirs, posedirs, w,
        )
        back = flame_mod.inverse_pts(
            fwd, jnp.broadcast_to(betas, (n, betas.shape[1])),
            jnp.broadcast_to(A, (n, 5, 4, 4)),
            jnp.broadcast_to(pose_feature, (n, 36)),
            shapedirs, posedirs, w,
        )
        np.testing.assert_allclose(np.asarray(back), np.asarray(pnts_c), atol=1e-4)

    def test_skinned_points_match_lbs_verts(self):
        """Skinning the template vertices per-point must equal lbs()."""
        m = model()
        expr = jnp.ones((1, m.n_exp)) * 0.2
        pose = jnp.full((1, 15), 0.15)
        verts, pose_feature, A = flame_forward(m, expr, pose)
        nv = m.num_verts

        betas = jnp.concatenate([jnp.zeros((1, m.n_shape)), expr], axis=1)
        posedirs_pts = m.posedirs.reshape(36, nv, 3).transpose(1, 0, 2)
        out = flame_mod.forward_pts(
            m.v_template,
            jnp.broadcast_to(betas, (nv, betas.shape[1])),
            jnp.broadcast_to(A, (nv, 5, 4, 4)),
            jnp.broadcast_to(pose_feature, (nv, 36)),
            m.shapedirs, posedirs_pts, m.lbs_weights,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(verts[0]), atol=1e-4)


class TestLandmarks:
    def test_vertices2landmarks_barycentric(self):
        m = model()
        verts, _, _ = flame_forward(m, jnp.zeros((1, m.n_exp)),
                                    jnp.zeros((1, 15)))
        lmk = flame_mod.flame_landmarks(m, verts)
        assert lmk.shape == (1, 68, 3)
        # each landmark must equal its face's barycentric vertex blend
        f0 = int(m.lmk_faces_idx[0])
        tri = np.asarray(verts[0])[np.asarray(m.faces[f0])]
        expect = np.asarray(m.lmk_bary_coords[0]) @ tri
        np.testing.assert_allclose(np.asarray(lmk[0, 0]), expect, atol=1e-6)

    def test_landmark_embedding_loader_dict_npy(self, tmp_path):
        from fateavatar_tpu.flame.loader import load_landmark_embedding

        rng = np.random.default_rng(0)
        d = {
            "full_lmk_faces_idx": rng.integers(0, 100, 68).astype(np.int64),
            "full_lmk_bary_coords": rng.dirichlet(np.ones(3), 68),
            "static_lmk_faces_idx": rng.integers(0, 100, 51),
        }
        d["dynamic_lmk_faces_idx"] = rng.integers(0, 100, (79, 17)).astype(np.int64)
        d["dynamic_lmk_bary_coords"] = rng.dirichlet(np.ones(3), (79, 17))
        path = str(tmp_path / "landmark_embedding.npy")
        np.save(path, d, allow_pickle=True)
        faces, bary, dyn_faces, dyn_bary = load_landmark_embedding(path)
        assert faces.shape == (68,) and faces.dtype == np.int32
        assert bary.shape == (68, 3) and bary.dtype == np.float32
        np.testing.assert_allclose(bary.sum(1), 1.0, atol=1e-5)
        assert dyn_faces.shape == (79, 17) and dyn_faces.dtype == np.int32
        assert dyn_bary.shape == (79, 17, 3)

    def test_landmark_embedding_loader_flat_rows(self, tmp_path):
        from fateavatar_tpu.flame.loader import load_landmark_embedding

        rows = np.concatenate(
            [np.arange(68)[:, None].astype(np.float64),
             np.full((68, 3), 1.0 / 3.0)], axis=1)
        path = str(tmp_path / "lmk_flat.npy")
        np.save(path, rows)
        faces, bary, dyn_faces, dyn_bary = load_landmark_embedding(path)
        assert faces.shape == (68,)
        assert dyn_faces is None and dyn_bary is None
        np.testing.assert_allclose(bary, 1.0 / 3.0, atol=1e-6)

    def test_dynamic_contour_selects_yaw_bin(self):
        """Yaw +-60deg must select the profile contour rows, yaw 0 the
        frontal row (benchmark/nersemble/FLAME.py:246-258 binning)."""
        import jax.numpy as jnp
        from fateavatar_tpu.flame.flame import (
            find_dynamic_lmk_idx_and_bcoords, flame_forward,
            flame_landmarks, flame_landmarks_dynamic,
        )

        m = synthetic_flame(n_verts=96, n_shape=4, n_exp=4, seed=3)
        pose0 = jnp.zeros((1, 15))
        f0, b0 = find_dynamic_lmk_idx_and_bcoords(m, pose0)
        np.testing.assert_array_equal(
            np.asarray(f0[0]), np.asarray(m.dynamic_lmk_faces_idx[0]))

        # root yaw +60deg: y = round(-60) < -39 -> row 78 (deep negative
        # bin); yaw -60deg: y = round(60) clamps to 39 -> row 39
        yaw = jnp.zeros((1, 15)).at[0, 1].set(jnp.pi / 3)  # rot about y-axis
        f_pos, _ = find_dynamic_lmk_idx_and_bcoords(m, yaw)
        f_neg, _ = find_dynamic_lmk_idx_and_bcoords(m, -yaw)
        rows = np.asarray(m.dynamic_lmk_faces_idx)
        assert (np.asarray(f_pos[0]) == rows[78]).all()
        assert (np.asarray(f_neg[0]) == rows[39]).all()
        # the two profile directions must pick different rows from frontal
        assert not (np.asarray(f_pos[0]) == rows[0]).all()
        assert not (np.asarray(f_neg[0]) == rows[0]).all()
        assert not (np.asarray(f_pos[0]) == np.asarray(f_neg[0])).all()

        # landmark extraction: dynamic contour changes only rows 0..16
        verts, _, _ = flame_forward(m, jnp.zeros((1, m.n_exp)), yaw)
        lmk_dyn = flame_landmarks_dynamic(m, verts, yaw)
        lmk_static = flame_landmarks(m, verts)
        assert lmk_dyn.shape == (1, 68, 3)
        np.testing.assert_allclose(
            np.asarray(lmk_dyn[0, 17:]), np.asarray(lmk_static[0, 17:]),
            atol=1e-6)


class TestWorldTransform:
    """Model-to-world similarity (NeRSemble tracking pose,
    benchmark/nersemble/FLAME.py:262-275)."""

    def test_euler_xyz_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        from fateavatar_tpu.flame.flame import euler_xyz_matrix

        rng = np.random.default_rng(3)
        e = rng.uniform(-np.pi, np.pi, (8, 3)).astype(np.float32)
        got = np.asarray(euler_xyz_matrix(jnp.asarray(e)))
        want = Rotation.from_euler("XYZ", e).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_scale_rotation_not_translation(self):
        from fateavatar_tpu.flame.flame import apply_world_transform

        v = jnp.asarray([[[1.0, 2.0, 3.0]]])
        wt = jnp.asarray([[0.0, 0.0, 0.0, 10.0, 20.0, 30.0, 2.0]])
        out = np.asarray(apply_world_transform(v, wt))[0, 0]
        # identity rotation, scale 2 on the point, translation UNscaled
        np.testing.assert_allclose(out, [12.0, 24.0, 36.0], atol=1e-5)

    def test_flame_forward_world_transform(self):
        from fateavatar_tpu.flame.flame import apply_world_transform

        m = synthetic_flame(n_verts=64, n_shape=4, n_exp=3, seed=5)
        expr = jnp.zeros((1, m.n_exp))
        pose = jnp.zeros((1, 15))
        wt = jnp.asarray([[0.3, -0.2, 0.1, 0.5, -0.1, 0.2, 1.1]])
        v_plain, _, _ = flame_forward(m, expr, pose)
        v_world, _, _ = flame_forward(m, expr, pose, world_transform=wt)
        np.testing.assert_allclose(
            np.asarray(v_world), np.asarray(apply_world_transform(v_plain, wt)),
            atol=1e-6)
        # global-rotation slot zero + external transform == reference's
        # variant contract: transform must be invertible back
        from fateavatar_tpu.flame.flame import euler_xyz_matrix
        R = np.asarray(euler_xyz_matrix(wt[0, :3])) * float(wt[0, 6])
        back = (np.asarray(v_world)[0] - np.asarray(wt[0, 3:6])) @ np.linalg.inv(R).T
        np.testing.assert_allclose(back, np.asarray(v_plain)[0], atol=1e-5)
