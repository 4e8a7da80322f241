"""Unit tests for the math substrate: quaternions, SH, camera, mesh ops,
sampling, KNN (SURVEY.md §4 test pyramid layer (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fateavatar_tpu.ops import quaternion as q
from fateavatar_tpu.ops import sh, camera, mesh, sampling, knn
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 4))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestQuaternion:
    def test_multiply_identity(self):
        quats = jnp.asarray(random_quats(16), jnp.float32)
        ident = jnp.array([1.0, 0, 0, 0])
        out = q.quat_multiply(ident, quats)
        np.testing.assert_allclose(out, quats, atol=1e-6)

    def test_multiply_matches_matrix_product(self):
        a = jnp.asarray(random_quats(8, 1), jnp.float32)
        b = jnp.asarray(random_quats(8, 2), jnp.float32)
        ab = q.quat_multiply(a, b)
        Ra, Rb = q.quat_to_matrix(a), q.quat_to_matrix(b)
        np.testing.assert_allclose(q.quat_to_matrix(ab), Ra @ Rb, atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        quats = jnp.asarray(random_quats(64), jnp.float32)
        m = q.quat_to_matrix(quats)
        q2 = q.matrix_to_quat(m)
        # sign-canonical comparison
        quats = jnp.where(quats[..., :1] < 0, -quats, quats)
        np.testing.assert_allclose(q2, quats, atol=1e-4)

    def test_axis_angle_roundtrip(self):
        rng = np.random.default_rng(3)
        aa = jnp.asarray(rng.normal(size=(32, 3)) * 0.8, jnp.float32)
        quat = q.axis_angle_to_quat(aa)
        np.testing.assert_allclose(q.quat_to_axis_angle(quat), aa, atol=1e-4)
        np.testing.assert_allclose(
            q.quat_to_matrix(quat), q.axis_angle_to_matrix(aa), atol=1e-5
        )

    def test_rodrigues_small_angle(self):
        aa = jnp.zeros((4, 3))
        np.testing.assert_allclose(
            q.axis_angle_to_matrix(aa), jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
            atol=1e-5,
        )


class TestSH:
    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(0).random((10, 3)), jnp.float32)
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree0_is_constant(self):
        coeff = jnp.asarray(np.random.default_rng(1).normal(size=(5, 1, 3)), jnp.float32)
        dirs = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeff, dirs)
        np.testing.assert_allclose(out, sh.C0 * coeff[:, 0], atol=1e-6)

    def test_degree3_matches_explicit(self):
        # against a direct numpy evaluation of the same basis
        rng = np.random.default_rng(4)
        coeff = rng.normal(size=(16, 3)).astype(np.float32)
        d = rng.normal(size=3)
        d = d / np.linalg.norm(d)
        x, y, z = d
        basis = np.array([
            sh.C0,
            -sh.C1 * y, sh.C1 * z, -sh.C1 * x,
            sh.C2[0] * x * y, sh.C2[1] * y * z, sh.C2[2] * (2 * z * z - x * x - y * y),
            sh.C2[3] * x * z, sh.C2[4] * (x * x - y * y),
            sh.C3[0] * y * (3 * x * x - y * y), sh.C3[1] * x * y * z,
            sh.C3[2] * y * (4 * z * z - x * x - y * y),
            sh.C3[3] * z * (2 * z * z - 3 * x * x - 3 * y * y),
            sh.C3[4] * x * (4 * z * z - x * x - y * y),
            sh.C3[5] * z * (x * x - y * y), sh.C3[6] * x * (x * x - 3 * y * y),
        ])
        expected = basis @ coeff
        got = sh.eval_sh(3, jnp.asarray(coeff)[None], jnp.asarray(d, jnp.float32)[None])
        np.testing.assert_allclose(got[0], expected, atol=1e-5)


class TestCamera:
    def test_identity_camera_center(self):
        cam = camera.make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 2.0]),
                                 0.8, 0.8, 64, 64)
        np.testing.assert_allclose(cam.campos, [0, 0, -2.0], atol=1e-6)

    def test_projection_maps_center(self):
        cam = camera.make_camera(jnp.eye(3), jnp.zeros(3), 0.8, 0.8, 64, 64)
        p = jnp.array([0.0, 0.0, 1.0, 1.0])
        clip = cam.full_proj @ p
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)

    def test_point_on_fov_edge(self):
        fov = 0.9
        cam = camera.make_camera(jnp.eye(3), jnp.zeros(3), fov, fov, 64, 64)
        x = np.tan(fov / 2)
        clip = cam.full_proj @ jnp.array([x, 0.0, 1.0, 1.0])
        np.testing.assert_allclose((clip[:3] / clip[3])[0], 1.0, atol=1e-5)

    def test_look_at_points_at_target(self):
        cam = camera.look_at_camera([0.5, 0.3, -2.0], [0, 0, 0], [0, 1, 0],
                                    0.8, 0.8, 32, 32)
        # target projects to image centre
        clip = cam.full_proj @ jnp.array([0.0, 0.0, 0.0, 1.0])
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)
        np.testing.assert_allclose(cam.campos, [0.5, 0.3, -2.0], atol=1e-5)


class TestMesh:
    def setup_method(self):
        self.mesh = sphere_obj_mesh(64)
        self.verts = jnp.asarray(self.mesh.verts)
        self.faces = jnp.asarray(self.mesh.faces)

    def test_face_normals_outward(self):
        n = mesh.compute_face_normals(self.verts, self.faces)
        centers = jnp.mean(jnp.take(self.verts, self.faces, axis=0), axis=1)
        dots = jnp.sum(n * centers, axis=-1)
        assert (np.asarray(dots) > 0).all()

    def test_orientation_orthonormal(self):
        R, s = mesh.compute_face_orientation(self.verts, self.faces, return_scale=True)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            jnp.einsum("fij,fkj->fik", R, R), eye, atol=1e-5
        )
        assert (np.asarray(s) > 0).all()
        # right-handed
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_vertex_normals_unit(self):
        vn = mesh.compute_vertex_normals(self.verts, self.faces)
        np.testing.assert_allclose(jnp.linalg.norm(vn, axis=-1), 1.0, atol=1e-5)

    def test_reweight_recovers_vertices(self):
        # bary (1,0,0) at face f must return vertex faces[f,0]
        fidx = jnp.arange(10, dtype=jnp.int32)
        bary = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (10, 1))
        out = mesh.reweight_verts_by_barycoords(self.verts, self.faces, fidx, bary)
        np.testing.assert_allclose(
            out, jnp.take(self.verts, self.faces[:10, 0], axis=0), atol=1e-6
        )

    def test_laplacian_zero_on_centroidal(self):
        # Laplacian residual of the sphere is small and points inward
        res = mesh.laplacian_smoothing(self.verts, self.faces)
        assert np.isfinite(np.asarray(res)).all()

    def test_normal_consistency_smooth_mesh(self):
        adj = mesh.build_face_adjacency(np.asarray(self.faces))
        val = mesh.mesh_normal_consistency(self.verts, self.faces, adj)
        assert float(val) < 0.5  # sphere is smooth


class TestSampling:
    def test_uniform_sampling_counts_and_validity(self):
        m = sphere_obj_mesh(128)
        fidx, bary = sampling.uniform_sampling_barycoords(
            1024, m.uvcoords, m.uvfaces
        )
        assert fidx.shape == (1024,)
        assert bary.shape == (1024, 3)
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
        assert (fidx >= 0).all() and (fidx < len(m.faces)).all()

    def test_sampled_points_on_surface(self):
        m = sphere_obj_mesh(128)
        fidx, bary = sampling.uniform_sampling_barycoords(256, m.uvcoords, m.uvfaces)
        pts = mesh.reweight_verts_by_barycoords(
            jnp.asarray(m.verts), jnp.asarray(m.faces),
            jnp.asarray(fidx), jnp.asarray(bary),
        )
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        assert (np.abs(r - 0.1) < 0.05).all()  # near the sphere surface

    def test_random_sampling_area_weighted(self):
        m = sphere_obj_mesh(64)
        fidx, bary = sampling.random_sampling_barycoords(512, m.verts, m.faces)
        assert fidx.shape == (512,)
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)


class TestKNN:
    def test_knn_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        d2 = knn.knn_dists(jnp.asarray(pts), k=4, chunk=128)
        full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        expected = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.asarray(d2), expected, atol=1e-4)

    def test_mean_knn_distance_grid(self):
        # regular grid spacing 1 -> nearest neighbour distance 1
        g = np.stack(np.meshgrid(*[np.arange(4.0)] * 3), -1).reshape(-1, 3)
        m = knn.mean_knn_distance(jnp.asarray(g, jnp.float32))
        np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-5)
