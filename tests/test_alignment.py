"""FFHQ alignment + EG3D camera labels (completion stage ③/⑦).

Pins: the FFHQ quad formula against hand-computed values, crop/paste
round-trips against hand-built affines, the label convention against the
EG3D provider's orbit labels, and the pose rejection filters.
Reference: tools/crop_utils/affine_util.py, train/completion.py:305-498,709-816.
"""

import numpy as np
import pytest

from fateavatar_tpu.completion.alignment import (
    crop_final, eg3dcamparams, get_crop_bound, matrix2angle,
    paste_back_images, paste_back_matrix, pose_reject, refine_quad,
)

cv2 = pytest.importorskip("cv2")


def _frontal_landmarks(cx=256.0, cy=256.0, eye_dx=40.0, mouth_dy=60.0):
    """A synthetic upright frontal 68-landmark set: eyes at (cx±eye_dx,
    cy), mouth corners at (cx±25, cy+mouth_dy), jaw endpoints at cx±90."""
    lm = np.zeros((68, 2), np.float64)
    lm[36:42] = [cx - eye_dx, cy]
    lm[42:48] = [cx + eye_dx, cy]
    lm[33] = [cx, cy + 30]
    lm[48] = [cx - 25, cy + mouth_dy]
    lm[54] = [cx + 25, cy + mouth_dy]
    lm[0] = [cx - 90, cy + 10]
    lm[16] = [cx + 90, cy + 10]
    return lm


class TestCropBound:
    def test_ffhq_quad_hand_computed(self):
        lm = _frontal_landmarks()
        quad, c, x, y = get_crop_bound(lm)
        # hand-compute (affine_util.py:48-57): eye_to_eye=(80,0),
        # eye_to_mouth=(0,60) -> x dir = (80,0) - flip(0,60)*[-1,1]
        #   = (80,0) - (60,0)*[-1,1] ... flipud((0,60)) = (60,0);
        #   (60,0)*[-1,1] = (-60,0); x = (80,0)-(-60,0) = (140, 0)
        # norm -> (1,0); |x| = max(80*2, 60*1.8) = 160
        np.testing.assert_allclose(x, [160.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(y, [0.0, 160.0], atol=1e-6)
        # c = eye_avg + 0.1*eye_to_mouth = (256, 256+6)
        np.testing.assert_allclose(c, [256.0, 262.0], atol=1e-6)
        np.testing.assert_allclose(
            quad,
            [[96, 102], [96, 422], [416, 422], [416, 102]], atol=1e-5)

    def test_quad_square_and_rotation_covariant(self):
        lm = _frontal_landmarks()
        ang = 0.3
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        lm_rot = (lm - 256) @ R.T + 256
        quad, _, x, y = get_crop_bound(lm_rot)
        # FFHQ quad is always square and axes orthogonal
        np.testing.assert_allclose(np.linalg.norm(x), np.linalg.norm(y),
                                   rtol=1e-6)
        assert abs(np.dot(x, y)) < 1e-6 * np.linalg.norm(x) ** 2


class TestCropPaste:
    def test_crop_final_identity_quad(self):
        """A quad exactly matching an axis-aligned square recovers the
        source pixels in the un-expanded interior."""
        rng = np.random.default_rng(0)
        img = rng.random((512, 512, 3)).astype(np.float32)
        size = 128
        q0 = 100
        quad = np.array([[q0, q0], [q0, q0 + size - 1],
                         [q0 + size - 1, q0 + size - 1], [q0 + size - 1, q0]],
                        np.float32)
        crop = crop_final(img, size=size, quad=quad, min_size=None,
                          upsample=1)
        # interior: crop[top + r, left + c] == img[q0 + r, q0 + c]
        top, left = int(size * 0.1), int(size * 0.05)
        got = crop[top + 10: top + 50, left + 10: left + 50]
        want = img[q0 + 10: q0 + 50, q0 + 10: q0 + 50]
        assert np.abs(got - want).mean() < 0.02  # u8 quantization + resample

    def test_crop_final_min_size_rejects(self):
        img = np.zeros((64, 64, 3), np.float32)
        quad = np.array([[10, 10], [10, 30], [30, 30], [30, 10]], np.float32)
        assert crop_final(img, 512, quad, min_size=256) is None
        assert crop_final(img, 32, quad, min_size=None) is not None

    def test_paste_back_matrix_hand_affine(self):
        """For an axis-aligned translation-only quad the paste matrix is a
        pure scale+shift computable by hand (completion.py:744-778)."""
        size = 512
        q0, qs = 64.0, 256.0   # quad: square at (64,64), side 256
        quad = np.array([[q0, q0], [q0, q0 + qs], [q0 + qs, q0 + qs],
                         [q0 + qs, q0]], np.float32)
        M = paste_back_matrix(quad, size=size)
        top, left = int(size * 0.1), int(size * 0.05)
        # maps quad -> bound: scale = (size-1)/qs, offset per axis
        s = (size - 1) / qs
        np.testing.assert_allclose(M[0, 0], s, rtol=1e-5)
        np.testing.assert_allclose(M[1, 1], s, rtol=1e-5)
        np.testing.assert_allclose(M[0, 2], left - q0 * s, atol=1e-3)
        np.testing.assert_allclose(M[1, 2], top - q0 * s, atol=1e-3)

    def test_crop_paste_roundtrip(self):
        """align-crop then paste-back reproduces the original interior —
        the pixel-level contract of stages ③+⑦."""
        # smooth content: geometry is what's under test, not the
        # interpolation loss of white noise through two resamplings
        yy, xx = np.mgrid[0:512, 0:512].astype(np.float32) / 511.0
        img = np.stack([xx, yy, 0.5 + 0.5 * np.sin(6 * xx + 4 * yy)], -1)
        lm = _frontal_landmarks()
        quad, _, _, _ = get_crop_bound(lm)
        crop = crop_final(img, size=512, quad=quad, min_size=None)
        assert crop is not None
        pasted, valid = paste_back_images(crop[None], quad, out_size=512)
        inner = (slice(192, 320), slice(192, 320))
        err = np.abs(pasted[0][inner] - img[inner]).mean()
        assert err < 0.03, err
        assert valid[0][inner].min() > 0.99


class TestPoseAndLabels:
    def test_matrix2angle_pure_yaw(self):
        th = 0.4
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        yaw, pitch, roll = matrix2angle(R)
        # affine_util.py:189: x = asin(R[2,0]) = asin(-sin th) = -th
        np.testing.assert_allclose(yaw, -th, atol=1e-6)
        np.testing.assert_allclose([pitch, roll], 0, atol=1e-6)

    def test_pose_reject_thresholds(self):
        assert pose_reject(np.eye(3)) is None
        th = np.deg2rad(120)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        assert pose_reject(R) is not None          # back view
        assert pose_reject(np.eye(3), s=2.0) is not None
        assert pose_reject(np.eye(3), t3d=np.array([1.5, 0.0])) is not None

    def test_label_matches_provider_orbit_label(self):
        """stage-③ labels from the camera matrices must equal the EG3D
        provider's internal orbit labels (pseudo.py flip composition)."""
        from fateavatar_tpu.completion.camera_sampler import (
            orbit_cameras, sample_orbit_pose)
        from fateavatar_tpu.completion.eg3d.networks import eg3d_camera_label

        lookat = np.zeros(3)
        cams, _ = orbit_cameras(
            4, lookat, 2.7, 0.7, 0.7, 64, 64,
            h_range=(np.pi / 2, np.pi / 2 + 2 * np.pi))
        flip = np.diag([1.0, -1.0, -1.0])
        for i, angle in enumerate(np.linspace(0, 2 * np.pi, 4,
                                              endpoint=False)):
            R4 = np.eye(4, dtype=np.float32)
            R4[:3, :3] = flip @ np.asarray(cams[i].view)[:3, :3]
            got = eg3dcamparams(R4)
            c2w = sample_orbit_pose(np.pi / 2 + angle, np.pi / 2, lookat, 2.7)
            want = eg3d_camera_label(c2w)
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_refine_quad_recenters(self):
        lm = _frontal_landmarks()
        quad, c, x, y = get_crop_bound(lm)
        # head centre projected at the crop centre -> no change
        q2, t3d = refine_quad(c, x, y, np.array([255.5, 255.5]), 512)
        np.testing.assert_allclose(q2, quad, atol=1e-4)
        np.testing.assert_allclose(t3d, 0, atol=1e-5)
        # centre to the right -> quad shifts right along +x axis
        q3, t3d3 = refine_quad(c, x, y, np.array([511.0, 255.5]), 512)
        assert t3d3[0] > 0.99
        np.testing.assert_allclose(
            q3.mean(0) - quad.mean(0), [np.linalg.norm(x), 0], rtol=1e-3)


class TestPipelineE2E:
    def test_run_produces_aligned_and_pasted(self, tmp_path):
        """run() drives ①→⑨ with alignment: aligned crops + dataset.json
        labels exist, pasted frames land in image/ (what the completion
        trainer consumes), trajectory.json covers the full orbit."""
        import jax.numpy as jnp

        from fateavatar_tpu.completion.pseudo import (
            PseudoGenerator, PseudoGeneratorConfig)
        from fateavatar_tpu.flame import synthetic_flame
        from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
        from fateavatar_tpu.render.render import RenderConfig
        from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

        flame = synthetic_flame(n_verts=96, n_shape=4, n_exp=4, seed=0)
        mesh = sphere_obj_mesh(96)
        cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=64,
                               img_width=64, normal_offset=0.01)
        model, params, state = init_fateavatar(mesh, flame, cfg)
        out_dir = str(tmp_path / "pseudo")
        gen = PseudoGenerator(
            model, params, state,
            PseudoGeneratorConfig(num_views=8, orbit_radius=0.5,
                                  crop_size=64, out_dir=out_dir),
            render_cfg=RenderConfig(impl="xla", max_per_tile=64),
        )
        out = gen.run(0.8, 0.8)
        assert out["pasted"].shape[0] == 8
        import os

        assert os.path.exists(os.path.join(out_dir, "trajectory.json"))
        assert os.path.exists(os.path.join(out_dir, "image", "0000.png"))
        assert os.path.exists(os.path.join(out_dir, "affine", "dataset.json"))
        if out["aligned"] is not None and out["aligned"]["front_quad"] is not None:
            # back views must have been pose-rejected (completion.py:419)
            assert len(out["aligned"]["index"]) < 8
            assert np.isfinite(out["aligned"]["label"]).all()
            assert out["aligned"]["label"].shape[1] == 25