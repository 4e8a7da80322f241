"""Execution-parity oracles: run the REFERENCE'S OWN torch modules and pin
the JAX ports to their live outputs (VERDICT r4 item 1).

Every other parity test in this suite compares against hand transcriptions
of the reference. Here the reference itself executes — `/root/reference`'s
Python runs under the CPU torch in this environment — so a transposed
convention or a sign slip in a transcription cannot hide.

Covered (reference file:line):
  * flame/FLAME.py:131-237 forward / forward_with_delta_blendshape /
    forward_pts + flame/lbs.py:24-385, on a synthetic FLAME pickle fed to
    BOTH implementations,
  * volume_rendering/camera_3dgs.py:22-72 Camera (incl. the
    principal-point-shift projection, graphics_utils.py:38-118),
  * volume_rendering/mesh_compute.py:27-79 face normals / orientation /
    scale (the splat-binding frame),
  * tools/gs_utils/general_utils.py:78-118 build_rotation /
    build_scaling_rotation,
  * tools/gs_utils/sh_utils.py C0..C4 / RGB2SH / SH2RGB / eval_sh,
  * tools/loss_utils/dssim.py:28-58 d_ssim,
  * tools/eg3d_utils/camera_eg3d.py:26-75 LookAtPoseSampler /
    create_cam2world_matrix,
  * tools/crop_utils/affine_util.py:5-28 eg3dcamparams.

The reference modules hard-code ``device='cuda'`` / ``.cuda()`` in a few
constructors; the ``cpu_torch`` fixture shims DEVICE PLACEMENT ONLY (cuda ->
cpu) so the reference's math executes unmodified on the CPU build of torch.

Not executable here (imports that don't exist in this environment):
pytorch3d (mesh_sampling.py), nvdiffrast, the CUDA rasterizer (covered by
tests/cuda_oracle.py, a literal transcription of the .cu sources), and the
external-weight networks (covered by scripts/validate_real_weights.py).
"""

from __future__ import annotations

import math
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_path():
    """Put /root/reference on sys.path for the duration of this module."""
    sys.path.insert(0, REF)
    yield
    try:
        sys.path.remove(REF)
    except ValueError:
        pass


@pytest.fixture()
def cpu_torch(monkeypatch):
    """Shim DEVICE PLACEMENT (cuda -> cpu) so reference code with hard-coded
    ``device='cuda'`` / ``.cuda()`` executes on the CPU torch build. The
    math is untouched."""

    def strip_device(fn):
        def wrapper(*args, **kwargs):
            dev = kwargs.get("device")
            if dev is not None and "cuda" in str(dev):
                kwargs["device"] = "cpu"
            return fn(*args, **kwargs)

        return wrapper

    for name in ("zeros", "ones", "tensor", "eye", "arange", "full",
                 "empty", "rand", "randn", "linspace"):
        monkeypatch.setattr(torch, name, strip_device(getattr(torch, name)))
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    yield


def t2n(x):
    return x.detach().cpu().numpy()


def allclose(a, b, atol=1e-5, rtol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=atol, rtol=rtol, err_msg=msg)


# --------------------------------------------------------------------------
# FLAME / LBS (flame/FLAME.py, flame/lbs.py)
# --------------------------------------------------------------------------

N_SHAPE, N_EXP = 8, 6
CANONICAL_POSE = 0.2


@pytest.fixture(scope="module")
def flame_pair(ref_path, tmp_path_factory):
    """(reference FLAME nn.Module, our FlameModel), built from the SAME
    synthetic assets written to disk in the reference's file formats."""
    from fateavatar_tpu.flame import make_flame, synthetic_flame_data

    data, (lmk_faces, lmk_bary, dyn_faces, dyn_bary) = synthetic_flame_data(
        n_verts=96, n_exp=N_EXP, seed=11
    )
    tmp = tmp_path_factory.mktemp("flame_assets")
    pkl_path = str(tmp / "generic_model.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(data, f)
    # landmark_embedding.npy layout (FLAME.py:66-93): static/full keys are
    # numpy, dynamic keys are PICKLED TORCH TENSORS (.long()/.to() are
    # called on them directly)
    lmk_path = str(tmp / "landmark_embedding.npy")
    np.save(lmk_path, {
        "static_lmk_faces_idx": lmk_faces[17:].astype(np.int64),
        "static_lmk_bary_coords": lmk_bary[17:].astype(np.float32),
        "dynamic_lmk_faces_idx": torch.from_numpy(dyn_faces.astype(np.int64)),
        "dynamic_lmk_bary_coords": torch.from_numpy(dyn_bary),
        "full_lmk_faces_idx": lmk_faces.astype(np.int64),
        "full_lmk_bary_coords": lmk_bary.astype(np.float32),
    }, allow_pickle=True)

    rng = np.random.default_rng(3)
    shape_params = rng.normal(size=(1, N_SHAPE)).astype(np.float32) * 0.5
    canonical_exp = rng.normal(size=(1, N_EXP)).astype(np.float32) * 0.3

    from flame.FLAME import FLAME as RefFLAME  # noqa: E402 (reference)

    ref = RefFLAME(
        flame_model_path=pkl_path,
        lmk_embedding_path=lmk_path,
        n_shape=N_SHAPE,
        n_exp=N_EXP,
        shape_params=torch.from_numpy(shape_params),
        canonical_expression=torch.from_numpy(canonical_exp),
        canonical_pose=CANONICAL_POSE,
        device="cpu",
    )
    ours = make_flame(
        data, n_shape=N_SHAPE, n_exp=N_EXP,
        shape_params=shape_params,
        canonical_expression=canonical_exp,
        canonical_pose=CANONICAL_POSE,
        landmark_embedding=(lmk_faces, lmk_bary, dyn_faces, dyn_bary),
    )
    return ref, ours


def _random_pose(rng, batch):
    # [global 3 | neck 3 | jaw 3 | eyes 6], modest angles
    return (rng.normal(size=(batch, 15)) * 0.2).astype(np.float32)


class TestFlameExec:
    def test_template_and_buffers_match(self, flame_pair):
        ref, ours = flame_pair
        allclose(t2n(ref.v_template), ours.v_template, msg="v_template")
        allclose(t2n(ref.shapedirs), ours.shapedirs, msg="shapedirs")
        allclose(t2n(ref.posedirs), ours.posedirs, msg="posedirs")
        allclose(t2n(ref.lbs_weights), ours.lbs_weights, msg="lbs_weights")
        allclose(t2n(ref.J_regressor), ours.j_regressor, msg="J_regressor")
        np.testing.assert_array_equal(t2n(ref.parents), np.asarray(ours.parents))
        np.testing.assert_array_equal(t2n(ref.faces_tensor),
                                      np.asarray(ours.faces))
        allclose(t2n(ref.canonical_exp), ours.canonical_exp)
        allclose(t2n(ref.canonical_pose), ours.canonical_pose)

    def test_forward_matches(self, flame_pair):
        from fateavatar_tpu.flame import flame_forward

        ref, ours = flame_pair
        rng = np.random.default_rng(5)
        for b in (1, 4):
            exp = (rng.normal(size=(b, N_EXP)) * 0.5).astype(np.float32)
            pose = _random_pose(rng, b)
            rv, rpf, rtf = ref.forward(torch.from_numpy(exp),
                                       torch.from_numpy(pose))
            ov, opf, otf = flame_forward(ours, exp, pose)
            allclose(t2n(rv), ov, msg=f"vertices b={b}")
            allclose(t2n(rpf), opf, msg=f"pose_feature b={b}")
            allclose(t2n(rtf), otf, msg=f"transformations b={b}")

    def test_forward_with_delta_blendshape_matches(self, flame_pair):
        from fateavatar_tpu.flame import flame_forward

        ref, ours = flame_pair
        rng = np.random.default_rng(7)
        V = t2n(ref.v_template).shape[0]
        dsd = (rng.normal(size=(V, 3, N_SHAPE + N_EXP)) * 0.01).astype(np.float32)
        dpd = (rng.normal(size=(36, V * 3)) * 0.001).astype(np.float32)
        dv = (rng.normal(size=(V, 3)) * 0.005).astype(np.float32)
        exp = (rng.normal(size=(2, N_EXP)) * 0.5).astype(np.float32)
        pose = _random_pose(rng, 2)

        rv, rpf, rtf = ref.forward_with_delta_blendshape(
            torch.from_numpy(exp), torch.from_numpy(pose),
            delta_shapedirs=torch.from_numpy(dsd),
            delta_posedirs=torch.from_numpy(dpd),
            delta_vertex=torch.from_numpy(dv),
        )
        ov, opf, otf = flame_forward(
            ours, exp, pose, delta_shapedirs=dsd, delta_posedirs=dpd,
            delta_vertex=dv,
        )
        allclose(t2n(rv), ov, msg="delta vertices")
        allclose(t2n(rpf), opf, msg="delta pose_feature")
        allclose(t2n(rtf), otf, msg="delta transformations")

    def test_forward_pts_matches(self, flame_pair):
        """FLAME.forward_pts (FLAME.py:207-237): inverse-morph from the
        canonical frame then forward-morph to the target frame — the
        MonoGaussianAvatar point path."""
        from fateavatar_tpu.flame import flame_forward
        from fateavatar_tpu.flame.flame import forward_pts, inverse_pts

        ref, ours = flame_pair
        rng = np.random.default_rng(9)
        N = 64
        J = 5

        # canonical transformations, set the way model/fateavatar.py:109-118
        # does (forward at canonical expression + pose)
        cexp = t2n(ref.canonical_exp)
        cpose = t2n(ref.canonical_pose)
        _, cpf_t, ctf_t = ref.forward(torch.from_numpy(cexp),
                                      torch.from_numpy(cpose))
        ref.canonical_pose_feature = cpf_t
        ref.canonical_transformations = ctf_t
        _, cpf, ctf = flame_forward(ours, cexp, cpose)

        pnts = (rng.normal(size=(N, 3)) * 0.1).astype(np.float32)
        betas = (rng.normal(size=(N, N_EXP)) * 0.3).astype(np.float32)
        pose = _random_pose(rng, 1)
        exp = (rng.normal(size=(1, N_EXP)) * 0.5).astype(np.float32)
        _, pf_t, tf_t = ref.forward(torch.from_numpy(exp),
                                    torch.from_numpy(pose))
        _, pf, tf = flame_forward(ours, exp, pose)

        # per-point blendshape/skinning tables (as MonoGaussianAvatar
        # predicts them, model/baseline/monogaussianavatar.py:784-883)
        sdirs = (rng.normal(size=(N, 3, N_EXP)) * 0.01).astype(np.float32)
        pdirs = (rng.normal(size=(N, 36, 3)) * 0.001).astype(np.float32)
        w = np.abs(rng.normal(size=(N, J))).astype(np.float32)
        w /= w.sum(axis=1, keepdims=True)

        r_out = ref.forward_pts(
            torch.from_numpy(pnts),
            torch.from_numpy(betas),
            tf_t.expand(N, -1, -1, -1),
            pf_t.expand(N, -1),
            torch.from_numpy(sdirs),
            torch.from_numpy(pdirs),
            torch.from_numpy(w),
        )

        import jax.numpy as jnp

        cano = inverse_pts(
            jnp.asarray(pnts),
            jnp.broadcast_to(jnp.asarray(cexp), (N, N_EXP)),
            jnp.broadcast_to(ctf, (N, J, 4, 4)),
            jnp.broadcast_to(cpf, (N, 36)),
            jnp.asarray(sdirs), jnp.asarray(pdirs), jnp.asarray(w),
        )
        o_out = forward_pts(
            cano,
            jnp.asarray(betas),
            jnp.broadcast_to(tf, (N, J, 4, 4)),
            jnp.broadcast_to(pf, (N, 36)),
            jnp.asarray(sdirs), jnp.asarray(pdirs), jnp.asarray(w),
        )
        allclose(t2n(r_out), o_out, atol=2e-5, msg="forward_pts")

    def test_vertices2landmarks_matches(self, flame_pair, ref_path):
        from flame.lbs import vertices2landmarks as ref_v2l

        from fateavatar_tpu.flame import flame_forward
        from fateavatar_tpu.flame.flame import vertices2landmarks

        ref, ours = flame_pair
        rng = np.random.default_rng(13)
        exp = (rng.normal(size=(1, N_EXP)) * 0.5).astype(np.float32)
        pose = _random_pose(rng, 1)
        rv, _, _ = ref.forward(torch.from_numpy(exp), torch.from_numpy(pose))
        r_lmk = ref_v2l(rv, ref.faces_tensor,
                        ref.full_lmk_faces_idx.expand(1, -1),
                        ref.full_lmk_bary_coords.expand(1, -1, -1))
        ov, _, _ = flame_forward(ours, exp, pose)
        o_lmk = vertices2landmarks(ov, ours.faces, ours.lmk_faces_idx,
                                   ours.lmk_bary_coords)
        allclose(t2n(r_lmk), o_lmk, msg="landmarks")


# --------------------------------------------------------------------------
# Camera (volume_rendering/camera_3dgs.py + tools/gs_utils/graphics_utils.py)
# --------------------------------------------------------------------------


def _random_rigid(rng):
    """Random rotation (QR) + translation in the 3DGS (R, T) convention."""
    A = rng.normal(size=(3, 3))
    Q, R_ = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R_))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    t = rng.normal(size=(3,)) * 0.5 + np.array([0, 0, 4.0])
    return Q.astype(np.float32), t.astype(np.float32)


class TestCameraExec:
    def test_camera_matrices_match(self, ref_path, cpu_torch):
        """Camera (camera_3dgs.py:22-72): our math-convention matrices are
        the TRANSPOSE of the reference's row-vector layout."""
        from volume_rendering.camera_3dgs import Camera as RefCamera

        from fateavatar_tpu.ops.camera import make_camera_np

        rng = np.random.default_rng(21)
        for i in range(4):
            R, T = _random_rigid(rng)
            fovx = float(rng.uniform(0.4, 1.2))
            fovy = float(rng.uniform(0.4, 1.2))
            ref = RefCamera(torch.from_numpy(R)[None],
                            torch.from_numpy(T)[None],
                            fovx, fovy, img_res=(512, 512))
            ours = make_camera_np(R, T, fovx, fovy, 512, 512)
            allclose(t2n(ref.world_view_transform).T, ours.view,
                     msg=f"W2V {i}")
            allclose(t2n(ref.projection_matrix).T, ours.proj,
                     msg=f"proj {i}")
            allclose(t2n(ref.full_proj_transform).T, ours.full_proj,
                     atol=2e-5, msg=f"full_proj {i}")
            allclose(t2n(ref.camera_center), ours.campos, atol=2e-5,
                     msg=f"campos {i}")

    def test_camera_shift_projection_matches(self, ref_path, cpu_torch):
        """Principal-point-shift path (graphics_utils.py:86-118) — the
        NeRSemble-benchmark camera."""
        from volume_rendering.camera_3dgs import Camera as RefCamera

        from fateavatar_tpu.ops.camera import make_camera_np

        rng = np.random.default_rng(23)
        R, T = _random_rigid(rng)
        W, H = 640, 480
        fx, fy = 800.0, 790.0
        cx, cy = 331.5, 229.0
        fovx = 2.0 * math.atan(W / (2 * fx))
        fovy = 2.0 * math.atan(H / (2 * fy))
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        ref = RefCamera(torch.from_numpy(R)[None], torch.from_numpy(T)[None],
                        fovx, fovy, img_res=(H, W),
                        intrinsics=torch.from_numpy(K)[None])
        ours = make_camera_np(R, T, fovx, fovy, W, H, intrinsics=K)
        allclose(t2n(ref.projection_matrix).T, ours.proj, msg="shift proj")
        allclose(t2n(ref.full_proj_transform).T, ours.full_proj, atol=2e-5)

    def test_world2view2_numpy_matches(self, ref_path):
        from tools.gs_utils.graphics_utils import getWorld2View2

        from fateavatar_tpu.ops.camera import world_to_view

        rng = np.random.default_rng(25)
        R, T = _random_rigid(rng)
        allclose(getWorld2View2(R, T), np.asarray(world_to_view(R, T)),
                 atol=1e-6)

    def test_fov_focal_roundtrip(self, ref_path):
        from tools.gs_utils.graphics_utils import focal2fov, fov2focal

        from fateavatar_tpu.ops import camera as oc

        assert fov2focal(0.8, 512) == pytest.approx(oc.fov2focal(0.8, 512))
        assert focal2fov(700.0, 512) == pytest.approx(oc.focal2fov(700.0, 512))


# --------------------------------------------------------------------------
# Face frames (volume_rendering/mesh_compute.py)
# --------------------------------------------------------------------------


class TestMeshComputeExec:
    @pytest.fixture()
    def mesh(self):
        from fateavatar_tpu.flame import synthetic_flame

        m = synthetic_flame(n_verts=80, seed=17)
        rng = np.random.default_rng(19)
        verts = np.asarray(m.v_template) + rng.normal(
            size=(np.asarray(m.v_template).shape)
        ).astype(np.float32) * 0.002
        return verts.astype(np.float32), np.asarray(m.faces)

    def test_face_orientation_and_scale(self, ref_path, cpu_torch, mesh):
        from volume_rendering.mesh_compute import (
            compute_face_orientation as ref_orient,
        )

        from fateavatar_tpu.ops.mesh import compute_face_orientation

        verts, faces = mesh
        r_rot, r_scale = ref_orient(
            torch.from_numpy(verts)[None],
            torch.from_numpy(faces).long(), return_scale=True)
        o_rot, o_scale = compute_face_orientation(verts, faces,
                                                  return_scale=True)
        allclose(t2n(r_rot)[0], o_rot, atol=2e-5, msg="orientation")
        allclose(t2n(r_scale)[0].ravel(), np.asarray(o_scale).ravel(),
                 atol=2e-5, msg="scale")

    def test_face_normals(self, ref_path, cpu_torch, mesh):
        from volume_rendering.mesh_compute import (
            compute_face_normals as ref_normals,
        )

        from fateavatar_tpu.ops.mesh import compute_face_normals

        verts, faces = mesh
        r_n = ref_normals(torch.from_numpy(verts)[None],
                          torch.from_numpy(faces).long())
        o_n = compute_face_normals(verts, faces)
        # both return the UNNORMALIZED cross products (mesh_compute.py:27-36)
        allclose(t2n(r_n)[0], o_n, atol=2e-6, msg="face normals")

    def test_vertex_normals(self, ref_path, cpu_torch, mesh):
        from volume_rendering.mesh_compute import (
            compute_vertex_normals as ref_vn,
        )

        from fateavatar_tpu.ops.mesh import compute_vertex_normals

        verts, faces = mesh
        r_vn = ref_vn(torch.from_numpy(verts)[None],
                      torch.from_numpy(faces).long())
        o_vn = compute_vertex_normals(verts, faces)
        allclose(t2n(r_vn)[0], o_vn, atol=2e-5, msg="vertex normals")


# --------------------------------------------------------------------------
# 3DGS math (tools/gs_utils/general_utils.py, sh_utils.py)
# --------------------------------------------------------------------------


class TestGsUtilsExec:
    def test_build_rotation(self, ref_path, cpu_torch):
        from tools.gs_utils.general_utils import build_rotation

        from fateavatar_tpu.ops.quaternion import quat_normalize, quat_to_matrix

        rng = np.random.default_rng(29)
        q = rng.normal(size=(32, 4)).astype(np.float32)
        r_R = build_rotation(torch.from_numpy(q))
        import jax.numpy as jnp

        o_R = quat_to_matrix(quat_normalize(jnp.asarray(q)))
        allclose(t2n(r_R), o_R, atol=2e-6, msg="build_rotation")

    def test_build_scaling_rotation(self, ref_path, cpu_torch):
        from tools.gs_utils.general_utils import build_scaling_rotation

        from fateavatar_tpu.ops.quaternion import quat_normalize, quat_to_matrix

        rng = np.random.default_rng(31)
        q = rng.normal(size=(16, 4)).astype(np.float32)
        s = np.abs(rng.normal(size=(16, 3))).astype(np.float32)
        r_L = build_scaling_rotation(torch.from_numpy(s), torch.from_numpy(q))
        import jax.numpy as jnp

        o_L = quat_to_matrix(quat_normalize(jnp.asarray(q))) * s[:, None, :]
        allclose(t2n(r_L), o_L, atol=2e-6, msg="build_scaling_rotation")

    def test_inverse_sigmoid(self, ref_path):
        from tools.gs_utils.general_utils import inverse_sigmoid

        x = torch.linspace(0.01, 0.99, 17)
        import jax.scipy.special as jsp
        import jax.numpy as jnp

        ours = jsp.logit(jnp.asarray(t2n(x)))
        allclose(t2n(inverse_sigmoid(x)), ours, atol=1e-5)

    def test_sh_constants_and_conversions(self, ref_path):
        from tools.gs_utils import sh_utils as ref_sh

        from fateavatar_tpu.ops import sh as our_sh

        assert ref_sh.C0 == pytest.approx(float(our_sh.C0), abs=1e-12)
        rng = np.random.default_rng(33)
        rgb = rng.uniform(0, 1, size=(8, 3)).astype(np.float32)
        import jax.numpy as jnp

        allclose(t2n(ref_sh.RGB2SH(torch.from_numpy(rgb))),
                 our_sh.rgb_to_sh(jnp.asarray(rgb)), atol=1e-6)
        shv = rng.normal(size=(8, 3)).astype(np.float32)
        allclose(t2n(ref_sh.SH2RGB(torch.from_numpy(shv))),
                 our_sh.sh_to_rgb(jnp.asarray(shv)), atol=1e-6)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3])
    def test_eval_sh(self, ref_path, deg):
        from tools.gs_utils.sh_utils import eval_sh as ref_eval

        from fateavatar_tpu.ops.sh import eval_sh, num_sh_coeffs

        rng = np.random.default_rng(37 + deg)
        n = 24
        k = num_sh_coeffs(deg)
        # reference layout: [..., C, (deg+1)**2]
        sh_ref = rng.normal(size=(n, 3, k)).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        r = ref_eval(deg, torch.from_numpy(sh_ref), torch.from_numpy(dirs))
        import jax.numpy as jnp

        # our layout: [N, K, 3]
        o = eval_sh(deg, jnp.asarray(sh_ref.transpose(0, 2, 1)),
                    jnp.asarray(dirs))
        allclose(t2n(r), o, atol=2e-6, msg=f"eval_sh deg={deg}")


# --------------------------------------------------------------------------
# DSSIM (tools/loss_utils/dssim.py)
# --------------------------------------------------------------------------


class TestDssimExec:
    def test_d_ssim_matches(self, ref_path, cpu_torch):
        from tools.loss_utils.dssim import d_ssim as ref_dssim

        from fateavatar_tpu.train.losses import d_ssim

        rng = np.random.default_rng(41)
        a = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.1,
                    0, 1)
        r = ref_dssim(torch.from_numpy(a.transpose(2, 0, 1))[None],
                      torch.from_numpy(b.transpose(2, 0, 1))[None])
        o = d_ssim(a, b)
        assert float(r) == pytest.approx(float(o), abs=2e-5)

    def test_d_ssim_identical_images(self, ref_path, cpu_torch):
        from tools.loss_utils.dssim import d_ssim as ref_dssim

        from fateavatar_tpu.train.losses import d_ssim

        rng = np.random.default_rng(43)
        a = rng.uniform(0, 1, size=(48, 48, 3)).astype(np.float32)
        r = ref_dssim(torch.from_numpy(a.transpose(2, 0, 1))[None],
                      torch.from_numpy(a.transpose(2, 0, 1))[None])
        o = d_ssim(a, a)
        assert float(r) == pytest.approx(float(o), abs=2e-6)


# --------------------------------------------------------------------------
# EG3D camera (tools/eg3d_utils/camera_eg3d.py) + FFHQ affine
# (tools/crop_utils/affine_util.py)
# --------------------------------------------------------------------------


class TestEg3dCameraExec:
    @pytest.mark.parametrize("h,v", [
        (math.pi / 2, math.pi / 2),
        (0.3, 1.1),
        (2.6, 2.0),
        (math.pi, math.pi / 2),
    ])
    def test_lookat_pose_sampler(self, ref_path, h, v):
        from tools.eg3d_utils.camera_eg3d import LookAtPoseSampler

        from fateavatar_tpu.completion.camera_sampler import sample_orbit_pose

        lookat = np.array([0.05, -0.01, 0.2], np.float32)
        r = LookAtPoseSampler.sample(h, v, torch.from_numpy(lookat),
                                     radius=2.7)
        o = sample_orbit_pose(h, v, lookat, radius=2.7)
        allclose(t2n(r)[0], o.reshape(4, 4), atol=2e-6,
                 msg=f"cam2world h={h} v={v}")

    def test_create_cam2world_matrix(self, ref_path):
        from tools.eg3d_utils.camera_eg3d import create_cam2world_matrix

        from fateavatar_tpu.completion.camera_sampler import cam2world_lookat

        rng = np.random.default_rng(47)
        origin = rng.normal(size=(3,)).astype(np.float32) * 2
        target = rng.normal(size=(3,)).astype(np.float32) * 0.1
        fwd = target - origin
        fwd = fwd / np.linalg.norm(fwd)
        r = create_cam2world_matrix(torch.from_numpy(fwd)[None],
                                    torch.from_numpy(origin)[None])
        o = cam2world_lookat(origin, target)
        allclose(t2n(r)[0], o, atol=2e-6)


class TestAffineExec:
    def test_eg3dcamparams(self, ref_path):
        from tools.crop_utils.affine_util import eg3dcamparams as ref_fn

        from fateavatar_tpu.completion.alignment import eg3dcamparams

        rng = np.random.default_rng(51)
        A = rng.normal(size=(3, 3))
        Q, R_ = np.linalg.qr(A)
        Q = Q * np.sign(np.diag(R_))
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = Q.astype(np.float32)
        allclose(ref_fn(M.flatten()), eg3dcamparams(M), atol=1e-5)

    def test_matrix2angle(self, ref_path):
        from tools.crop_utils.affine_util import matrix2angle as ref_m2a

        from fateavatar_tpu.completion.alignment import matrix2angle

        rng = np.random.default_rng(53)
        for _ in range(4):
            A = rng.normal(size=(3, 3))
            Q, R_ = np.linalg.qr(A)
            Q = Q * np.sign(np.diag(R_))
            if np.linalg.det(Q) < 0:
                Q[:, 0] = -Q[:, 0]
            r = ref_m2a(Q)
            o = matrix2angle(Q)
            allclose(np.asarray(r), np.asarray(o), atol=1e-6)
