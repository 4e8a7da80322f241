import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 implication (e)). The axon sitecustomize
# force-registers the TPU backend via jax.config, so we must override the
# config value (the env var alone is ignored).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()


# ---- fast tier (docs/TESTING.md): `pytest -m fast` runs a <5-minute
# slice that touches EVERY subsystem — the pre-commit regression gate on
# this 1-core host, where the full suite takes ~1h. Substring match
# against nodeids; one entry can select a class or a parametrized group.
FAST = (
    # rasterizer core: oracle, binning, XLA blend, facade, goldens
    # (one Oracle scene: the per-pixel reference loops cost ~10 s each)
    "test_rasterizer.py::TestOracle::test_single_gaussian_blob",
    "test_rasterizer.py::TestBinning::test_lists_match_bruteforce",
    "test_rasterizer.py::TestTileBlend::test_xla_blend_matches_oracle",
    "test_rasterizer.py::TestRenderFacade::test_render_outputs",
    "test_golden_scenes.py::TestGoldenScenes::test_all_variants_match_golden[sh0_basic]",
    "test_golden_scenes.py::TestSceneProperties::test_depth_ties_bit_identical",
    "test_cuda_oracle.py::TestOracleInternals",
    "test_cuda_oracle.py::TestOracleForwardGoldens::test_forward_matches_golden[sh0_basic]",
    # ops / FLAME
    "test_ops.py::TestQuaternion::test_matrix_quat_roundtrip",
    "test_ops.py::TestSH::test_degree3_matches_explicit",
    "test_ops.py::TestCamera::test_projection_maps_center",
    "test_ops.py::TestKNN::test_knn_matches_bruteforce",
    "test_flame.py::TestFlameForward::test_rest_pose_identity",
    # reference-execution oracle: ONE representative (the FLAME forward is
    # the highest-value substrate; the full class runs in the slow tier)
    "test_reference_exec.py::TestFlameExec::test_forward_matches",
    "test_flame.py::TestFlameForward::test_jit_compiles",
    "test_flame.py::TestWorldTransform::test_euler_xyz_matches_scipy",
    # model + training step + maintenance + optim
    "test_model.py::TestForward::test_forward_shapes",
    "test_model.py::TestMaintenance::test_densify_adds_points",
    "test_model.py::TestOptim",
    "test_training.py::TestDatasets::test_synthetic_dataset_contract",
    "test_training.py::TestGraftEntry::test_entry_compiles_small",
    "test_loader.py::test_loader_plain_checkpoint",
    "test_autosize.py::TestOccupancy::test_size_caps_bounds",
    # baselines
    "test_baselines.py::TestGaussianAvatars::test_forward",
    "test_baselines.py::TestSplattingAvatar::test_triangle_walk_zero_delta",
    "test_baselines.py::TestMonoGaussianAvatar::test_forward",
    "test_baseline_steps.py::TestRegistry",
    # multi-chip: ONE representative — the 2-D mesh step (42 s) covers
    # sharding+psum+densify; the DP parity test costs 107 s and overlaps
    "test_splat_parallel.py::test_mesh2d_train_step",
    # network ports + completion
    "test_block_oracles.py::TestNormOracles",
    "test_block_oracles.py::TestConvPaddingSemantics::test_vgg16_conv_matches_torch",
    "test_lpips.py::TestLpipsBasics::test_zero_self_distance_and_positive[alex]",
    "test_matting.py::TestMODNet::test_torso_boundary",
    "test_restoration.py::TestGFPGAN::test_restore_shapes",
    "test_eg3d.py::TestPrimitives::test_upsample2x_shape_and_mass",
    "test_eg3d.py::TestSynthesis::test_mapping_shapes",
    "test_pkl_ingest.py::TestRestrictedLoad::test_blocked_global_raises",
    "test_completion.py::TestOrbitSampler",
    "test_alignment.py::TestCropBound::test_ffhq_quad_hand_computed",
    "test_alignment.py::TestCropPaste::test_crop_paste_roundtrip",
    # aux: baking, nersemble, mesh render, native loader, utils, viewer
    "test_baking.py::TestUVDecoder::test_forward_outputs",
    "test_nersemble.py::test_world_transform_changes_render",
    "test_mesh_render.py::test_sphere_renders_centered",
    "test_native.py::test_library_builds",
    "test_native.py::test_png_rgb_matches_pil",
    "test_utils.py::TestConfig",
    "test_utils.py::TestMisc::test_bg_color",
    "test_viewer.py::test_page_carries_new_controls",
    "test_viewer.py::test_bg_color_toggle",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "fast: <5-min pre-commit tier covering every subsystem "
        "(docs/TESTING.md)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in FAST):
            item.add_marker(pytest.mark.fast)
