"""End-to-end smoke of scripts/validate_real_weights.py (the real-weight
readiness drill, VERDICT r2 item #9): synthetic checkpoints with the real
key layouts stand in for the published weights, proving the drill's
conversion + key-audit + forward + fixture/compare machinery runs before
the day real checkpoints arrive."""

import os
import subprocess
import sys

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_real_weights.py")


def _write_modnet(weights_dir):
    from fateavatar_tpu.completion.matting import modnet_random_params

    params = modnet_random_params(jax.random.PRNGKey(0))
    sd = {"module." + k: torch.from_numpy(np.array(v))
          for k, v in params.items()}
    torch.save(sd, os.path.join(weights_dir,
                                "modnet_webcam_portrait_matting.ckpt"))
    return sd


def _write_lpips_alex(weights_dir):
    rng = np.random.default_rng(7)
    shapes = [(1, 0, 64, 3, 11), (2, 3, 192, 64, 5), (3, 6, 384, 192, 3),
              (4, 8, 256, 384, 3), (5, 10, 256, 256, 3)]
    sd = {}
    for s, i, o, c, k in shapes:
        sd[f"net.slice{s}.{i}.weight"] = torch.tensor(
            rng.normal(size=(o, c, k, k)).astype(np.float32) * 0.05)
        sd[f"net.slice{s}.{i}.bias"] = torch.tensor(
            rng.normal(size=(o,)).astype(np.float32) * 0.01)
    for k_i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{k_i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
    torch.save(sd, os.path.join(weights_dir, "lpips_alex.pth"))


def _run(weights_dir, *extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, SCRIPT, weights_dir, *extra],
        capture_output=True, text=True, env=env, timeout=900)


def test_drill_validates_present_ports_and_compare(tmp_path):
    weights = str(tmp_path)
    _write_modnet(weights)
    _write_lpips_alex(weights)

    r = _run(weights, "--ports", "modnet,lpips_alex")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "[ OK ] modnet" in r.stdout and "[ OK ] lpips_alex" in r.stdout
    fix = os.path.join(weights, "fixtures_real")
    assert os.path.exists(os.path.join(fix, "modnet.npz"))
    assert os.path.exists(os.path.join(fix, "lpips_alex.npz"))

    # second run with --compare regresses against the recorded fixtures
    r2 = _run(weights, "--ports", "modnet,lpips_alex", "--compare", fix)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert r2.stdout.count("matches recorded fixture") == 2


def test_drill_fails_on_bad_checkpoint(tmp_path):
    weights = str(tmp_path)
    sd = _write_modnet(weights)
    # inject an extra tensor the loader neither consumes nor documents —
    # the key-audit class of bug random-weight fixtures cannot catch
    k0 = next(iter(sd))
    sd["module.mystery_branch.conv.weight"] = sd[k0].clone()
    torch.save(sd, os.path.join(weights,
                                "modnet_webcam_portrait_matting.ckpt"))
    r = _run(weights, "--ports", "modnet")
    assert r.returncode == 1
    assert "[FAIL] modnet" in r.stdout
