"""The chip fidelity protocol as a pytest (VERDICT r4 item 8): run
``scripts/validate_tpu_training.run_validation`` — the SAME code path the
on-chip 512^2 validation artifact uses (Trainer loop, maintenance,
scan-epoch mode, per-epoch diagnostics) — on CPU at reduced shape and
assert the PSNR trend, so a quality regression in the full training stack
is caught by ``pytest`` rather than by remembering to run a script.

Complements, not replaces, the 48^2 bare-step test
(tests/test_reconstruction.py): this one goes through the Trainer
(prefetch, frame cache, scan epochs, densify/prune cadence knobs).

Shape notes (1-core CPU host): 128^2/2k splats runs in ~100 s — the
256^2 compile alone exceeds 9 minutes on this host, so the production
512^2 variant is env-gated (FATEAVATAR_FULL_VALIDATION=1) for chip or
multi-core hosts; the driver-run chip artifact (VALIDATION_r<N>.json)
executes the identical entry point at 512^2/70k every round."""

import os

import pytest

from scripts.validate_tpu_training import run_validation


def test_validation_protocol_psnr_trend():
    art = run_validation(
        epochs=3, frames=3, res=128, tex=32, capacity=2048,
        densify=4, prune=6, reset=10**9, increase_num=128,
        write_artifact=False,
    )
    curve = art["curve"]
    assert len(curve) == 3
    psnrs = [e["psnr"] for e in curve]
    losses = [e["loss"] for e in curve]
    # reconstruction trend: monotone improvement start -> end (the two
    # measured runs give 16.1 -> 16.8 -> 17.2-ish; margin guards noise)
    assert psnrs[-1] > psnrs[0] + 0.3, psnrs
    assert losses[-1] < losses[0], losses
    # epoch 1 is per-step (populates the frame cache), epoch 2+ scan
    assert curve[0]["mode"] == "per-step"
    assert curve[-1]["mode"] == "scan"
    # maintenance fired (densify every 4 steps, 3-frame epochs)
    assert curve[-1]["alive"] > curve[0]["alive"]
    # diagnostics are present for scan epochs (collapse localization)
    assert "loss_step_max_jump" in curve[-1]
    assert "scale_p99" in curve[-1] and curve[-1]["scale_p99"] < 1.0


def test_bake_gate_smoke():
    """The baked-fidelity gate as a pytest (VERDICT r5 item 8): UVBaker ->
    render_from_texture_dict -> PSNR floor at tiny shape, band-limited GT
    (reference behavior train/baker.py:120-191, model/uv_decoder.py:564-690).

    The floor is scaled to the shape: a 32^2 texture over ~1k alive splats
    after a 60-step bake reproduces the splat render only coarsely, but a
    BROKEN baker (exporter mismatch, texture orientation flip, dead
    attribute wiring) lands far below reconstruction-level PSNR — the
    r2-r4 history shows broken-vs-working separates by >6 dB."""
    art = run_validation(
        epochs=2, frames=4, res=128, tex=32, capacity=2048,
        densify=10**9, prune=10**9, reset=10**9,
        bake_epochs=15, bake_poses=3,
        write_artifact=False,
    )
    bake = art["bake"]
    assert bake["convergence"], bake
    # the curve must actually improve over the bake
    first, last = bake["convergence"][0], bake["convergence"][-1]
    assert last["baked_psnr"] >= first["baked_psnr"] - 0.5, bake
    assert bake["baked_psnr"] > 15.0, bake
    # exporter parity: the texture-export render must track the
    # net-forward render (a large gap means the exporter loses quality)
    assert bake["baked_psnr"] > bake["net_psnr"] - 3.0, bake


@pytest.mark.skipif(
    os.environ.get("FATEAVATAR_FULL_VALIDATION") != "1",
    reason="512^2 production shape needs the chip or a multi-core host "
           "(set FATEAVATAR_FULL_VALIDATION=1)",
)
def test_validation_protocol_full_512():
    art = run_validation(epochs=3, frames=20, write_artifact=False)
    assert art["best_psnr"] > 20.0, art["curve"]
