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


@pytest.mark.skipif(
    os.environ.get("FATEAVATAR_FULL_VALIDATION") != "1",
    reason="512^2 production shape needs the chip or a multi-core host "
           "(set FATEAVATAR_FULL_VALIDATION=1)",
)
def test_validation_protocol_full_512():
    art = run_validation(epochs=3, frames=20, write_artifact=False)
    assert art["best_psnr"] > 20.0, art["curve"]
