"""Streaming evaluation meters (train/metrics.py:9-104 equivalents).

Metric math (PSNR/SSIM/L1/L2) is pure JAX; meters are host-side
accumulators. LPIPS requires pretrained AlexNet/VGG + calibration weights
that cannot be downloaded in a zero-egress environment — the meter exists
and activates automatically when weights are provided (see
:class:`LPIPSMeter`)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.train.losses import d_ssim, psnr as psnr_fn


class Meter:
    """Running average (train/metrics.py:9-35)."""

    def __init__(self, name: str):
        self.name = name
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 1e-6
        self.V_cur = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.V_cur = val
        self.V += val
        self.N += n

    def update_value(self, val: float, n: int = 1):
        """Record an already-computed metric value (the trainer computes
        the image metrics on device and feeds the fetched scalars here)."""
        Meter.update(self, val, n)

    def measure(self) -> float:
        return self.V / self.N

    def report(self) -> str:
        return f"{self.name.ljust(max(len(self.name), 10))} = {self.measure():.8f}"


class LossMeter(Meter):
    def __init__(self, name: Optional[str] = None):
        super().__init__(name or "Loss")


class PSNRMeter(Meter):
    def __init__(self):
        super().__init__("PSNR")

    def update(self, preds, truths):
        super().update(float(psnr_fn(jnp.asarray(preds), jnp.asarray(truths))))


class L1Meter(Meter):
    def __init__(self):
        super().__init__("L1")

    def update(self, preds, truths):
        super().update(float(jnp.mean(jnp.abs(jnp.asarray(preds) - jnp.asarray(truths)))))


class L2Meter(Meter):
    def __init__(self):
        super().__init__("L2")

    def update(self, preds, truths):
        super().update(float(jnp.mean((jnp.asarray(preds) - jnp.asarray(truths)) ** 2)))


class SSIMMeter(Meter):
    def __init__(self):
        super().__init__("SSIM")

    def update(self, preds, truths):
        super().update(1.0 - float(d_ssim(jnp.asarray(preds), jnp.asarray(truths))))


class LPIPSMeter(Meter):
    """Native LPIPS meter (train/metrics.py:65-74, net='alex' default).

    The distance runs fully in JAX (:mod:`fateavatar_tpu.train.lpips`);
    calibrated weights come from ``weights_path`` — a converted ``.npz``, a
    full exported LPIPS state dict, or the official lin-only checkpoint
    plus ``backbone_path`` (torchvision backbone). Without weights the
    meter records NaN and ``available`` is False (zero-egress environments
    cannot fetch the published weights)."""

    def __init__(self, net: str = "alex", weights_path: Optional[str] = None,
                 backbone_path: Optional[str] = None, params=None):
        super().__init__("LPIPS")
        self.available = False
        self._dist = None
        if params is None and weights_path is not None:
            try:
                from fateavatar_tpu.train.lpips import load_lpips_from_torch

                params = load_lpips_from_torch(
                    weights_path, backbone=net, backbone_path=backbone_path)
            except Exception as e:  # weights missing/corrupt: stay disabled
                import warnings

                warnings.warn(f"LPIPS weights failed to load: {e}")
                params = None
        if params is not None:
            import jax

            from fateavatar_tpu.train.lpips import lpips_distance

            self._dist = jax.jit(
                lambda p, t: lpips_distance(params, p, t, normalize=True))
            self.available = True

    def update(self, preds, truths):
        if not self.available:
            self.V_cur = float("nan")
            return
        v = float(self._dist(jnp.asarray(preds, jnp.float32),
                             jnp.asarray(truths, jnp.float32)))
        super().update(v)


def default_meters(lpips_weights_path: Optional[str] = None) -> dict:
    return {
        "psnr": PSNRMeter(),
        "ssim": SSIMMeter(),
        "l1": L1Meter(),
        "l2": L2Meter(),
        "lpips": LPIPSMeter(weights_path=lpips_weights_path),
    }
