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
    """LPIPS meter. Needs calibrated network weights; in their absence the
    meter records NaN and ``available`` is False (zero-egress environments
    cannot fetch the published weights — supply them via ``weights_path``)."""

    def __init__(self, net: str = "alex", weights_path: Optional[str] = None):
        super().__init__("LPIPS")
        self.available = False
        self._fn = None
        if weights_path is not None:
            try:
                import lpips  # noqa: F401  (only if the user installed it)
                import torch

                self._fn = lpips.LPIPS(net=net, model_path=weights_path).eval()
                self.available = True
            except Exception:
                self.available = False

    def update(self, preds, truths):
        if not self.available:
            self.V_cur = float("nan")
            return
        import torch

        p = torch.from_numpy(np.asarray(preds)).permute(2, 0, 1)[None].float()
        t = torch.from_numpy(np.asarray(truths)).permute(2, 0, 1)[None].float()
        with torch.no_grad():
            v = self._fn(t, p, normalize=True).item()
        super().update(v)


def default_meters() -> dict:
    return {
        "psnr": PSNRMeter(),
        "ssim": SSIMMeter(),
        "l1": L1Meter(),
        "l2": L2Meter(),
        "lpips": LPIPSMeter(),
    }
