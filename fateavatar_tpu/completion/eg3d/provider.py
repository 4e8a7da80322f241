"""EG3D-backed :class:`PseudoViewProvider` — the real generative stage ⑤/⑥.

Replaces the weight-free MirrorPseudoProvider with the reference's actual
mechanism (train/completion.py:564-707): invert the avatar's frontal renders
into the generator's latent space via PTI, then render the tuned generator
along the full orbit to hallucinate the unseen back of the head.

Angle convention matches the pipeline (completion/pseudo.py): 0 == front,
increasing counter-clockwise; EG3D's LookAtPoseSampler places the frontal
camera at horizontal π/2 (tools/eg3d_utils/pti.py:71), so h = π/2 + angle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.completion.camera_sampler import sample_orbit_pose
from fateavatar_tpu.completion.eg3d.networks import (
    EG3DConfig, Params, eg3d_camera_label, synthesis,
)
from fateavatar_tpu.completion.eg3d.pti import (
    PTIConfig, project_w, pti_finetune,
)


@dataclass
class EG3DProviderConfig:
    front_halfwidth: float = np.pi / 3   # inversion targets: |angle| below this
    max_target_views: int = 8
    radius: float = 2.7                  # EG3D canonical orbit (pti.py:71)
    focal: float = 4.2647                # EG3D intrinsics (pti.py:72)
    truncation_psi: float = 1.0
    seed: int = 0


class EG3DPseudoProvider:
    """PTI inversion + orbit re-render with the JAX EG3D generator."""

    def __init__(self, params: Params, cfg: EG3DConfig,
                 pti_cfg: PTIConfig = PTIConfig(),
                 provider_cfg: EG3DProviderConfig = EG3DProviderConfig(),
                 vgg_params=None, log_fn=None):
        self.params = params
        self.cfg = cfg
        self.pti_cfg = pti_cfg
        self.pcfg = provider_cfg
        self.vgg_params = vgg_params
        self.log_fn = log_fn
        self.tuned_params: Optional[Params] = None
        self.ws: Optional[jax.Array] = None

    # ------------------------------------------------------------------
    def _label(self, angle: float) -> np.ndarray:
        c2w = sample_orbit_pose(np.pi / 2 + angle, np.pi / 2,
                                np.zeros(3), self.pcfg.radius)
        return eg3d_camera_label(c2w, self.pcfg.focal)

    def _resize(self, imgs: np.ndarray, size: int) -> jax.Array:
        x = jnp.asarray(imgs, jnp.float32)
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), "linear")
        return x * 2.0 - 1.0             # [0,1] -> [-1,1]

    # ------------------------------------------------------------------
    def invert(self, crops: np.ndarray, angles: np.ndarray,
               labels: Optional[np.ndarray] = None) -> None:
        """Run both PTI stages on the frontal subset of the input crops.

        ``labels``: per-crop 25-d EG3D camera labels from stage ③
        (alignment.eg3dcamparams — the dataset.json of
        train/completion.py:492-498). Without them the provider falls back
        to its internal orbit assumption."""
        wrapped = (np.asarray(angles) + np.pi) % (2 * np.pi) - np.pi
        order = np.argsort(np.abs(wrapped))
        keep = [i for i in order if abs(wrapped[i]) <= self.pcfg.front_halfwidth]
        keep = keep[: self.pcfg.max_target_views] or [int(order[0])]
        targets = self._resize(crops[keep], self.cfg.sr_resolution)
        if labels is not None:
            labels = jnp.asarray(np.stack([labels[i] for i in keep]))
        else:
            labels = jnp.asarray(np.stack(
                [self._label(wrapped[i]) for i in keep]))
        key = jax.random.PRNGKey(self.pcfg.seed)
        ws = project_w(self.params, self.cfg, self.pti_cfg, targets, labels,
                       key, self.vgg_params, self.log_fn)
        self.ws = ws
        self.tuned_params = pti_finetune(self.params, self.cfg, self.pti_cfg,
                                         ws, targets, labels,
                                         self.vgg_params, self.log_fn)

    def render_orbit(self, angles: np.ndarray, out_size: int) -> np.ndarray:
        assert self.tuned_params is not None, "call invert() first"
        labels = jnp.asarray(np.stack([
            self._label(float((a + np.pi) % (2 * np.pi) - np.pi))
            for a in angles
        ]))
        render = jax.jit(lambda c: synthesis(
            self.tuned_params, self.cfg,
            jnp.repeat(self.ws, 1, axis=0), c[None])["image"][0])
        out = []
        for i in range(labels.shape[0]):
            img = render(labels[i])
            img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
            if img.shape[0] != out_size:
                img = jax.image.resize(img, (out_size, out_size, 3), "linear")
            out.append(np.asarray(img))
        return np.stack(out)

    # ------------------------------------------------------------------
    def generate(self, crops: np.ndarray, angles: np.ndarray,
                 labels: Optional[np.ndarray] = None,
                 out_angles: Optional[np.ndarray] = None) -> np.ndarray:
        """PseudoViewProvider protocol entry (pseudo.py stage ⑤/⑥)."""
        self.invert(crops, angles, labels=labels)
        if out_angles is None:
            out_angles = angles
        return self.render_orbit(np.asarray(out_angles), crops.shape[1])
