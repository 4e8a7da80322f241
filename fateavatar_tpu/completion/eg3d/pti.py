"""Pivotal Tuning Inversion (PTI) for the JAX EG3D generator.

TPU-native re-design of tools/eg3d_utils/pti.py:29-362:

  * :func:`compute_w_stats`   — W midpoint/stddev from z samples
                                (pti.py:67-79, 10k samples through mapping)
  * :func:`project_w`         — stage 1: optimize a single w (broadcast to
                                num_ws) against the multi-view target crops
                                with MSE + VGG16-perceptual + w-norm losses
                                and a ramped learning rate (pti.py:107-248)
  * :func:`pti_finetune`      — stage 2: freeze w, fine-tune the generator
                                weights on the same targets (pti.py:249-362)

Differences from the reference, by design:
  * both stages are single jitted update steps driven by `lax`-friendly
    Python loops (each step is one XLA program; all views live on device),
  * the noise-buffer regularization is dropped (noise is disabled during
    inversion — deterministic renders suit the avatar-completion use),
  * the perceptual term uses the repo's own JAX VGG16
    (fateavatar_tpu/train/losses.py) when weights are supplied, else it
    falls back to a multi-scale L1 pyramid so the pipeline runs weight-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fateavatar_tpu.completion.eg3d.networks import (
    EG3DConfig, Params, mapping_network, synthesis,
)
from fateavatar_tpu.train.losses import vgg16_features


@dataclass(frozen=True)
class PTIConfig:
    w_steps: int = 200                  # train/completion.py:70 (200 W-steps)
    pti_steps: int = 200                # train/completion.py:71
    w_avg_samples: int = 1024
    w_lr: float = 0.01                  # pti.py:37 initial_learning_rate
    pti_lr: float = 3e-4                # pti.py:262
    lr_rampdown: float = 0.25           # pti.py:39
    lr_rampup: float = 0.05             # pti.py:40
    lambda_mse: float = 0.1             # pti.py:43
    lambda_perc: float = 1.0            # pti.py:44
    lambda_w_norm: float = 1.0          # pti.py:45
    truncation_psi: float = 1.0


def compute_w_stats(p: Params, cfg: EG3DConfig, key, frontal_label: jax.Array,
                    n_samples: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """W midpoint and stddev over z~N(0,1) at the frontal camera
    (pti.py:67-79). Returns (w_avg [w_dim], w_std scalar)."""
    z = jax.random.normal(key, (n_samples, cfg.z_dim))
    c = jnp.broadcast_to(frontal_label, (n_samples, cfg.c_dim))

    @jax.jit
    def run(z, c):
        ws = mapping_network(p, cfg, z, c)
        w0 = ws[:, 0, :]
        w_avg = jnp.mean(w0, axis=0)
        w_std = jnp.sqrt(jnp.sum(jnp.square(w0 - w_avg)) / n_samples)
        return w_avg, w_std

    return run(z, c)


def _perceptual(vgg_params, pred, gt):
    """VGG16 feature L2 on 256-res images in [0,255] (pti.py:159-169), or a
    weight-free multi-scale L1 pyramid fallback."""
    if vgg_params is not None:
        fp = vgg16_features(vgg_params, pred / 255.0)
        fg = vgg16_features(vgg_params, gt / 255.0)
        return sum(jnp.mean(jnp.square(a - b)) for a, b in zip(fp, fg))
    loss, a, b = 0.0, pred, gt
    for _ in range(4):
        loss = loss + jnp.mean(jnp.abs(a - b))
        a = jax.image.resize(a, (a.shape[0], a.shape[1] // 2, a.shape[2] // 2,
                                 a.shape[3]), "linear")
        b = jax.image.resize(b, (b.shape[0], b.shape[1] // 2, b.shape[2] // 2,
                                 b.shape[3]), "linear")
    return loss / 4.0


def _inversion_loss(p, cfg, pti_cfg, w_broadcast, targets, labels,
                    w_ref, vgg_params):
    """Shared loss over all target views. targets [V,H,W,3] in [-1,1]."""
    out = synthesis(p, cfg, w_broadcast, labels)
    pred = out["image"]
    mse = jnp.mean(jnp.square(pred - targets))
    # perceptual on 255-scaled (pti.py renders to [0,255])
    perc = _perceptual(vgg_params, (pred * 0.5 + 0.5) * 255.0,
                       (targets * 0.5 + 0.5) * 255.0)
    w_norm = jnp.mean(jnp.square(w_broadcast[:, 0] - w_ref))
    return (pti_cfg.lambda_mse * mse + pti_cfg.lambda_perc * perc
            + pti_cfg.lambda_w_norm * w_norm), {"mse": mse, "perc": perc}


def _w_lr_schedule(pti_cfg: PTIConfig, step: int) -> float:
    """pti.py:178-183 ramped cosine schedule."""
    t = step / max(pti_cfg.w_steps, 1)
    lr_ramp = min(1.0, (1.0 - t) / pti_cfg.lr_rampdown)
    lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
    lr_ramp = lr_ramp * min(1.0, t / pti_cfg.lr_rampup)
    return pti_cfg.w_lr * lr_ramp


def project_w(p: Params, cfg: EG3DConfig, pti_cfg: PTIConfig,
              targets: jax.Array, labels: jax.Array, key,
              vgg_params=None, log_fn=None) -> jax.Array:
    """Stage 1: optimize a single pivot w against V target views.

    targets [V,H,W,3] in [-1,1] at cfg.sr_resolution; labels [V,25].
    Returns ws [1,num_ws,w_dim]."""
    w_avg, w_std = compute_w_stats(p, cfg, key, labels[0],
                                   pti_cfg.w_avg_samples)
    w = w_avg[None, :]                                   # [1,w_dim]
    opt = optax.adam(1.0, b1=0.9, b2=0.999)              # lr applied via scale
    opt_state = opt.init(w)

    @jax.jit
    def step_fn(w, opt_state, lr):
        def loss_fn(w_):
            wb = jnp.repeat(w_[:, None, :], cfg.num_ws, axis=1)
            return _inversion_loss(p, cfg, pti_cfg, wb, targets, labels,
                                   w_avg, vgg_params)
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(w)
        updates, opt_state = opt.update(g, opt_state)
        w = w + lr * updates            # adam(1.0) scaled by the ramped lr
        return w, opt_state, loss, aux

    for i in range(pti_cfg.w_steps):
        lr = _w_lr_schedule(pti_cfg, i)
        w, opt_state, loss, aux = step_fn(w, opt_state, lr)
        if log_fn and (i % 50 == 0 or i == pti_cfg.w_steps - 1):
            log_fn(f"[pti:W] step {i} loss {float(loss):.4f} "
                   f"mse {float(aux['mse']):.3e}")
    return jnp.repeat(w[:, None, :], cfg.num_ws, axis=1)


def pti_finetune(p: Params, cfg: EG3DConfig, pti_cfg: PTIConfig,
                 ws: jax.Array, targets: jax.Array, labels: jax.Array,
                 vgg_params=None, log_fn=None) -> Params:
    """Stage 2: generator fine-tune at the fixed pivot ws (pti.py:249-362).
    Returns the tuned parameter dict (input dict left untouched)."""
    trainable = {k: v for k, v in p.items()
                 if k.startswith(("backbone.synthesis", "superresolution",
                                  "decoder")) and "noise_const" not in k}
    frozen = {k: v for k, v in p.items() if k not in trainable}
    opt = optax.adam(pti_cfg.pti_lr)
    opt_state = opt.init(trainable)

    @jax.jit
    def step_fn(trainable, opt_state):
        def loss_fn(tr):
            full = {**frozen, **tr}
            return _inversion_loss(full, cfg, pti_cfg, ws, targets, labels,
                                   ws[0, 0], vgg_params)
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = opt.update(g, opt_state)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss, aux

    for i in range(pti_cfg.pti_steps):
        trainable, opt_state, loss, aux = step_fn(trainable, opt_state)
        if log_fn and (i % 50 == 0 or i == pti_cfg.pti_steps - 1):
            log_fn(f"[pti:G] step {i} loss {float(loss):.4f} "
                   f"mse {float(aux['mse']):.3e}")
    return {**frozen, **trainable}
