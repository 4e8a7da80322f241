"""Inference-side loading + cross-identity reenactment.

Equivalent of train/loader.py:30-227 (Loader / Reenactor): rebuild a trained
avatar from its workspace (checkpoint + identity_info.json) without the
training dataset, and drive it with another subject's FLAME sequences.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    fateavatar_forward,
)
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.checkpoints import CheckpointManager
from fateavatar_tpu.utils.logging import write_video


class Loader:
    """Restore (params, state) of a trained avatar from a workspace."""

    def __init__(self, model: FateAvatarModel, params_template, state_template,
                 workspace: str, render_cfg: RenderConfig = RenderConfig()):
        self.model = model
        self.workspace = workspace
        self.render_cfg = render_cfg
        from fateavatar_tpu.train.optim import fateavatar_optimizers
        from fateavatar_tpu.train.step import init_train_state

        ckpt = CheckpointManager(os.path.join(workspace, "checkpoints"))
        opt = fateavatar_optimizers({})
        ts = init_train_state(params_template, state_template, opt)
        tree = {"ts": ts, "epoch": 0, "global_step": 0}
        self.tables = None   # TrackingTables when the run refined tracking
        try:
            restored = ckpt.restore(tree)
            self.params = restored["ts"].params
            self.state = restored["ts"].state
            self.epoch = int(restored["epoch"])
        except Exception:
            # tracking-enabled checkpoints carry extra keys the template
            # doesn't know about; restore raw and rebuild by field name
            import orbax.checkpoint as ocp

            step = ckpt.manager.latest_step()
            raw = ckpt.manager.restore(step, args=ocp.args.StandardRestore())
            ts_raw = raw["ts"]
            self.params = params_template.replace(**{
                k: jnp.asarray(v) for k, v in ts_raw["params"].items()
            })
            self.state = state_template.replace(**{
                k: jnp.asarray(v) for k, v in ts_raw["state"].items()
            })
            self.epoch = int(raw["epoch"])
            if "train_tables" in raw:
                from fateavatar_tpu.train.tracking import TrackingTables

                self.tables = TrackingTables(**{
                    k: jnp.asarray(v) for k, v in raw["train_tables"].items()
                })
        ckpt.close()

    def render_frame(self, expression, flame_pose, camera):
        return fateavatar_forward(
            self.model, self.params, self.state,
            jnp.asarray(expression, jnp.float32),
            jnp.asarray(flame_pose, jnp.float32),
            camera, render_cfg=self.render_cfg,
        )["rgb_image"]


class Reenactor(Loader):
    """Cross-identity reenactment (train/loader.py:140-227 +
    avatar_reenact.py:85-88): drive the destination avatar with the source
    sequence's expressions, shifted by the canonical-expression delta."""

    def reenact(
        self,
        src_expressions: np.ndarray,   # [F, n_exp] source sequence
        src_poses: np.ndarray,         # [F, 15]
        delta_exp: Optional[np.ndarray],  # src_canonical - dst_mean (or None)
        camera,
        out_path: Optional[str] = None,
        fps: int = 25,
    ):
        n_exp = self.model.flame.n_exp
        # render returns uint8 (4x smaller device->host fetch — on a slow
        # link the download, not the render, bounds video throughput) and
        # dispatches stay ahead of batched fetches
        fwd = jax.jit(lambda e, p: jnp.clip(jnp.round(fateavatar_forward(
            self.model, self.params, self.state, e, p, camera,
            render_cfg=self.render_cfg,
        )["rgb_image"] * 255.0), 0, 255).astype(jnp.uint8))

        frames: list = []
        pending: list = []

        def drain():
            if not pending:
                return
            # ONE stacked fetch: per-array device_get pays a full transfer
            # round trip each (measured ~3 MB/s through the remote-TPU
            # tunnel vs ~48 MB/s for one large array) — stack on device,
            # fetch once, unstack on host
            batch = np.asarray(jnp.stack(pending))
            frames.extend(batch[i] for i in range(batch.shape[0]))
            pending.clear()

        for expr, pose in zip(src_expressions, src_poses):
            e = np.zeros(n_exp, np.float32)
            m = min(n_exp, len(expr))
            e[:m] = expr[:m]
            if delta_exp is not None:
                e[: len(delta_exp)] -= np.asarray(delta_exp, np.float32)[: len(e)]
            pending.append(fwd(e, np.asarray(pose, np.float32)))
            if len(pending) >= 8:
                drain()
        drain()
        if out_path is not None:
            write_video(out_path, frames, fps=fps)
        return frames
