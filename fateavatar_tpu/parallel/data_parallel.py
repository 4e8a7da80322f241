"""Multi-chip scaling via jax.sharding — a NEW capability of this framework.

The reference is strictly single-process / single-GPU (SURVEY.md §2.2: no
torch.distributed anywhere). Here, training scales data-parallel over a TPU
``Mesh``: a batch of frames is sharded over the ``data`` axis (one frame per
chip at reference batch semantics), splat state and FLAME deltas are
replicated, and XLA inserts the psum gradient reduction over ICI
automatically from the sharding annotations — no NCCL-style code.

Gaussian-sharded rendering (splitting N_splats over chips for >1M splat
scenes) is the planned second axis; the binning/blend pipeline is already
shape-static which makes ``shard_map`` over the splat axis mechanical.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fateavatar_tpu.models import maintenance
from fateavatar_tpu.models.fateavatar import FateAvatarModel, fateavatar_forward
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.optim import MultiAdam, apply_updates, zero_moment_rows
from fateavatar_tpu.train.step import (
    Frame,
    MaintenanceConfig,
    TrainState,
)


def make_device_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_frames(frames: Frame, mesh: Mesh):
    """Place a batched Frame (leading dim B == mesh size) with the batch axis
    split over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(frames, sharding)


def stack_frames(frame_list) -> Frame:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frame_list)


def make_dp_train_step(
    model: FateAvatarModel,
    loss_fn,
    optimizer: MultiAdam,
    mesh: Mesh,
    maint: MaintenanceConfig = MaintenanceConfig(),
    render_cfg: RenderConfig = RenderConfig(),
    enable_maintenance: bool = True,
):
    """Data-parallel training step: (TrainState, batched Frame[B]) ->
    (TrainState, aux). B frames render in parallel (one per chip), the loss
    is the mean over frames, gradients all-reduce over ICI via the sharding
    annotations. Densify/prune run once on the replicated state so replicas
    stay bit-identical."""

    def batched_loss(params, probe, state, frames: Frame):
        def one(frame: Frame, probe_row):
            out = fateavatar_forward(
                model, params, state,
                frame.expression, frame.flame_pose, frame.camera,
                bg_color=frame.bg_color, render_cfg=render_cfg,
                means2d_probe=probe_row,
            )
            losses = loss_fn(out, {"rgb": frame.rgb})
            aux = {
                "loss": losses["loss"],
                "visibility": out["visibility_filter"],
                "radii": out["radii"],
                "overflow": out["overflow"],
            }
            return losses["loss"], aux

        losses, aux = jax.vmap(one)(frames, probe)
        return jnp.mean(losses), aux

    grad_fn = jax.grad(batched_loss, argnums=(0, 1), has_aux=True)

    def step_fn(ts: TrainState, frames: Frame):
        B = frames.rgb.shape[0]
        probe = jnp.zeros((B, 2, ts.params.offset.shape[0]), jnp.float32)
        (grads, probe_grad), aux = grad_fn(ts.params, probe, ts.state, frames)

        # densification stats: accumulate over every frame in the batch
        state = ts.state
        gnorm = jnp.linalg.norm(probe_grad, axis=1)            # [B, N]
        vis = aux["visibility"] & state.alive[None, :]         # [B, N]
        state = state.replace(
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.sum(jnp.where(vis, gnorm, 0.0), axis=0),
            denom=state.denom + jnp.sum(vis.astype(jnp.float32), axis=0),
            max_radii2d=jnp.maximum(
                state.max_radii2d,
                jnp.max(jnp.where(vis, aux["radii"].astype(jnp.float32), 0.0), axis=0),
            ),
        )

        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        step = ts.step + 1
        key = ts.key

        if enable_maintenance:
            num_alive = jnp.sum(state.alive)
            do_densify = (
                (step % maint.densify_interval == 0)
                & (num_alive + maint.increase_num <= maint.max_points_num)
            )
            key, sub = jax.random.split(key)

            def densify_branch(args):
                p, s, o = args
                p2, s2, touched = maintenance.uv_densify(
                    sub, p, s, increase_num=maint.increase_num
                )
                return p2, s2, zero_moment_rows(o, touched, maintenance.SPLAT_FIELDS)

            params, state, opt_state = jax.lax.cond(
                do_densify, densify_branch, lambda a: a, (params, state, opt_state)
            )
            params, state = jax.lax.cond(
                step % maint.prune_interval == 0,
                lambda a: (a[0], maintenance.prune_low_opacity(a[0], a[1], maint.min_opacity)),
                lambda a: a, (params, state),
            )

        new_ts = TrainState(params=params, state=state, opt_state=opt_state,
                            step=step, key=key)
        out_aux = {
            "loss": jnp.mean(aux["loss"]),
            "num_alive": jnp.sum(state.alive),
            "overflow": jnp.sum(aux["overflow"]),
        }
        return new_ts, out_aux

    # Shardings are carried by the inputs (caller places TrainState
    # replicated and frames split over 'data'); XLA propagates them and
    # inserts the ICI psum for the gradient reduction.
    return jax.jit(step_fn, donate_argnums=(0,))
