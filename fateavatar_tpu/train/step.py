"""The fully-jitted training step.

One call = forward + loss + backward + per-attribute Adam + densification
statistics + (conditionally) densify / prune / opacity-reset — the entire
body of train/iteration.py:21-89 from the reference, fused into a single XLA
program. Because splat arrays have static capacity (models/maintenance.py),
the periodic maintenance runs under ``lax.cond`` with no shape changes and
no recompilation — the reference's "anti-jit event" (SURVEY.md §3.1) becomes
an ordinary branch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    FateAvatarParams,
    FateAvatarState,
    fateavatar_forward,
)
from fateavatar_tpu.models import maintenance
from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.losses import as_float_rgb
from fateavatar_tpu.train.optim import (
    MultiAdam,
    MultiAdamState,
    apply_updates,
    zero_moment_field,
    zero_moment_rows,
)

SPLAT_FIELDS = maintenance.SPLAT_FIELDS


@struct.dataclass
class Frame:
    """One training sample (the collate output of train/dataset.py:283-319)."""

    expression: jax.Array   # [n_exp]
    flame_pose: jax.Array   # [15]
    camera: Camera
    rgb: jax.Array          # [H, W, 3]
    bg_color: jax.Array     # [3]
    # optional model-to-world similarity [7] (euler_xyz, transl, scale) —
    # the NeRSemble tracking keeps global head pose outside FLAME
    # (benchmark/nersemble/dataset.py:60-93); None for INSTA/IMAvatar
    world_transform: Optional[jax.Array] = None


@struct.dataclass
class TrainState:
    params: FateAvatarParams
    state: FateAvatarState
    opt_state: MultiAdamState
    step: jax.Array          # [] int32
    key: jax.Array


@struct.dataclass
class MaintenanceConfig:
    densify_interval: int = struct.field(pytree_node=False, default=3000)
    prune_interval: int = struct.field(pytree_node=False, default=2000)
    opacity_reset_interval: int = struct.field(pytree_node=False, default=60000)
    increase_num: int = struct.field(pytree_node=False, default=1000)
    min_opacity: float = struct.field(pytree_node=False, default=0.005)
    max_points_num: int = struct.field(pytree_node=False, default=200_000)


def make_train_step(
    model: FateAvatarModel,
    loss_fn: Callable,
    optimizer: MultiAdam,
    maint: MaintenanceConfig = MaintenanceConfig(),
    render_cfg: RenderConfig = RenderConfig(),
    enable_maintenance: bool = True,
    return_raw: bool = False,
):
    """Build the jitted step: (TrainState, Frame) -> (TrainState, aux dict).

    Mirrors iteration_step_fateavatar (train/iteration.py:21-89): forward,
    loss, backward, densify-stats from the screen-space probe gradient, two
    Adam groups (one MultiAdam here), then interval-gated maintenance.
    """

    def loss_and_out(params: FateAvatarParams, probe, state, frame: Frame):
        out = fateavatar_forward(
            model, params, state,
            frame.expression, frame.flame_pose, frame.camera,
            bg_color=frame.bg_color,
            render_cfg=render_cfg,
            means2d_probe=probe,
            world_transform=frame.world_transform,
        )
        losses = loss_fn(out, {"rgb": frame.rgb})
        return losses["loss"], (out, losses)

    grad_fn = jax.grad(loss_and_out, argnums=(0, 1), has_aux=True)

    def step_fn(ts: TrainState, frame: Frame):
        probe = jnp.zeros((2, ts.params.offset.shape[0]), jnp.float32)
        (grads, probe_grad), (out, losses) = grad_fn(
            ts.params, probe, ts.state, frame
        )

        # densification statistics from d(loss)/d(mean2d) — replaces the
        # viewspace_points.grad hook (train/iteration.py:54-57)
        state = maintenance.add_densification_stats(
            ts.state, probe_grad, out["visibility_filter"]
        )
        state = maintenance.update_max_radii(state, out["radii"], out["visibility_filter"])

        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)

        step = ts.step + 1
        key = ts.key

        if enable_maintenance:
            # --- densify (train/iteration.py:63-72) ---
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
                o2 = zero_moment_rows(o, touched, SPLAT_FIELDS)
                return p2, s2, o2

            params, state, opt_state = jax.lax.cond(
                do_densify, densify_branch, lambda a: a,
                (params, state, opt_state),
            )

            # --- prune (train/iteration.py:74-79) ---
            def prune_branch(args):
                p, s = args
                return p, maintenance.prune_low_opacity(p, s, maint.min_opacity)

            params, state = jax.lax.cond(
                step % maint.prune_interval == 0,
                prune_branch, lambda a: a, (params, state),
            )

            # --- opacity reset (train/iteration.py:81-85) ---
            def reset_branch(args):
                p, o = args
                return maintenance.reset_opacity(p), zero_moment_field(o, "opacity")

            params, opt_state = jax.lax.cond(
                step % maint.opacity_reset_interval == 0,
                reset_branch, lambda a: a, (params, opt_state),
            )

        new_ts = TrainState(
            params=params, state=state, opt_state=opt_state, step=step, key=key
        )
        aux = {k: v for k, v in losses.items()}
        aux["num_alive"] = jnp.sum(state.alive)
        aux["overflow"] = out["overflow"]
        aux["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out["rgb_image"] - as_float_rgb(frame.rgb)) ** 2)
        )
        return new_ts, aux

    if return_raw:
        # unjitted body for callers that embed the step in a larger
        # program (the Trainer's scan-epoch mode runs a whole epoch of
        # steps in ONE lax.scan dispatch over device-resident frames)
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,))


def init_train_state(
    params: FateAvatarParams,
    state: FateAvatarState,
    optimizer: MultiAdam,
    seed: int = 0,
) -> TrainState:
    # Copy the inputs: the jitted step donates its TrainState argument, so
    # the state must own its buffers (not alias caller-held arrays).
    params = jax.tree.map(jnp.array, params)
    state = jax.tree.map(jnp.array, state)
    return TrainState(
        params=params,
        state=state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )
