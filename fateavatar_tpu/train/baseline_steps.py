"""Per-model training steps for the baseline avatars.

Equivalent of train/iteration.py:93-302 + train/optim.py:41-123: each
baseline gets a fused jitted step (forward, loss, backward, optimizers,
interval-gated maintenance) sharing the same TrainState shape so the
Trainer drives all five model families uniformly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from fateavatar_tpu.models.baselines import gaussianavatars as GA
from fateavatar_tpu.models.baselines import flashavatar as FA
from fateavatar_tpu.models.baselines import monogaussianavatar as MA
from fateavatar_tpu.models.baselines import splattingavatar as SA
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.optim import (
    MultiAdam,
    apply_updates,
    zero_moment_field,
    zero_moment_rows,
)
from fateavatar_tpu.train.step import Frame
from fateavatar_tpu.train.losses import as_float_rgb


@struct.dataclass
class BaselineTrainState:
    params: Any
    state: Any
    opt_state: Any
    step: jax.Array
    key: jax.Array


def _init_ts(params, state, optimizer, seed=0):
    params = jax.tree.map(jnp.array, params)
    state = jax.tree.map(jnp.array, state)
    return BaselineTrainState(
        params=params, state=state, opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32), key=jax.random.PRNGKey(seed),
    )



def _jit_with_raw(step_fn):
    """Jit the step and keep the unjitted body reachable (``.raw``) so the
    Trainer's scan-epoch mode can embed it in a per-epoch lax.scan."""
    jitted = jax.jit(step_fn, donate_argnums=(0,))

    def step(ts, frame):
        return jitted(ts, frame)

    step.raw = step_fn
    return step


# ---------------------------------------------------------------------------
# GaussianAvatars (train/iteration.py:128-199)
# ---------------------------------------------------------------------------

def gaussianavatars_optimizer(training_cfg: dict) -> MultiAdam:
    return MultiAdam(lr_tree=dict(
        xyz=training_cfg.get("position_lr_init", 0.005),
        opacity=training_cfg.get("opacity_lr", 0.05),
        features_dc=training_cfg.get("feature_dc_lr", 0.0025),
        features_rest=training_cfg.get("feature_dc_lr", 0.0025) / 20,
        rotation=training_cfg.get("rotation_lr", 0.001),
        scaling=training_cfg.get("scaling_lr", 0.017),
    ))


def make_gaussianavatars_step(
    model: GA.GAModel, loss_fn, optimizer: MultiAdam,
    render_cfg: RenderConfig = RenderConfig(),
    active_sh_degree: int = 0,
    densify_interval: int = 2000,
    densify_from: int = 10000,
    densify_until: int = 600_000,
    densify_grad_threshold: float = 0.0001,
    min_opacity: float = 0.005,
    extent: float = 2.0,
    size_threshold: float = 20.0,
    opacity_reset_interval: int = 60000,
    xyz_lr_schedule: Optional[Callable] = None,
    densify_budget: int = 8192,
):
    """active_sh_degree is STATIC: the host trainer bumps it every 1000
    steps (train/iteration.py:185-187) and rebuilds this step (4 recompiles
    over a run)."""

    def one_frame(params, probe, state, frame: Frame):
        out = GA.ga_forward(
            model, params, state, frame.expression, frame.flame_pose,
            frame.camera, active_sh_degree=active_sh_degree,
            bg_color=frame.bg_color, render_cfg=render_cfg,
            means2d_probe=probe,
        )
        losses = loss_fn(out, {"rgb": frame.rgb})
        aux = {"visibility_filter": out["visibility_filter"],
               "radii": out["radii"], "rgb_image": out["rgb_image"],
               "overflow": out.get("overflow", jnp.int32(0))}
        return losses["loss"], (aux, losses)

    def loss_and_out(params, probe, state, frame: Frame):
        if frame.rgb.ndim == 4:       # batched / data-parallel frames
            losses_b, aux_b = {}, {}

            def body(f, pr):
                _, (aux, losses) = one_frame(params, pr, state, f)
                return aux, losses

            aux_b, losses_b = jax.vmap(body)(frame, probe)
            losses = jax.tree.map(jnp.mean, losses_b)
            return losses["loss"], (aux_b, losses)
        return one_frame(params, probe, state, frame)

    grad_fn = jax.grad(loss_and_out, argnums=(0, 1), has_aux=True)

    def step_fn(ts: BaselineTrainState, frame: Frame):
        n = ts.params.xyz.shape[0]
        batched = frame.rgb.ndim == 4
        if batched:
            probe = jnp.zeros((frame.rgb.shape[0], 2, n), jnp.float32)
        else:
            probe = jnp.zeros((2, n), jnp.float32)
        (grads, probe_grad), (out, losses) = grad_fn(
            ts.params, probe, ts.state, frame
        )
        state = ts.state
        # NDC-scaled densification stats, matching the CUDA convention that
        # the 0.0002 grad threshold was tuned for (mean2D grads are in NDC
        # half-units there: ddelx_dx = 0.5 W, backward.cu:399+)
        w = frame.camera.width
        if batched:
            # the batched loss is the MEAN over B frames, so each frame's
            # probe gradient is 1/B of its single-frame value; rescale so
            # the accumulated stats stay comparable with the absolute
            # densify_grad_threshold (tuned for per-frame grads)
            B = frame.rgb.shape[0]
            gnorm = jnp.linalg.norm(probe_grad, axis=1) * (2.0 / w) * B
            vis = out["visibility_filter"] & state.alive[None, :]
            state = state.replace(
                xyz_gradient_accum=state.xyz_gradient_accum
                + jnp.sum(jnp.where(vis, gnorm, 0.0), axis=0),
                denom=state.denom + jnp.sum(vis.astype(jnp.float32), axis=0),
                max_radii2d=jnp.maximum(
                    state.max_radii2d,
                    jnp.max(jnp.where(
                        vis, out["radii"].astype(jnp.float32), 0.0), axis=0),
                ),
            )
        else:
            gnorm = jnp.linalg.norm(probe_grad, axis=0) * (2.0 / w)
            vis = out["visibility_filter"] & state.alive
            state = state.replace(
                xyz_gradient_accum=state.xyz_gradient_accum
                + jnp.where(vis, gnorm, 0.0),
                denom=state.denom + jnp.where(vis, 1.0, 0.0),
                max_radii2d=jnp.where(
                    vis,
                    jnp.maximum(state.max_radii2d,
                                out["radii"].astype(jnp.float32)),
                    state.max_radii2d,
                ),
            )

        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        if xyz_lr_schedule is not None:
            # per-step lr for xyz: rescale that leaf's update
            scale = xyz_lr_schedule(ts.step) / jnp.maximum(
                optimizer.lr_tree["xyz"], 1e-12
            )
            updates = updates.replace(xyz=updates.xyz * scale)
        params = apply_updates(ts.params, updates)
        step = ts.step + 1
        key = ts.key

        do_densify = (
            (step % densify_interval == 0) & (step >= densify_from)
            & (step < densify_until)
        )
        key, sub = jax.random.split(key)

        def densify_branch(args):
            p, s, o = args
            use_size = step > opacity_reset_interval
            p2, s2, touched = GA.densify_and_prune(
                sub, p, s, densify_grad_threshold, min_opacity, extent,
                max_screen_size=jnp.where(use_size, size_threshold, jnp.inf),
                budget=densify_budget, percent_dense=model.cfg.percent_dense,
            )
            o2 = zero_moment_rows(
                o, touched,
                ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity"),
            )
            return p2, s2, o2

        params, state, opt_state = jax.lax.cond(
            do_densify, densify_branch, lambda a: a, (params, state, opt_state)
        )

        def reset_branch(args):
            p, o = args
            return GA.reset_opacity(p), zero_moment_field(o, "opacity")

        params, opt_state = jax.lax.cond(
            (opacity_reset_interval > 0) & (step % opacity_reset_interval == 0),
            reset_branch, lambda a: a, (params, opt_state),
        )

        new_ts = BaselineTrainState(params=params, state=state,
                                    opt_state=opt_state, step=step, key=key)
        aux = dict(losses)
        aux["num_alive"] = jnp.sum(state.alive)
        aux["psnr"] = -10.0 * jnp.log10(jnp.mean((out["rgb_image"] - as_float_rgb(frame.rgb)) ** 2))
        aux["overflow"] = jnp.sum(out["overflow"])
        return new_ts, aux

    return _jit_with_raw(step_fn)


# ---------------------------------------------------------------------------
# FlashAvatar (train/iteration.py:93-124: plain step, two optimizers)
# ---------------------------------------------------------------------------

def flashavatar_optimizer(training_cfg: dict) -> MultiAdam:
    return MultiAdam(lr_tree=dict(
        opacity=training_cfg.get("opacity_lr", 0.05),
        features_dc=training_cfg.get("feature_dc_lr", 0.0025),
        features_rest=training_cfg.get("feature_dc_lr", 0.0025) / 20,
        rotation=training_cfg.get("rotation_lr", 0.001),
        scaling=training_cfg.get("scaling_lr", 0.005),
        deformer=training_cfg.get("deformer_lr", 1e-4),
    ))


def make_flashavatar_step(model, net, loss_fn, optimizer: MultiAdam,
                          render_cfg: RenderConfig = RenderConfig()):
    def loss_one(params, frame: Frame):
        out = FA.flash_forward(
            model, params, net, frame.expression, frame.flame_pose,
            frame.camera, bg_color=frame.bg_color, render_cfg=render_cfg,
        )
        gt = {"rgb": frame.rgb}
        losses = loss_fn(out, gt)
        losses = dict(losses)
        losses["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out["rgb_image"] - as_float_rgb(frame.rgb)) ** 2))
        return losses["loss"], losses

    def loss_of(params, frame: Frame):
        # batched Frame (leading B, e.g. sharded over a DP mesh): mean loss,
        # XLA inserts the gradient psum from the input shardings
        if frame.rgb.ndim == 4:
            losses = jax.vmap(lambda f: loss_one(params, f)[1])(frame)
            losses = jax.tree.map(jnp.mean, losses)
            return losses["loss"], losses
        return loss_one(params, frame)

    grad_fn = jax.grad(loss_of, has_aux=True)

    def step_fn(ts: BaselineTrainState, frame: Frame):
        grads, losses = grad_fn(ts.params, frame)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        new_ts = BaselineTrainState(
            params=params, state=ts.state, opt_state=opt_state,
            step=ts.step + 1, key=ts.key,
        )
        return new_ts, dict(losses)

    return _jit_with_raw(step_fn)


# ---------------------------------------------------------------------------
# SplattingAvatar (train/iteration.py:241-302: step + periodic walk + densify)
# ---------------------------------------------------------------------------

def splattingavatar_optimizer(training_cfg: dict) -> MultiAdam:
    return MultiAdam(lr_tree=dict(
        uvd=training_cfg.get("uvd_lr", 0.005),
        opacity=training_cfg.get("opacity_lr", 0.05),
        features_dc=training_cfg.get("feature_dc_lr", 0.0025),
        features_rest=training_cfg.get("feature_dc_lr", 0.0025) / 20,
        rotation=training_cfg.get("rotation_lr", 0.001),
        scaling=training_cfg.get("scaling_lr", 0.005),
    ))


def make_splattingavatar_step(model, loss_fn, optimizer: MultiAdam,
                              render_cfg: RenderConfig = RenderConfig(),
                              triangle_walk_interval: int = 100):
    def loss_one(params, state, frame: Frame):
        out = SA.splat_forward(
            model, params, state, frame.expression, frame.flame_pose,
            frame.camera, bg_color=frame.bg_color, render_cfg=render_cfg,
        )
        losses = loss_fn(out, {"rgb": frame.rgb})
        losses = dict(losses)
        losses["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out["rgb_image"] - as_float_rgb(frame.rgb)) ** 2))
        return losses["loss"], losses

    def loss_of(params, state, frame: Frame):
        if frame.rgb.ndim == 4:       # batched / data-parallel frames
            losses = jax.vmap(lambda f: loss_one(params, state, f)[1])(frame)
            losses = jax.tree.map(jnp.mean, losses)
            return losses["loss"], losses
        return loss_one(params, state, frame)

    grad_fn = jax.grad(loss_of, has_aux=True)

    def step_fn(ts: BaselineTrainState, frame: Frame):
        grads, losses = grad_fn(ts.params, ts.state, frame)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        state = ts.state
        step = ts.step + 1

        def walk_branch(args):
            p, s, o = args
            p2, s2 = SA.walking_on_triangles(model, p, s)
            # zero the uvd.xy Adam moments (splattingavatar.py:685-695)
            mu = o.mu.replace(uvd=o.mu.uvd.at[:, :2].set(0.0))
            nu = o.nu.replace(uvd=o.nu.uvd.at[:, :2].set(0.0))
            return p2, s2, o.replace(mu=mu, nu=nu)

        params, state, opt_state = jax.lax.cond(
            step % triangle_walk_interval == 0,
            walk_branch, lambda a: a, (params, state, opt_state),
        )

        new_ts = BaselineTrainState(params=params, state=state,
                                    opt_state=opt_state, step=step, key=ts.key)
        return new_ts, dict(losses)

    return _jit_with_raw(step_fn)


# ---------------------------------------------------------------------------
# MonoGaussianAvatar (train/iteration.py:203-237: plain Adam over everything;
# epoch-level prune/upsample handled by the host trainer)
# ---------------------------------------------------------------------------

def monogaussianavatar_optimizer(training_cfg: dict) -> MultiAdam:
    lr = training_cfg.get("lr", 1e-4)
    return MultiAdam(lr_tree=dict(
        points=lr, geometry=lr, deformer=lr, gaussian=lr, rendering=lr,
    ))


def make_monogaussianavatar_step(model, nets, loss_fn, optimizer: MultiAdam,
                                 render_cfg: RenderConfig = RenderConfig()):
    def loss_one(params, state, frame: Frame):
        out = MA.mono_forward(
            model, params, state, nets, frame.expression, frame.flame_pose,
            frame.camera, bg_color=frame.bg_color, render_cfg=render_cfg,
        )
        losses = loss_fn(out, {"rgb": frame.rgb})
        losses = dict(losses)
        losses["psnr"] = -10.0 * jnp.log10(
            jnp.mean((out["rgb_image"] - as_float_rgb(frame.rgb)) ** 2))
        return losses["loss"], (losses, out["visible_now"])

    def loss_of(params, state, frame: Frame):
        if frame.rgb.ndim == 4:       # batched / data-parallel frames
            losses, vis = jax.vmap(
                lambda f: loss_one(params, state, f)[1])(frame)
            losses = jax.tree.map(jnp.mean, losses)
            return losses["loss"], (losses, jnp.any(vis, axis=0))
        return loss_one(params, state, frame)

    grad_fn = jax.grad(loss_of, has_aux=True)

    def step_fn(ts: BaselineTrainState, frame: Frame):
        grads, (losses, visible_now) = grad_fn(ts.params, ts.state, frame)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        state = ts.state.replace(visible=ts.state.visible | visible_now)
        new_ts = BaselineTrainState(params=params, state=state,
                                    opt_state=opt_state, step=ts.step + 1,
                                    key=ts.key)
        return new_ts, dict(losses)

    return _jit_with_raw(step_fn)


def mono_epoch_maintenance(ts: BaselineTrainState, model, epoch: int,
                           upsample_freq: int = 5):
    """Epoch-level prune + upsample driven by the host
    (train/trainer.py:204-227 + monogaussianavatar.py:430-467)."""
    import numpy as np

    if epoch % upsample_freq != 0:
        return ts
    target = MA.target_points_for_epoch(epoch, model.cfg.max_points)
    noise = float(ts.state.radius) if epoch <= 100 else 0.004
    key, sub = jax.random.split(ts.key)
    params, state, touched = MA.prune_and_upsample(
        sub, ts.params, ts.state, target=target,
        noise_scale=jnp.asarray(noise),
    )
    opt_state = zero_moment_rows(ts.opt_state, touched, ("points",))
    state = state.replace(
        radius=jnp.asarray(MA.radius_decay(epoch, float(ts.state.radius)),
                           jnp.float32)
    )
    return ts.replace(params=params, state=state, opt_state=opt_state, key=key)
