"""Gaussian maintenance: densify / prune / opacity-reset under STATIC shapes.

TPU-native replacement for the reference's optimizer-state surgery
(model/fateavatar.py:610-812, volume_rendering/gaussian_model.py:271-416):
instead of concatenating/pruning Parameter tensors and rebuilding
``torch.optim.Adam`` state, all splat arrays live at a fixed capacity with an
``alive`` mask, and every maintenance op is a masked index write that stays
inside jit — no recompiles, no host round-trips.

Moment bookkeeping matches the reference bit-for-bit in effect:
* densify: new slots get ZERO Adam moments (fateavatar.py:644-645),
* prune: surviving slots keep their moments (fateavatar.py:687-688),
* opacity reset: opacity moments zeroed for ALL slots (fateavatar.py:722-724).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    FateAvatarParams,
    FateAvatarState,
)
from fateavatar_tpu.render.splats import inverse_sigmoid

SPLAT_FIELDS = ("offset", "features_dc", "features_rest", "scaling",
                "rotation", "opacity")


def add_densification_stats(
    state: FateAvatarState,
    viewspace_grad: jax.Array,   # [2, N] or [N, 2] d(loss)/d(mean2d) probe
    visibility: jax.Array,       # [N] bool
) -> FateAvatarState:
    """Accumulate screen-space gradient norms (fateavatar.py:734-737)."""
    if viewspace_grad.shape[0] == 2:
        gnorm = jnp.sqrt(viewspace_grad[0] ** 2 + viewspace_grad[1] ** 2)
    else:
        gnorm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    vis = visibility & state.alive
    return state.replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=state.denom + jnp.where(vis, 1.0, 0.0),
    )


def update_max_radii(state: FateAvatarState, radii: jax.Array,
                     visibility: jax.Array) -> FateAvatarState:
    return state.replace(
        max_radii2d=jnp.where(
            visibility & state.alive,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        )
    )


def _free_slots(alive: jax.Array, count: int) -> Tuple[jax.Array, jax.Array]:
    """Indices of up to ``count`` dead slots + validity mask. When fewer dead
    slots exist than requested, extra writes are dropped (mode='drop'
    scatters with an out-of-range index)."""
    n = alive.shape[0]
    count = min(count, n)
    order = jnp.argsort(alive)          # False (dead) first, stable by index
    slots = order[:count]
    n_free = n - jnp.sum(alive)
    valid = jnp.arange(count) < n_free
    slots = jnp.where(valid, slots, n)  # out-of-range -> dropped
    return slots.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("increase_num",))
def uv_densify(
    key: jax.Array,
    params: FateAvatarParams,
    state: FateAvatarState,
    increase_num: int = 1000,
):
    """Sampling-based UV densification (fateavatar.py:610-672): draw source
    splats with probability proportional to accumulated screen-space
    gradient, re-sample a random barycentric point in the SAME face, copy
    attributes with scale shrunk by 0.75, and write into dead slots.

    Returns (params, state, touched_mask [N] bool) — ``touched_mask`` flags
    the written slots so the optimizer can zero their Adam moments.
    """
    n = state.alive.shape[0]
    increase_num = min(increase_num, n)
    k_src, k_bary = jax.random.split(key)

    probs = jnp.where(state.alive, state.xyz_gradient_accum, 0.0)
    # degenerate all-zero accum -> uniform over alive (categorical of -inf is
    # nan-prone); mirrors multinomial semantics closely enough at init
    probs = jnp.where(jnp.sum(probs) > 0, probs, state.alive.astype(jnp.float32))
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    src = jax.random.categorical(k_src, logits, shape=(increase_num,))

    uvw = jax.random.uniform(k_bary, (increase_num, 3))
    new_bary = uvw / jnp.sum(uvw, axis=-1, keepdims=True)

    slots, valid = _free_slots(state.alive, increase_num)

    def write(dst, src_vals):
        return dst.at[slots].set(src_vals, mode="drop")

    new_params = params.replace(
        offset=write(params.offset, params.offset[src]),
        features_dc=write(params.features_dc, params.features_dc[src]),
        features_rest=write(params.features_rest, params.features_rest[src]),
        scaling=write(params.scaling, params.scaling[src] + jnp.log(0.75)),
        rotation=write(params.rotation, params.rotation[src]),
        opacity=write(params.opacity, params.opacity[src]),
    )
    new_state = state.replace(
        face_index=write(state.face_index, state.face_index[src]),
        bary_coords=write(state.bary_coords, new_bary),
        alive=state.alive.at[slots].set(valid, mode="drop"),
        sample_flag=write(state.sample_flag, jnp.ones((increase_num,))),
        # densify resets the stats for ALL splats (fateavatar.py:670-672)
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    touched = jnp.zeros((n,), bool).at[slots].set(valid, mode="drop")
    return new_params, new_state, touched


@jax.jit
def prune_low_opacity(
    params: FateAvatarParams,
    state: FateAvatarState,
    min_opacity: float = 0.005,
):
    """Kill splats with activated opacity below threshold
    (fateavatar.py:674-713). A pure mask update: dead slots simply stop
    rendering and become reusable by densify."""
    keep = jax.nn.sigmoid(params.opacity[:, 0]) >= min_opacity
    return state.replace(alive=state.alive & keep)


@jax.jit
def reset_opacity(params: FateAvatarParams):
    """Clamp opacity to at most 0.01 (fateavatar.py:715-732). Returns new
    params; the caller must zero the opacity Adam moments (the reference
    zeroes them for the whole tensor)."""
    cur = jax.nn.sigmoid(params.opacity)
    new = inverse_sigmoid(jnp.minimum(cur, 0.01))
    return params.replace(opacity=new)


def add_default_points(
    model: FateAvatarModel,
    params: FateAvatarParams,
    state: FateAvatarState,
    seed: int = 0,
):
    """Re-seed a full set of template splats into dead slots — used before
    full-head completion fine-tuning because back-of-head splats were pruned
    during monocular training (fateavatar.py:739-812, train/completor.py:153).

    Host-side (re-runs the UV chart sampler); call between jit steps.
    Returns (params, state, touched_mask).
    """
    import numpy as np

    from fateavatar_tpu.ops import sampling

    n_new = model.cfg.tex_size * model.cfg.tex_size
    face_index_np, bary_np = sampling.uniform_sampling_barycoords(
        n_new, np.asarray(model.uvcoords), np.asarray(model.uvfaces), seed=seed
    )
    slots, valid = _free_slots(state.alive, n_new)

    def write(dst, vals):
        return dst.at[slots].set(vals, mode="drop")

    k = params.features_rest.shape[1] + 1
    new_params = params.replace(
        offset=write(params.offset, jnp.zeros((n_new, 1))),
        features_dc=write(params.features_dc, jnp.zeros((n_new, 1, 3))),
        features_rest=write(params.features_rest, jnp.zeros((n_new, k - 1, 3))),
        scaling=write(params.scaling, jnp.full((n_new, 3), model.scale_init)),
        rotation=write(
            params.rotation,
            jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n_new, 1)),
        ),
        opacity=write(
            params.opacity, jnp.full((n_new, 1), inverse_sigmoid(jnp.float32(0.1)))
        ),
    )
    new_state = state.replace(
        face_index=write(state.face_index, jnp.asarray(face_index_np)),
        bary_coords=write(state.bary_coords, jnp.asarray(bary_np)),
        alive=state.alive.at[slots].set(valid, mode="drop"),
        sample_flag=write(state.sample_flag, jnp.ones((n_new,))),
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    touched = jnp.zeros_like(state.alive).at[slots].set(valid, mode="drop")
    return new_params, new_state, touched
