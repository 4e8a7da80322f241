"""2-D mesh training: data-parallel frames x model-parallel splats.

Combines the two scaling axes (SURVEY.md §7 step 12) into ONE jitted
training step over a ``Mesh(("data", "gauss"))``:

* frames shard over ``data`` (one frame per mesh row, as in
  parallel/data_parallel.py),
* every per-splat parameter/state leaf shards over ``gauss`` while the
  FLAME deltas replicate (parallel/splat_parallel.py's axis),
* inside the shard_map each (data, gauss) cell FLAME-drives its local
  splat shard for its row's frame, renders its tile-row slice through
  :func:`render_shard_body` (candidates reshard to tile owners over an ICI
  all_to_all), and contributes a pixel-loss share for the rows it owns,
* one ``psum`` over both axes produces the replicated scalar loss; JAX AD
  transposes the whole pipeline (all_to_all -> all_to_all, psum ->
  broadcast), so per-splat gradients come back already gauss-sharded and
  delta gradients already all-reduced.

This is the >1M-splat training configuration: no device ever materializes
the full splat state. The step accumulates real densification statistics
(screen-space probe gradients through the sharded render, DP semantics);
the categorical source sampling itself is a global operation, so
densify/prune run between phases via :func:`mesh2d_maintenance`.
The loss covers the full reference set: rgb L1 and scale-anisotropy
partition over the mesh; the windowed terms (DSSIM, VGG16) compute on the
all-gathered image (3 MB over ICI — AD turns the gather into a
reduce-scatter of pixel cotangents).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    FateAvatarParams,
    FateAvatarState,
    build_gaussians,
)
from fateavatar_tpu.parallel.splat_parallel import render_shard_body
from fateavatar_tpu.render import binning
from fateavatar_tpu.render.blend_tiles import tiles_to_image
from fateavatar_tpu.train.optim import MultiAdam, apply_updates
from fateavatar_tpu.train.step import Frame, TrainState
from fateavatar_tpu.train.losses import as_float_rgb


def fateavatar_mesh2d_specs(
    data_axis: str = "data", gauss_axis: str = "gauss",
) -> Tuple[FateAvatarParams, FateAvatarState]:
    """PartitionSpec pytrees for FateAvatar params/state under the 2-D
    mesh: per-splat leaves shard over ``gauss``, FLAME deltas replicate."""
    g = P(gauss_axis)
    r = P()
    params_spec = FateAvatarParams(
        offset=g, features_dc=g, features_rest=g, scaling=g, rotation=g,
        opacity=g, delta_shapedirs=r, delta_posedirs=r, delta_vertex=r,
    )
    state_spec = FateAvatarState(
        face_index=g, bary_coords=g, alive=g, xyz_gradient_accum=g,
        denom=g, sample_flag=g, max_radii2d=g,
    )
    return params_spec, state_spec


def place_mesh2d(ts: TrainState, mesh: Mesh,
                 data_axis: str = "data", gauss_axis: str = "gauss"):
    """Device-put a TrainState for the 2-D mesh (optimizer moments follow
    their parameter leaves; scalars replicate)."""
    pspec, sspec = fateavatar_mesh2d_specs(data_axis, gauss_axis)
    return TrainState(
        params=jax.device_put(
            ts.params, jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)),
        state=jax.device_put(
            ts.state, jax.tree.map(lambda s: NamedSharding(mesh, s), sspec)),
        opt_state=ts.opt_state.replace(
            mu=jax.device_put(ts.opt_state.mu, jax.tree.map(
                lambda s: NamedSharding(mesh, s), pspec)),
            nu=jax.device_put(ts.opt_state.nu, jax.tree.map(
                lambda s: NamedSharding(mesh, s), pspec)),
            count=jax.device_put(ts.opt_state.count,
                                 NamedSharding(mesh, P())),
        ),
        step=jax.device_put(ts.step, NamedSharding(mesh, P())),
        key=jax.device_put(ts.key, NamedSharding(mesh, P())),
    )


def mesh2d_maintenance(
    ts: TrainState,
    mesh: Mesh,
    *,
    increase_num: int = 1000,
    min_opacity: float = 0.005,
    max_points_num: int = 0,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
) -> TrainState:
    """Between-phase densify + prune for the 2-D mesh mode.

    The categorical source sampling needs the GLOBAL densification stats,
    so this gathers the sharded state once, runs the same
    models/maintenance ops the fused single-chip step uses, and re-places
    the result on the mesh — the coarse-to-fine phase boundary the module
    docstring describes (an epoch-cadence host round trip, not a per-step
    one)."""
    from fateavatar_tpu.models import maintenance
    from fateavatar_tpu.train.optim import zero_moment_rows

    params = jax.device_get(ts.params)
    state = jax.device_get(ts.state)
    opt_state = jax.device_get(ts.opt_state)
    key = jax.device_get(ts.key)

    key, sub = jax.random.split(jnp.asarray(key))
    cap = max_points_num or state.alive.shape[0]
    if int(jnp.sum(state.alive)) + increase_num <= cap:
        params, state, touched = maintenance.uv_densify(
            sub, params, state, increase_num=increase_num)
        opt_state = zero_moment_rows(opt_state, touched,
                                     maintenance.SPLAT_FIELDS)
    state = maintenance.prune_low_opacity(params, state, min_opacity)

    return place_mesh2d(
        TrainState(params=params, state=state, opt_state=opt_state,
                   step=ts.step, key=key),
        mesh, data_axis, gauss_axis,
    )


def _sharded_densify(
    key: jax.Array,
    params: FateAvatarParams,
    state: FateAvatarState,
    *,
    gauss_axis: str,
    n_devices: int,
    increase_num: int,
):
    """uv_densify INSIDE a shard_map over the splat axis — runs on the
    gauss-sharded leaves without gathering the full state anywhere:

    * global sampling probabilities come from ONE all_gather of the [N]
      gradient-accum vector (a few hundred KB),
    * every shard draws the SAME global source ids (same key), then the
      selected source ROWS (increase_num of them, not N) are fetched
      cross-shard with a masked-gather + psum,
    * each shard fills its own dead slots with a static 1/Dg quota of the
      new splats (writes beyond a shard's dead count are dropped and
      reported via ``touched`` like the single-chip op).

    Mirrors models/maintenance.uv_densify semantics (scale x0.75, fresh
    barycentric in the source face, stats reset)."""
    Dg = n_devices
    assert increase_num % Dg == 0
    quota = increase_num // Dg
    dev = jax.lax.axis_index(gauss_axis)
    n_local = state.alive.shape[0]

    k_src, k_bary = jax.random.split(key)
    probs_l = jnp.where(state.alive, state.xyz_gradient_accum, 0.0)
    probs_g = jax.lax.all_gather(probs_l, gauss_axis, tiled=True)   # [N]
    alive_g = jax.lax.all_gather(
        state.alive.astype(jnp.float32), gauss_axis, tiled=True)
    probs_g = jnp.where(jnp.sum(probs_g) > 0, probs_g, alive_g)
    logits = jnp.log(jnp.maximum(probs_g, 1e-30))
    src = jax.random.categorical(k_src, logits, shape=(increase_num,))

    local_idx = (src - dev * n_local).astype(jnp.int32)
    own = (local_idx >= 0) & (local_idx < n_local)
    safe = jnp.clip(local_idx, 0, n_local - 1)

    def fetch(arr):
        rows = arr[safe].astype(jnp.float32)
        mask = own.reshape((-1,) + (1,) * (rows.ndim - 1))
        return jax.lax.psum(jnp.where(mask, rows, 0.0), gauss_axis)

    uvw = jax.random.uniform(k_bary, (increase_num, 3))
    new_bary = uvw / jnp.sum(uvw, axis=-1, keepdims=True)

    def my_chunk(rows):
        return jax.lax.dynamic_slice_in_dim(rows, dev * quota, quota, 0)

    from fateavatar_tpu.models.maintenance import _free_slots

    slots, valid = _free_slots(state.alive, quota)

    def write(dst, rows):
        rows = my_chunk(rows).astype(dst.dtype)
        return dst.at[slots].set(rows, mode="drop")

    new_params = params.replace(
        offset=write(params.offset, fetch(params.offset)),
        features_dc=write(params.features_dc, fetch(params.features_dc)),
        features_rest=write(params.features_rest,
                            fetch(params.features_rest)),
        scaling=write(params.scaling,
                      fetch(params.scaling) + jnp.log(0.75)),
        rotation=write(params.rotation, fetch(params.rotation)),
        opacity=write(params.opacity, fetch(params.opacity)),
    )
    new_state = state.replace(
        face_index=state.face_index.at[slots].set(
            my_chunk(fetch(state.face_index)).astype(jnp.int32),
            mode="drop"),
        bary_coords=write(state.bary_coords, new_bary),
        alive=state.alive.at[slots].set(valid, mode="drop"),
        sample_flag=write(state.sample_flag,
                          jnp.ones((increase_num,), jnp.float32)),
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    touched = jnp.zeros((n_local,), bool).at[slots].set(valid, mode="drop")
    return new_params, new_state, touched


def make_mesh2d_train_step(
    model: FateAvatarModel,
    optimizer: MultiAdam,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
    rgb_weight: float = 1.0,
    dssim_weight: float = 0.0,
    vgg_weight: float = 0.0,
    vgg_params=None,
    scale_weight: float = 0.1,
    scale_threshold: float = 9.0,
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    max_per_tile: int = 1024,
    chunk: int = 32,
    densify_interval: int = 0,       # 0 disables in-jit densification
    prune_interval: int = 0,
    increase_num: int = 1024,
    min_opacity: float = 0.005,
    max_points_num: int = 0,
    return_grads: bool = False,
):
    """Build the jitted 2-D-mesh training step:
    ``(TrainState, Frame[Bd]) -> (TrainState, aux)``.

    ``return_grads`` adds the psum-replicated parameter gradients and the
    per-frame probe gradients to ``aux`` (grad-parity tests vs the
    single-device step; costs one extra device->host copy, leave off in
    production).

    The caller places the TrainState with :func:`place_mesh2d` and the
    batched frames with ``NamedSharding(mesh, P(data_axis))`` (leading
    batch dim == mesh.shape[data_axis]).
    """
    Bd = mesh.shape[data_axis]
    Dg = mesh.shape[gauss_axis]
    H, W = model.cfg.img_height, model.cfg.img_width
    grid = binning.tile_grid(W, H)
    ty, tx = grid
    assert H % binning.TILE == 0, (
        f"mesh2d needs the image height ({H}) tile-aligned "
        f"({binning.TILE}) so gt rows slice exactly per device")
    assert ty % Dg == 0, f"tile rows {ty} must divide over gauss={Dg}"
    rows_per_dev = ty // Dg
    row_px = rows_per_dev * binning.TILE
    pspec, sspec = fateavatar_mesh2d_specs(data_axis, gauss_axis)

    def local_loss(params, probe, state, frames: Frame):
        # this cell's frame (leading local batch of 1), probe row and
        # splat shard
        f = jax.tree.map(lambda x: x[0], frames)
        n_local = params.scaling.shape[0]
        n_total = n_local * Dg

        gaussians, _, _ = build_gaussians(
            model, params, state, f.expression, f.flame_pose
        )
        img_tiles, dropped, visible = render_shard_body(
            f.camera, gaussians, f.bg_color, axis=gauss_axis, n_devices=Dg,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            pair_budget=pair_budget, max_per_tile=max_per_tile, chunk=chunk,
            mean2d_probe=probe[0],
        )
        local_img = tiles_to_image(
            img_tiles, (rows_per_dev, tx), W, row_px
        )                                                   # [row_px, W, 3]
        dev = jax.lax.axis_index(gauss_axis)
        gt_rows = jax.lax.dynamic_slice_in_dim(
            as_float_rgb(f.rgb), dev * row_px, row_px, axis=0
        )
        # shares are scaled so the FULL-mesh psum is the true batch loss:
        # pixel rows partition over gauss, frames partition over data
        pix = jnp.sum(jnp.abs(local_img - gt_rows)) / (H * W * 3 * Bd)

        window_terms = 0.0
        if dssim_weight > 0 or (vgg_weight > 0 and vgg_params is not None):
            # windowed terms (DSSIM 11x11, VGG receptive fields) straddle
            # tile-row shard boundaries, so compute them on the
            # ALL-GATHERED image — 3 MB over ICI per frame; AD transposes
            # the gather into a reduce-scatter of the pixel cotangents.
            # Every gauss cell computes the same value for its frame, so
            # the share divides by Dg (and Bd as usual).
            from fateavatar_tpu.train.losses import (
                d_ssim, vgg_perceptual_loss,
            )

            tiles_full = jax.lax.all_gather(
                img_tiles, gauss_axis, tiled=True)      # [T, 3, P]
            img_full = tiles_to_image(tiles_full, grid, W, H)
            gt_full = as_float_rgb(f.rgb)
            if dssim_weight > 0:
                window_terms = window_terms + dssim_weight * d_ssim(
                    img_full, gt_full) / (Bd * Dg)
            if vgg_weight > 0 and vgg_params is not None:
                window_terms = window_terms + vgg_weight * (
                    vgg_perceptual_loss(vgg_params, img_full, gt_full)
                    / (Bd * Dg))
        s = jnp.exp(params.scaling)
        ratio = jnp.max(s, axis=-1) / jnp.maximum(jnp.min(s, axis=-1), 1e-12)
        reg = jnp.sum(
            jnp.where(state.alive, jnp.maximum(ratio - scale_threshold, 0.0),
                      0.0)
        ) / (n_total * Bd)                  # /Bd: replicated over data rows

        local = rgb_weight * pix + scale_weight * reg + window_terms
        total = jax.lax.psum(local, (data_axis, gauss_axis))
        overflow = jax.lax.psum(jnp.sum(dropped), (data_axis, gauss_axis))
        vis_count = jax.lax.psum(visible.astype(jnp.float32), data_axis)
        return total, (overflow, vis_count)

    sharded_loss = shard_map(
        local_loss, mesh=mesh,
        in_specs=(pspec, P(data_axis, None, gauss_axis), sspec,
                  P(data_axis)),
        out_specs=(P(), (P(), P(gauss_axis))),
        check_vma=False,
    )

    grad_fn = jax.value_and_grad(sharded_loss, argnums=(0, 1), has_aux=True)

    def step_fn(ts: TrainState, frames: Frame):
        n = ts.params.scaling.shape[0]
        # per-frame screen-space probe [Bd, 2, N]: its gradient feeds the
        # densification statistics exactly like the DP step (per-frame
        # gradient norms, summed over the batch)
        probe = jnp.zeros((Bd, 2, n), jnp.float32)
        ((loss, (overflow, vis_count)),
         (grads, probe_grad)) = grad_fn(ts.params, probe, ts.state, frames)

        gnorm = jnp.sqrt(probe_grad[:, 0] ** 2
                         + probe_grad[:, 1] ** 2)          # [Bd, N]
        vis = vis_count > 0
        state = ts.state
        state = state.replace(
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.where(vis & state.alive, jnp.sum(gnorm, axis=0), 0.0),
            denom=state.denom
            + jnp.where(state.alive, vis_count, 0.0),
        )

        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = apply_updates(ts.params, updates)
        step = ts.step + 1
        key = ts.key

        if densify_interval:
            # in-jit sharded densification. The branch predicate is
            # replicated, but collectives inside lax.cond are fragile on
            # SPMD backends — the (cheap: K rows, one [N] all_gather)
            # densify math runs every step and a masked select applies it.
            from fateavatar_tpu.models.maintenance import SPLAT_FIELDS
            from fateavatar_tpu.train.optim import zero_moment_rows
            import functools as _ft

            densify_sm = shard_map(
                _ft.partial(_sharded_densify, gauss_axis=gauss_axis,
                            n_devices=Dg, increase_num=increase_num),
                mesh=mesh,
                in_specs=(P(), pspec, sspec),
                out_specs=(pspec, sspec, P(gauss_axis)),
                check_vma=False,
            )
            cap = max_points_num or n
            num_alive = jnp.sum(state.alive)
            do_densify = (
                (step % densify_interval == 0)
                & (num_alive + increase_num <= cap)
            )
            key, sub = jax.random.split(key)
            d_params, d_state, touched = densify_sm(sub, params, state)
            params = jax.tree.map(
                lambda a, b: jnp.where(do_densify, a, b), d_params, params)
            state = jax.tree.map(
                lambda a, b: jnp.where(do_densify, a, b), d_state, state)
            opt_state = zero_moment_rows(
                opt_state, touched & do_densify, SPLAT_FIELDS)

        if prune_interval:
            keep = jax.nn.sigmoid(params.opacity[:, 0]) >= min_opacity
            state = state.replace(alive=jnp.where(
                step % prune_interval == 0, state.alive & keep, state.alive))

        new_ts = TrainState(params=params, state=state,
                            opt_state=opt_state, step=step, key=key)
        aux = {"loss": loss, "overflow": overflow,
               "num_alive": jnp.sum(state.alive)}
        if return_grads:
            aux["grads"] = grads
            aux["probe_grad"] = probe_grad
        return new_ts, aux

    return jax.jit(step_fn, donate_argnums=(0,))


def make_mesh2d_tracking_step(
    model: FateAvatarModel,
    mesh: Mesh,
    track_opt,
    *,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    max_per_tile: int = 1024,
    chunk: int = 32,
):
    """Per-frame FLAME-tracking refinement ON the 2-D mesh (the adapter
    for IMAvatar-style datasets, train/base.py:113-151 semantics): a batch
    of Bd frames refines its tracking rows in one dispatch — frames shard
    over ``data``, splats stay gauss-sharded, gradients flow to the rows'
    (expression, flame_pose, cam_t) only; model params are frozen.

    Step: ``(tables, track_state, idxs, mask, params, state, fc)
    -> (tables, track_state, loss)``, where ``fc`` is a dict of per-frame
    constants: ``R`` [Bd,3,3] camera rotations, ``fovx``/``fovy`` [Bd],
    ``rgb`` [Bd,H,W,3], ``bg`` [Bd,3] — all placed ``P(data)``. ``mask``
    disables padded rows (RowAdam.update_rows semantics).
    """
    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.train.tracking import TrackingTables

    Bd = mesh.shape[data_axis]
    Dg = mesh.shape[gauss_axis]
    H, W = model.cfg.img_height, model.cfg.img_width
    grid = binning.tile_grid(W, H)
    ty, tx = grid
    assert ty % Dg == 0, f"tile rows {ty} must divide over gauss={Dg}"
    rows_per_dev = ty // Dg
    row_px = rows_per_dev * binning.TILE
    pspec, sspec = fateavatar_mesh2d_specs(data_axis, gauss_axis)

    def local_loss(e, p, t, params, state, fc):
        e0, p0, t0 = e[0], p[0], t[0]
        cam = make_camera(fc["R"][0], t0, fc["fovx"][0], fc["fovy"][0],
                          W, H)
        gaussians, _, _ = build_gaussians(model, params, state, e0, p0)
        img_tiles, dropped, _ = render_shard_body(
            cam, gaussians, fc["bg"][0], axis=gauss_axis, n_devices=Dg,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            pair_budget=pair_budget, max_per_tile=max_per_tile, chunk=chunk,
        )
        local_img = tiles_to_image(img_tiles, (rows_per_dev, tx), W, row_px)
        dev = jax.lax.axis_index(gauss_axis)
        gt_rows = jax.lax.dynamic_slice_in_dim(
            as_float_rgb(fc["rgb"][0]), dev * row_px, row_px, axis=0)
        pix = jnp.sum(jnp.abs(local_img - gt_rows)) / (H * W * 3 * Bd)
        return jax.lax.psum(pix, (data_axis, gauss_axis))

    sharded_loss = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis), pspec, sspec,
                  P(data_axis)),
        out_specs=P(),
        check_vma=False,
    )

    grad_fn = jax.value_and_grad(sharded_loss, argnums=(0, 1, 2))

    @jax.jit
    def step(tables, track_state, idxs, mask, params, state, fc):
        e = tables.expression[idxs]
        p = tables.flame_pose[idxs]
        t = tables.cam_t[idxs]
        loss, (ge, gp, gt) = grad_fn(e, p, t, params, state, fc)
        row_grads = TrackingTables(expression=ge, flame_pose=gp, cam_t=gt)
        tables, track_state = track_opt.update_rows(
            tables, track_state, row_grads, idxs, mask)
        return tables, track_state, loss

    return step
