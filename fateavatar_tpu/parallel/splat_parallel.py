"""Gaussian-sharded rendering: model parallelism over the splat axis.

The second scaling axis (SURVEY.md §7 step 12): when a scene outgrows one
chip's HBM (>1M splats), shard the SPLATS over the mesh and reshard to
TILE ownership between binning and blending:

  per device (shard_map over axis 'gauss'):
    1. preprocess its splat shard (pure local math),
    2. expand tile-rect candidates, pack per-instance payloads
       [tile, depth, mean2d, conic, color, opacity] (12 floats),
    3. bucket instances by owner device (contiguous tile slices) into
       fixed [D, M_pair] send buffers — the static-shape stand-in for a
       ragged all-to-all (overflow counted, as everywhere else),
    4. lax.all_to_all over ICI,
    5. sort received instances by (tile, depth) — a LOCAL sort of the
       device's own tile slice only,
    6. blend its T/D tiles with the shared XLA tile blend.

  The image comes back tile-sharded; reassembly is a reshape.

Payloads (not indices) travel with the instances, so the pipeline is
differentiable end-to-end: sorts permute values, all_to_all transposes,
and XLA derives the reverse path. No gather against a global splat array
is ever needed — each device only ever touches its own shard's parameters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.render import binning
from fateavatar_tpu.render.blend_tiles import blend_tiles_xla, tiles_to_image
from fateavatar_tpu.render.preprocess import preprocess
from fateavatar_tpu.render.splats import Gaussians


def render_splat_sharded(
    camera: Camera,
    gaussians: Gaussians,
    bg_color: jax.Array,
    mesh: Mesh,
    axis: str = "gauss",
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    max_per_tile: int = 1024,
    chunk: int = 64,
):
    """Render splats sharded over ``mesh[axis]``. The caller places the
    Gaussians pytree with its leading N axis sharded over ``axis``.
    Returns (image [H, W, 3], overflow scalar)."""
    D = mesh.shape[axis]
    grid = binning.tile_grid(camera.width, camera.height)
    ty, tx = grid
    num_tiles = ty * tx
    assert ty % D == 0, f"tile rows {ty} must divide over {D} devices"
    rows_per_dev = ty // D
    tiles_per_dev = rows_per_dev * tx

    n_local = gaussians.xyz.shape[0] // D
    R = max_tiles_per_gaussian
    M_pair = pair_budget or (4 * n_local * R // (D * 2))

    def shard_fn(g: Gaussians, bg):
        img_tiles, dropped, _ = render_shard_body(
            camera, g, bg, axis=axis, n_devices=D,
            max_tiles_per_gaussian=R, pair_budget=M_pair,
            max_per_tile=max_per_tile, chunk=chunk,
        )
        return img_tiles, dropped

    from jax import shard_map

    img_tiles, dropped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(gaussians, bg_color)

    image = tiles_to_image(img_tiles, grid, camera.width, camera.height)
    return image, jnp.sum(dropped)


def render_shard_body(
    camera: Camera,
    g: Gaussians,
    bg: jax.Array,
    *,
    axis: str,
    n_devices: int,
    max_tiles_per_gaussian: int = 16,
    pair_budget: int = 0,
    max_per_tile: int = 1024,
    chunk: int = 64,
    mean2d_probe=None,
):
    """The per-device render pipeline — runs INSIDE a ``shard_map`` whose
    mesh binds ``axis``. ``g`` is this device's splat shard. Returns the
    device's tile-row slice of the image ([tiles_per_dev, 3, P]) and a
    1-element dropped-instance count. Exposed so larger shard_map programs
    (the 2-D data x gauss training step in parallel/mesh2d.py) can embed
    the same pipeline; :func:`render_splat_sharded` is the thin wrapper."""
    D = n_devices
    grid = binning.tile_grid(camera.width, camera.height)
    ty, tx = grid
    num_tiles = ty * tx
    rows_per_dev = ty // D
    tiles_per_dev = rows_per_dev * tx
    R = max_tiles_per_gaussian
    n_local = g.xyz.shape[0]
    M_pair = pair_budget or (4 * n_local * R // (D * 2))

    dev = jax.lax.axis_index(axis)

    prep = preprocess(
        camera, g.xyz, g.get_scaling, g.get_rotation, g.get_opacity,
        g.get_features, g.sh_degree, alive=g.alive,
    )

    # candidate expansion (local shard)
    mean2d = prep.mean2d
    if mean2d_probe is not None:
        # zero-valued probe whose gradient is d(loss)/d(mean2d) — the
        # densification statistic (train/step.py uses the same trick)
        mean2d = mean2d + mean2d_probe.T
    rminx, rminy, rmaxx, rmaxy = binning.gaussian_rect(
        jax.lax.stop_gradient(mean2d), prep.radius, grid
    )
    rect_w = jnp.maximum(rmaxx - rminx, 1)   # division safety only
    # raw width in the count: a rect fully clipped off an edge emits ZERO
    # candidates (CUDA getRect semantics; matches binning.py)
    touched = jnp.where(prep.visible, (rmaxx - rminx) * (rmaxy - rminy), 0)
    r_lin = jnp.arange(R, dtype=jnp.int32)[None, :]
    cand_x = rminx[:, None] + r_lin % rect_w[:, None]
    cand_y = rminy[:, None] + r_lin // rect_w[:, None]
    valid = r_lin < touched[:, None]
    tile_id = jnp.where(valid, cand_y * tx + cand_x, num_tiles)
    dropped = jnp.sum(jnp.maximum(touched - R, 0))

    # per-instance payload [N*R, 12]
    nl = mean2d.shape[0]
    payload = jnp.concatenate([
        jnp.broadcast_to(prep.depth[:, None], (nl, 1)),
        mean2d, prep.conic, prep.color, prep.opacity[:, None],
    ], axis=-1)                                        # [N, 10]
    payload = jnp.broadcast_to(payload[:, None, :], (nl, R, 10))
    flat_payload = payload.reshape(-1, 10)
    flat_tiles = tile_id.reshape(-1)
    flat_valid = valid.reshape(-1)

    # bucket by owner device (contiguous tile-row slices)
    owner = jnp.clip(flat_tiles // tiles_per_dev, 0, D - 1)
    owner = jnp.where(flat_valid, owner, D)            # sentinel bucket
    # rank within destination bucket via per-destination cumsum
    send_pay = jnp.zeros((D, M_pair, 10), jnp.float32)
    send_tile = jnp.full((D, M_pair), num_tiles, jnp.int32)
    for d in range(D):  # D is static and small; unrolled masked compactions
        m = owner == d
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        dst = jnp.where(m & (pos < M_pair), pos, M_pair)
        buf_p = jnp.zeros((M_pair + 1, 10), jnp.float32).at[dst].set(
            flat_payload, mode="drop")[:M_pair]
        buf_t = jnp.full((M_pair + 1,), num_tiles, jnp.int32).at[dst].set(
            flat_tiles, mode="drop")[:M_pair]
        send_pay = send_pay.at[d].set(buf_p)
        send_tile = send_tile.at[d].set(buf_t)
        dropped = dropped + jnp.maximum(jnp.sum(m) - M_pair, 0)

    recv_pay = jax.lax.all_to_all(send_pay, axis, 0, 0, tiled=False)
    recv_tile = jax.lax.all_to_all(send_tile, axis, 0, 0, tiled=False)

    # local (tile, depth) order over everything received
    flat_t = recv_tile.reshape(-1)
    flat_p = recv_pay.reshape(-1, 10)
    local_tile = jnp.where(
        flat_t < num_tiles, flat_t - dev * tiles_per_dev, tiles_per_dev
    ).astype(jnp.int32)
    sort_t, sort_d, *sort_cols = jax.lax.sort(
        (local_tile, flat_p[:, 0]) + tuple(flat_p[:, i] for i in range(1, 10)),
        num_keys=2, is_stable=False,
    )
    sorted_pay = jnp.stack([sort_d] + list(sort_cols), axis=-1)  # [Mr, 10]

    # per-tile [K] lists over the local tile slice
    Mr = sort_t.shape[0]
    starts = jnp.searchsorted(
        sort_t, jnp.arange(tiles_per_dev + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    pos = jnp.arange(Mr, dtype=jnp.int32)
    rank = pos - starts[jnp.clip(sort_t, 0, tiles_per_dev - 1)]
    keep = (sort_t < tiles_per_dev) & (rank < max_per_tile)
    flat_idx = jnp.where(
        keep, sort_t * max_per_tile + rank, tiles_per_dev * max_per_tile
    )
    lists = jnp.zeros(
        (tiles_per_dev * max_per_tile + 1, 10), jnp.float32
    ).at[flat_idx].set(sorted_pay, mode="drop")[:-1]
    lists = lists.reshape(tiles_per_dev, max_per_tile, 10)
    valid_lists = jnp.zeros(
        (tiles_per_dev * max_per_tile + 1,), bool
    ).at[flat_idx].set(keep, mode="drop")[:-1].reshape(
        tiles_per_dev, max_per_tile
    )
    counts = starts[1:] - starts[:-1]
    dropped = dropped + jnp.sum(jnp.maximum(counts - max_per_tile, 0))

    # blend the local tile slice (pixel coords need the GLOBAL tile grid,
    # so pad the per-tile arrays into a full-grid layout view)
    mean2d_t = lists[..., 1:3]
    conic_t = lists[..., 3:6]
    color_t = lists[..., 6:9]
    opacity_t = lists[..., 9]

    # local blend with explicit pixel origin: reuse blend_tiles_xla by
    # shifting tile coordinates — build a sub-grid camera row block
    sub_grid = (rows_per_dev, tx)
    # pixel origin offset: device dev owns tile rows [dev*rows_per_dev, ...)
    # blend_tiles_xla computes pixel coords from the sub-grid, so shift
    # the gaussian means into the sub-grid frame instead
    y_off = (dev * rows_per_dev * binning.TILE).astype(jnp.float32)
    mean2d_shifted = mean2d_t.at[..., 1].add(-y_off)
    img_tiles, t_final = blend_tiles_xla(
        mean2d_shifted, conic_t, color_t, opacity_t, valid_lists, bg,
        sub_grid, chunk=chunk,
    )
    return img_tiles, jnp.sum(dropped)[None], prep.visible
