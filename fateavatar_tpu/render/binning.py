"""Tile binning: build fixed-size, depth-ordered per-tile Gaussian lists.

TPU-native replacement for the CUDA pipeline
InclusiveSum -> duplicateWithKeys -> RadixSort -> identifyTileRanges
(diff-gaussian-rasterization cuda_rasterizer/rasterizer_impl.cu:70-336).

The CUDA code materializes a data-dependent instance list (``num_rendered``)
and per-tile [start,end) ranges. XLA needs static shapes, so instead:

1. depth-argsort the N Gaussians once (replaces sorting every instance by a
   packed [tile|depth] 64-bit key — a stable tile sort of depth-ordered
   instances yields the identical ordering),
2. expand each Gaussian into at most ``max_tiles_per_gaussian`` (tile)
   candidate instances over its screen rect, invalid slots get a sentinel
   tile id,
3. stable-sort the N*R instances by tile id,
4. compute each instance's rank inside its tile and scatter Gaussian ids
   into a dense [num_tiles, K] list (K = ``max_per_tile``), truncating
   overflow (reported via ``overflow`` for observability — the CUDA version
   has no cap, so we log instead of silently diverging).

Everything is static-shaped, jittable, and runs as a few large XLA sort /
scatter ops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16  # pixels per tile edge (config.h:15-17 BLOCK_X/BLOCK_Y)


class TileLists(NamedTuple):
    ids: jax.Array        # [num_tiles, K] int32 gaussian index, -1 = empty
    counts: jax.Array     # [num_tiles] int32 (pre-truncation instance count)
    overflow: jax.Array   # [] int32 total truncated instances
    grid: tuple           # (tiles_y, tiles_x) static


class InstanceLists(NamedTuple):
    """Flat depth-sorted instance representation (the CUDA layout:
    rasterizer_impl.cu's point_list + per-tile ranges) — no per-tile cap."""

    instances: jax.Array    # [M] int32 gaussian index per instance (tile-major,
                            #     depth-ordered within tile; sentinel rows = -1)
    tile_starts: jax.Array  # [num_tiles + 1] int32 range offsets
    overflow: jax.Array     # [] int32 instances dropped (budget/R caps)
    grid: tuple
    slots: jax.Array | None = None  # [N, R] int32 output slot of each
                            # gaussian's instances (original gaussian order;
                            # sentinel M_out) — the scatter-free transpose
                            # of the instance gather, used by the custom VJP
    group_counts: jax.Array | None = None  # [N] int32 kept instances per
                            # gaussian id (return_groups): with the ids
                            # sorted by gaussian, group i spans
                            # [excl-cumsum(counts)[i], +counts[i]) — the
                            # sort-based (scatter-free) gather transpose
    group_tail: jax.Array | None = None    # [K] int32 gaussian ids allowed
                            # more than tail_r0 instances (twotier tail;
                            # None for single-tier modes)


def tile_grid(width: int, height: int) -> tuple:
    return ((height + TILE - 1) // TILE, (width + TILE - 1) // TILE)


def gaussian_rect(mean2d, radius: jax.Array, grid: tuple):
    """Per-Gaussian tile rect [min, max) in tile units (auxiliary.h:46-56).
    ``mean2d`` is [N, 2] or a (mean_x, mean_y) tuple of [N] vectors."""
    ty, tx = grid
    if isinstance(mean2d, tuple):
        mx, my = mean2d
    else:
        mx, my = mean2d[..., 0], mean2d[..., 1]
    rmin_x = jnp.clip(((mx - radius) / TILE).astype(jnp.int32), 0, tx)
    rmin_y = jnp.clip(((my - radius) / TILE).astype(jnp.int32), 0, ty)
    rmax_x = jnp.clip(
        ((mx + radius + TILE - 1) / TILE).astype(jnp.int32), 0, tx
    )
    rmax_y = jnp.clip(
        ((my + radius + TILE - 1) / TILE).astype(jnp.int32), 0, ty
    )
    return rmin_x, rmin_y, rmax_x, rmax_y


@partial(jax.jit, static_argnames=(
    "grid", "max_per_tile", "max_tiles_per_gaussian", "instance_budget"))
def build_tile_lists(
    mean2d: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    grid: tuple,
    max_per_tile: int = 1024,
    max_tiles_per_gaussian: int = 32,
    instance_budget: int = 0,
) -> TileLists:
    """Build [T, K] depth-ordered per-tile lists of Gaussian indices.

    ``instance_budget``: static capacity of the compacted instance list fed
    to the sort (0 -> min(8 * N, N * R)). Most candidate slots are invalid
    (small rects), so compacting via a cheap cumsum before the expensive
    sort cuts the sort size ~4-8x — the TPU stand-in for CUDA's exact
    ``num_rendered`` allocation (rasterizer_impl.cu:280-285).
    """
    n = mean2d.shape[0]
    ty, tx = grid
    num_tiles = ty * tx
    R = max_tiles_per_gaussian
    M = instance_budget or min(6 * n, n * R)

    visible = radius > 0

    # 1. depth order (dead gaussians pushed to the end)
    order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
    mean2d_s = mean2d[order]
    radius_s = radius[order]
    visible_s = visible[order]

    rmin_x, rmin_y, rmax_x, rmax_y = gaussian_rect(mean2d_s, radius_s, grid)
    # rect_w's max(., 1) is DIVISION safety for the rect walk only; the
    # touched count uses the raw width so a rect fully clipped off an edge
    # (min == max after gaussian_rect's grid clamp) emits ZERO candidates —
    # CUDA getRect semantics (auxiliary.h:46-56)
    rect_w = jnp.maximum(rmax_x - rmin_x, 1)
    rect_h = rmax_y - rmin_y
    n_tiles_touched = (rmax_x - rmin_x) * rect_h

    # 2. candidate instance expansion: walk the rect row-major with a
    # DYNAMIC width, so any rect shape with area <= R is fully covered
    r_lin = jnp.arange(R, dtype=jnp.int32)[None, :]        # [1, R]
    cand_x = rmin_x[:, None] + r_lin % rect_w[:, None]     # [N, R]
    cand_y = rmin_y[:, None] + r_lin // rect_w[:, None]
    valid = visible_s[:, None] & (r_lin < n_tiles_touched[:, None])
    tile_id = jnp.where(valid, cand_y * tx + cand_x, num_tiles)  # sentinel T

    # truncation bookkeeping: instances beyond the per-gaussian R cap
    dropped_tiles = jnp.sum(
        jnp.where(visible_s, jnp.maximum(n_tiles_touched - R, 0), 0)
    )

    # 3a. compact valid instances into the static budget (cumsum ≪ sort)
    flat_valid = valid.reshape(-1)
    flat_tiles = tile_id.reshape(-1)
    gauss_idx = jnp.broadcast_to(order[:, None], tile_id.shape).reshape(-1)
    pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    dest = jnp.where(flat_valid & (pos < M), pos, M)
    comp_tiles = jnp.full((M + 1,), num_tiles, jnp.int32).at[dest].set(
        flat_tiles.astype(jnp.int32), mode="drop"
    )[:M]
    comp_gauss = jnp.zeros((M + 1,), jnp.int32).at[dest].set(
        gauss_idx.astype(jnp.int32), mode="drop"
    )[:M]
    n_valid = jnp.sum(flat_valid)
    dropped_tiles = dropped_tiles + jnp.maximum(n_valid - M, 0)

    # 3b. stable sort the compacted instances by tile id (preserves depth
    # order within each tile)
    sort_tiles, sort_gauss = jax.lax.sort(
        (comp_tiles, comp_gauss), num_keys=1, is_stable=True
    )

    # 4. per-tile ranks and scatter into [T, K]
    tile_start = jnp.searchsorted(sort_tiles, jnp.arange(num_tiles, dtype=jnp.int32))
    pos = jnp.arange(sort_tiles.shape[0], dtype=jnp.int32)
    rank = pos - tile_start[jnp.clip(sort_tiles, 0, num_tiles - 1)]
    in_range = sort_tiles < num_tiles
    keep = in_range & (rank < max_per_tile)

    flat_out_idx = jnp.where(
        keep, sort_tiles * max_per_tile + rank, num_tiles * max_per_tile
    )
    lists = jnp.full((num_tiles * max_per_tile + 1,), -1, jnp.int32)
    lists = lists.at[flat_out_idx].set(jnp.where(keep, sort_gauss, -1))
    ids = lists[:-1].reshape(num_tiles, max_per_tile)

    counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[
        jnp.clip(sort_tiles, 0, num_tiles)
    ].add(jnp.where(in_range, 1, 0))[:num_tiles]

    overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0)) + dropped_tiles

    return TileLists(ids=ids, counts=counts, overflow=overflow, grid=grid)


@partial(jax.jit, static_argnames=(
    "grid", "max_tiles_per_gaussian", "instance_budget", "chunk", "sort_mode",
    "count_block", "return_slots", "relayout", "layout", "tail_r0",
    "tail_k", "return_groups"))
def build_instance_lists(
    mean2d: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    grid: tuple,
    max_tiles_per_gaussian: int = 16,
    instance_budget: int = 0,
    chunk: int = 64,
    sort_mode: str = "stable",
    count_block: int = 512,
    return_slots: bool = False,
    relayout: str = "scatter",
    layout: str = "aligned",
    tail_r0: int = 4,
    tail_k: int = 0,
    return_groups: bool = False,
) -> InstanceLists:
    """Flat instance binning for the instance-range blend kernel: the same
    depth-sort + candidate expansion + compaction + stable tile sort as
    :func:`build_tile_lists`, but returning the sorted instance array and
    per-tile [start, end) offsets instead of a capped [T, K] matrix —
    exactly the CUDA pipeline's ``point_list`` + ``ranges``
    (rasterizer_impl.cu:303-338).

    Each tile's range is padded to a multiple of ``chunk`` (sentinel id -1)
    so the kernel's fixed-size DMAs never cross tile boundaries. Output
    length is the static ``M + num_tiles * chunk``.

    ``mean2d`` may be an [N, 2] array or a ``(mean_x, mean_y)`` tuple of
    lane-major [N] vectors (the preprocess SoA form — avoids two layout
    passes per call on TPU).
    """
    if isinstance(mean2d, tuple):
        mean_x, mean_y = mean2d
    else:
        mean_x, mean_y = mean2d[..., 0], mean2d[..., 1]
    n = mean_x.shape[0]
    ty, tx = grid
    num_tiles = ty * tx
    R = max_tiles_per_gaussian
    M = instance_budget or min(4 * n, n * R)
    M_out = M + num_tiles * chunk

    visible = radius > 0

    if sort_mode == "gather":
        # SCATTER-FREE stable path. TPU scatters serialize badly, and the
        # classic pipeline has two big ones (candidate compaction and the
        # chunk-aligned re-layout). Both maps are invertible, so each
        # becomes a searchsorted + gather instead:
        #   compaction: output slot m belongs to the gaussian whose
        #     inclusive tiles_touched cumsum first exceeds m; its tile is
        #     recomputed from the rect walk — the [N, R] candidate tensor
        #     is never materialized at all.
        #   re-layout: output slot o inverts to (tile, rank) via the
        #     aligned starts, then to the sorted-instance index.
        order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
        mean2d_arr = jnp.stack([mean_x, mean_y], axis=-1)
        mean2d_s = mean2d_arr[order]
        radius_s = radius[order]
        visible_s = visible[order]

        rmin_x, rmin_y, rmax_x, rmax_y = gaussian_rect(
            mean2d_s, radius_s, grid)
        rect_w = jnp.maximum(rmax_x - rmin_x, 1)   # division safety only
        n_tiles_touched = jnp.where(
            visible_s, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0)
        dropped = jnp.sum(jnp.maximum(n_tiles_touched - R, 0))
        touched_capped = jnp.minimum(n_tiles_touched, R)

        cum = jnp.cumsum(touched_capped)                      # inclusive [N]
        n_valid = cum[-1]
        dropped = dropped + jnp.maximum(n_valid - M, 0)

        # inverse of the offsets map WITHOUT searchsorted (whose sequential
        # binary-search loop lowers poorly on TPU): scatter each gaussian's
        # index at its first instance slot, then a cummax fills its range.
        offs = cum - touched_capped
        m_idx = jnp.arange(M, dtype=jnp.int32)
        first = jnp.where(touched_capped > 0, offs, M)
        g_of_m = jnp.zeros((M + 1,), jnp.int32).at[first].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:M]
        g_clip = jax.lax.associative_scan(jnp.maximum, g_of_m)
        r_of_m = m_idx - (cum[g_clip] - touched_capped[g_clip])
        valid_m = m_idx < n_valid
        rw = rect_w[g_clip]
        comp_tiles = jnp.where(
            valid_m,
            (rmin_y[g_clip] + r_of_m // rw) * tx + rmin_x[g_clip] + r_of_m % rw,
            num_tiles,
        ).astype(jnp.int32)
        comp_gauss = jnp.where(valid_m, order[g_clip], -1).astype(jnp.int32)

        sort_tiles, sort_gauss = jax.lax.sort(
            (comp_tiles, comp_gauss), num_keys=1, is_stable=True
        )

        raw_starts = jnp.searchsorted(
            sort_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        counts = raw_starts[1:] - raw_starts[:-1]
        padded = ((counts + chunk - 1) // chunk) * chunk
        aligned_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
        )

        o_idx = jnp.arange(M_out, dtype=jnp.int32)
        # same scatter+cummax trick for the tile-of-slot inverse (tiles with
        # zero padded length collide on a start slot; .max keeps the later
        # tile, whose range is the non-empty one)
        t_seed = jnp.zeros((M_out + 1,), jnp.int32).at[
            jnp.minimum(aligned_starts[:num_tiles], M_out)
        ].max(jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")[:M_out]
        t_clip = jax.lax.associative_scan(jnp.maximum, t_seed)
        rank_o = o_idx - aligned_starts[t_clip]
        src = jnp.minimum(raw_starts[t_clip] + rank_o, M - 1)
        keep = (rank_o < counts[t_clip]) & (o_idx < aligned_starts[num_tiles])
        instances = jnp.where(keep, sort_gauss[src], -1)

        return InstanceLists(
            instances=instances,
            tile_starts=aligned_starts,
            overflow=dropped, grid=grid,
        )

    if sort_mode in ("stable", "count", "onesort", "twotier"):
        # depth-argsort gaussians upfront, then ONE stable tile pass.
        # The three reordered per-gaussian fields ride ONE gather (row
        # gathers lower to slow VMEM-bound custom fusions on TPU; one
        # [N, 4] gather costs the same as one [N] gather).
        order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
        # stack along a NEW leading axis (layout-free for lane-major [N]
        # vectors), ONE transpose to the row-gatherable [N, 4] form
        packed_fields = jnp.stack([
            mean_x, mean_y, radius.astype(jnp.float32),
            visible.astype(jnp.float32),
        ], axis=0).T[order]
        mean2d_s = (packed_fields[:, 0], packed_fields[:, 1])
        radius_s = packed_fields[:, 2].astype(jnp.int32)
        visible_s = packed_fields[:, 3] > 0.5
    else:
        # 'twokey': skip the argsort + per-gaussian reorder; sort instances
        # by (tile, depth) in one two-key pass instead
        order = jnp.arange(n, dtype=jnp.int32)
        mean2d_s = (mean_x, mean_y)
        radius_s = jnp.where(visible, radius, 0)
        visible_s = visible

    rmin_x, rmin_y, rmax_x, rmax_y = gaussian_rect(mean2d_s, radius_s, grid)
    rect_w = jnp.maximum(rmax_x - rmin_x, 1)       # division safety only
    n_tiles_touched = jnp.where(
        visible_s, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0)

    if sort_mode == "twotier":
        # Per-gaussian caps: everyone gets R0; the K largest-footprint
        # gaussians get the full R. Occupancy is heavy-tailed (measured
        # ~1.8 mean tiles/gaussian with a max of ~10 on trained avatars),
        # so this shrinks the sorted candidate array from N*R to
        # N*R0 + K*(R-R0) — the full-candidate sort and the [R, N]
        # expansion arithmetic both scale with it.
        R0 = min(tail_r0, R)
        K = tail_k or max(256, n // 16)
        K = min(K, n)
        sel_idx = jnp.argsort(-n_tiles_touched)[:K]
        sel = jnp.zeros((n,), bool).at[sel_idx].set(True, mode="drop")
        capr = jnp.where(sel, R, R0)
        touched_capped = jnp.minimum(n_tiles_touched, capr)
        dropped = jnp.sum(n_tiles_touched - touched_capped)
    else:
        dropped = jnp.sum(jnp.maximum(n_tiles_touched - R, 0))
        touched_capped = jnp.minimum(n_tiles_touched, R)

    # exact compaction offsets from an N-length cumsum (the CUDA
    # InclusiveSum over tiles_touched, rasterizer_impl.cu:277) — far
    # cheaper than a cumsum over all N*R candidate slots
    offsets = jnp.cumsum(touched_capped) - touched_capped       # exclusive
    n_valid = jnp.sum(touched_capped)
    dropped = dropped + jnp.maximum(n_valid - M, 0)

    if sort_mode not in ("onesort", "twotier"):
        r_lin = jnp.arange(R, dtype=jnp.int32)[None, :]
        cand_x = rmin_x[:, None] + r_lin % rect_w[:, None]
        cand_y = rmin_y[:, None] + r_lin // rect_w[:, None]
        valid = (r_lin < touched_capped[:, None])
        tile_id = jnp.where(valid, cand_y * tx + cand_x, num_tiles)
        dest = jnp.where(
            valid & (offsets[:, None] + r_lin < M),
            offsets[:, None] + r_lin, M,
        )
        flat_tiles = tile_id.reshape(-1)
        gauss_idx = jnp.broadcast_to(
            order[:, None], tile_id.shape).reshape(-1)
        dest = dest.reshape(-1)
        comp_tiles = jnp.full((M + 1,), num_tiles, jnp.int32).at[dest].set(
            flat_tiles.astype(jnp.int32), mode="drop")[:M]
        comp_gauss = jnp.full((M + 1,), -1, jnp.int32).at[dest].set(
            gauss_idx.astype(jnp.int32), mode="drop")[:M]

    if sort_mode == "twotier":
        if return_slots:
            raise NotImplementedError("slots not supported with twotier")
        # rank = position in depth order; it rides INSIDE the sort key so
        # the main and tail candidate groups interleave correctly:
        # key = tile * RANK_LIM + rank is one int32 (single-key unstable
        # sort — (tile, rank) pairs are unique per gaussian)
        rank_lim = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
        if (num_tiles + 1) * rank_lim >= 2**31:
            raise NotImplementedError(
                f"twotier packed key overflows int32 at n={n}, "
                f"num_tiles={num_tiles} — use binning='onesort'")

        def _tier(r0, r1, rect_w_t, rmin_x_t, rmin_y_t, capped_t, offs_t,
                  rank_t, gauss_t):
            """Candidate keys/payload for ranks [r0, r1) of one tier.
            All *_t inputs are [Nt] vectors; returns flat [len, (r1-r0)*Nt]."""
            r_col = jnp.arange(r0, r1, dtype=jnp.int32)[:, None]
            recip = 1.0 / rect_w_t[None, :].astype(jnp.float32)
            q = jnp.floor(
                (r_col.astype(jnp.float32) + 0.5) * recip).astype(jnp.int32)
            cand_x = rmin_x_t[None, :] + (r_col - q * rect_w_t[None, :])
            cand_y = rmin_y_t[None, :] + q
            valid = (r_col < capped_t[None, :]) & (
                offs_t[None, :] + r_col < M)
            tile_id = jnp.where(valid, cand_y * tx + cand_x, num_tiles)
            key = tile_id * rank_lim + rank_t[None, :]
            gauss = jnp.where(valid, gauss_t[None, :], -1)
            return (key.T.reshape(-1).astype(jnp.int32),
                    gauss.T.reshape(-1).astype(jnp.int32))

        rank_all = jnp.arange(n, dtype=jnp.int32)
        key_main, gauss_main = _tier(
            0, R0, rect_w, rmin_x, rmin_y, touched_capped, offsets,
            rank_all, order)

        # ONE row-gather of every tail-tier per-gaussian field
        tail_packed = jnp.stack([
            rect_w, rmin_x, rmin_y, touched_capped, offsets, rank_all, order,
        ], axis=0).T[sel_idx]                                   # [K, 7]
        key_tail, gauss_tail = _tier(
            R0, R,
            tail_packed[:, 0], tail_packed[:, 1], tail_packed[:, 2],
            tail_packed[:, 3], tail_packed[:, 4], tail_packed[:, 5],
            tail_packed[:, 6])

        keys = jnp.concatenate([key_main, key_tail])
        gauss = jnp.concatenate([gauss_main, gauss_tail])
        sort_keys, sort_gauss = jax.lax.sort(
            (keys, gauss), num_keys=1, is_stable=False)
        S = keys.shape[0]
        keep_m = min(M, S)
        sort_keys = sort_keys[:keep_m]
        sort_gauss = sort_gauss[:keep_m]
        if keep_m < M:
            sort_keys = jnp.pad(sort_keys, (0, M - keep_m),
                                constant_values=num_tiles * rank_lim)
            sort_gauss = jnp.pad(sort_gauss, (0, M - keep_m),
                                 constant_values=-1)
        sort_tiles = sort_keys // rank_lim
        sort_m = None

    if sort_mode == "onesort":
        # Profiling on TPU v5e shows scatters lower to a SERIAL per-update
        # loop (~7 ms for the 1.1M-candidate compaction scatter) while
        # lax.sort is fast (~0.4 ms at 280k). So: skip compaction entirely
        # and stable-sort ALL N*R candidates by tile id — invalid slots
        # carry the sentinel tile and sort to the end, so the first M
        # entries are exactly the compacted, tile-grouped, depth-ordered
        # instances. Candidates that would exceed the budget are
        # pre-dropped (same selection as the compaction path, so results
        # stay bit-exact including overflow).
        #
        # The expansion runs TRANSPOSED [R, N]: with R on lanes a [N, R]
        # candidate tensor uses R of 128 lanes (the profile showed ~15
        # near-empty VPU passes); [R, N] keeps N on lanes. The g-major
        # candidate order the stable sort needs is restored by ONE
        # transpose per sort operand.
        r_col = jnp.arange(R, dtype=jnp.int32)[:, None]     # [R, 1]
        # r // w for r < R without integer division (int32 div by a VECTOR
        # lowers to slow multi-pass sequences on TPU): one f32 reciprocal
        # multiply. floor((r + 0.5) * (1/w)) is exact for integer r, w in
        # this range — (r + 0.5)/w sits at least 0.5/w from any integer,
        # while the reciprocal's rounding error is ~1e-7 * r. (The previous
        # R-1 fused-compare loop was O(R^2 N): 1.03 ms/step at R=12.)
        w_row = rect_w[None, :]
        recip = 1.0 / w_row.astype(jnp.float32)
        q = jnp.floor(
            (r_col.astype(jnp.float32) + 0.5) * recip).astype(jnp.int32)
        cand_x = rmin_x[None, :] + (r_col - q * w_row)      # [R, N]
        cand_y = rmin_y[None, :] + q
        valid = r_col < touched_capped[None, :]
        tile_id = jnp.where(valid, cand_y * tx + cand_x, num_tiles)
        over_budget = offsets[None, :] + r_col >= M
        tile_all = jnp.where(valid & ~over_budget, tile_id, num_tiles)
        gauss_all = jnp.where(
            valid & ~over_budget,
            jnp.broadcast_to(order[None, :], (R, n)), -1,
        )
        operands = [tile_all.T.reshape(-1).astype(jnp.int32),
                    gauss_all.T.reshape(-1).astype(jnp.int32)]
        if return_slots:  # carry the compact index m through the sort
            operands.append(jnp.where(
                valid & ~over_budget, offsets[None, :] + r_col, M
            ).T.reshape(-1).astype(jnp.int32))
        sorted_ops = jax.lax.sort(tuple(operands), num_keys=1, is_stable=True)
        keep_m = min(M, n * R)
        pad_vals = (num_tiles, -1, M)
        sorted_ops = [
            jnp.pad(a[:keep_m], (0, M - keep_m), constant_values=pv)
            if keep_m < M else a[:keep_m]
            for a, pv in zip(sorted_ops, pad_vals)
        ]
        sort_tiles, sort_gauss = sorted_ops[0], sorted_ops[1]
        sort_m = sorted_ops[2] if return_slots else None
    elif sort_mode == "count":
        # O(M) STABLE COUNTING SORT by tile — the XLA replacement for the
        # CUDA radix sort (rasterizer_impl.cu:303) that skips comparison
        # sorting entirely. comp_* is already in depth order, so a stable
        # grouping by tile id gives the identical instance ordering:
        #   dest(i) = aligned_start[tile_i]            (chunk-padded base)
        #           + carry[block_i, tile_i]           (earlier blocks)
        #           + |{j < i in block : tile_j = tile_i}|  (within block)
        # The within-block term is a pairwise-equality reduction that XLA
        # fuses (no [B, C, C] materialization); everything else is one
        # scatter-add histogram, one cumsum and gathers — no sort passes.
        C = count_block
        pad_m = (-M) % C
        B = (M + pad_m) // C
        t_sent = num_tiles  # sentinel tile for padding / dropped slots
        tiles_b = jnp.pad(comp_tiles, (0, pad_m),
                          constant_values=t_sent).reshape(B, C)

        # per-block histograms via one scatter-add into [B * (T+1)]
        b_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), C).reshape(B, C)
        hist = jnp.zeros((B * (num_tiles + 1),), jnp.int32).at[
            (b_idx * (num_tiles + 1) + tiles_b).reshape(-1)
        ].add(1).reshape(B, num_tiles + 1)
        carry = jnp.cumsum(hist, axis=0) - hist          # exclusive over blocks
        total = hist.sum(axis=0)                         # [T+1] tile counts

        padded = ((total[:num_tiles] + chunk - 1) // chunk) * chunk
        aligned_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
        )
        base = jnp.concatenate([aligned_starts[:num_tiles],
                                jnp.full((1,), M_out, jnp.int32)])

        within = jnp.sum(
            (tiles_b[:, None, :] == tiles_b[:, :, None])
            & (jnp.arange(C)[None, :] < jnp.arange(C)[:, None])[None],
            axis=-1, dtype=jnp.int32,
        )                                                 # [B, C]
        dest = (
            base[tiles_b]
            + jnp.take_along_axis(carry, tiles_b, axis=1)
            + within
        )
        dest = jnp.where(tiles_b == t_sent, M_out, dest).reshape(-1)[:M]
        instances = jnp.full((M_out + 1,), -1, jnp.int32).at[dest].set(
            comp_gauss, mode="drop")[:M_out]

        return InstanceLists(
            instances=instances,
            tile_starts=aligned_starts,
            overflow=dropped, grid=grid,
        )

    if sort_mode == "stable":
        if return_slots:
            sort_tiles, sort_gauss, sort_m = jax.lax.sort(
                (comp_tiles, comp_gauss, jnp.arange(M, dtype=jnp.int32)),
                num_keys=1, is_stable=True,
            )
        else:
            sort_tiles, sort_gauss = jax.lax.sort(
                (comp_tiles, comp_gauss), num_keys=1, is_stable=True
            )
    elif sort_mode == "twokey":
        comp_depth = jnp.where(
            comp_gauss >= 0, depth[jnp.maximum(comp_gauss, 0)], jnp.inf
        )
        sort_tiles, _, sort_gauss = jax.lax.sort(
            (comp_tiles, comp_depth, comp_gauss), num_keys=2, is_stable=False
        )
    # ('onesort' arrives here with sort_tiles/sort_gauss already built)
    group_counts = group_tail = None
    if return_groups:
        # per-GAUSSIAN-ID instance counts for the sort-based gather
        # transpose (render._take_packed_grouped). kept = the pre-drop
        # survivor count per depth rank; one n-length sort inverts the
        # depth order (sorts are ~40x cheaper than scatters on TPU).
        if sort_mode not in ("onesort", "twotier"):
            raise NotImplementedError(
                f"return_groups requires 'onesort'/'twotier', "
                f"got {sort_mode!r}")
        kept = jnp.minimum(touched_capped, jnp.maximum(M - offsets, 0))
        _, inv_order = jax.lax.sort(
            (order.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        group_counts = kept[inv_order]
        if sort_mode == "twotier":
            group_tail = order[sel_idx]
    raw_starts = jnp.searchsorted(
        sort_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = raw_starts[1:] - raw_starts[:-1]

    if layout == "compact":
        # NO re-layout at all: the tile-sorted array IS the instance array
        # and the raw (unaligned) searchsorted offsets are the ranges — the
        # blend kernel masks window heads/tails by position. Kills both the
        # chunk padding (1/3 of the downstream gather/scatter volume) and
        # the re-layout scatter.
        if return_slots:
            raise NotImplementedError("slots not supported with compact")
        return InstanceLists(
            instances=sort_gauss,
            tile_starts=raw_starts,
            overflow=dropped, grid=grid,
            group_counts=group_counts, group_tail=group_tail,
        )

    # chunk-aligned re-layout
    padded = ((counts + chunk - 1) // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    idx = jnp.arange(M, dtype=jnp.int32)
    tile_of = jnp.clip(sort_tiles, 0, num_tiles)
    rank = idx - raw_starts[jnp.clip(tile_of, 0, num_tiles - 1)]
    in_range = sort_tiles < num_tiles
    dst = jnp.where(
        in_range, aligned_starts[jnp.clip(tile_of, 0, num_tiles - 1)] + rank,
        M_out,
    )
    if relayout == "gather":
        # invert the (tile, rank) -> slot map instead of scattering: the
        # per-slot tile comes from a searchsorted over the SMALL (T+1)
        # starts array (fast, unlike large-array searchsorted), the rest
        # are gathers — scatters serialize on TPU, gathers don't.
        o_idx = jnp.arange(M_out, dtype=jnp.int32)
        t_of_o = (jnp.searchsorted(
            aligned_starts, o_idx, side="right") - 1).astype(jnp.int32)
        t_clip = jnp.clip(t_of_o, 0, num_tiles - 1)
        rank_o = o_idx - aligned_starts[t_clip]
        src = jnp.minimum(raw_starts[t_clip] + rank_o, M - 1)
        keep = (rank_o < counts[t_clip]) & (o_idx < aligned_starts[num_tiles])
        instances = jnp.where(keep, sort_gauss[src], -1)
    else:
        instances = jnp.full((M_out + 1,), -1, jnp.int32).at[dst].set(
            sort_gauss, mode="drop")[:M_out]

    slots = None
    if return_slots:
        if sort_mode not in ("stable", "onesort"):
            raise NotImplementedError(
                f"return_slots requires sort_mode 'stable'/'onesort', "
                f"got {sort_mode!r}")
        # scatter-free inverse of the instance gather: invert the sort
        # permutation with a SECOND sort (sorts are ~40x cheaper than
        # scatters on TPU), then read each candidate's output slot.
        _, k_of_m = jax.lax.sort(
            (sort_m, jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        dst_by_m = dst[k_of_m]                               # [M]
        r_row = jnp.arange(R, dtype=jnp.int32)[None, :]
        if sort_mode == "onesort":                           # valid is [R, N]
            slot_valid = (valid & ~over_budget).T            # [N, R]
        else:
            slot_valid = valid & (offsets[:, None] + r_row < M)
        m_nr = jnp.minimum(offsets[:, None] + r_row, M - 1)
        slot_sorted = jnp.where(slot_valid, dst_by_m[m_nr], M_out)
        _, inv_order = jax.lax.sort(
            (order.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        slots = slot_sorted[inv_order]

    return InstanceLists(
        instances=instances,
        tile_starts=aligned_starts,
        overflow=dropped, grid=grid,
        slots=slots,
        group_counts=group_counts, group_tail=group_tail,
    )


@partial(jax.jit, static_argnames=(
    "grid", "max_per_tile", "max_tiles_per_gaussian", "block"))
def build_tile_lists_scan(
    mean2d: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    grid: tuple,
    max_per_tile: int = 1024,
    max_tiles_per_gaussian: int = 32,
    block: int = 4096,
) -> TileLists:
    """SORT-FREE tile binning.

    The CUDA pipeline's 64-bit radix sort (rasterizer_impl.cu:303) and our
    v1 XLA sort are both replaced by a counting scheme: process the
    depth-sorted Gaussians in blocks, keep a per-tile running count as the
    scan carry, and compute each instance's within-tile rank as

        rank(g, tile) = carry[tile] + (exclusive count of earlier
                        in-block gaussians covering tile)

    where the in-block count is a cumulative sum over a [T, B] coverage
    mask — pure VPU work instead of O(M log^2 M) sort passes. Ranks then
    scatter gaussian ids straight into the [T, K] lists.
    """
    n = mean2d.shape[0]
    ty, tx = grid
    num_tiles = ty * tx
    R = max_tiles_per_gaussian
    K = max_per_tile
    pad = (-n) % block
    nb = (n + pad) // block

    visible = radius > 0
    order = jnp.argsort(jnp.where(visible, depth, jnp.inf))
    mean2d_s = jnp.pad(mean2d[order], ((0, pad), (0, 0)))
    radius_s = jnp.pad(jnp.where(visible, radius, 0)[order], (0, pad))
    order_p = jnp.pad(order.astype(jnp.int32), (0, pad), constant_values=-1)

    rminx, rminy, rmaxx, rmaxy = gaussian_rect(mean2d_s, radius_s, grid)
    vis_s = radius_s > 0
    rect_w = jnp.maximum(rmaxx - rminx, 1)
    n_touched = jnp.where(vis_s, rect_w * (rmaxy - rminy), 0)
    dropped_tiles = jnp.sum(jnp.maximum(n_touched - R, 0))

    # tile coordinates [T]
    t_lin = jnp.arange(num_tiles, dtype=jnp.int32)
    t_x = (t_lin % tx)[:, None]
    t_y = (t_lin // tx)[:, None]

    r_lin = jnp.arange(R, dtype=jnp.int32)[None, :]

    def body(carry_counts, blk):
        bx0, by0, bx1, by1, gid, bw, btouched = blk
        # [T, B] coverage mask (invisible/padding gaussians excluded so they
        # neither shift ranks nor inflate counts)
        cover = (
            (t_x >= bx0[None, :]) & (t_x < bx1[None, :])
            & (t_y >= by0[None, :]) & (t_y < by1[None, :])
            & (btouched > 0)[None, :]
        )
        cover_i = cover.astype(jnp.int32)
        incl = jnp.cumsum(cover_i, axis=1)
        excl = incl - cover_i                       # exclusive within block

        # candidate tiles per gaussian (row-major rect walk, capped at R)
        cand_x = bx0[:, None] + r_lin % bw[:, None]          # [B, R]
        cand_y = by0[:, None] + r_lin // bw[:, None]
        valid = (r_lin < jnp.minimum(btouched, R)[:, None]) & (gid >= 0)[:, None]
        cand_t = jnp.where(valid, cand_y * tx + cand_x, 0)

        g_local = jnp.broadcast_to(
            jnp.arange(bx0.shape[0], dtype=jnp.int32)[:, None], cand_t.shape
        )
        rank = carry_counts[cand_t] + excl[cand_t, g_local]  # [B, R]

        write = valid & (rank < K)
        flat = jnp.where(write, cand_t * K + rank, num_tiles * K)
        ids_update = (flat, jnp.broadcast_to(gid[:, None], cand_t.shape))

        carry_counts = carry_counts + incl[:, -1]
        return carry_counts, ids_update

    blocks = (
        rminx.reshape(nb, block), rminy.reshape(nb, block),
        rmaxx.reshape(nb, block), rmaxy.reshape(nb, block),
        order_p.reshape(nb, block), rect_w.reshape(nb, block),
        n_touched.reshape(nb, block),
    )
    counts, (flat_all, gid_all) = jax.lax.scan(
        body, jnp.zeros((num_tiles,), jnp.int32), blocks
    )

    lists = jnp.full((num_tiles * K + 1,), -1, jnp.int32)
    lists = lists.at[flat_all.reshape(-1)].set(gid_all.reshape(-1), mode="drop")
    ids = lists[:-1].reshape(num_tiles, K)

    overflow = jnp.sum(jnp.maximum(counts - K, 0)) + dropped_tiles
    return TileLists(ids=ids, counts=counts, overflow=overflow, grid=grid)
