"""The ``render()`` facade — same contract as the reference's
volume_rendering/render_3dgs.py:7-81, TPU-native internals.

Pipeline: per-Gaussian preprocess (pure JAX, XLA-fused) -> tile binning
(XLA sort/scatter, stop-gradient) -> per-tile gather -> tile blend (Pallas
kernel with custom VJP, or the XLA fallback). The per-instance gradients
produced by the blend VJP are scatter-added back to per-Gaussian tensors by
XLA's gather transpose — the deterministic TPU replacement for the CUDA
backward's atomicAdd (backward.cu:439-556).

The ``means2d_probe`` input reproduces the reference's ``screenspace_points``
retain_grad trick (render_3dgs.py:22-27): pass a zeros [N, 2] array and take
``jax.grad`` w.r.t. it to obtain the screen-space position gradients that
drive densification (model/fateavatar.py:734-737).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.render import binning
from fateavatar_tpu.render.blend_tiles import (
    blend_tiles_pallas,
    blend_tiles_xla,
    tiles_to_image,
)
from fateavatar_tpu.render.preprocess import preprocess
from fateavatar_tpu.render.splats import Gaussians


@struct.dataclass
class RenderConfig:
    max_per_tile: int = struct.field(pytree_node=False, default=1024)
    max_tiles_per_gaussian: int = struct.field(pytree_node=False, default=16)
    instance_budget: int = struct.field(pytree_node=False, default=0)  # 0 = 6N
    chunk: int = struct.field(pytree_node=False, default=64)
    impl: str = struct.field(pytree_node=False, default="auto")  # auto|pallas|xla
    # instance binning flavour: 'onesort' (default — one full-candidate
    # stable sort, no scatters; fastest on TPU, see docs/STATUS_ROUND1.md),
    # 'sort' (compaction scatter + short sort), 'scan', 'count', 'twokey',
    # 'gather' — all bit-exact, kept A/B-able
    binning: str = struct.field(pytree_node=False, default="onesort")
    count_block: int = struct.field(pytree_node=False, default=256)
    # 'twotier' binning: every gaussian expands at most tail_r0 tiles; only
    # the tail_k largest-footprint gaussians expand to the full R cap
    # (0 = max(256, N // 16)). Shrinks the sorted candidate array from N*R
    # to N*r0 + K*(R - r0) on heavy-tailed occupancy distributions.
    tail_r0: int = struct.field(pytree_node=False, default=4)
    tail_k: int = struct.field(pytree_node=False, default=0)
    # consumed by the Trainer at startup: measure the dataset's occupancy
    # and replace budget/R/tail_k with sized values (render/autosize.py)
    autosize: bool = struct.field(pytree_node=False, default=False)
    # gradient-accumulation strategy for the instance gather's transpose.
    # All three are bit-exact; A/B on the TPU v5e chained train step keeps
    # XLA's plain scatter-add as default (17.0 it/s):
    #   bwd_sorted_scatter — presort cotangent rows by gaussian id +
    #     indices_are_sorted scatter; REJECTED (16.1 it/s — the permutation
    #     row-gather costs more than collision serialization saves).
    #   bwd_slots — [N, R] slot table built in binning, reduce by gather;
    #     REJECTED (13.8 it/s — slot build + [N,R,16] row gather dominate).
    bwd_sorted_scatter: bool = struct.field(pytree_node=False, default=False)
    bwd_slots: bool = struct.field(pytree_node=False, default=False)
    #   bwd_grouped — SCATTER-FREE transpose: one id-sort of the cotangent
    #     rows + structured [N, r0] (+tail [K, R-r0]) row gathers using
    #     binning's per-gaussian kept counts (_take_packed_grouped).
    #     Requires binning 'onesort'/'twotier'.
    bwd_grouped: bool = struct.field(pytree_node=False, default=False)
    # re-layout of sorted instances into the chunk-aligned array:
    # 'scatter' (XLA scatter) or 'gather' (small-searchsorted inverse map)
    relayout: str = struct.field(pytree_node=False, default="scatter")
    # instance-array layout: 'compact' (default — raw unaligned ranges, the
    # kernel masks window heads/tails by position: no chunk padding, no
    # re-layout pass; 18.6 -> 20.3 it/s) or 'aligned' (chunk-padded
    # per-tile ranges). Requires binning 'onesort'/'sort'/'twokey'/'twotier'.
    layout: str = struct.field(pytree_node=False, default="compact")
    # pallas kernel flavour: 'instances' = CUDA-layout flat ranges (no per-
    # tile cap, less data movement); 'tiles' = dense [T, K] lists
    kernel: str = struct.field(pytree_node=False, default="instances")
    # chunk-granular early exit once all of a tile's pixels saturate below
    # this transmittance (renderCUDA's T < 1e-4, forward.cu:343-351).
    # 0.0 = exact closed-form blend (the library default; goldens pin it).
    # Only the 'instances' Pallas kernel honors it.
    t_cutoff: float = struct.field(pytree_node=False, default=0.0)

    def resolve_impl(self) -> str:
        if self.impl != "auto":
            return self.impl
        return "pallas" if jax.default_backend() == "tpu" else "xla"


@jax.custom_vjp
def _take_packed(packed, ids, slots):
    """Instance gather with a scatter-free transpose.

    Forward: plain row gather ``packed[ids].T`` ([N+1, C] -> [C, M]).
    Backward: instead of XLA's gather-transpose (a scatter-add that lowers
    to a SERIAL per-update loop on TPU, ~14 ms at 411k instances), sum each
    gaussian's <= R per-instance gradient rows through the precomputed
    ``slots`` table — pure gathers + a reduction."""
    del slots
    return jnp.take(packed, ids, axis=0).T


def _take_packed_fwd(packed, ids, slots):
    return _take_packed(packed, ids, slots), (slots, packed.shape[0])


def _take_packed_bwd(res, g):
    slots, n_rows = res                       # slots [N, R]; g [C, M]
    gt = jnp.concatenate(
        [g.T, jnp.zeros((1, g.shape[0]), g.dtype)], axis=0
    )                                          # [M + 1, C], zero sentinel row
    gsum = jnp.sum(gt[jnp.minimum(slots, gt.shape[0] - 1)], axis=1)  # [N, C]
    gpacked = jnp.concatenate(
        [gsum, jnp.zeros((n_rows - gsum.shape[0], g.shape[0]), g.dtype)],
        axis=0,
    )
    return gpacked, None, None


_take_packed.defvjp(_take_packed_fwd, _take_packed_bwd)


@jax.custom_vjp
def _take_packed_slim(packed, ids):
    """Instance gather whose transpose scatters only the 9 meaningful
    channels (mean2d, conic, color, opacity). Rows 9..15 of ``packed`` are
    the valid flag and zero padding — no parameter gradient flows through
    them, so the scatter-add (a serial per-update loop on TPU) moves 44%
    less data than the full 16-channel transpose."""
    return jnp.take(packed, ids, axis=0).T


def _take_packed_slim_fwd(packed, ids):
    return _take_packed_slim(packed, ids), (ids, packed.shape[0])


def _take_packed_slim_bwd(res, g):
    ids, n_rows = res                          # g [16, M]
    g9 = jnp.zeros((n_rows, 9), g.dtype).at[ids].add(g[:9].T)
    gpacked = jnp.concatenate(
        [g9, jnp.zeros((n_rows, g.shape[0] - 9), g.dtype)], axis=1)
    return gpacked, None


_take_packed_slim.defvjp(_take_packed_slim_fwd, _take_packed_slim_bwd)


@jax.custom_vjp
def _take_packed_sorted(packed, ids):
    """Instance gather whose transpose presorts updates by target row.

    XLA's default gather-transpose emits an unsorted scatter-add that
    serializes per update on TPU (~14 ms at 411k spatially-clustered
    instances). Sorting the cotangent rows by gaussian id first (sorts are
    ~40x cheaper than scatters here) lets the scatter run with
    ``indices_are_sorted`` as a segmented reduction."""
    return jnp.take(packed, ids, axis=0).T


def _take_packed_sorted_fwd(packed, ids):
    return _take_packed_sorted(packed, ids), (ids, packed.shape[0])


def _take_packed_sorted_bwd(res, g):
    ids, n_rows = res                          # g [C, M]
    perm = jnp.argsort(ids)
    # slim: only rows 0..8 carry parameter gradients (see _take_packed_slim)
    g9 = jnp.zeros((n_rows, 9), g.dtype).at[ids[perm]].add(
        g[:9].T[perm], indices_are_sorted=True)
    return jnp.concatenate(
        [g9, jnp.zeros((n_rows, g.shape[0] - 9), g.dtype)], axis=1), None


_take_packed_sorted.defvjp(_take_packed_sorted_fwd, _take_packed_sorted_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _take_packed_grouped(packed, ids, counts, tail_ids, r0, r_max):
    """Instance gather whose transpose is SCATTER-FREE (binning 'groups').

    The serial per-update scatter (~13 ns/row at 151k spatially-clustered
    instances, the measured r2 floor) is replaced by known-fast primitives:
    ONE m-length sort groups the cotangent rows by gaussian id, and since
    binning knows each gaussian's kept-instance count, every gaussian's
    rows sit at [excl-cumsum(counts)[i], +counts[i]) — two structured row
    gathers + masked sums finish the reduction. With twotier binning only
    the K tail gaussians may own more than ``r0`` rows, so the main gather
    is [N, r0] (r0=4) instead of [N, R]: ~4x less gather volume than the
    rejected r2 'slots' variant.
    """
    del counts, tail_ids
    return jnp.take(packed, ids, axis=0).T


def _take_packed_grouped_fwd(packed, ids, counts, tail_ids, r0, r_max):
    return (_take_packed_grouped(packed, ids, counts, tail_ids, r0, r_max),
            (ids, counts, tail_ids, packed.shape[0]))


def _take_packed_grouped_bwd(r0, r_max, res, g):
    ids, counts, tail_ids, n_rows = res               # g [16, m]
    m = ids.shape[0]
    n = counts.shape[0]
    # sort instance slots by gaussian id (sentinel id n sorts last);
    # pos[j] = which instance slot holds the j-th id-ordered row
    _, pos = jax.lax.sort((ids, jnp.arange(m, dtype=jnp.int32)), num_keys=1)
    g_by_id = jnp.take(g[:9].T, pos, axis=0)          # [m, 9] id-grouped
    starts = jnp.cumsum(counts) - counts              # [n] exclusive
    r = jnp.arange(r0, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:, None] + r, m - 1)
    valid = r < jnp.minimum(counts, r0)[:, None]
    rows = jnp.take(g_by_id, idx.reshape(-1), axis=0).reshape(n, r0, 9)
    gsum = jnp.sum(jnp.where(valid[..., None], rows, 0.0), axis=1)
    k_tail = tail_ids.shape[0]
    if k_tail and r_max > r0:
        # twotier tail: only these K gaussians may own rows r0..r_max
        rt = jnp.arange(r0, r_max, dtype=jnp.int32)[None, :]
        tidx = jnp.minimum(starts[tail_ids][:, None] + rt, m - 1)
        tvalid = rt < counts[tail_ids][:, None]
        trows = jnp.take(g_by_id, tidx.reshape(-1), axis=0
                         ).reshape(k_tail, r_max - r0, 9)
        tsum = jnp.sum(jnp.where(tvalid[..., None], trows, 0.0), axis=1)
        gsum = gsum.at[tail_ids].add(tsum)            # K rows — negligible
    gpacked = jnp.concatenate(
        [gsum, jnp.zeros((n, g.shape[0] - 9), g.dtype)], axis=1)
    gpacked = jnp.concatenate(
        [gpacked, jnp.zeros((n_rows - n, g.shape[0]), g.dtype)], axis=0)
    return gpacked, None, None, None


_take_packed_grouped.defvjp(_take_packed_grouped_fwd,
                            _take_packed_grouped_bwd)


def render(
    camera: Camera,
    gaussians: Gaussians,
    bg_color: jax.Array,
    scaling_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    config: RenderConfig = RenderConfig(),
    means2d_probe: Optional[jax.Array] = None,
):
    """Rasterize ``gaussians`` into an image.

    Returns a dict: ``render`` [H, W, 3], ``radii`` [N], ``visibility_filter``
    [N] bool, ``t_final`` [H, W] transmittance, ``overflow`` scalar (instances
    dropped by the static per-tile cap; 0 in healthy configs).
    """
    means3d = gaussians.xyz
    scales = gaussians.get_scaling
    rots = gaussians.get_rotation
    opac = gaussians.get_opacity
    sh = None if override_color is not None else gaussians.get_features

    grid = binning.tile_grid(camera.width, camera.height)
    impl = config.resolve_impl()
    use_instances = (impl in ("pallas", "pallas_interpret")
                     and config.kernel == "instances")

    prep = preprocess(
        camera,
        means3d,
        scales,
        rots,
        opac,
        sh,
        gaussians.sh_degree,
        colors_precomp=override_color,
        scale_modifier=scaling_modifier,
        alive=gaussians.alive,
        stacked=not use_instances,
    )

    mx, my, c_a, c_b, c_c, col_r, col_g, col_b, op_v = prep.soa
    if means2d_probe is not None:
        # probe rows: accept [2, N] (lane-major, preferred) or legacy [N, 2]
        if means2d_probe.shape[0] == 2 and means2d_probe.ndim == 2:
            px_p, py_p = means2d_probe[0], means2d_probe[1]
        else:
            px_p, py_p = means2d_probe[..., 0], means2d_probe[..., 1]
        mx = mx + px_p
        my = my + py_p
    mean2d = (jnp.stack([mx, my], axis=-1) if not use_instances
              else None)

    if use_instances:
        from fateavatar_tpu.render.blend_instances import (
            CHUNK as INST_CHUNK,
            blend_instances_pallas,
        )

        sort_mode = (config.binning
                     if config.binning in ("twokey", "count", "gather",
                                           "onesort", "twotier")
                     else "stable")
        use_groups = (config.bwd_grouped
                      and sort_mode in ("onesort", "twotier"))
        ilists = binning.build_instance_lists(
            (jax.lax.stop_gradient(mx), jax.lax.stop_gradient(my)),
            jax.lax.stop_gradient(prep.depth),
            prep.radius, grid,
            max_tiles_per_gaussian=config.max_tiles_per_gaussian,
            instance_budget=config.instance_budget,
            chunk=INST_CHUNK,
            sort_mode=sort_mode,
            count_block=config.count_block,
            return_slots=(config.bwd_slots and config.layout == "aligned"
                          and sort_mode in ("stable", "onesort")),
            relayout=config.relayout,
            layout=config.layout,
            tail_r0=config.tail_r0,
            tail_k=config.tail_k,
            return_groups=use_groups,
        )
        n = mx.shape[0]
        # [10, N] stack of lane-major vectors (no relayout), ONE transpose
        # to the row-gatherable [N, 16] form, sentinel row appended
        packed_t = jnp.stack([
            mx, my, c_a, c_b, c_c, col_r, col_g, col_b, op_v,
            jnp.ones((n,), jnp.float32),
        ], axis=0)
        packed = jnp.concatenate([
            packed_t.T, jnp.zeros((n, 6), jnp.float32),
        ], axis=1)
        packed = jnp.concatenate(
            [packed, jnp.zeros((1, 16), jnp.float32)], axis=0
        )  # sentinel row (valid = 0)
        ids = jnp.where(ilists.instances >= 0, ilists.instances, n)
        if config.layout == "compact":
            # pad so the kernel's last chunk-aligned window stays in bounds
            m_real = ids.shape[0]
            m_pad = ((m_real + INST_CHUNK) // INST_CHUNK + 1) * INST_CHUNK
            ids = jnp.concatenate(
                [ids, jnp.full((m_pad - m_real,), n, jnp.int32)])
        if ilists.slots is not None:
            inst_data = _take_packed(packed, ids, ilists.slots)  # [16, M]
        elif use_groups and ilists.group_counts is not None:
            tail = (ilists.group_tail if ilists.group_tail is not None
                    else jnp.zeros((0,), jnp.int32))
            r0 = (config.tail_r0 if sort_mode == "twotier"
                  else config.max_tiles_per_gaussian)
            inst_data = _take_packed_grouped(
                packed, ids, ilists.group_counts, tail, r0,
                config.max_tiles_per_gaussian)                   # [16, M]
        elif config.bwd_sorted_scatter:
            inst_data = _take_packed_sorted(packed, ids)         # [16, M]
        else:
            inst_data = _take_packed_slim(packed, ids)           # [16, M]
        img_tiles, t_final = blend_instances_pallas(
            inst_data, ilists.tile_starts, bg_color, grid,
            impl == "pallas_interpret", config.t_cutoff,
        )
        image = tiles_to_image(img_tiles, grid, camera.width, camera.height)
        t_img = tiles_to_image(
            jnp.repeat(t_final[:, None, :], 3, axis=1), grid,
            camera.width, camera.height,
        )[..., 0]
        counts = ilists.tile_starts[1:] - ilists.tile_starts[:-1]
        return {
            "render": image,
            # stacked lazily; gradient flows through the probe, so unused
            # consumers cost nothing (DCE) and used ones pay one stack
            "viewspace_points": jnp.stack([mx, my], axis=-1),
            "visibility_filter": prep.visible,
            "radii": prep.radius,
            "t_final": t_img,
            "overflow": ilists.overflow,
            "tile_counts": counts,
        }

    if config.binning == "scan":
        lists = binning.build_tile_lists_scan(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(prep.depth),
            prep.radius,
            grid,
            max_per_tile=config.max_per_tile,
            max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        )
    else:
        lists = binning.build_tile_lists(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(prep.depth),
            prep.radius,
            grid,
            max_per_tile=config.max_per_tile,
            max_tiles_per_gaussian=config.max_tiles_per_gaussian,
            instance_budget=config.instance_budget,
        )

    # Per-tile gather: ONE packed gather (HBM-bound step — packing the nine
    # channels into a single [N, 9] array keeps it a single coalesced pass);
    # differentiable — XLA transposes it to a scatter-add.
    ids = jnp.maximum(lists.ids, 0)
    valid = lists.ids >= 0
    packed = jnp.concatenate(
        [mean2d, prep.conic, prep.color, prep.opacity[:, None]], axis=-1
    )
    packed_t = jnp.take(packed, ids, axis=0)
    mean2d_t = packed_t[..., 0:2]
    conic_t = packed_t[..., 2:5]
    color_t = packed_t[..., 5:8]
    opacity_t = packed_t[..., 8]

    if impl == "pallas" or impl == "pallas_interpret":
        img_tiles, t_final = blend_tiles_pallas(
            mean2d_t, conic_t, color_t, opacity_t,
            valid.astype(jnp.float32), lists.counts, bg_color,
            grid, config.chunk, impl == "pallas_interpret",
        )
    else:
        img_tiles, t_final = blend_tiles_xla(
            mean2d_t, conic_t, color_t, opacity_t, valid, bg_color,
            grid, chunk=config.chunk,
        )

    image = tiles_to_image(img_tiles, grid, camera.width, camera.height)
    t_img = tiles_to_image(
        jnp.repeat(t_final[:, None, :], 3, axis=1), grid,
        camera.width, camera.height,
    )[..., 0]

    return {
        "render": image,
        "viewspace_points": mean2d,
        "visibility_filter": prep.visible,
        "radii": prep.radius,
        "t_final": t_img,
        "overflow": lists.overflow,
        "tile_counts": lists.counts,
    }
