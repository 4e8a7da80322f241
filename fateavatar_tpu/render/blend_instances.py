"""Instance-range tile blend: the CUDA-layout Pallas kernel.

Where blend_tiles.py consumes dense [T, K] per-tile matrices (simple, but
pays for the K cap in gather/scatter volume and imposes a per-tile limit),
this kernel walks the FLAT depth-sorted instance array with per-tile
[start, end) ranges — the exact data layout of ``renderCUDA``
(rasterizer_impl.cu point_list + ranges; forward.cu:289-306 batched
shared-memory fetch becomes a double-buffered HBM->VMEM DMA pipeline).

* no per-tile cap: every binned instance is blended,
* instance data is DMA'd in fixed CHUNK=128 instance slices (tile ranges
  are chunk-aligned by build_instance_lists so DMAs never straddle tiles;
  128 satisfies Mosaic's lane-aligned HBM slicing),
* data lives TRANSPOSED as [16, M] so the sliced dimension is the 128-lane
  axis; one (16, 128) -> (128, 16) in-kernel transpose puts instances on
  sublanes for the blend math,
* backward recomputes forward per chunk and DMAs per-instance gradients
  back out; XLA's gather transpose scatter-adds them onto the Gaussians.

Channel layout (rows of the [16, M] array):
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
  5 color_r, 6 color_g, 7 color_b, 8 opacity, 9 valid, 10..15 zero pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fateavatar_tpu.render.binning import TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4  # renderCUDA's termination threshold (forward.cu:347)
P = TILE * TILE
ROW = 16
CHUNK = 128  # instances per DMA; lane-aligned


def _chunk_math(data, px, py):
    """Per-chunk alpha math. data [CHUNK, 16] (instances on sublanes)."""
    dx = data[:, 0:1] - px
    dy = data[:, 1:2] - py
    a = data[:, 2:3]
    b = data[:, 3:4]
    c = data[:, 4:5]
    op = data[:, 8:9]
    vl = data[:, 9:10]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    exp_power = jnp.exp(jnp.minimum(power, 0.0))
    raw = op * exp_power
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & (vl > 0)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, raw, keep, dx, dy, (a, b, c), exp_power


def _cumsum_sublanes(x):
    """Inclusive prefix sum over sublanes as ONE MXU matmul with a
    lower-triangular ones matrix — replaces a log2(C)-deep chain of
    dependent sublane rolls (each a full [C, P] VPU pass) with a single
    [C,C]x[C,P] dot the MXU does in a few microseconds."""
    c = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = (col <= row).astype(x.dtype)
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _cumprod_sublanes(x):
    """Inclusive prefix product via exp(cumsum(log x)). All inputs are
    1 - alpha in [0.01, 1] (ALPHA_MAX clamp), so the log is bounded and
    the exp/log roundtrip costs ~1e-7 relative — well inside the blend's
    float32 noise floor."""
    return jnp.exp(_cumsum_sublanes(jnp.log(x)))


def _pixels(grid_x, t):
    tile_x = (t % grid_x).astype(jnp.float32) * TILE
    tile_y = (t // grid_x).astype(jnp.float32) * TILE
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    return tile_x + (lin % TILE), tile_y + (lin // TILE)


def _fwd_kernel(starts_ref, inst_ref, bg_ref, img_ref, tfin_ref,
                scratch, sems, *, grid_x: int, cutoff: float = 0.0):
    t = pl.program_id(0)
    px, py = _pixels(grid_x, t)
    s = starts_ref[t]
    e = starts_ref[t + 1]
    # window the [s, e) range with CHUNK-aligned DMAs; with the compact
    # (unaligned) layout the head/tail of a window holds NEIGHBOUR tiles'
    # instances, masked out by position below. With the aligned layout the
    # mask is a no-op (s is CHUNK-aligned and [s, e) covers whole chunks).
    win0 = (s // CHUNK) * CHUNK
    nchunk = (e - win0 + CHUNK - 1) // CHUNK
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def get_dma(slot, i):
        off = pl.multiple_of(win0 + i * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunk > 0)
    def _():
        get_dma(0, 0).start()

    def body(carry):
        i, t_carry, q_carry, acc_r, acc_g, acc_b = carry
        slot = i % 2

        @pl.when(i + 1 < nchunk)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        data = scratch[slot].T                      # [CHUNK, 16]
        pos = win0 + i * CHUNK + sub
        in_range = ((pos >= s) & (pos < e)).astype(jnp.float32)
        alpha, _, _, _, _, _, _ = _chunk_math(data, px, py)
        alpha = alpha * in_range
        om = 1.0 - alpha
        t_incl = _cumprod_sublanes(om)              # UNMASKED cumulative
        # CUDA termination (forward.cu:346-351): q = unmasked global
        # transmittance is monotone, so q >= T_EPS is the sticky done
        # flag; the crossing instance is dropped and T freezes before it
        # (t_carry == q_carry while anything is kept, so weights use
        # q_carry; t_carry tracks the frozen CUDA T via min-over-kept).
        q_incl = q_carry * t_incl
        keep_t = (q_incl >= T_EPS).astype(jnp.float32)
        t_excl = t_incl / om
        w = alpha * keep_t * t_excl * q_carry
        acc_r = acc_r + jnp.sum(w * data[:, 5:6], axis=0, keepdims=True)
        acc_g = acc_g + jnp.sum(w * data[:, 6:7], axis=0, keepdims=True)
        acc_b = acc_b + jnp.sum(w * data[:, 7:8], axis=0, keepdims=True)
        t_carry = jnp.min(
            jnp.where(keep_t > 0.0, q_incl,
                      jnp.broadcast_to(t_carry, q_incl.shape)),
            axis=0, keepdims=True)
        q_carry = q_incl[CHUNK - 1 : CHUNK, :]
        return i + 1, t_carry, q_carry, acc_r, acc_g, acc_b

    init = (jnp.int32(0), jnp.ones((1, P), jnp.float32),
            jnp.ones((1, P), jnp.float32)) + tuple(
        jnp.zeros((1, P), jnp.float32) for _ in range(3)
    )
    if cutoff > 0.0:
        # stop once every pixel of the tile has terminated (q below the
        # exit threshold). With the exact T_EPS semantics above, any
        # cutoff <= T_EPS is PURE perf: every skipped instance would have
        # been dropped by the keep mask anyway — bit-identical results.
        def cond(carry):
            return (carry[0] < nchunk) & (jnp.max(carry[2]) >= cutoff)

        i_exit, t_final, _, ar, ag, ab = jax.lax.while_loop(cond, body, init)

        # the last executed body prefetched chunk i_exit — drain it
        @pl.when((i_exit > 0) & (i_exit < nchunk))
        def _():
            get_dma(i_exit % 2, i_exit).wait()
    else:
        # exact closed form: a fori_loop keeps the Mosaic pipeline simple
        t_final, _, ar, ag, ab = jax.lax.fori_loop(
            0, nchunk, lambda i, c: body((i,) + c)[1:], init[1:]
        )
    bg = bg_ref[0]
    img_ref[0, 0:1, :] = ar + t_final * bg[0]
    img_ref[0, 1:2, :] = ag + t_final * bg[1]
    img_ref[0, 2:3, :] = ab + t_final * bg[2]
    tfin_ref[0] = t_final


def _bwd_kernel(starts_ref, inst_ref, bg_ref, img_ref, tfin_ref,
                gimg_ref, gtfin_ref, gout_init_ref, gout_ref, bnd_ref,
                scratch, out_scratch, sems, out_sem,
                *, grid_x: int, cutoff: float = 0.0):
    del gout_init_ref  # aliased zeros -> gout_ref (fills coverage holes)
    t = pl.program_id(0)
    px, py = _pixels(grid_x, t)
    s = starts_ref[t]
    e = starts_ref[t + 1]
    win0 = (s // CHUNK) * CHUNK
    nchunk = (e - win0 + CHUNK - 1) // CHUNK
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    img = img_ref[0]
    t_n = tfin_ref[0]              # [1, P]
    g_img = gimg_ref[0]
    g_tfin = gtfin_ref[0]
    # The per-channel suffix terms S_j^c only ever enter dL/dalpha dotted
    # with the image cotangent: sum_c g_c S_j^c = (g.img) - cumsum_j(u)
    # with u_j = w_j (g.c_j). ONE prefix cumsum of u replaces the three
    # per-channel prefix cumsums (21 -> 7 sublane roll steps per chunk).
    gdotimg = (g_img[0:1] * img[0:1] + g_img[1:2] * img[1:2]
               + g_img[2:3] * img[2:3])                        # [1, P]

    # chunk 0's window can straddle the previous tile's range (compact
    # layout), so its gradients go to a private per-tile boundary buffer
    # (merged with a segment-sum outside); chunks >= 1 DMA straight out.
    bnd_ref[0] = jnp.zeros((ROW, CHUNK), jnp.float32)

    def get_dma(slot, i):
        off = pl.multiple_of(win0 + i * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunk > 0)
    def _():
        get_dma(0, 0).start()

    def body(carry):
        i, q_carry, pu = carry
        slot = i % 2

        @pl.when(i + 1 < nchunk)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(slot, i).wait()
        data = scratch[slot].T                      # [CHUNK, 16]
        pos = win0 + i * CHUNK + sub
        in_range = (pos >= s) & (pos < e)
        alpha, raw, keep, dx, dy, (ca, cb, cc), exp_power = _chunk_math(
            data, px, py
        )
        alpha = jnp.where(in_range, alpha, 0.0)
        keep = keep & in_range
        om = 1.0 - alpha
        t_incl = _cumprod_sublanes(om)              # UNMASKED cumulative
        # CUDA termination: same q >= T_EPS sticky mask as the forward;
        # dropped instances get no gradient (backward.cu:486-488), and
        # for every KEPT j the transmittance before j equals the
        # unmasked one, so t_j can keep using the unmasked t_excl.
        q_incl = q_carry * t_incl
        term = q_incl >= T_EPS
        keep = keep & term
        alpha = jnp.where(term, alpha, 0.0)
        t_excl = t_incl / om
        t_j = t_excl * q_carry
        w = alpha * t_j

        cl_r = data[:, 5:6]
        cl_g = data[:, 6:7]
        cl_b = data[:, 7:8]

        gdotc = (g_img[0:1] * cl_r + g_img[1:2] * cl_g
                 + g_img[2:3] * cl_b)               # [CHUNK, P]
        pu = pu + _cumsum_sublanes(w * gdotc)

        inv_om = 1.0 / om
        dalpha = (
            t_j * gdotc
            - (gdotimg - pu) * inv_om
            - g_tfin * t_n * inv_om
        )
        dalpha = jnp.where(keep, dalpha, 0.0)

        # CUDA does NOT gate gradients through the 0.99 alpha clamp
        # (backward.cu:499,538,554): dL_dG = op * dL_dalpha, dL_dop =
        # G * dL_dalpha unconditionally, so g_power uses the UNclamped
        # raw = op * G (equal to alpha when not clamped)
        g_power = dalpha * raw
        g_op = jnp.sum(dalpha * exp_power, axis=1, keepdims=True)

        grows = jnp.concatenate([
            jnp.sum(g_power * (-ca * dx - cb * dy), axis=1, keepdims=True),
            jnp.sum(g_power * (-cc * dy - cb * dx), axis=1, keepdims=True),
            jnp.sum(g_power * (-0.5 * dx * dx), axis=1, keepdims=True),
            jnp.sum(g_power * (-dx * dy), axis=1, keepdims=True),
            jnp.sum(g_power * (-0.5 * dy * dy), axis=1, keepdims=True),
            jnp.sum(w * g_img[0:1], axis=1, keepdims=True),
            jnp.sum(w * g_img[1:2], axis=1, keepdims=True),
            jnp.sum(w * g_img[2:3], axis=1, keepdims=True),
            g_op,
            jnp.zeros((CHUNK, ROW - 9), jnp.float32),
        ], axis=1)                                   # [CHUNK, 16]
        # chunk 0 -> boundary buffer; chunks >= 1 -> double-buffered DMA
        # (wait for the DMA that last used this slot before overwriting)
        oslot = i % 2

        def out_dma_for(j, sl):
            off = pl.multiple_of(win0 + j * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                out_scratch.at[sl],
                gout_ref.at[:, pl.ds(off, CHUNK)],
                out_sem.at[sl],
            )

        @pl.when(i == 0)
        def _():
            bnd_ref[0] = grows.T                     # [16, CHUNK]

        @pl.when(i >= 3)
        def _():
            out_dma_for(i - 2, oslot).wait()

        @pl.when(i >= 1)
        def _():
            out_scratch[oslot] = grows.T             # [16, CHUNK]
            out_dma_for(i, oslot).start()

        q_carry = q_incl[CHUNK - 1 : CHUNK, :]
        return i + 1, q_carry, pu[CHUNK - 1 : CHUNK]

    init = (jnp.int32(0), jnp.ones((1, P), jnp.float32),
            jnp.zeros((1, P), jnp.float32))
    if cutoff > 0.0:
        # must stop at the SAME chunk as the forward (same data, same
        # condition); skipped instances' TRUE gradients are zero (their
        # alpha is dropped by the keep mask), but their gout windows must
        # still be WRITTEN — see the zero-fill loop below
        def loop_cond(carry):
            return (carry[0] < nchunk) & (jnp.max(carry[1]) >= cutoff)

        i_exit = jax.lax.while_loop(loop_cond, body, init)[0]

        # drain the input prefetch started by the last executed body
        @pl.when((i_exit > 0) & (i_exit < nchunk))
        def _():
            get_dma(i_exit % 2, i_exit).wait()
    else:
        jax.lax.fori_loop(0, nchunk, lambda i, c: body((i,) + c)[1:],
                          init[1:])
        i_exit = nchunk

    # drain outstanding gradient write-backs (only chunks >= 1 DMA'd)
    def drain(j):
        @pl.when(j >= 1)
        def _():
            off = pl.multiple_of(win0 + j * CHUNK, CHUNK)
            pltpu.make_async_copy(
                out_scratch.at[j % 2],
                gout_ref.at[:, pl.ds(off, CHUNK)],
                out_sem.at[j % 2],
            ).wait()

    drain(i_exit - 2)
    drain(i_exit - 1)

    if cutoff > 0.0:
        # Chunks [i_exit, nchunk) were skipped by the early exit. Their
        # gout windows are NOT hole windows (they are this tile's
        # chunk >= 1 — chunk 0 always executes when nchunk > 0 since q
        # starts at 1 >= cutoff) and are not masked by the col < total
        # check outside, so without an explicit write their content is
        # whatever the aliased zeros-init buffer holds — STALE under
        # lax.scan (XLA hoists the zeros literal; the aliased kernel
        # mutates it in place — the r3 failure mode, see _call_bwd).
        # DMA a zeroed scratch into every skipped window: the true
        # gradient of every dropped instance is exactly zero.
        @pl.when(i_exit < nchunk)
        def _():
            out_scratch[0] = jnp.zeros((ROW, CHUNK), jnp.float32)

        def zero_window(j, c):
            off = pl.multiple_of(win0 + j * CHUNK, CHUNK)
            dma = pltpu.make_async_copy(
                out_scratch.at[0],
                gout_ref.at[:, pl.ds(off, CHUNK)],
                out_sem.at[0],
            )
            dma.start()
            dma.wait()
            return c

        jax.lax.fori_loop(jnp.maximum(i_exit, 1), nchunk, zero_window, 0)


def _call_fwd(inst_data, tile_starts, bg, grid, interpret, cutoff=0.0):
    ty, tx = grid
    T = ty * tx
    kern = functools.partial(_fwd_kernel, grid_x=tx, cutoff=cutoff)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # [16, M] stays in HBM
            pl.BlockSpec((1, 3), lambda t, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    img, tfin = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(tile_starts.astype(jnp.int32), inst_data, bg.reshape(1, 3))
    return img, tfin[:, 0, :]


def _call_bwd(inst_data, tile_starts, bg, img_tiles, t_final, g_img, g_tfin,
              grid, interpret, cutoff=0.0, gout_init=None):
    """``gout_init`` is a TEST-ONLY hook: the buffer aliased into gout.
    Production always passes fresh zeros; tests pass a DIRTY buffer to
    prove the result is independent of the aliased input's content
    (the guarantee the hole-window zeroing + the cutoff-path zero-fill
    DMAs provide)."""
    ty, tx = grid
    T = ty * tx
    M = inst_data.shape[1]
    kern = functools.partial(_bwd_kernel, grid_x=tx, cutoff=cutoff)
    tile3 = pl.BlockSpec((1, 3, P), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((1, 1, P), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3), lambda t, s: (0, 0), memory_space=pltpu.VMEM),
            tile3, tile1, tile3, tile1,
            pl.BlockSpec(memory_space=pl.ANY),      # gout init (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, ROW, CHUNK), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROW, CHUNK), jnp.float32),
            pltpu.VMEM((2, ROW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    gout, bnd = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ROW, M), jnp.float32),
            jax.ShapeDtypeStruct((T, ROW, CHUNK), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={7: 0},   # zeros input -> gout (coverage holes)
    )(tile_starts.astype(jnp.int32), inst_data, bg.reshape(1, 3),
      img_tiles, t_final[:, None, :], g_img, g_tfin[:, None, :],
      jnp.zeros((ROW, M), jnp.float32) if gout_init is None else gout_init)
    # merge each tile's boundary chunk (its first, possibly straddling,
    # window) back in: one tiny segment-sum over window index + an add
    n_win = (M + CHUNK - 1) // CHUNK
    w_t = jnp.clip(tile_starts[:-1] // CHUNK, 0, n_win - 1)
    merged = jax.ops.segment_sum(bnd, w_t, num_segments=n_win)
    pad = n_win * CHUNK - M
    gout_p = jnp.pad(gout, ((0, 0), (0, pad))) if pad else gout
    gout_p = gout_p.reshape(ROW, n_win, CHUNK)
    # HOLE windows: a window that is some tile's chunk-0 (grads -> bnd)
    # and no tile's chunk>=1 — exactly the windows whose boundary column
    # is a CHUNK-aligned tile start. The kernel never DMAs them, so their
    # content is whatever the aliased gout-init buffer held. That buffer
    # CANNOT be trusted to be zeros: under lax.scan XLA hoists the
    # loop-invariant zeros literal out of the loop, the aliased kernel
    # mutates it in place, and every iteration after the first reads the
    # previous iteration's gradients as "zeros" (caught as a PSNR
    # regression on the chip, r3; per-dispatch execution re-materializes
    # the literal each call, which is why single-step tests passed).
    # Zero them explicitly — with this plus the kernel's cutoff-path
    # zero-fill DMAs (chunks skipped by the early exit), correctness no
    # longer depends on the aliased input's content anywhere (all other
    # windows are fully DMA-overwritten; columns >= total are masked
    # below). test_dirty_gout_init_* pins this.
    aligned_start = (tile_starts[:-1] % CHUNK) == 0
    holes = jnp.zeros((n_win,), jnp.int32).at[w_t].max(
        aligned_start.astype(jnp.int32), mode="drop")
    gout_p = jnp.where(holes[None, :, None] > 0, 0.0, gout_p)
    gout = ((gout_p + merged.transpose(1, 0, 2))
            .reshape(ROW, n_win * CHUNK))[:, :M]
    # columns past the last real instance are never owned by any tile
    total = tile_starts[-1]
    col_ids = jnp.arange(M, dtype=jnp.int32)[None, :]
    return jnp.where(col_ids < total, gout, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def blend_instances_pallas(inst_data, tile_starts, bg, grid, interpret=False,
                           cutoff=0.0):
    """Instance-range blend. inst_data [16, M] (see module docstring),
    tile_starts [T+1] CHUNK-aligned. Returns (img_tiles [T,3,P],
    t_final [T,P]). ``cutoff`` > 0 enables the chunk-granular early exit
    once every pixel's transmittance drops below it (renderCUDA's T < 1e-4
    semantics, forward.cu:343-351); 0 keeps the exact closed form."""
    return _call_fwd(inst_data, tile_starts, bg, grid, interpret, cutoff)


def _vjp_fwd(inst_data, tile_starts, bg, grid, interpret, cutoff):
    img, tfin = _call_fwd(inst_data, tile_starts, bg, grid, interpret, cutoff)
    return (img, tfin), (inst_data, tile_starts, bg, img, tfin)


def _vjp_bwd(grid, interpret, cutoff, res, grads):
    inst_data, tile_starts, bg, img, tfin = res
    g_img, g_tfin = grads
    g_bg = jnp.einsum("tdp,tp->d", g_img, tfin)
    g_inst = _call_bwd(
        inst_data, tile_starts, bg, img, tfin, g_img, g_tfin, grid, interpret,
        cutoff,
    )
    return g_inst, None, g_bg


blend_instances_pallas.defvjp(_vjp_fwd, _vjp_bwd)
