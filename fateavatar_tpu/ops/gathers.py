"""Row gathers with MXU-friendly transposes.

``jnp.take(table, idx)`` where many indices collide (e.g. 70k splats
gathering from ~2-10k faces) autodiffs into a scatter-add that lowers to a
SERIAL per-update loop on TPU (~3.7 ms per gather at 70k updates — see
docs/STATUS_ROUND1.md per-op profile). :func:`gather_rows` keeps the same
forward but computes the transpose as a chunked one-hot matmul on the MXU:

    grad_table[f] = sum_n [idx_n == f] * grad_out[n]
                  = one_hot(idx).T @ grad_out

The one-hot factor is bf16 (0/1 are exact) with f32 accumulation, built in
chunks of ``chunk`` rows so the [N, F] factor never materializes whole.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jax.Array, idx: jax.Array, chunk: int = 8192):
    """``table[idx]`` ([F, D] x [N] -> [N, D]) with a matmul transpose."""
    return jnp.take(table, idx, axis=0)


def _gather_rows_fwd(table, idx, chunk):
    return gather_rows(table, idx, chunk), (idx, table.shape[0])


def _gather_rows_bwd(chunk, res, g):
    idx, F = res
    n = idx.shape[0]
    pad = (-n) % chunk
    idx_p = jnp.pad(idx, (0, pad), constant_values=F)  # OOB -> masked below
    g_p = jnp.pad(g, ((0, pad), (0, 0)))
    nb = idx_p.shape[0] // chunk
    f_ids = jnp.arange(F, dtype=idx.dtype)

    # bf16 one-hot on TPU (0/1 exact, MXU-native); f32 on CPU, whose XLA
    # thunk runtime lacks the BF16 x BF16 = F32 dot
    ot_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def body(carry, blk):
        bidx, bg = blk
        onehot = (bidx[:, None] == f_ids[None, :]).astype(ot_dtype)
        contrib = jax.lax.dot_general(
            onehot, bg.astype(ot_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry + contrib, None

    init = jnp.zeros((F, g.shape[1]), jnp.float32)
    grad_table, _ = jax.lax.scan(
        body, init,
        (idx_p.reshape(nb, chunk), g_p.reshape(nb, chunk, g.shape[1])),
    )
    return grad_table.astype(g.dtype), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
