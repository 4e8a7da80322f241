"""Exact k-nearest-neighbour distances on TPU.

Replaces ``simple-knn``'s Morton-sorted CUDA KNN (submodules/simple-knn) and
pytorch3d ``knn_points`` (model/fateavatar.py:596-608). For avatar-scale
point sets (N ~ 65k-200k) an exact chunked pairwise distance + top_k maps
straight onto the MXU and needs no spatial data structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_dists(points: jax.Array, k: int = 6, chunk: int = 4096) -> jax.Array:
    """Squared distances to the k nearest neighbours (self included at 0).

    Args:
      points: [N, 3] float32.
      k: neighbours to return (including self).
      chunk: query rows per MXU tile-sweep.

    Returns:
      [N, k] squared distances, ascending (column 0 is self / 0.0).
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    sq = jnp.sum(points * points, axis=-1)  # [N]

    def body(q):  # q: [chunk, 3]
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)
        # ||q - p||^2 = |q|^2 - 2 q.p + |p|^2 ; the q.p term is one big matmul
        d2 = qsq - 2.0 * (q @ points.T) + sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return -neg_top

    out = jax.lax.map(body, pts.reshape(-1, chunk, 3))
    return out.reshape(-1, k)[:n]


def mean_knn_distance(points: jax.Array, k: int = 6) -> jax.Array:
    """Mean distance to the nearest non-self neighbour — the splat scale
    initializer (model/fateavatar.py:596-608 uses sqrt(dists[..., 1]))."""
    d2 = knn_dists(points, k=k)
    return jnp.sqrt(jnp.maximum(d2[:, 1], 1e-20))
