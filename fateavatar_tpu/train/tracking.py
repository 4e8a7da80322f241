"""Per-frame FLAME-tracking refinement (IMAvatar datasets).

Replaces the reference's sparse nn.Embedding tables + torch.optim.SparseAdam
(train/base.py:113-151) with plain arrays and a ROW-WISE Adam: each frame's
row keeps its own step count and moments, and an update touches only the
rows visited — exactly SparseAdam's semantics, expressed as masked writes.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class TrackingTables:
    """Per-frame learnable FLAME/camera corrections."""

    expression: jax.Array   # [F, n_exp]
    flame_pose: jax.Array   # [F, 15]
    cam_t: jax.Array        # [F, 3] camera translation override


@struct.dataclass
class RowAdamState:
    mu: TrackingTables
    nu: TrackingTables
    count: jax.Array        # [F] per-row step count


@struct.dataclass
class RowAdam:
    lr: float = struct.field(pytree_node=False, default=5e-4)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def init(self, tables: TrackingTables) -> RowAdamState:
        zeros = jax.tree.map(jnp.zeros_like, tables)
        return RowAdamState(
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, tables),
            count=jnp.zeros((tables.expression.shape[0],), jnp.int32),
        )

    def update_row(
        self,
        tables: TrackingTables,
        opt_state: RowAdamState,
        row_grads: TrackingTables,   # gradients for ONE row (leading dim 1 removed)
        idx: jax.Array,              # [] int32 frame index
    ) -> Tuple[TrackingTables, RowAdamState]:
        """SparseAdam step on a single row."""
        count = opt_state.count[idx] + 1
        c1 = 1.0 - self.b1 ** count.astype(jnp.float32)
        c2 = 1.0 - self.b2 ** count.astype(jnp.float32)

        def upd(table, mu, nu, g):
            m_row = self.b1 * mu[idx] + (1 - self.b1) * g
            v_row = self.b2 * nu[idx] + (1 - self.b2) * g * g
            step = -self.lr * (m_row / c1) / (jnp.sqrt(v_row / c2) + self.eps)
            return (
                table.at[idx].add(step),
                mu.at[idx].set(m_row),
                nu.at[idx].set(v_row),
            )

        new_t, new_mu, new_nu = {}, {}, {}
        for f in ("expression", "flame_pose", "cam_t"):
            t, m, v = upd(
                getattr(tables, f), getattr(opt_state.mu, f),
                getattr(opt_state.nu, f), getattr(row_grads, f),
            )
            new_t[f], new_mu[f], new_nu[f] = t, m, v

        return (
            TrackingTables(**new_t),
            RowAdamState(
                mu=TrackingTables(**new_mu),
                nu=TrackingTables(**new_nu),
                count=opt_state.count.at[idx].set(count),
            ),
        )


    def update_rows(
        self,
        tables: TrackingTables,
        opt_state: RowAdamState,
        row_grads: TrackingTables,   # gradients for B rows (leading dim B)
        idxs: jax.Array,             # [B] int32 frame indices
        mask: jax.Array,             # [B] bool; False rows are no-ops
    ) -> Tuple[TrackingTables, RowAdamState]:
        """SparseAdam step on B rows at once (the data-parallel form of
        :meth:`update_row`). ``mask`` disables rows — used to drop the
        duplicated tail frames a DP epoch pads its last batch with, which
        would otherwise double-step their row."""
        count = opt_state.count[idxs] + jnp.where(mask, 1, 0)    # [B]
        cf = count.astype(jnp.float32)
        c1 = 1.0 - self.b1 ** cf
        c2 = 1.0 - self.b2 ** cf

        def upd(table, mu, nu, g):
            m_old = mu[idxs]
            v_old = nu[idxs]
            mb = mask.reshape((-1,) + (1,) * (g.ndim - 1))
            m_row = jnp.where(mb, self.b1 * m_old + (1 - self.b1) * g, m_old)
            v_row = jnp.where(mb, self.b2 * v_old + (1 - self.b2) * g * g,
                              v_old)
            step = jnp.where(
                mb,
                -self.lr * (m_row / c1[:, None]) /
                (jnp.sqrt(v_row / c2[:, None]) + self.eps),
                0.0,
            )
            # masked rows are dropped from the scatters entirely (a masked
            # duplicate of an active index must not race its row write)
            return (
                table.at[live_idx].add(step, mode="drop"),
                mu.at[live_idx].set(m_row, mode="drop"),
                nu.at[live_idx].set(v_row, mode="drop"),
            )

        n_rows = tables.expression.shape[0]
        live_idx = jnp.where(mask, idxs, n_rows)   # out-of-range => dropped
        new_t, new_mu, new_nu = {}, {}, {}
        for f in ("expression", "flame_pose", "cam_t"):
            t, m, v = upd(
                getattr(tables, f), getattr(opt_state.mu, f),
                getattr(opt_state.nu, f), getattr(row_grads, f),
            )
            new_t[f], new_mu[f], new_nu[f] = t, m, v

        return (
            TrackingTables(**new_t),
            RowAdamState(
                mu=TrackingTables(**new_mu),
                nu=TrackingTables(**new_nu),
                count=opt_state.count.at[live_idx].set(count, mode="drop"),
            ),
        )


def tables_from_dataset(dataset) -> TrackingTables:
    """Initialize the tables from dataset FLAME params (train/base.py:117-137)."""
    return TrackingTables(
        expression=jnp.asarray(dataset.expressions, jnp.float32),
        flame_pose=jnp.asarray(dataset.flame_pose, jnp.float32),
        cam_t=jnp.asarray(dataset.world_mats[:, :3, 3], jnp.float32),
    )


def make_batched_tracking_step(loss_of_frame: Callable, optimizer: RowAdam):
    """Data-parallel tracking refinement: one jitted step optimizing B
    frames' rows at once (the DP-epoch companion of
    :func:`make_tracking_step`).

    ``loss_of_frame(expression, flame_pose, cam_t, frame_const, shared)``
    — ``frame_const`` is per-frame (vmapped, B-leading, shardable over the
    data mesh axis), ``shared`` holds the replicated model params/state.
    Rows in a batch are distinct by construction (a DP epoch pads its tail
    batch with wrapped duplicates — those are masked via ``mask``).
    """

    grad_fn = jax.grad(loss_of_frame, argnums=(0, 1, 2))
    batched_grads = jax.vmap(grad_fn, in_axes=(0, 0, 0, 0, None))

    @jax.jit
    def step(tables: TrackingTables, opt_state: RowAdamState,
             idxs: jax.Array, mask: jax.Array, frame_consts, shared):
        e = tables.expression[idxs]
        p = tables.flame_pose[idxs]
        t = tables.cam_t[idxs]
        ge, gp, gt = batched_grads(e, p, t, frame_consts, shared)
        row_grads = TrackingTables(expression=ge, flame_pose=gp, cam_t=gt)
        return optimizer.update_rows(tables, opt_state, row_grads, idxs, mask)

    return step


def make_tracking_step(loss_of_frame: Callable, optimizer: RowAdam):
    """Build a jitted step optimizing ONE frame's tracking row.

    ``loss_of_frame(expression, flame_pose, cam_t, frame_const) -> scalar``
    closes over model params (frozen during tracking, matching
    train/base.py:198-235 where only the embeddings receive gradients).
    """

    grad_fn = jax.grad(loss_of_frame, argnums=(0, 1, 2))

    @jax.jit
    def step(tables: TrackingTables, opt_state: RowAdamState,
             idx: jax.Array, frame_const):
        e = tables.expression[idx]
        p = tables.flame_pose[idx]
        t = tables.cam_t[idx]
        ge, gp, gt = grad_fn(e, p, t, frame_const)
        row_grads = TrackingTables(expression=ge, flame_pose=gp, cam_t=gt)
        return optimizer.update_row(tables, opt_state, row_grads, idx)

    return step
