"""Per-attribute Adam with surgery-free moment management.

TPU-native equivalent of train/optim.py:11-123 (per-group torch.optim.Adam)
plus the optimizer-state surgery scattered through model/fateavatar.py
(:637-672 extend, :683-697 prune, :719-728 reset). Because splat arrays have
static capacity, "surgery" reduces to zeroing moment rows — implemented here
as explicit pytree ops on a transparent Adam state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MultiAdamState:
    mu: Any
    nu: Any
    count: jax.Array


@struct.dataclass
class MultiAdam:
    """Adam whose learning rate is a PYTREE matching the params (one lr per
    leaf), with torch-compatible bias correction (betas (0.9, 0.999),
    eps 1e-8 — torch.optim.Adam defaults used by the reference)."""

    lr_tree: Any = struct.field(pytree_node=False)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def init(self, params) -> MultiAdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return MultiAdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                              count=jnp.zeros((), jnp.int32))

    def update(self, grads, opt_state: MultiAdamState, params):
        count = opt_state.count + 1
        b1, b2 = self.b1, self.b2
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt_state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, opt_state.nu, grads)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf_update(lr, m, v):
            mhat = m / c1
            vhat = v / c2
            return -lr * mhat / (jnp.sqrt(vhat) + self.eps)

        lr_tree = self._expand_lrs(params)
        updates = jax.tree.map(leaf_update, lr_tree, mu, nu)
        return updates, MultiAdamState(mu=mu, nu=nu, count=count)

    def _expand_lrs(self, params):
        """lr_tree may be a dict keyed by dataclass field name (each field's
        lr is broadcast over that field's subtree — fields may themselves be
        parameter pytrees, e.g. a flax MLP), or any pytree matching params."""
        if isinstance(self.lr_tree, dict):
            updates = {}
            for name in params.__dataclass_fields__:
                lr = self.lr_tree.get(name, 0.0)
                updates[name] = jax.tree.map(
                    lambda _: lr, getattr(params, name)
                )
            return params.replace(**updates)
        return self.lr_tree


def apply_updates(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def zero_moment_rows(opt_state: MultiAdamState, touched: jax.Array,
                     fields: tuple) -> MultiAdamState:
    """Zero Adam moments at ``touched`` slots for the named dataclass fields
    (the reference gives freshly densified splats zero moments,
    fateavatar.py:644-645)."""

    def zero_rows(tree):
        updates = {}
        for f in fields:
            leaf = getattr(tree, f)
            mask = touched.reshape((-1,) + (1,) * (leaf.ndim - 1))
            updates[f] = jnp.where(mask, 0.0, leaf)
        return tree.replace(**updates)

    return opt_state.replace(mu=zero_rows(opt_state.mu), nu=zero_rows(opt_state.nu))


def zero_moment_field(opt_state: MultiAdamState, field: str) -> MultiAdamState:
    """Zero the full moment tensors of one field (opacity reset,
    fateavatar.py:722-724)."""
    return opt_state.replace(
        mu=opt_state.mu.replace(**{field: jnp.zeros_like(getattr(opt_state.mu, field))}),
        nu=opt_state.nu.replace(**{field: jnp.zeros_like(getattr(opt_state.nu, field))}),
    )


def fateavatar_optimizers(training_cfg: dict):
    """The two optimizer groups of the reference (train/optim.py:11-37):
    'gs' over splat attributes with per-attribute LRs, 'bs' over the FLAME
    personalization deltas. Here both live in ONE MultiAdam whose lr pytree
    encodes the groups."""
    lrs = dict(
        opacity=training_cfg.get("opacity_lr", 0.05),
        offset=training_cfg.get("offset_lr", 0.0016),
        features_dc=training_cfg.get("feature_dc_lr", 0.0025),
        features_rest=training_cfg.get("feature_dc_lr", 0.0025) / 20.0,
        rotation=training_cfg.get("rotation_lr", 0.001),
        scaling=training_cfg.get("scaling_lr", 0.005),
        delta_shapedirs=training_cfg.get("delta_shapedirs_lr", 1e-5),
        delta_posedirs=training_cfg.get("delta_posedirs_lr", 1e-5),
        delta_vertex=training_cfg.get("delta_vertex_lr", 1e-4),
    )
    return MultiAdam(lr_tree=lrs)
