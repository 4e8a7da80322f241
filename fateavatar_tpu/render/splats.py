"""Gaussian splat containers (pytrees).

TPU-native re-design of volume_rendering/gaussian_model.py:37-419. Two key
departures from the reference:

* ``Gaussians`` holds RAW (pre-activation) attributes as a frozen pytree;
  activations are applied functionally at render time.
* Arrays are allocated at a STATIC capacity ``N`` with an ``alive`` mask.
  Densify / prune / opacity-reset (the reference's optimizer-state surgery,
  gaussian_model.py:271-416) become masked index writes that keep all shapes
  static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class Gaussians:
    """Raw splat attributes, capacity N (dead slots masked by ``alive``).

    Activation conventions (gaussian_model.py:39-49):
      xyz: world position        (identity)
      scaling: log-scale         (exp activation)
      rotation: wxyz quaternion  (normalize activation)
      opacity: logit             (sigmoid activation)
      features_dc/rest: SH coefficients, [N, 1, 3] / [N, K-1, 3]
    """

    xyz: jax.Array            # [N, 3]
    scaling: jax.Array        # [N, 3] (log)
    rotation: jax.Array       # [N, 4] (unnormalized wxyz)
    opacity: jax.Array        # [N, 1] (logit)
    features_dc: jax.Array    # [N, 1, 3]
    features_rest: jax.Array  # [N, K-1, 3]
    alive: jax.Array          # [N] bool
    sh_degree: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    # -- activated views ----------------------------------------------------
    @property
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jax.Array:
        return self.rotation / jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True
        ).clip(1e-8)

    @property
    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jax.Array:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


def make_gaussians(
    xyz,
    scaling,
    rotation,
    opacity,
    features_dc,
    features_rest=None,
    alive=None,
    sh_degree: int = 0,
) -> Gaussians:
    xyz = jnp.asarray(xyz, jnp.float32)
    n = xyz.shape[0]
    if features_rest is None:
        k = (sh_degree + 1) ** 2
        features_rest = jnp.zeros((n, k - 1, 3), jnp.float32)
    if alive is None:
        alive = jnp.ones((n,), bool)
    return Gaussians(
        xyz=xyz,
        scaling=jnp.asarray(scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(opacity, jnp.float32).reshape(n, 1),
        features_dc=jnp.asarray(features_dc, jnp.float32).reshape(n, 1, 3),
        features_rest=jnp.asarray(features_rest, jnp.float32),
        alive=jnp.asarray(alive, bool),
        sh_degree=sh_degree,
    )
