"""fateavatar_tpu — a TPU-native (JAX/XLA/Pallas) framework for full-head
Gaussian avatars with textural editing, re-designed from scratch with the
capabilities of FateAvatar (zjwfufu/FateAvatar, CVPR 2025).

Design stance (vs the CUDA/PyTorch reference):
  * one functional core under ``jax.jit``: ``state -> (image, aux)``,
  * splat state is a pytree with STATIC capacity and an alive mask —
    densify / prune / opacity-reset are masked index writes, not
    optimizer-state surgery,
  * the differentiable tile rasterizer is a Pallas kernel pipeline with a
    custom VJP (reference: ``submodules/diff-gaussian-rasterization``),
  * multi-chip scaling is expressed with ``jax.sharding`` meshes (the
    reference is single-GPU only).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") in ("cpu", "tpu", "gpu", "cuda"):
    # Some site configurations force-register accelerator plugins through
    # jax.config, which silently overrides the JAX_PLATFORMS env var. Restore
    # standard JAX behaviour for the standard platform names: the env var
    # wins. (Plugin-specific aliases are left to the plugin.)
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
