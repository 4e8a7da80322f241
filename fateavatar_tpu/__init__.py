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

def _enable_compile_cache_if_tpu() -> bool:
    # Persistent XLA compilation cache: the flagship scan-epoch program
    # costs 50-80 s to compile per fresh process (minutes through a
    # remote-TPU tunnel); caching it makes restart/resume and repeated
    # CLI invocations pay it once. Opt out with FATEAVATAR_COMPILE_CACHE=0.
    # Non-TPU backends are excluded BY DETECTED BACKEND, not by env var
    # (ADVICE r3: JAX_PLATFORMS is often unset on CPU-only hosts): XLA:CPU
    # caches AOT code keyed on detected machine features, and feature-set
    # drift between processes makes reloads warn about potential SIGILL —
    # while CPU compiles are cheap enough not to need a cache.
    if _os.environ.get("FATEAVATAR_COMPILE_CACHE", "1") == "0":
        return False
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        return False  # cheap static skip: no backend init needed
    import jax as _jax2

    try:
        if _jax2.default_backend() != "tpu":
            return False
        _jax2.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("FATEAVATAR_COMPILE_CACHE_DIR",
                            _os.path.expanduser("~/.cache/fateavatar_xla")))
        _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return True
    except Exception:  # older jax without the knobs — run uncached
        return False


_enable_compile_cache_if_tpu()
