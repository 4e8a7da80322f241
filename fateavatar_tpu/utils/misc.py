"""Misc utilities (tools/util.py equivalents)."""

from __future__ import annotations

import functools
import os
import random
import shutil
import time

import numpy as np


def seed_everything(seed: int):
    """tools/util.py:55 — python / numpy seeding (JAX randomness is explicit
    PRNG keys, seeded where keys are created)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def file_backup(workspace: str, source_dirs=("fateavatar_tpu", "configs"),
                repo_root: str = "."):
    """Snapshot source files into <workspace>/archive for reproducibility
    (tools/util.py:86-100)."""
    archive = os.path.join(workspace, "archive")
    for d in source_dirs:
        src = os.path.join(repo_root, d)
        if not os.path.isdir(src):
            continue
        for root, _, files in os.walk(src):
            if "__pycache__" in root:
                continue
            rel = os.path.relpath(root, repo_root)
            dst = os.path.join(archive, rel)
            os.makedirs(dst, exist_ok=True)
            for f in files:
                if f.endswith((".py", ".yaml", ".md")):
                    shutil.copy2(os.path.join(root, f), os.path.join(dst, f))


def colorize_weights_map(weights: np.ndarray) -> np.ndarray:
    """Scalar map [H, W] in [0,1] -> blue->red heat RGB (tools/util.py:151)."""
    w = np.clip(np.asarray(weights, np.float32), 0, 1)
    r = np.clip(1.5 - np.abs(4 * w - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * w - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * w - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def get_bg_color(name):
    """'white' | 'black' | 'random' -> RGB (tools/util.py:138)."""
    import jax.numpy as jnp

    if name == "white":
        return jnp.ones(3)
    if name == "black":
        return jnp.zeros(3)
    if name == "random":
        return jnp.asarray(np.random.random(3), jnp.float32)
    raise ValueError(name)


def measure_fps(fn):
    """Decorator printing wall-clock FPS (tools/util.py:235). For precise
    device timing use utils.profiling.timed instead."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        print(f"[fps] {fn.__name__}: {1.0 / max(dt, 1e-9):.2f} fps ({dt*1e3:.2f} ms)")
        return out

    return wrapper
