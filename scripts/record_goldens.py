"""Record rasterizer golden fixtures for tests/test_rasterizer.py.

Runs the XLA reference path (CPU, float32) on each scene in
tests/golden_scenes.py and saves image/t_final/radii plus analytic
gradients of every differentiable field to tests/goldens/<name>.npz.

Usage: JAX_PLATFORMS=cpu python scripts/record_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: E402

    from fateavatar_tpu.render.render import RenderConfig, render  # noqa: E402
    from golden_scenes import SCENES  # noqa: E402

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)

    diff_fields = ("xyz", "scaling", "rotation", "opacity",
                   "features_dc", "features_rest")

    # the round-1 legacy golden (tests/test_rasterizer.py::TestGoldens)
    # records the SAME loss/fields — include it here so semantic fixes
    # that re-record the scene set can never leave it stale again (it
    # went stale at the r3 CUDA-oracle parity fixes)
    from test_rasterizer import make_scene  # noqa: E402

    scenes = dict(SCENES)
    scenes["rasterizer_scene80_sh2"] = lambda: make_scene(
        80, seed=1234, sh_degree=2)

    for name, factory in scenes.items():
        cam, g, bg = factory()
        n = g.xyz.shape[0]
        cfg = RenderConfig(impl="xla", instance_budget=n * 36)
        out = render(cam, g, bg, config=cfg)
        rec = {
            "render": np.asarray(out["render"]),
            "t_final": np.asarray(out["t_final"]),
            "radii": np.asarray(out["radii"]),
        }

        sub = {f: getattr(g, f) for f in diff_fields}

        def loss(d):
            o = render(cam, g.replace(**d), bg, config=cfg)
            return jnp.mean(o["render"] ** 2) + 0.1 * jnp.mean(o["t_final"])

        grads = jax.grad(loss)(sub)
        for f in diff_fields:
            rec[f"grad_{f}"] = np.asarray(grads[f])
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **rec)
        print(f"recorded {name}: n={n} -> {path}")


if __name__ == "__main__":
    main()
