"""FLAME asset loading.

* :func:`load_flame_pickle` reads the official ``generic_model.pkl``
  (FLAME2020/2023) without requiring the ``chumpy`` package — a minimal stub
  module is registered so the legacy pickle deserializes into numpy arrays
  (the reference relies on chumpy being importable, flame/FLAME.py:62-64).
* :func:`synthetic_flame` builds a tiny internally-consistent head model for
  tests and benchmarks, so the framework is exercisable without the
  licensed MPI assets.
"""

from __future__ import annotations

import sys
import types
from typing import Optional

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.flame.flame import FlameModel


def _install_chumpy_stub() -> None:
    """Register a minimal ``chumpy`` so legacy FLAME pickles unpickle.

    chumpy ``Ch`` objects pickle their data under ``x``; we only need to get
    the ndarray back out.
    """
    if "chumpy" in sys.modules:
        return

    class Ch:  # noqa: D401 - stub
        def __init__(self, *args, **kwargs):
            self.x = args[0] if args else None

        def __setstate__(self, state):
            self.__dict__.update(state)

        @property
        def r(self):
            return np.asarray(self.x)

        def __array__(self, dtype=None):
            arr = np.asarray(self.x)
            return arr.astype(dtype) if dtype is not None else arr

    mod = types.ModuleType("chumpy")
    mod.Ch = Ch
    ch_mod = types.ModuleType("chumpy.ch")
    ch_mod.Ch = Ch
    reordering = types.ModuleType("chumpy.reordering")

    class _Stub(Ch):
        pass

    for name in ("transpose", "reshape", "Select", "concatenate", "Transpose", "Reshape"):
        setattr(reordering, name, _Stub)
        setattr(ch_mod, name, _Stub)
        setattr(mod, name, _Stub)
    mod.ch = ch_mod
    mod.reordering = reordering
    sys.modules["chumpy"] = mod
    sys.modules["chumpy.ch"] = ch_mod
    sys.modules["chumpy.reordering"] = reordering


def _to_np(x, dtype=np.float32):
    if "scipy.sparse" in str(type(x)):
        x = x.todense()
    return np.array(x, dtype=dtype)


def load_flame_pickle(path: str):
    """Load the raw FLAME pickle into a dict of numpy arrays."""
    import pickle

    _install_chumpy_stub()
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    out = {
        "v_template": _to_np(data["v_template"]),
        "shapedirs": _to_np(data["shapedirs"]),
        "posedirs": _to_np(data["posedirs"]),
        "J_regressor": _to_np(data["J_regressor"]),
        "weights": _to_np(data["weights"]),
        "f": _to_np(data["f"], np.int32),
        "kintree_table": _to_np(data["kintree_table"], np.int64),
    }
    return out


def _tensor_to_np(x):
    """Entries of landmark_embedding.npy may be pickled torch tensors
    (FLAME.py:75 calls .long() on them directly)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_landmark_embedding(path: str):
    """Read the reference's ``landmark_embedding.npy`` (FLAME.py:66-93).

    The file is a pickled dict with static (51), dynamic-contour (17 x 79
    yaw bins) and full (68) barycentric embeddings. Returns
    (faces_idx [68] int32, bary [68, 3] float32, dynamic_faces [79, 17]
    int32 or None, dynamic_bary [79, 17, 3] float32 or None). The full-68
    set is ordered [17 contour ++ 51 static] so the dynamic variant can
    splice rows (flame.flame_landmarks_dynamic)."""
    raw = np.load(path, allow_pickle=True)
    if raw.dtype == object:
        raw = raw[()]
    dyn_faces = dyn_bary = None
    if isinstance(raw, dict):
        faces = _tensor_to_np(raw["full_lmk_faces_idx"]).reshape(-1)
        bary = _tensor_to_np(raw["full_lmk_bary_coords"]).reshape(-1, 3)
        if "dynamic_lmk_faces_idx" in raw:
            dyn_faces = _tensor_to_np(
                raw["dynamic_lmk_faces_idx"]
            ).reshape(79, -1).astype(np.int32)
            dyn_bary = _tensor_to_np(
                raw["dynamic_lmk_bary_coords"]
            ).reshape(79, dyn_faces.shape[1], 3).astype(np.float32)
    else:  # plain [L, 4] rows of (face_idx, b0, b1, b2)
        faces = raw[:, 0]
        bary = raw[:, 1:4]
    return faces.astype(np.int32), bary.astype(np.float32), dyn_faces, dyn_bary


def make_flame(
    flame_data: dict,
    n_shape: int,
    n_exp: int,
    shape_params: Optional[np.ndarray] = None,
    canonical_expression: Optional[np.ndarray] = None,
    canonical_pose: float = 0.0,
    factor: float = 1.0,
    landmark_embedding: Optional[tuple] = None,
) -> FlameModel:
    """Assemble a :class:`FlameModel` the way the reference does
    (flame/FLAME.py:56-129): slice shapedirs to [n_shape | 300:300+n_exp],
    bake the subject identity shape into v_template, reshape posedirs to
    [P, V*3], and record the canonical expression / jaw pose."""
    v_template = flame_data["v_template"].astype(np.float32) * factor
    shapedirs_full = flame_data["shapedirs"].astype(np.float32)
    total_shape = shapedirs_full.shape[-1]
    exp_start = 300 if total_shape > 300 else n_shape
    shapedirs = np.concatenate(
        [shapedirs_full[:, :, :n_shape],
         shapedirs_full[:, :, exp_start: exp_start + n_exp]],
        axis=2,
    ) * factor

    if shape_params is not None:
        shape_params = np.asarray(shape_params, np.float32).reshape(1, -1)[:, :n_shape]
        v_template = v_template + np.einsum(
            "bl,mkl->bmk", shape_params, shapedirs[:, :, :n_shape]
        )[0]

    posedirs = flame_data["posedirs"].astype(np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T * factor  # [P, V*3]

    parents = flame_data["kintree_table"][0].astype(np.int32).copy()
    parents[0] = -1

    if canonical_expression is None:
        canonical_exp = np.zeros((1, n_exp), np.float32)
    else:
        canonical_exp = np.asarray(canonical_expression, np.float32).reshape(1, -1)[:, :n_exp]
    cpose = np.zeros((1, 15), np.float32)
    cpose[0, 6] = canonical_pose  # jaw-open canonical pose (FLAME.py:104-105)

    return FlameModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(flame_data["J_regressor"].astype(np.float32)),
        lbs_weights=jnp.asarray(flame_data["weights"].astype(np.float32)),
        parents=jnp.asarray(parents),
        faces=jnp.asarray(flame_data["f"].astype(np.int32)),
        n_shape=n_shape,
        n_exp=n_exp,
        canonical_exp=jnp.asarray(canonical_exp),
        canonical_pose=jnp.asarray(cpose),
        lmk_faces_idx=(jnp.asarray(landmark_embedding[0])
                       if landmark_embedding is not None else None),
        lmk_bary_coords=(jnp.asarray(landmark_embedding[1])
                         if landmark_embedding is not None else None),
        dynamic_lmk_faces_idx=(
            jnp.asarray(landmark_embedding[2])
            if landmark_embedding is not None and len(landmark_embedding) > 2
            and landmark_embedding[2] is not None else None),
        dynamic_lmk_bary_coords=(
            jnp.asarray(landmark_embedding[3])
            if landmark_embedding is not None and len(landmark_embedding) > 3
            and landmark_embedding[3] is not None else None),
    )


def synthetic_flame_data(
    n_verts: int = 128,
    n_exp: int = 6,
    seed: int = 0,
):
    """The raw synthetic FLAME assets: a pickle-layout data dict (same keys
    as the official ``generic_model.pkl``) plus a landmark-embedding tuple.
    Kept separate from :func:`synthetic_flame` so tests can feed the SAME
    assets to the reference's own ``flame/FLAME.py`` (written out as a
    pickle) and to our :func:`make_flame` — the execution-parity oracle."""
    rng = np.random.default_rng(seed)

    # Fibonacci sphere vertices -> convex hull triangulation
    idx = np.arange(n_verts, dtype=np.float64)
    phi = np.arccos(1.0 - 2.0 * (idx + 0.5) / n_verts)
    theta = np.pi * (1.0 + 5.0**0.5) * idx
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    ) * 0.1  # head-sized (~10 cm radius)

    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    # orient faces outward
    tri = pts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    flip = (n * c).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    J = 5
    j_reg = np.abs(rng.normal(size=(J, n_verts))).astype(np.float32)
    j_reg /= j_reg.sum(axis=1, keepdims=True)

    w = np.abs(rng.normal(size=(n_verts, J))).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)

    data = {
        "v_template": pts.astype(np.float32),
        "shapedirs": (rng.normal(size=(n_verts, 3, 300 + n_exp)) * 0.01).astype(np.float32),
        "posedirs": (rng.normal(size=(n_verts, 3, 36)) * 0.001).astype(np.float32),
        "J_regressor": j_reg,
        "weights": w,
        "f": faces,
        "kintree_table": np.array([[-1, 0, 1, 1, 1], [0, 1, 2, 3, 4]], np.int64),
    }
    lmk_faces = rng.integers(0, len(faces), size=68).astype(np.int32)
    lmk_bary = rng.dirichlet(np.ones(3), size=68).astype(np.float32)
    dyn_faces = rng.integers(0, len(faces), size=(79, 17)).astype(np.int32)
    dyn_bary = rng.dirichlet(np.ones(3), size=(79, 17)).astype(np.float32)
    return data, (lmk_faces, lmk_bary, dyn_faces, dyn_bary)


def synthetic_flame(
    n_verts: int = 128,
    n_shape: int = 8,
    n_exp: int = 6,
    seed: int = 0,
    canonical_pose: float = 0.2,
) -> FlameModel:
    """A small FLAME-shaped random model (5 joints, icosphere-ish mesh) for
    tests and self-contained benchmarks."""
    data, lmk = synthetic_flame_data(n_verts=n_verts, n_exp=n_exp, seed=seed)
    return make_flame(data, n_shape=n_shape, n_exp=n_exp,
                      canonical_pose=canonical_pose,
                      landmark_embedding=lmk)
