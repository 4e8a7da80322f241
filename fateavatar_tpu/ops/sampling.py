"""Barycentric sampling of a UV-unwrapped mesh.

TPU-native replacement for volume_rendering/mesh_sampling.py:86-169. The UV
chart is rasterized ONCE at model init on the host (numpy), so this is
deliberately not jitted — the output (face_index, bary_coords) become static
buffers driving the splats.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _rasterize_uv_chart(uv: np.ndarray, uv_faces: np.ndarray, size: int):
    """Point-in-triangle test of every pixel centre against the UV chart.

    Returns (face_index [size*size], bary [size*size, 3], hit mask).
    Later faces overwrite earlier ones on overlap (UV charts should not
    overlap; behaviour on ties is irrelevant for sampling).
    """
    face_idx = np.full((size, size), -1, dtype=np.int64)
    bary = np.zeros((size, size, 3), dtype=np.float64)

    # pixel centres in UV space
    px = (np.arange(size) + 0.5) / size

    tri = uv[uv_faces]  # [F, 3, 2]
    for f in range(tri.shape[0]):
        a, b, c = tri[f]
        lo = np.minimum(np.minimum(a, b), c)
        hi = np.maximum(np.maximum(a, b), c)
        x0 = np.searchsorted(px, lo[0], "left")
        x1 = np.searchsorted(px, hi[0], "right")
        y0 = np.searchsorted(px, lo[1], "left")
        y1 = np.searchsorted(px, hi[1], "right")
        if x0 >= x1 or y0 >= y1:
            continue
        gx, gy = np.meshgrid(px[x0:x1], px[y0:y1], indexing="ij")
        p = np.stack([gx, gy], axis=-1)

        v0 = b - a
        v1 = c - a
        v2 = p - a
        d00 = v0 @ v0
        d01 = v0 @ v1
        d11 = v1 @ v1
        denom = d00 * d11 - d01 * d01
        if abs(denom) < 1e-18:
            continue
        d20 = v2 @ v0
        d21 = v2 @ v1
        v = (d11 * d20 - d01 * d21) / denom
        w = (d00 * d21 - d01 * d20) / denom
        u = 1.0 - v - w
        inside = (u >= -1e-9) & (v >= -1e-9) & (w >= -1e-9)
        if not inside.any():
            continue
        sl = (slice(x0, x1), slice(y0, y1))
        face_idx[sl] = np.where(inside, f, face_idx[sl])
        for k, comp in enumerate((u, v, w)):
            bary[sl + (k,)] = np.where(inside, comp, bary[sl + (k,)])

    hit = face_idx.reshape(-1) >= 0
    return face_idx.reshape(-1), bary.reshape(-1, 3), hit


def uniform_sampling_barycoords(
    num_points: int,
    tex_coord: np.ndarray,
    uv_faces: np.ndarray,
    d_size: float = 1.0,
    strict: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniformly sample ``num_points`` barycentric points over the UV chart.

    Same contract as mesh_sampling.py:86-138: rasterize the chart at
    ``sqrt(num_points) * d_size`` resolution, collect covered texels, then pad
    with random re-samples / truncate to exactly ``num_points`` when strict.
    """
    uv = np.asarray(tex_coord, dtype=np.float64)
    uv_faces = np.asarray(uv_faces, dtype=np.int64)
    size = int(np.sqrt(num_points) * d_size)

    face_idx, bary, hit = _rasterize_uv_chart(uv, uv_faces, size)
    face_index = face_idx[hit]
    bary_coords = bary[hit]
    cur_n = face_index.shape[0]

    if strict:
        rng = np.random.default_rng(seed)
        if cur_n == 0:
            raise ValueError("UV chart rasterization produced no samples")
        if cur_n < num_points:
            pad = num_points - cur_n
            pick = rng.integers(0, cur_n, size=pad)
            uvw = rng.random((pad, 3))
            uvw = uvw / uvw.sum(axis=-1, keepdims=True)
            face_index = np.concatenate([face_index, face_index[pick]])
            bary_coords = np.concatenate([bary_coords, uvw])
        elif cur_n > num_points:
            face_index = face_index[:num_points]
            bary_coords = bary_coords[:num_points]

    return face_index.astype(np.int32), bary_coords.astype(np.float32)


def random_sampling_barycoords(
    num_points: int,
    vertices: np.ndarray,
    faces: np.ndarray,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Area-weighted random barycentric sampling (mesh_sampling.py:140-169)."""
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    tri = vertices[faces]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    p = areas / areas.sum()
    rng = np.random.default_rng(seed)
    face_index = rng.choice(len(faces), size=num_points, p=p)
    uvw = rng.random((num_points, 3))
    bary_coords = uvw / uvw.sum(axis=-1, keepdims=True)
    return face_index.astype(np.int32), bary_coords.astype(np.float32)
