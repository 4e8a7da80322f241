"""Debug mesh rasterizer (pure JAX) — NVDiffRenderer replacement.

The reference overlays a front-lit FLAME mesh render on training snapshots
via nvdiffrast (mesh_rendering/__init__.py:218-278, train/trainer.py:501).
Here: a chunked z-buffer triangle rasterizer — for each face chunk, test
pixels of the face's bounding region, barycentric-interpolate depth, and
min-reduce. O(F * tile_area) with static shapes. Built for DEBUG frequency
(a snapshot every ~1000 steps), not the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fateavatar_tpu.ops.camera import Camera
from fateavatar_tpu.ops.mesh import compute_face_normals


@partial(jax.jit, static_argnames=("width", "height", "face_chunk", "span"))
def render_mesh(
    verts: jax.Array,       # [V, 3] world space
    faces: jax.Array,       # [F, 3]
    camera: Camera,
    width: int,
    height: int,
    face_chunk: int = 256,
    span: int = 64,
    light_dir=(0.0, 0.0, 1.0),
    base_color=(0.75, 0.75, 0.75),
):
    """Front-lit shaded render + alpha mask. Faces project to at most a
    ``span`` x ``span`` pixel window (larger faces are clipped — fine for
    debug overlays of dense head meshes).

    Returns (rgb [H, W, 3], alpha [H, W])."""
    F = faces.shape[0]
    pad = (-F) % face_chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))
    valid_face = jnp.pad(jnp.ones((F,), bool), (0, pad))

    # project
    hom = verts @ camera.full_proj[:, :3].T + camera.full_proj[:, 3]
    w = hom[:, 3:4] + 1e-7
    ndc = hom[:, :3] / w
    px = ((ndc[:, 0] + 1) * width - 1) * 0.5
    py = ((ndc[:, 1] + 1) * height - 1) * 0.5
    depth = verts @ camera.view[2, :3] + camera.view[2, 3]

    # shading per face
    n = compute_face_normals(verts, faces_p)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)
    # orient towards camera
    ld = jnp.asarray(light_dir)
    ld = ld / jnp.linalg.norm(ld)
    shade = jnp.abs(n @ ld) * 0.8 + 0.2
    color = shade[:, None] * jnp.asarray(base_color)

    tri_x = px[faces_p]   # [Fp, 3]
    tri_y = py[faces_p]
    tri_z = depth[faces_p]
    behind = jnp.any(tri_z <= 0.01, axis=-1)
    valid_face = valid_face & ~behind

    zbuf0 = jnp.full((height, width), jnp.inf)
    rgb0 = jnp.zeros((height, width, 3))

    sx = jnp.arange(span)
    oy, ox = jnp.meshgrid(sx, sx, indexing="ij")     # [span, span]

    def chunk_body(carry, blk):
        zbuf, rgb = carry
        cx, cy, cz, ccol, cvalid = blk
        x0 = jnp.clip(jnp.floor(jnp.min(cx, axis=-1)).astype(jnp.int32),
                      0, width - 1)
        y0 = jnp.clip(jnp.floor(jnp.min(cy, axis=-1)).astype(jnp.int32),
                      0, height - 1)

        pxs = x0[:, None, None] + ox[None]            # [C, span, span]
        pys = y0[:, None, None] + oy[None]
        fx = pxs.astype(jnp.float32)
        fy = pys.astype(jnp.float32)

        x1, y1 = cx[:, 0, None, None], cy[:, 0, None, None]
        x2, y2 = cx[:, 1, None, None], cy[:, 1, None, None]
        x3, y3 = cx[:, 2, None, None], cy[:, 2, None, None]
        det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        l1 = ((y2 - y3) * (fx - x3) + (x3 - x2) * (fy - y3)) / det
        l2 = ((y3 - y1) * (fx - x3) + (x1 - x3) * (fy - y3)) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        inside &= (pxs < width) & (pys < height)
        inside &= cvalid[:, None, None]

        z = (l1 * cz[:, 0, None, None] + l2 * cz[:, 1, None, None]
             + l3 * cz[:, 2, None, None])
        z = jnp.where(inside, z, jnp.inf)

        flat_idx = jnp.where(
            inside, pys * width + pxs, height * width
        ).reshape(-1)
        zflat = z.reshape(-1)

        # z-buffer via min-scatter, then color where this chunk won
        zb = jnp.full((height * width + 1,), jnp.inf).at[flat_idx].min(zflat)
        zb2 = zb[:-1].reshape(height, width)
        new_zbuf = jnp.minimum(zbuf, zb2)

        # winners: faces whose z equals the new buffer value at their pixel
        won = inside & (z <= zb2.reshape(-1)[
            jnp.clip(flat_idx, 0, height * width - 1)
        ].reshape(z.shape) + 0.0) & (z <= new_zbuf.reshape(-1)[
            jnp.clip(flat_idx, 0, height * width - 1)
        ].reshape(z.shape))
        col = jnp.broadcast_to(ccol[:, None, None, :], z.shape + (3,))
        rgb_new = rgb
        for c in range(3):
            ch = jnp.full((height * width + 1,), 0.0).at[flat_idx].max(
                jnp.where(won, col[..., c], 0.0).reshape(-1)
            )[:-1].reshape(height, width)
            rgb_new = rgb_new.at[..., c].set(
                jnp.where(new_zbuf < zbuf, ch, rgb_new[..., c])
            )
        return (new_zbuf, rgb_new), None

    nchunk = faces_p.shape[0] // face_chunk
    blocks = (
        tri_x.reshape(nchunk, face_chunk, 3),
        tri_y.reshape(nchunk, face_chunk, 3),
        tri_z.reshape(nchunk, face_chunk, 3),
        color.reshape(nchunk, face_chunk, 3),
        valid_face.reshape(nchunk, face_chunk),
    )
    (zbuf, rgb), _ = jax.lax.scan(chunk_body, (zbuf0, rgb0), blocks)
    alpha = jnp.isfinite(zbuf).astype(jnp.float32)
    return rgb, alpha


def overlay_mesh(image: jax.Array, verts, faces, camera,
                 opacity: float = 0.6):
    """Blend a mesh render over an image (the snapshot overlay panel,
    train/trainer.py:496-507)."""
    h, w = image.shape[:2]
    rgb, alpha = render_mesh(verts, faces, camera, w, h)
    a = alpha[..., None] * opacity
    return image * (1 - a) + rgb * a
