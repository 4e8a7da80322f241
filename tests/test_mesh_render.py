"""Debug mesh rasterizer tests (NVDiffRenderer replacement)."""

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.mesh_render import overlay_mesh, render_mesh
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh

RES = 64


def test_sphere_renders_centered():
    m = sphere_obj_mesh(128)
    cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]), 0.8, 0.8,
                      RES, RES)
    rgb, alpha = render_mesh(jnp.asarray(m.verts), jnp.asarray(m.faces),
                             cam, RES, RES)
    a = np.asarray(alpha)
    # sphere covers the centre, not the corners
    assert a[RES // 2, RES // 2] == 1.0
    assert a[0, 0] == 0.0 and a[-1, -1] == 0.0
    # shaded colour inside
    c = np.asarray(rgb)
    assert c[RES // 2, RES // 2].max() > 0.1
    assert np.isfinite(c).all()


def test_depth_order_front_face_wins():
    # two triangles at different depths covering the centre; front one red-ish
    verts = jnp.array([
        [-0.2, -0.2, 0.5], [0.2, -0.2, 0.5], [0.0, 0.25, 0.5],   # front
        [-0.3, -0.3, 1.0], [0.3, -0.3, 1.0], [0.0, 0.35, 1.0],   # back
    ])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    cam = make_camera(jnp.eye(3), jnp.zeros(3), 0.9, 0.9, RES, RES)
    rgb, alpha = render_mesh(verts, faces, cam, RES, RES, face_chunk=2)
    # centre pixel belongs to the FRONT triangle: its depth is 0.5
    assert float(alpha[RES // 2, RES // 2]) == 1.0


def test_overlay_blends():
    m = sphere_obj_mesh(64)
    cam = make_camera(jnp.eye(3), jnp.array([0.0, 0.0, 0.4]), 0.8, 0.8,
                      RES, RES)
    img = jnp.zeros((RES, RES, 3))
    out = overlay_mesh(img, jnp.asarray(m.verts), jnp.asarray(m.faces), cam)
    o = np.asarray(out)
    assert o[RES // 2, RES // 2].max() > 0.05  # mesh visible
    assert o[0, 0].max() == 0.0                # background untouched
