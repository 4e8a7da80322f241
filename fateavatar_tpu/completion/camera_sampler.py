"""Orbit / look-at camera sampling for novel-view generation.

Equivalent of tools/eg3d_utils/camera_eg3d.py:26-75 (LookAtPoseSampler +
create_cam2world_matrix): cameras on a sphere around a look-at point,
parameterized by horizontal/vertical angles.
"""

from __future__ import annotations

import numpy as np

from fateavatar_tpu.ops.camera import Camera, make_camera


def cam2world_lookat(camera_origin: np.ndarray, lookat: np.ndarray) -> np.ndarray:
    """4x4 cam2world with -z forward (EG3D convention uses +y up)."""
    forward = lookat - camera_origin
    forward = forward / np.linalg.norm(forward).clip(1e-8)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right = right / np.linalg.norm(right).clip(1e-8)
    down = np.cross(forward, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = down
    m[:3, 2] = forward
    m[:3, 3] = camera_origin
    return m


def sample_orbit_pose(
    horizontal_mean: float,
    vertical_mean: float,
    lookat: np.ndarray,
    radius: float = 2.7,
) -> np.ndarray:
    """One cam2world on the orbit sphere (camera_eg3d.py:26-54 EXACT
    semantics, pinned by tests/test_reference_exec.py): h is azimuth; v is
    mapped EQUAL-AREA onto the polar angle, phi = arccos(1 - 2 v / pi)
    (v = pi/2 -> equator, unchanged); origins sit on the radius sphere
    CENTERED AT THE WORLD ORIGIN (not at ``lookat`` — pretrained
    EG3D/SphereHead generators were conditioned on exactly these labels,
    so an origin offset would corrupt real-weight PTI transfer)."""
    h, v = horizontal_mean, vertical_mean
    v = np.clip(v, 1e-5, np.pi - 1e-5)
    phi = np.arccos(1.0 - 2.0 * (v / np.pi))
    origin = np.array([
        radius * np.sin(phi) * np.cos(np.pi - h),
        radius * np.cos(phi),
        radius * np.sin(phi) * np.sin(np.pi - h),
    ])
    return cam2world_lookat(origin, np.asarray(lookat, np.float64))


def orbit_cameras(
    num_views: int,
    lookat,
    radius: float,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    vertical: float = np.pi / 2,
    h_range=(0.0, 2 * np.pi),
):
    """Full orbit of 3DGS cameras + their cam2world matrices
    (train/completion.py:159-251 drives exactly this loop)."""
    cams, c2ws = [], []
    for i in range(num_views):
        h = h_range[0] + (h_range[1] - h_range[0]) * i / max(num_views, 1)
        c2w = sample_orbit_pose(h, vertical, lookat, radius)
        w2c = np.linalg.inv(c2w)
        cams.append(make_camera(
            w2c[:3, :3].T, w2c[:3, 3], fovx, fovy, width, height
        ))
        c2ws.append(c2w)
    return cams, np.stack(c2ws)
