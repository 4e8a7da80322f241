"""Web viewer: render callback autoplay modes (raw dataset params vs
tracking-refined table rows — the reference GUI's train-mode playback,
tools/gui.py:606-637), the device-timed FPS readout (the CUDA-event
display, tools/gui.py:643-699), and one HTTP round trip."""

import json
import urllib.request

import numpy as np
import jax.numpy as jnp

from fateavatar_tpu.flame import synthetic_flame
from fateavatar_tpu.models import FateAvatarConfig, init_fateavatar
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.datasets import SyntheticDataset
from fateavatar_tpu.train.tracking import TrackingTables
from fateavatar_tpu.utils.obj_io import sphere_obj_mesh
from fateavatar_tpu.viewer.web import ViewerServer, make_avatar_render_fn

RES = 32
RENDER_CFG = RenderConfig(impl="xla", max_per_tile=64, chunk=32)


def _avatar():
    flame = synthetic_flame(n_verts=96, n_shape=6, n_exp=4, seed=0)
    cfg = FateAvatarConfig(tex_size=8, capacity=128, img_height=RES,
                           img_width=RES, normal_offset=0.02)
    return init_fateavatar(sphere_obj_mesh(96), flame, cfg)


def test_autoplay_modes_and_device_timing():
    model, params, state = _avatar()
    ds = SyntheticDataset(num_frames=3, img_res=(RES, RES), n_exp=4)
    # tables deliberately differ from the raw dataset params
    F = len(ds)
    tables = TrackingTables(
        expression=jnp.asarray(
            np.stack([ds.sample(i)["expression"] for i in range(F)])
            + 0.5, jnp.float32),
        flame_pose=jnp.asarray(
            np.stack([ds.sample(i)["flame_pose"] for i in range(F)]),
            jnp.float32),
        cam_t=jnp.tile(jnp.asarray([0.0, 0.0, 0.4])[None], (F, 1)),
    )
    fn = make_avatar_render_fn(model, params, state, dataset=ds,
                               render_cfg=RENDER_CFG, tables=tables)

    img_raw, ms_raw = fn({"playing": True, "frame": 1, "tracked": False})
    img_trk, ms_trk = fn({"playing": True, "frame": 1, "tracked": True})
    img_sl, _ = fn({"playing": False, "exp": [0.3], "jaw": 0.1})
    assert img_raw.shape == (RES, RES, 3)
    assert ms_raw > 0 and ms_trk > 0
    # tracked rows (expression +0.5) render differently from raw params
    assert float(jnp.abs(img_trk - img_raw).max()) > 1e-4
    assert np.isfinite(np.asarray(img_sl)).all()


def test_http_round_trip_serves_device_ms():
    model, params, state = _avatar()
    ds = SyntheticDataset(num_frames=2, img_res=(RES, RES), n_exp=4)
    fn = make_avatar_render_fn(model, params, state, dataset=ds,
                               render_cfg=RENDER_CFG)
    srv = ViewerServer(fn, RES, RES, 4, port=0)
    port = srv.httpd.server_address[1]
    srv.serve_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"playing": True, "frame": 0}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "image/jpeg"
            assert float(r.headers["X-Device-Ms"]) > 0
            assert body[:2] == b"\xff\xd8"          # JPEG magic
        # the page carries both autoplay controls
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30) as r:
            page = r.read().decode()
            assert "play sequence" in page and "tracked params" in page
            assert "X-Device-Ms" in page
    finally:
        srv.shutdown()


def test_bg_color_toggle():
    """Background select (white/black/gray): empty pixels take the chosen
    color (the reference's get_bg_color surface, tools/util.py:138)."""
    model, params, state = _avatar()
    fn = make_avatar_render_fn(model, params, state, render_cfg=RENDER_CFG)
    white, _ = fn({"playing": False, "bg": "white"})
    black, _ = fn({"playing": False, "bg": "black"})
    gray, _ = fn({"playing": False, "bg": "gray"})
    w = np.asarray(white)
    b = np.asarray(black)
    g = np.asarray(gray)
    # corner pixels are background at this zoom
    assert np.allclose(w[0, 0], 1.0, atol=1e-3)
    assert np.allclose(b[0, 0], 0.0, atol=1e-3)
    assert np.allclose(g[0, 0], 0.5, atol=1e-3)


def test_canonical_pose_view():
    """The canonical toggle renders the FLAME canonical exp/pose (the
    reference viewer's manual-mode default, tools/gui.py:186-190) and
    ignores the sliders; orbit still applies."""
    model, params, state = _avatar()
    # make the canonical conditioning differ from zeros
    flame = model.flame.replace(
        canonical_exp=jnp.full((1, model.flame.n_exp), 0.7),
        canonical_pose=jnp.zeros((1, 15)).at[0, 6].set(0.3),
    )
    model = model.replace(flame=flame)
    fn = make_avatar_render_fn(model, params, state, render_cfg=RENDER_CFG)
    zeros, _ = fn({"playing": False})
    cano, _ = fn({"playing": False, "canonical": True,
                  "exp": [2.0], "jaw": 0.5})
    cano2, _ = fn({"playing": False, "canonical": True,
                   "exp": [-2.0], "jaw": 0.0})
    assert float(jnp.abs(cano - zeros).max()) > 1e-4   # canonical != zeros
    np.testing.assert_allclose(np.asarray(cano), np.asarray(cano2),
                               atol=1e-6)              # sliders ignored
    orbited, _ = fn({"playing": False, "canonical": True, "yaw": 0.6})
    assert float(jnp.abs(orbited - cano).max()) > 1e-4  # orbit still live


def test_page_carries_new_controls():
    """Pause-on-drag ships in the page script; bg/canonical controls are
    present (per-control checklist, docs/PARITY.md)."""
    from fateavatar_tpu.viewer.web import _PAGE

    page = _PAGE % {"w": 32, "h": 32, "n_exp": 4}
    assert "state.playing && !dragging" in page        # pause on drag
    assert 'id="bg"' in page and "canonical pose" in page


def test_fov_and_neck_controls():
    """FoV and neck sliders (the reference GUI's camera/FLAME controls,
    tools/gui.py:276-401) change the render."""
    model, params, state = _avatar()
    fn = make_avatar_render_fn(model, params, state, render_cfg=RENDER_CFG)
    base, _ = fn({"playing": False})
    wide, _ = fn({"playing": False, "fov": 1.3})
    neck, _ = fn({"playing": False, "neck": [0.0, 0.5, 0.0]})
    import jax.numpy as jnp
    assert float(jnp.abs(wide - base).max()) > 1e-3
    assert float(jnp.abs(neck - base).max()) > 1e-3
