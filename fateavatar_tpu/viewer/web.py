"""Interactive avatar viewer — dependency-free web UI.

Replaces the reference's dearpygui desktop viewer (tools/gui.py:153-708)
with a stdlib http.server app: a browser canvas with orbit-drag, expression
and pose sliders, and train/test-sequence autoplay, driving the jitted
``model.inference`` path on the device. A web surface suits TPU hosts
(headless pods) far better than a desktop GL window.

Camera convention matches the reference viewer: mouse orbit is realized as
a FLAME root-rotation offset, not a camera move (tools/gui.py:654-661).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>fateavatar_tpu viewer</title><style>
body { font-family: sans-serif; background: #181818; color: #eee;
       display: flex; gap: 16px; padding: 16px; }
#view { border: 1px solid #444; cursor: grab; }
.panel { width: 320px; }
label { display:block; font-size: 12px; margin-top: 8px; }
input[type=range] { width: 100%%; }
#fps { color: #8f8; font-size: 12px; }
button { margin-top: 8px; }
</style></head><body>
<div><canvas id="view" width="%(w)d" height="%(h)d"></canvas>
<div id="fps"></div></div>
<div class="panel">
  <h3>fateavatar_tpu</h3>
  <div>drag to orbit &middot; wheel to zoom</div>
  <button id="play">play sequence</button>
  <button id="tracked">tracked params: off</button>
  <button id="canonical">canonical pose: off</button>
  <button id="reset">reset</button>
  <label>background
    <select id="bg"><option>white</option><option>black</option>
    <option>gray</option></select></label>
  <div id="sliders"></div>
</div>
<script>
const NEXP = %(n_exp)d;
let state = {yaw: 0, pitch: 0, zoom: 1, exp: new Array(NEXP).fill(0),
             jaw: 0, playing: false, frame: 0, tracked: false,
             fov: 0.8, neck: [0, 0, 0], bg: 'white', canonical: false};
const sliders = document.getElementById('sliders');
function addSlider(name, min, max, get, set, step) {
  const l = document.createElement('label');
  l.textContent = name;
  const s = document.createElement('input');
  s.type = 'range'; s.min = min; s.max = max;
  s.step = step || 0.01; s.value = get();
  s.oninput = () => { set(parseFloat(s.value)); dirty = true; };
  l.appendChild(s); sliders.appendChild(l);
}
// camera controls (tools/gui.py:276-360: FoV + orbit sliders)
addSlider('fov', 0.2, 1.4, () => state.fov, v => state.fov = v);
addSlider('frame', 0, 9999, () => state.frame,
          v => state.frame = Math.round(v), 1);
addSlider('jaw', 0, 0.5, () => state.jaw, v => state.jaw = v);
// neck rotation (tools/gui.py:386-401)
['neck x', 'neck y', 'neck z'].forEach((n, i) =>
  addSlider(n, -0.6, 0.6, () => state.neck[i], v => state.neck[i] = v));
for (let i = 0; i < Math.min(NEXP, 8); i++)
  addSlider('exp ' + i, -3, 3, () => state.exp[i], v => state.exp[i] = v);

const canvas = document.getElementById('view');
const ctx = canvas.getContext('2d');
let dragging = false, lastX = 0, lastY = 0, dirty = true;
canvas.onmousedown = e => { dragging = true; lastX = e.clientX; lastY = e.clientY; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  state.yaw += (e.clientX - lastX) * 0.01;
  state.pitch += (e.clientY - lastY) * 0.01;
  lastX = e.clientX; lastY = e.clientY; dirty = true;
};
canvas.onwheel = e => { state.zoom *= e.deltaY > 0 ? 1.05 : 0.95; dirty = true;
                        e.preventDefault(); };
document.getElementById('play').onclick = () => { state.playing = !state.playing; };
document.getElementById('tracked').onclick = e => {
  state.tracked = !state.tracked; dirty = true;
  e.target.textContent = 'tracked params: ' + (state.tracked ? 'on' : 'off');
};
// canonical-pose view: render the avatar's FLAME canonical exp/pose
// (the reference viewer's manual-mode default, tools/gui.py:186-190)
document.getElementById('canonical').onclick = e => {
  state.canonical = !state.canonical; dirty = true;
  e.target.textContent = 'canonical pose: ' + (state.canonical ? 'on' : 'off');
};
document.getElementById('bg').onchange = e => {
  state.bg = e.target.value; dirty = true; };
document.getElementById('reset').onclick = () => {
  state.yaw = 0; state.pitch = 0; state.zoom = 1;
  state.exp.fill(0); state.jaw = 0; dirty = true; };

let inflight = false;
async function tick() {
  if ((dirty || state.playing) && !inflight) {
    dirty = false; inflight = true;
    // pause-on-drag: autoplay holds the current frame while orbiting
    if (state.playing && !dragging) state.frame++;
    const t0 = performance.now();
    const r = await fetch('/render', {method: 'POST',
      body: JSON.stringify(state)});
    const devMs = r.headers.get('X-Device-Ms');
    const blob = await r.blob();
    const img = await createImageBitmap(blob);
    ctx.drawImage(img, 0, 0);
    document.getElementById('fps').textContent =
      (1000 / (performance.now() - t0)).toFixed(1) + ' fps (round-trip)' +
      (devMs ? ' · ' + parseFloat(devMs).toFixed(1) +
               ' ms device (' + (1000 / parseFloat(devMs)).toFixed(0) +
               ' fps)' : '');
    inflight = false;
  }
  requestAnimationFrame(tick);
}
tick();
</script></body></html>"""


class ViewerServer:
    """Serve the viewer for a render callback.

    ``render_fn(state: dict) -> np.ndarray [H, W, 3] float`` receives the UI
    state: yaw, pitch, zoom, exp (list), jaw, frame, playing.
    """

    def __init__(self, render_fn: Callable, width: int, height: int,
                 n_exp: int, port: int = 8090):
        self.render_fn = render_fn
        self.port = port
        page = _PAGE % {"w": width, "h": height, "n_exp": n_exp}

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page.encode())

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                state = json.loads(self.rfile.read(n) or b"{}")
                out = outer.render_fn(state)
                # render_fn may return (image, device_ms) — the viewer
                # shows pure device render time next to the round-trip fps
                # (the reference's CUDA-event display, tools/gui.py:643-699)
                device_ms = None
                if isinstance(out, tuple):
                    out, device_ms = out
                from PIL import Image

                buf = io.BytesIO()
                arr = (np.clip(np.asarray(out), 0, 1) * 255).astype("uint8")
                Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                if device_ms is not None:
                    self.send_header("X-Device-Ms", f"{device_ms:.3f}")
                self.end_headers()
                self.wfile.write(buf.getvalue())

        self.httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)

    def serve_forever(self):
        print(f"viewer at http://localhost:{self.port}")
        self.httpd.serve_forever()

    def serve_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()


def make_avatar_render_fn(model, params, state, dataset=None,
                          camera_distance: float = 1.0,
                          render_cfg=None, tables=None):
    """Build the render callback for a FateAvatar: mouse orbit as FLAME
    root rotation (tools/gui.py:654-661), slider-driven jaw/expression,
    optional dataset autoplay (play_step, tools/gui.py:606-637).

    ``tables``: optional :class:`TrackingTables` — with UI ``tracked`` on,
    sequence playback drives the TRACKING-REFINED per-frame rows instead
    of the raw dataset params (the reference's train-mode playback,
    tools/gui.py:606-637 reading the optimized embeddings). Returns
    ``(image, device_ms)`` pairs; device_ms is the blocked jitted render
    time (the CUDA-event equivalent, tools/gui.py:643-699)."""
    import time

    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.models.fateavatar import fateavatar_forward
    from fateavatar_tpu.ops.camera import make_camera
    from fateavatar_tpu.render.render import RenderConfig

    render_cfg = render_cfg or RenderConfig()
    n_exp = model.flame.n_exp
    h, w = model.cfg.img_height, model.cfg.img_width

    @jax.jit
    def _render(expr, pose, cam_t, fov, bg):
        camera = make_camera(
            jnp.eye(3), cam_t, fov, fov, w, h
        )
        return fateavatar_forward(
            model, params, state, expr, pose, camera, bg_color=bg,
            render_cfg=render_cfg
        )["rgb_image"]

    _BG = {"white": np.ones(3, np.float32),
           "black": np.zeros(3, np.float32),
           "gray": np.full(3, 0.5, np.float32)}
    _cano_exp = (np.zeros(n_exp, np.float32)
                 if model.flame.canonical_exp is None else
                 np.asarray(model.flame.canonical_exp, np.float32).reshape(-1))
    _cano_pose = (np.zeros(15, np.float32)
                  if model.flame.canonical_pose is None else
                  np.asarray(model.flame.canonical_pose,
                             np.float32).reshape(-1))

    if tables is not None:
        _t_expr = np.asarray(jax.device_get(tables.expression))
        _t_pose = np.asarray(jax.device_get(tables.flame_pose))

    def render_fn(ui):
        playing = ui.get("playing") and dataset is not None and len(dataset)
        if playing:
            idx = ui.get("frame", 0) % len(dataset)
            if ui.get("tracked") and tables is not None:
                expr = _t_expr[idx, :n_exp].astype(np.float32)
                pose = _t_pose[idx].astype(np.float32).copy()
            else:
                s = dataset.sample(idx)
                expr = np.asarray(s["expression"], np.float32)
                pose = np.asarray(s["flame_pose"], np.float32).copy()
        elif ui.get("canonical"):
            # canonical-pose view (the reference viewer's manual-mode
            # default, tools/gui.py:186-190); orbit still applies below
            expr = _cano_exp[:n_exp].copy()
            pose = _cano_pose[:15].copy()
        else:
            expr = np.zeros(n_exp, np.float32)
            vals = ui.get("exp", [])
            expr[: len(vals)] = np.asarray(vals, np.float32)[:n_exp]
            pose = np.zeros(15, np.float32)
            pose[6] = ui.get("jaw", 0.0)
            neck = ui.get("neck")
            if neck:
                pose[3:6] = np.asarray(neck, np.float32)[:3]
        # orbit as head rotation
        pose[0] = -float(ui.get("pitch", 0.0))
        pose[1] = float(ui.get("yaw", 0.0))
        cam_t = np.array([0.0, 0.0, camera_distance * float(ui.get("zoom", 1.0))],
                         np.float32)
        bg = _BG.get(str(ui.get("bg", "white")), _BG["white"])
        t0 = time.perf_counter()
        img = _render(jnp.asarray(expr), jnp.asarray(pose),
                      jnp.asarray(cam_t),
                      jnp.asarray(float(ui.get("fov", 0.8)), jnp.float32),
                      jnp.asarray(bg))
        jax.block_until_ready(img)
        device_ms = (time.perf_counter() - t0) * 1000.0
        return img, device_ms

    return render_fn
