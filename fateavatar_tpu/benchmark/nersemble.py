"""NeRSemble mono-FLAME-avatar benchmark harness.

Equivalent of benchmark/ in the reference (~1.7k LoC): train FateAvatar on
one camera serial of a NeRSemble participant and render the hold-out serials
to videos for submission (benchmark/run_nersemble_benchmark.py:101-137,
train_nersemble_benchmark_mono.py:74-121).

The reference reads data through the proprietary ``nersemble_benchmark``
package. This harness consumes a neutral exported layout instead (one
``prepare`` run with that package on any machine produces it):

  <root>/<participant>/
    calibration.json          # {serial: {"K": 3x3, "world2cam": 4x4}}
    flame_params.json         # {"frames": [{"expression": [...], "pose": [15]}],
                              #  "shape_params": [...], "n_shape": N, "n_exp": E}
    images/<serial>/<frame>.png   (train serial only)

Benchmark cameras have non-centred principal points, so the camera path
uses the intrinsics-shift projection (ops/camera.py, mirroring
benchmark/nersemble/fateavatar.py:182-186).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from fateavatar_tpu.ops.camera import focal2fov, make_camera
from fateavatar_tpu.train.datasets import FaceDataset, FrameRecord

# the benchmark's standard hold-out serials (benchmark/run_nersemble_benchmark.sh)
DEFAULT_TRAIN_SERIAL = "222200037"
DEFAULT_HOLD_OUT_SERIALS = ("222200040", "222200042", "222200046", "222200049")


class NersembleBenchmarkDataset(FaceDataset):
    """Per-serial dataset with intrinsics-shift cameras
    (benchmark/nersemble/dataset.py:12-60 contract)."""

    type_name = "nersemble"
    optimize_tracking = False

    def __init__(self, root: str, participant: str, serial: str, img_res,
                 mode: str = "train", cache_images: bool = True,
                 background_color: str = "white"):
        super().__init__(img_res, background_color, cache_images)
        pdir = os.path.join(root, participant)
        with open(os.path.join(pdir, "calibration.json")) as f:
            calib = json.load(f)[serial]
        with open(os.path.join(pdir, "flame_params.json")) as f:
            flame = json.load(f)

        self.K = np.asarray(calib["K"], np.float32)
        w2c = np.asarray(calib["world2cam"], np.float32)
        self.n_shape = int(flame.get("n_shape", 100))
        self.n_exp = int(flame.get("n_exp", 300))
        self.shape_params = np.asarray(
            flame["shape_params"], np.float32
        ).reshape(1, -1)

        h, w = img_res
        # rescale K for the working resolution (native NeRSemble is 2200x3208)
        native_w = float(flame.get("native_width", w))
        native_h = float(flame.get("native_height", h))
        self.K = self.K.copy()
        self.K[0] *= w / native_w
        self.K[1] *= h / native_h
        self.fovx = focal2fov(float(self.K[0, 0]), w)
        self.fovy = focal2fov(float(self.K[1, 1]), h)

        exprs, poses = [], []
        img_dir = os.path.join(pdir, "images", serial)
        for i, fr in enumerate(flame["frames"]):
            exprs.append(np.asarray(fr["expression"], np.float32)[: self.n_exp])
            poses.append(np.asarray(fr["pose"], np.float32))
            name = fr.get("name", f"{i:05d}")
            self.records.append(FrameRecord(
                image_path=os.path.join(img_dir, name + ".png"),
                mask_path=None, img_name=name,
            ))
        self.expressions = np.stack(exprs)
        self.flame_pose = np.stack(poses)
        self.world_mats = np.tile(w2c[None], (len(self.records), 1, 1))
        self.mean_expression = self.expressions.mean(0, keepdims=True)
        self.var_expression = self.expressions.var(0, keepdims=True)

    def camera(self, idx: int, width: int, height: int):
        w2v = self.world_mats[idx]
        return make_camera(
            w2v[:3, :3].T, w2v[:3, 3], self.fovx, self.fovy, width, height,
            intrinsics=self.K,
        )

    def sample(self, idx: int) -> dict:
        s = super().sample(idx)
        s["intrinsics_K"] = self.K  # principal-point-shift camera path
        return s


@dataclass
class BenchmarkRunConfig:
    root: str
    participants: List[str]
    train_serial: str = DEFAULT_TRAIN_SERIAL
    hold_out_serials: tuple = DEFAULT_HOLD_OUT_SERIALS
    out_dir: str = "./nersemble_submission"
    img_res: tuple = (512, 512)
    fps: int = 25


def render_hold_out_serials(
    model, params, state, dataset_root: str, participant: str,
    hold_out_serials, img_res, out_dir: str, render_cfg, fps: int = 25,
):
    """Render every hold-out serial's test sequence to video
    (run_nersemble_benchmark.py:101-137)."""
    import jax
    import jax.numpy as jnp

    from fateavatar_tpu.models.fateavatar import fateavatar_forward
    from fateavatar_tpu.utils.logging import write_video

    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(lambda e, p, cam: fateavatar_forward(
        model, params, state, e, p, cam, render_cfg=render_cfg
    )["rgb_image"])

    written = []
    for serial in hold_out_serials:
        ds = NersembleBenchmarkDataset(
            dataset_root, participant, serial, img_res, mode="test",
        )
        frames = []
        for i in range(len(ds)):
            cam = ds.camera(i, img_res[1], img_res[0])
            frames.append(np.asarray(fwd(
                jnp.asarray(ds.expressions[i]),
                jnp.asarray(ds.flame_pose[i]), cam,
            )))
        path = os.path.join(out_dir, f"{participant}_cam_{serial}.mp4")
        write_video(path, frames, fps=fps)
        written.append(path)
    return written
