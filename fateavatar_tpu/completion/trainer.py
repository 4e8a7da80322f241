"""Completion fine-tuning: interleave real and pseudo frames.

Re-design of train/completor.py:31-454 (CompletionTrainer). After stage-1
monocular training + pseudo-view generation, the avatar is re-seeded with a
fresh template splat set (back-of-head splats were pruned during monocular
training) and fine-tuned with each real frame followed by one random pseudo
frame (random background, orbit camera, canonical pose — completor.py:88-266).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.completion.camera_sampler import orbit_cameras, sample_orbit_pose
from fateavatar_tpu.models import maintenance
from fateavatar_tpu.models.fateavatar import fateavatar_forward
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.train.datasets import FaceDataset, FrameRecord, load_rgb
from fateavatar_tpu.train.optim import zero_moment_rows
from fateavatar_tpu.train.step import Frame
from fateavatar_tpu.train.trainer import Trainer
from fateavatar_tpu.utils.logging import write_video


class PseudoDataset(FaceDataset):
    """Reads the pseudo-view folder written by PseudoGenerator: image/*.png
    + trajectory.json + optional mask/*.png (train/completor.py:119-131
    restricts to the middle half of the orbit by default)."""

    type_name = "pseudo"

    def __init__(self, pseudo_dir: str, img_res, n_exp: int,
                 flame_canonical_exp=None, flame_canonical_pose=None,
                 orbit_radius: float = 2.7, lookat=(0.0, 0.0, 0.0),
                 fovx: float = 0.8, fovy: float = 0.8,
                 middle_half_only: bool = True,
                 cache_images: bool = True):
        super().__init__(img_res, cache_images=cache_images)
        with open(os.path.join(pseudo_dir, "trajectory.json")) as f:
            traj = json.load(f)

        names = sorted(traj.keys())
        if middle_half_only:
            lo, hi = len(names) // 4, 3 * len(names) // 4
            names = names[lo:hi]

        self.n_exp = n_exp
        self.fovx, self.fovy = fovx, fovy
        exp = (np.zeros((1, n_exp), np.float32)
               if flame_canonical_exp is None
               else np.asarray(flame_canonical_exp, np.float32).reshape(1, -1))
        pose = (np.zeros((1, 15), np.float32)
                if flame_canonical_pose is None
                else np.asarray(flame_canonical_pose, np.float32).reshape(1, -1))

        world_mats = []
        for name in names:
            az = traj[name]["azimuth"]
            c2w = sample_orbit_pose(az, np.pi / 2, np.asarray(lookat),
                                    orbit_radius)
            world_mats.append(np.linalg.inv(c2w).astype(np.float32))
            self.records.append(FrameRecord(
                image_path=os.path.join(pseudo_dir, "image", name + ".png"),
                mask_path=os.path.join(pseudo_dir, "mask", name + ".png"),
                img_name=name,
            ))
        self.world_mats = np.stack(world_mats)
        self.expressions = np.repeat(exp, len(names), axis=0)
        self.flame_pose = np.repeat(pose, len(names), axis=0)
        self.shape_params = np.zeros((1, 1), np.float32)
        self.mean_expression = exp
        self.var_expression = None


class CompletionTrainer(Trainer):
    """Trainer with pseudo-frame augmentation (completor.py:88-266)."""

    def __init__(self, *args, pseudo_dataset: Optional[PseudoDataset] = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.pseudo_dataset = pseudo_dataset

    def add_default_points(self, seed: int = 0):
        """Re-seed template splats into free capacity before completion
        fine-tuning (completor.py:153, fateavatar.py:739-812)."""
        params, state, touched = maintenance.add_default_points(
            self.model, self.ts.params, self.ts.state, seed=seed
        )
        opt_state = zero_moment_rows(
            self.ts.opt_state, touched, maintenance.SPLAT_FIELDS
        )
        self.ts = self.ts.replace(params=params, state=state, opt_state=opt_state)
        self.logger.log(
            f"[completion] re-seeded template splats, alive="
            f"{int(jnp.sum(state.alive))}"
        )

    def augmentation(self, finetune_epochs: int = 1, seed: int = 0):
        """Interleaved fine-tune: per real frame also train one random
        pseudo frame with a RANDOM background colour (completor.py:163-212)."""
        if self.pseudo_dataset is None or len(self.pseudo_dataset) == 0:
            raise ValueError("no pseudo dataset")
        rng = np.random.default_rng(seed)
        ds = self.train_dataset
        pd = self.pseudo_dataset

        for _ in range(finetune_epochs):
            self.epoch += 1
            for i in range(len(ds)):
                real = ds.sample(i)
                frame = self._make_frame(real, self.train_tables
                                         if self.tracking_enabled else None)
                self.ts, aux = self.train_step(self.ts, frame)
                self.global_step += 1

                p = pd.sample(int(rng.integers(len(pd))))
                bg = jnp.asarray(rng.random(3), jnp.float32)
                # cache=False: the device frame cache is keyed by TRAIN
                # frame index — caching a pseudo frame under its own idx
                # would poison the real frames' cache entries
                pframe = self._make_frame(
                    p, None, cache=False).replace(bg_color=bg)
                # composite the pseudo gt onto the same random bg
                mask_path = pd.records[p["idx"]].mask_path
                gt = np.asarray(p["ground_truth"]["rgb"])
                if mask_path and os.path.exists(mask_path):
                    from fateavatar_tpu.train.datasets import load_mask

                    m = load_mask(mask_path, pd.img_res)[..., None]
                    gt = gt * m + np.asarray(bg) * (1 - m)
                pframe = pframe.replace(rgb=jnp.asarray(gt, jnp.float32))
                self.ts, aux = self.train_step(self.ts, pframe)
                self.global_step += 1
            self.save_checkpoint()
            self.logger.log(
                f"[completion epoch {self.epoch}] loss={float(aux['loss']):.5f} "
                f"alive={int(aux['num_alive'])}"
            )

    # ------------------------------------------------------------------
    # 360° result videos (completor.py:269-424)
    # ------------------------------------------------------------------

    def render_dynamic_novel_view(self, out_path: str, num_frames: int = 100,
                                  radius: float = 2.7):
        """Orbiting camera over the test expression sequence."""
        ds = self.test_dataset or self.train_dataset
        lookat = np.asarray(jax.device_get(
            jnp.mean(self.model.flame.v_template, axis=0)))
        cams, _ = orbit_cameras(
            num_frames, lookat, radius,
            float(ds.fovx), float(ds.fovy),
            self.model.cfg.img_width, self.model.cfg.img_height,
        )
        fwd = jax.jit(lambda e, p, cam: fateavatar_forward(
            self.model, self.ts.params, self.ts.state, e, p, cam,
            render_cfg=self.render_cfg,
        )["rgb_image"])
        frames = []
        for i, cam in enumerate(cams):
            s = ds.sample(i % len(ds))
            frames.append(np.asarray(fwd(
                jnp.asarray(s["expression"], jnp.float32),
                jnp.asarray(s["flame_pose"], jnp.float32), cam,
            )))
        write_video(out_path, frames)
        return frames

    def render_dynamic_fixed_view(self, out_dir: str, num_frames: int = 50,
                                  radius: float = 2.7,
                                  azimuths=(0, 60, 120, 180, 240, 300)):
        """Six fixed azimuth videos (completor.py:355-424)."""
        ds = self.test_dataset or self.train_dataset
        lookat = np.asarray(jax.device_get(
            jnp.mean(self.model.flame.v_template, axis=0)))
        os.makedirs(out_dir, exist_ok=True)
        fwd = jax.jit(lambda e, p, cam: fateavatar_forward(
            self.model, self.ts.params, self.ts.state, e, p, cam,
            render_cfg=self.render_cfg,
        )["rgb_image"])
        for az in azimuths:
            c2w = sample_orbit_pose(np.deg2rad(az), np.pi / 2, lookat, radius)
            w2c = np.linalg.inv(c2w)
            cam = make_camera(
                w2c[:3, :3].T, w2c[:3, 3], float(ds.fovx), float(ds.fovy),
                self.model.cfg.img_width, self.model.cfg.img_height,
            )
            frames = []
            for i in range(min(num_frames, len(ds))):
                s = ds.sample(i)
                frames.append(np.asarray(fwd(
                    jnp.asarray(s["expression"], jnp.float32),
                    jnp.asarray(s["flame_pose"], jnp.float32), cam,
                )))
            write_video(os.path.join(out_dir, f"azimuth_{az:03d}.mp4"), frames)
