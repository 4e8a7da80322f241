"""Pseudo-view generation for 360° head completion.

Re-design of train/completion.py:41-1074 (PseudoGenerator). The reference's
nine-stage pipeline hinges on six externally-downloaded networks (dlib,
3DDFA_V2, GFPGAN, SphereHead, BiSeNet, MODNet — SURVEY.md §2.4). This module
keeps the pipeline's STRUCTURE and the fully-computable stages native:

  ① render_novel_view     — orbit renders of the trained avatar      [native]
  ② keypoints/pose        — pluggable (cv2 cascades / user detector) [plugin]
  ③ affine crop           — FFHQ-style quad crop via cv2             [native]
  ④ face restoration      — pluggable (GFPGAN-class enhancer)        [plugin]
  ⑤ GAN inversion (PTI)   — pluggable PseudoViewProvider             [plugin]
  ⑥ orbit re-render       — provider-driven                          [plugin]
  ⑦ inverse paste-back    — inverse affine composite via cv2         [native]
  ⑧ mask retrieval        — pluggable matting, alpha fallback        [plugin]
  ⑨ heatmap check         — L1 maps GS-render vs pseudo              [native]

A :class:`MirrorPseudoProvider` makes the whole pipeline runnable with zero
external weights: back-head views are synthesized by horizontally mirroring
the avatar's own renders and blending towards the mean head colour — a
placeholder for a generative prior, clearly marked as such, so the
completion TRAINER (train/completor.py equivalent) can be exercised and
real providers (SphereHead PTI, diffusion inpainting) plug in later.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.completion.camera_sampler import orbit_cameras
from fateavatar_tpu.models.fateavatar import fateavatar_forward
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.utils.logging import Logger, save_image


class PseudoViewProvider(Protocol):
    """Stage ⑤/⑥ abstraction: given the avatar's frontal crops, produce
    pseudo views along the orbit. The reference implements this with
    SphereHead PTI (200 W-steps + 200 generator-tune steps,
    tools/eg3d_utils/pti.py:29-362)."""

    def generate(self, crops: np.ndarray, angles: np.ndarray) -> np.ndarray:
        ...


class MirrorPseudoProvider:
    """Weight-free placeholder provider: mirrors the nearest front view and
    fades detail with angular distance from the front. NOT a generative
    prior — documents the interface and keeps the pipeline runnable."""

    def generate(self, crops: np.ndarray, angles: np.ndarray) -> np.ndarray:
        n_src = len(crops)
        out = []
        mean_color = crops.mean(axis=(0, 1, 2), keepdims=True)[0]
        for ang in angles:
            # wrap angle to [-pi, pi); 0 == front
            a = (ang + np.pi) % (2 * np.pi) - np.pi
            src = crops[int(abs(a) / np.pi * (n_src - 1))]
            img = src[:, ::-1] if a < 0 else src
            back_ness = min(abs(a) / np.pi, 1.0)
            out.append(img * (1 - back_ness) + mean_color * back_ness)
        return np.stack(out).astype(np.float32)


@dataclass
class PseudoGeneratorConfig:
    num_views: int = 30
    orbit_radius: float = 2.7
    crop_size: int = 512
    out_dir: str = "./pseudo"


class PseudoGenerator:
    """Drives the staged pipeline over a trained avatar (the Loader role of
    train/completion.py:41-157)."""

    def __init__(
        self,
        model,
        params,
        state,
        cfg: PseudoGeneratorConfig,
        render_cfg: RenderConfig = RenderConfig(),
        provider: Optional[PseudoViewProvider] = None,
        matting_fn: Optional[Callable] = None,
        restorer_fn: Optional[Callable] = None,
        logger: Optional[Logger] = None,
    ):
        self.model = model
        self.params = params
        self.state = state
        self.cfg = cfg
        self.render_cfg = render_cfg
        self.provider = provider or MirrorPseudoProvider()
        self.matting_fn = matting_fn
        self.restorer_fn = restorer_fn
        self.logger = logger or Logger("pseudo")
        os.makedirs(cfg.out_dir, exist_ok=True)

    # ------------------------------------------------------------------
    # stage ①: orbit renders of the trained avatar (completion.py:159-251)
    # ------------------------------------------------------------------
    def render_novel_view(self, fovx: float, fovy: float, radius: float = None):
        cfgm = self.model.cfg
        lookat = np.asarray(
            jax.device_get(jnp.mean(self.model.flame.v_template, axis=0))
        )
        cams, c2ws = orbit_cameras(
            self.cfg.num_views, lookat, radius or self.cfg.orbit_radius,
            fovx, fovy, cfgm.img_width, cfgm.img_height,
        )
        self._last_cams = cams          # reused by stage ② in run()
        expr = self.model.flame.canonical_exp[0]
        pose = self.model.flame.canonical_pose[0]
        fwd = jax.jit(lambda cam: fateavatar_forward(
            self.model, self.params, self.state, expr, pose, cam,
            render_cfg=self.render_cfg,
        )["rgb_image"])
        images = []
        view_dir = os.path.join(self.cfg.out_dir, "novel_views")
        os.makedirs(view_dir, exist_ok=True)
        for i, cam in enumerate(cams):
            img = np.asarray(fwd(cam))
            images.append(img)
            save_image(os.path.join(view_dir, f"{i:04d}.png"), img)
        np.save(os.path.join(self.cfg.out_dir, "c2w.npy"), c2ws)
        self.logger.log(f"[pseudo ①] {len(images)} orbit views -> {view_dir}")
        return np.stack(images), c2ws

    # ------------------------------------------------------------------
    # stage ②: keypoints (completion.py:253-303). The reference runs dlib's
    # 68-landmark detector on its own renders; here the camera AND driving
    # mesh are known, so the EXACT FLAME landmarks are projected instead
    # (needs the landmark embedding asset; returns None without it).
    # ------------------------------------------------------------------
    def detect_keypoints(self, cams):
        from fateavatar_tpu.flame.flame import flame_forward, flame_landmarks

        flame = self.model.flame
        if flame.lmk_faces_idx is None:
            self.logger.log("[pseudo ②] no landmark embedding — skipped")
            return None
        verts, _, _ = flame_forward(
            flame, flame.canonical_exp, flame.canonical_pose
        )
        lmk3d = flame_landmarks(flame, verts)[0]          # [68, 3]
        out = []
        for cam in cams:
            p = lmk3d @ cam.full_proj[:, :3].T + cam.full_proj[:, 3]
            ndc = p[:, :2] / jnp.maximum(p[:, 3:4], 1e-6)
            px = (ndc * 0.5 + 0.5) * jnp.asarray(
                [cam.width, cam.height], jnp.float32
            )
            visible = p[:, 3] > 0
            out.append(np.concatenate(
                [np.asarray(px), np.asarray(visible)[:, None]], axis=1
            ))
        kps = np.stack(out)                               # [V, 68, 3]
        np.save(os.path.join(self.cfg.out_dir, "keypoints.npy"), kps)
        self.logger.log(f"[pseudo ②] projected FLAME 68-kps for {len(cams)} views")
        return kps

    # ------------------------------------------------------------------
    # stage ③/⑦: FFHQ-style crop and inverse paste-back (completion.py:305-498,
    # 709-816) — pure affine image ops via cv2
    # ------------------------------------------------------------------
    @staticmethod
    def crop_with_quad(image: np.ndarray, quad: np.ndarray, size: int):
        import cv2

        src = quad.astype(np.float32)[:3]
        dst = np.array([[0, 0], [0, size - 1], [size - 1, size - 1]], np.float32)
        M = cv2.getAffineTransform(src, dst)
        out = cv2.warpAffine((image * 255).astype(np.uint8), M, (size, size))
        return out.astype(np.float32) / 255.0, M

    @staticmethod
    def paste_back(original: np.ndarray, crop: np.ndarray, M: np.ndarray,
                   mask: Optional[np.ndarray] = None):
        import cv2

        h, w = original.shape[:2]
        inv = cv2.invertAffineTransform(M)
        warped = cv2.warpAffine((crop * 255).astype(np.uint8), inv, (w, h))
        warped = warped.astype(np.float32) / 255.0
        if mask is None:
            mask = cv2.warpAffine(
                np.ones(crop.shape[:2], np.float32), inv, (w, h)
            )
        mask = mask[..., None] if mask.ndim == 2 else mask
        return warped * mask + original * (1 - mask)

    # ------------------------------------------------------------------
    # stage ⑤/⑥: provider-driven pseudo views
    # ------------------------------------------------------------------
    def generate_pseudo_views(self, front_images: np.ndarray):
        angles = np.linspace(0, 2 * np.pi, self.cfg.num_views, endpoint=False)
        pseudo = self.provider.generate(front_images, angles)
        img_dir = os.path.join(self.cfg.out_dir, "image")
        os.makedirs(img_dir, exist_ok=True)
        trajectory = {}
        for i, (img, ang) in enumerate(zip(pseudo, angles)):
            name = f"{i:04d}"
            save_image(os.path.join(img_dir, name + ".png"), img)
            trajectory[name] = {"azimuth": float(ang)}
        with open(os.path.join(self.cfg.out_dir, "trajectory.json"), "w") as f:
            json.dump(trajectory, f, indent=2)
        self.logger.log(f"[pseudo ⑤/⑥] {len(pseudo)} pseudo views -> {img_dir}")
        return pseudo, angles

    # ------------------------------------------------------------------
    # stage ⑧: masks (completion.py:818-1028) — pluggable matting, alpha
    # threshold fallback
    # ------------------------------------------------------------------
    def retrieve_masks(self, images: np.ndarray):
        mask_dir = os.path.join(self.cfg.out_dir, "mask")
        os.makedirs(mask_dir, exist_ok=True)
        masks = []
        for i, img in enumerate(images):
            if self.matting_fn is not None:
                m = self.matting_fn(img)
            else:
                # luminance-distance from the background colour
                bg = np.asarray(jax.device_get(self.model.bg_color))
                m = (np.abs(img - bg).sum(-1) > 0.08).astype(np.float32)
            masks.append(m)
            save_image(
                os.path.join(mask_dir, f"{i:04d}.png"),
                np.repeat(m[..., None], 3, axis=-1),
            )
        return np.stack(masks)

    # ------------------------------------------------------------------
    # stage ⑨: heatmap sanity check (completion.py:1030-1066)
    # ------------------------------------------------------------------
    def heatmap_check(self, gs_renders: np.ndarray, pseudo: np.ndarray):
        heat_dir = os.path.join(self.cfg.out_dir, "heatmap")
        os.makedirs(heat_dir, exist_ok=True)
        scores = []
        for i, (a, b) in enumerate(zip(gs_renders, pseudo)):
            l1 = np.abs(a - b).mean(-1)
            scores.append(float(l1.mean()))
            heat = np.stack([l1, np.zeros_like(l1), 1 - l1], axis=-1)
            save_image(os.path.join(heat_dir, f"{i:04d}.png"), heat)
        self.logger.log(
            f"[pseudo ⑨] mean L1 GS-vs-pseudo: {np.mean(scores):.4f}"
        )
        return scores

    # ------------------------------------------------------------------
    def run(self, fovx: float, fovy: float):
        """Full pipeline (the stage flags of train_generate_pseudo.py:15-23
        collapse to one call here; stages are individually reusable)."""
        renders, c2ws = self.render_novel_view(fovx, fovy)
        keypoints = self.detect_keypoints(self._last_cams)
        if self.restorer_fn is not None:
            # stage ④ (completion.py:500-562): restore the crops that feed
            # the GAN-inversion provider (GFPGANRestorer or user enhancer)
            renders_for_provider = self.restorer_fn(renders)
            self.logger.log("[pseudo ④] crops restored")
        else:
            renders_for_provider = renders
        pseudo, angles = self.generate_pseudo_views(renders_for_provider)
        masks = self.retrieve_masks(pseudo)
        self.heatmap_check(renders, pseudo)
        return {"renders": renders, "pseudo": pseudo, "masks": masks,
                "angles": angles, "c2w": c2ws, "keypoints": keypoints}
