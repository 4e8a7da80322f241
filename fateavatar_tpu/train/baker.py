"""Neural baking trainer + texture editor.

Re-design of train/baker.py:32-777 (UVBaker / UVEditor): optimize the UV
decoder against the trained avatar's renders, dump textures, export a baked
avatar, and edit the baked color texture (sticker compositing and style
transfer) with live re-rendering.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fateavatar_tpu.models import uv_decoder as uvd
from fateavatar_tpu.models.uv_decoder import UVDecoderModel
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train.checkpoints import load_pytree, save_pytree
from fateavatar_tpu.train.datasets import FaceDataset, Prefetcher
from fateavatar_tpu.train.losses import FateAvatarLossConfig, l2_loss
from fateavatar_tpu.utils.logging import Logger, save_image, save_image_grid


class UVBakerLossConfig(FateAvatarLossConfig):
    pass


class UVBaker:
    """Decoder-only optimization (train/baker.py:97-191): Adam lr 1e-3 over
    the net params + const input, avatar priors frozen."""

    def __init__(
        self,
        model: UVDecoderModel,
        net,
        net_vars,
        loss_fn,                      # FateAvatarLoss-compatible callable
        train_dataset: FaceDataset,
        workspace: Optional[str] = None,
        reg_weight: float = 0.0,
        reg_attribute=("color",),
        lr: float = 1e-3,
        render_cfg: RenderConfig = RenderConfig(),
        bg_color=None,
    ):
        self.model = model
        self.net = net
        self.net_vars = net_vars
        self.loss_fn = loss_fn
        self.dataset = train_dataset
        self.workspace = workspace
        self.reg_weight = reg_weight
        self.reg_attribute = tuple(reg_attribute)
        self.render_cfg = render_cfg
        self.bg_color = (
            jnp.asarray(bg_color, jnp.float32) if bg_color is not None else None
        )
        self.logger = Logger("baker", workspace)
        self.epoch = 0
        self.global_step = 0

        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self._trainable(net_vars))
        self._step = self._build_step()

        # device frame cache (float32 gt + camera pytree per index), gated
        # on a conservative HBM budget like Trainer's uint8 cache
        h = model.avatar.cfg.img_height
        w = model.avatar.cfg.img_width
        est_bytes = len(train_dataset) * h * w * 12
        self._frame_cache: Optional[dict] = {} if est_bytes <= (2 << 30) else None

        if workspace is not None:
            for sub in ("textures", "checkpoints_baked", "bake_snapshots"):
                os.makedirs(os.path.join(workspace, sub), exist_ok=True)

    @staticmethod
    def _trainable(net_vars):
        return {"params": net_vars["params"], "const": net_vars["const"]}

    def _build_step(self):
        model, net, loss_fn = self.model, self.net, self.loss_fn
        reg_w, reg_attrs = self.reg_weight, self.reg_attribute
        render_cfg = self.render_cfg

        def loss_of(trainable, batch_stats, expr, pose, camera, rgb, bg):
            net_vars = {
                "params": trainable["params"],
                "const": trainable["const"],
                "batch_stats": batch_stats,
            }
            out, new_vars = uvd.uv_decoder_forward(
                model, net, net_vars, expr, pose, camera,
                bg_color=bg, render_cfg=render_cfg, train=True,
            )
            losses = loss_fn(out, {"rgb": rgb})
            loss = losses["loss"]
            # per-attribute L2 regularization vs the trained priors
            # (train/loss.py:651-676), restricted to alive prior splats
            if reg_w > 0:
                alive = model.alive[: model.prior_opacity.shape[0]]
                w = alive.astype(jnp.float32)
                denom = jnp.maximum(jnp.sum(w), 1.0)

                def masked_l2(a, b):
                    d = jnp.sum((a - b) ** 2, axis=tuple(range(1, a.ndim)))
                    return jnp.sum(d * w) / denom

                reg = 0.0
                pairs = {
                    "color": (out["decode_color"], out["prior_features_dc"]),
                    "opacity": (out["decode_opacity"], out["prior_opacity"]),
                    "scaling": (out["decode_scaling"], out["prior_scaling"]),
                    "rotation": (out["decode_rotation"], out["prior_rotation"]),
                    "offset": (out["decode_offset"], out["prior_offset"]),
                }
                for att in reg_attrs:
                    a, b = pairs[att]
                    reg = reg + masked_l2(a, b)
                losses["reg_loss"] = reg
                loss = loss + reg * reg_w
            return loss, (losses, new_vars["batch_stats"], out)

        grad_fn = jax.grad(loss_of, has_aux=True)

        @jax.jit
        def step(trainable, batch_stats, opt_state, expr, pose, camera, rgb, bg):
            grads, (losses, new_bs, out) = grad_fn(
                trainable, batch_stats, expr, pose, camera, rgb, bg
            )
            updates, opt_state = self.opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, new_bs, opt_state, losses

        return step

    def bake(self, max_epochs: int = 5, pseudo_dataset: Optional[FaceDataset] = None):
        # the __init__ budget gate saw only the real dataset; pseudo frames
        # are cached too (keyed ('pseudo', idx)), so re-check the combined
        # footprint and drop caching entirely if it would blow the budget
        if pseudo_dataset is not None and self._frame_cache is not None:
            h = self.model.avatar.cfg.img_height
            w = self.model.avatar.cfg.img_width
            est = (len(self.dataset) + len(pseudo_dataset)) * h * w * 12
            if est > (2 << 30):
                self.logger.log(
                    f"[bake] real+pseudo frames ~{est >> 20} MiB exceed the "
                    "2 GiB device-cache budget; streaming uploads per step")
                self._frame_cache = None
        for _ in range(max_epochs):
            self.epoch += 1
            self.bake_epoch(pseudo_dataset)
            if self.workspace is not None:
                self.texture_dump()
        return self.net_vars

    def bake_epoch(self, pseudo_dataset: Optional[FaceDataset] = None):
        """One pass over the dataset (train/baker.py:120-191). When a
        ``pseudo_dataset`` is given, each real frame is followed by a random
        pseudo frame (bake_full_head_epoch, train/baker.py:193-361)."""
        t0 = time.perf_counter()
        total, count = 0.0, 0
        rng = np.random.default_rng(self.epoch)
        trainable = self._trainable(self.net_vars)
        batch_stats = self.net_vars["batch_stats"]

        # Deferred loss fetches: a float() per step is one blocking host
        # round trip (~ms each through a remote-TPU tunnel) that serializes
        # the dispatch pipeline — the r4 bake ran at 1.3 it/s for a ~25 ms
        # device step. Losses are device scalars until flushed in batches.
        pending = []

        def flush():
            nonlocal total, count
            for v in jax.device_get(pending):
                total += float(v)
                count += 1
            pending.clear()

        for sample in Prefetcher(self.dataset, np.arange(len(self.dataset))):
            samples = [sample]
            if pseudo_dataset is not None and len(pseudo_dataset):
                samples.append(
                    pseudo_dataset.sample(int(rng.integers(len(pseudo_dataset))))
                )
            for tag, s in zip(("real", "pseudo"), samples):
                frame = self._prep(s, tag)
                trainable, batch_stats, self.opt_state, losses = self._step(
                    trainable, batch_stats, self.opt_state, *frame
                )
                self.global_step += 1
                pending.append(losses["loss"])
                if len(pending) >= 50:
                    flush()

        flush()
        self.net_vars = {
            "params": trainable["params"],
            "const": trainable["const"],
            "batch_stats": batch_stats,
        }
        dt = time.perf_counter() - t0
        self.logger.log(
            f"[bake epoch {self.epoch}] loss={total / max(count, 1):.5f} "
            f"({count / max(dt, 1e-9):.2f} it/s)"
        )

    def _prep(self, sample, tag: str = "real"):
        # frames are device-cached by (source, index): the gt upload (3 MB
        # per 512^2 float32 frame) otherwise re-ships every epoch and bounds
        # the bake at the tunnel bandwidth, not the device step
        idx = sample.get("idx") if self._frame_cache is not None else None
        key = (tag, idx)
        if idx is not None and key in self._frame_cache:
            return self._frame_cache[key]
        from fateavatar_tpu.ops.camera import make_camera_np

        h = self.model.avatar.cfg.img_height
        w = self.model.avatar.cfg.img_width
        cam_pose = np.asarray(sample["cam_pose"], np.float32)
        # numpy camera: eager jnp camera math costs ~a tunnel round trip
        # per op on remote backends (see Trainer._make_frame)
        camera = make_camera_np(
            cam_pose[:3, :3].T, cam_pose[:3, 3],
            sample["fovx"], sample["fovy"], w, h,
        )
        bg = self.bg_color if self.bg_color is not None else self.model.avatar.bg_color
        frame = (
            jnp.asarray(sample["expression"], jnp.float32),
            jnp.asarray(sample["flame_pose"], jnp.float32),
            camera,
            jax.device_put(np.asarray(sample["ground_truth"]["rgb"],
                                      np.float32)),
            bg,
        )
        if idx is not None:
            self._frame_cache[key] = frame
        return frame

    # ------------------------------------------------------------------
    # artifacts
    # ------------------------------------------------------------------

    def textures(self) -> Dict[str, jax.Array]:
        raw, act, _ = uvd.decode_textures(
            self.model, self.net, self.net_vars, train=False
        )
        return raw, act

    def texture_dump(self):
        """Persist raw textures + a visualization grid
        (train/baker.py:406-442)."""
        raw, act = self.textures()
        path = os.path.join(
            self.workspace, "textures", f"texture_epoch{self.epoch}.npz"
        )
        np.savez(path, **{k: np.asarray(v) for k, v in raw.items()})
        from fateavatar_tpu.ops.sh import sh_to_rgb

        vis = [
            np.asarray(sh_to_rgb(act["color"])),
            np.repeat(np.asarray(jax.nn.sigmoid(act["opacity"])), 3, axis=-1),
            np.asarray((act["offset"] + 1) / 2).repeat(3, axis=-1),
        ]
        save_image_grid(
            os.path.join(self.workspace, "bake_snapshots",
                         f"texture_epoch{self.epoch}.png"),
            vis,
        )
        return path

    def export_avatar(self):
        """Write the baked avatar checkpoint (train/baker.py:444-477):
        decoded attributes in FateAvatar param/state form."""
        params, state = uvd.export_avatar_params(
            self.model, self.net, self.net_vars
        )
        if self.workspace is not None:
            save_pytree(
                os.path.join(self.workspace, "checkpoints_baked", "baked.npz"),
                {"params": params, "state": state},
            )
        return params, state


class UVEditor:
    """Texture-space editing of a baked avatar (train/baker.py:487-777)."""

    def __init__(self, model: UVDecoderModel, raw_textures: Dict[str, jax.Array],
                 render_cfg: RenderConfig = RenderConfig()):
        self.model = model
        self.render_cfg = render_cfg
        # work on ACTIVATED textures, like the reference editor
        self.act_textures = {
            name: uvd.activate_texture(
                name, t, model.mean_scaling, model.max_scaling
            )
            for name, t in raw_textures.items()
        }

    def sticker_editing(self, sticker_rgb: np.ndarray, sticker_mask: np.ndarray,
                        position=(0, 0), scale: float = 1.0):
        """Alpha-composite a sticker onto the color texture in activated SH
        space (train/baker.py:649-682). sticker_rgb [h,w,3] in [0,1],
        sticker_mask [h,w] in [0,1]."""
        from PIL import Image

        tex = np.asarray(self.act_textures["color"])
        H, W = tex.shape[:2]
        h = max(1, int(sticker_rgb.shape[0] * scale))
        w = max(1, int(sticker_rgb.shape[1] * scale))
        rgb = np.asarray(Image.fromarray(
            (np.clip(sticker_rgb, 0, 1) * 255).astype("uint8")).resize((w, h))
        ).astype(np.float32) / 255.0
        mask = np.asarray(Image.fromarray(
            (np.clip(sticker_mask, 0, 1) * 255).astype("uint8")).resize((w, h))
        ).astype(np.float32) / 255.0

        y0, x0 = position
        y1, x1 = min(y0 + h, H), min(x0 + w, W)
        rgb = rgb[: y1 - y0, : x1 - x0]
        mask = mask[: y1 - y0, : x1 - x0, None]

        from fateavatar_tpu.ops.sh import rgb_to_sh

        sticker_sh = np.asarray(rgb_to_sh(jnp.asarray(rgb)))
        region = tex[y0:y1, x0:x1]
        tex = tex.copy()
        tex[y0:y1, x0:x1] = sticker_sh * mask + region * (1 - mask)
        self.act_textures["color"] = jnp.asarray(tex)
        return self.act_textures["color"]

    def style_transfer(self, style_model_path: str):
        """Run an OpenCV-dnn .t7 fast-style-transfer model on the color
        texture (train/baker.py:710-746). Requires the user-supplied model
        file (edit_assets/style_transfer/*.t7 in the reference)."""
        import cv2

        from fateavatar_tpu.ops.sh import rgb_to_sh, sh_to_rgb

        color = np.asarray(sh_to_rgb(self.act_textures["color"]))
        img = (np.clip(color, 0, 1) * 255).astype(np.uint8)[:, :, ::-1]  # BGR
        net = cv2.dnn.readNetFromTorch(style_model_path)
        h, w = img.shape[:2]
        blob = cv2.dnn.blobFromImage(
            img, 1.0, (w, h), (103.939, 116.779, 123.680), swapRB=False,
            crop=False,
        )
        net.setInput(blob)
        out = net.forward()[0].transpose(1, 2, 0)
        out += (103.939, 116.779, 123.680)
        out = np.clip(out / 255.0, 0, 1)[:, :, ::-1]
        self.act_textures["color"] = jnp.asarray(
            np.asarray(rgb_to_sh(jnp.asarray(out.astype(np.float32))))
        )
        return self.act_textures["color"]

    def render(self, expression, flame_pose, camera, bg_color=None):
        # jitted once; textures are a TRACED argument so sticker/style
        # edits never recompile (eager per-op dispatch costs ~seconds per
        # frame through a remote-TPU tunnel)
        if not hasattr(self, "_render_jit"):
            self._render_jit = jax.jit(
                lambda tex, e, p, cam, bg: uvd.render_from_texture_dict(
                    self.model, tex, e, p, cam, bg_color=bg,
                    render_cfg=self.render_cfg, activated=True,
                )["rgb_image"])
        if bg_color is None:
            bg_color = self.model.avatar.bg_color
        return self._render_jit(self.act_textures, expression, flame_pose,
                                camera, jnp.asarray(bg_color, jnp.float32))

    def run_animation(self, dataset: FaceDataset, out_path: str, fps: int = 25,
                      max_frames: Optional[int] = None):
        """Animate the edited avatar over a dataset sequence
        (train/baker.py:551-596)."""
        from fateavatar_tpu.utils.logging import write_video

        frames = []
        n = len(dataset) if max_frames is None else min(len(dataset), max_frames)
        h = self.model.avatar.cfg.img_height
        w = self.model.avatar.cfg.img_width
        for i in range(n):
            s = dataset.sample(i)
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            camera = make_camera(
                cam_pose[:3, :3].T, cam_pose[:3, 3], s["fovx"], s["fovy"], w, h
            )
            img = self.render(
                jnp.asarray(s["expression"], jnp.float32),
                jnp.asarray(s["flame_pose"], jnp.float32),
                camera,
            )
            frames.append(np.asarray(img))
        write_video(out_path, frames, fps=fps)
        return frames
