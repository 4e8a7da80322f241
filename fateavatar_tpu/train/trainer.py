"""Trainer: host-side orchestration of the jitted training step.

TPU-native re-design of train/base.py:14-245 + train/trainer.py:61-632.
The device-side work (forward/loss/backward/optim/maintenance) is ONE jit
call per frame (train/step.py); the trainer handles epochs, data prefetch,
meters, media snapshots, checkpoints, evaluation and (for IMAvatar) the
per-frame tracking refinement. Host <-> device traffic per step is one
frame upload and one scalar fetch of the loss dict (the reference also
syncs on ``loss.item()`` per step, train/trainer.py:191-200).
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fateavatar_tpu.models.fateavatar import (
    FateAvatarModel,
    fateavatar_forward,
    fateavatar_visualization,
)
from fateavatar_tpu.ops.camera import make_camera
from fateavatar_tpu.render.render import RenderConfig
from fateavatar_tpu.train import metrics as metrics_mod
from fateavatar_tpu.train.checkpoints import CheckpointManager
from fateavatar_tpu.train.datasets import FaceDataset, Prefetcher
from fateavatar_tpu.train.optim import MultiAdam
from fateavatar_tpu.train.step import (
    Frame,
    MaintenanceConfig,
    TrainState,
    init_train_state,
    make_train_step,
)
from fateavatar_tpu.train.tracking import (
    RowAdam,
    TrackingTables,
    make_tracking_step,
    tables_from_dataset,
)
from fateavatar_tpu.utils.logging import Logger, save_image, save_image_grid, write_video


class Trainer:
    def __init__(
        self,
        name: str,
        model: FateAvatarModel,
        params,
        state,
        loss_fn,
        optimizer: MultiAdam,
        train_dataset: FaceDataset,
        test_dataset: Optional[FaceDataset] = None,
        workspace: Optional[str] = None,
        maint_cfg: MaintenanceConfig = MaintenanceConfig(),
        render_cfg: RenderConfig = RenderConfig(),
        tracking_lr: float = 5e-4,
        bg_color=(1.0, 1.0, 1.0),
        snapshot_interval: int = 1000,
        max_keep_ckpt: int = 2,
        seed: int = 0,
        adapter=None,
        data_parallel: int = 0,
        device_frame_cache: str = "auto",
        lpips_weights_path=None,
        scan_unroll: int = 1,
    ):
        self.name = name
        self.model = model
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.workspace = workspace
        if getattr(render_cfg, "autosize", False) and adapter is None:
            # measure the dataset's true tile occupancy on the first few
            # frames and size instance_budget / R / tail_k from it
            # (render/autosize.py) — the CUDA reference sizes its buffers
            # exactly per frame; static XLA shapes get the measured bound
            from fateavatar_tpu.render.autosize import autosize_render_config
            from fateavatar_tpu.train.step import Frame as _Frame

            probes = []
            for i in range(min(4, len(train_dataset))):
                s = train_dataset.sample(i)
                cam_pose = np.asarray(s["cam_pose"], np.float32)
                wt = s.get("world_transform")
                probes.append(_Frame(
                    expression=jnp.asarray(s["expression"], jnp.float32),
                    flame_pose=jnp.asarray(s["flame_pose"], jnp.float32),
                    camera=make_camera(
                        cam_pose[:3, :3].T, cam_pose[:3, 3],
                        s["fovx"], s["fovy"],
                        model.cfg.img_width, model.cfg.img_height,
                        intrinsics=s.get("intrinsics_K")),
                    rgb=jnp.zeros((1, 1, 3)), bg_color=jnp.ones(3),
                    world_transform=(None if wt is None
                                     else jnp.asarray(wt, jnp.float32)),
                ))
            render_cfg = autosize_render_config(
                model, params, state, probes,
                render_cfg.replace(autosize=False), log_fn=print,
            )
        self.render_cfg = render_cfg
        self.maint_cfg = maint_cfg
        self.bg_color = jnp.asarray(bg_color, jnp.float32)
        self.snapshot_interval = snapshot_interval
        self.lpips_weights_path = lpips_weights_path
        # scan-epoch unroll: body copies per while-loop iteration. >1
        # amortizes the loop's per-iteration sequencing overhead (~0.9 ms
        # at 512^2/65k, scripts/bench_bwd_ab.py A/B) at the cost of a
        # proportionally bigger program; epochs whose length is not a
        # multiple still work (lax.scan handles the remainder).
        self.scan_unroll = max(1, int(scan_unroll))

        self.logger = Logger(name, workspace)
        self.epoch = 0
        self.global_step = 0

        # Device-resident uint8 frame cache. Host->device image upload is
        # the trainer's throughput ceiling when the link is slow (measured:
        # a 512^2 float32 frame at ~48 MB/s through the remote-TPU tunnel
        # capped training at 14 it/s vs 91 for the step itself). Frames are
        # shipped ONCE as uint8 (4x smaller), kept in HBM, and converted to
        # float inside the jitted loss (losses.as_float_rgb). "auto"
        # enables it when the whole dataset fits a conservative HBM budget.
        h, w = model.cfg.img_height, model.cfg.img_width
        est_bytes = len(train_dataset) * h * w * 3
        self._frame_cache: Optional[dict] = None
        if device_frame_cache == "on" or (
            device_frame_cache == "auto" and est_bytes <= 4 << 30
        ):
            self._frame_cache = {}
        elif device_frame_cache == "auto":
            self.logger.log(
                f"[cache] dataset ~{est_bytes >> 20} MiB exceeds the 4 GiB "
                "device-frame budget; streaming uploads per step")

        # family adapter (train/adapters.py): None -> built-in FateAvatar
        # wiring; otherwise any registry family trains through this Trainer
        # (the reference's per-model hook dicts, train/trainer.py:79-101)
        self.adapter = adapter
        if adapter is None:
            self.train_step = make_train_step(
                model, loss_fn, optimizer, maint_cfg, render_cfg
            )
            self.ts: TrainState = init_train_state(
                params, state, optimizer, seed)

            def _forward(p, st, expr, pose, camera, world_transform=None):
                return fateavatar_forward(
                    model, p, st, expr, pose, camera,
                    bg_color=self.bg_color, render_cfg=render_cfg,
                    world_transform=world_transform,
                )

            self._forward = _forward
            self._visualize = lambda p, st, expr, pose, camera: (
                fateavatar_visualization(model, p, st, expr, pose, camera,
                                         render_cfg=render_cfg))
        else:
            self.train_step = adapter.step
            self.ts = adapter.init_ts(seed)
            self._forward = lambda p, st, expr, pose, camera: adapter.forward(
                p, st, expr, pose, camera, self.bg_color)
            self._visualize = adapter.visualize

        # media dirs (train/trainer.py:107-134)
        self.media_dirs = {}
        if workspace is not None:
            for sub in ("snapshots", "eval_images", "eval_videos", "metrics"):
                d = os.path.join(workspace, "media", sub)
                os.makedirs(d, exist_ok=True)
                self.media_dirs[sub] = d
            self.ckpt = CheckpointManager(
                os.path.join(workspace, "checkpoints"), max_keep=max_keep_ckpt
            )
        else:
            self.ckpt = None

        # tracking refinement (train/base.py:113-151)
        self.tracking_enabled = getattr(train_dataset, "optimize_tracking", False)
        if self.tracking_enabled:
            self.track_opt = RowAdam(lr=tracking_lr)
            self.train_tables = tables_from_dataset(train_dataset)
            self.train_track_state = self.track_opt.init(self.train_tables)
            if test_dataset is not None:
                self.test_tables = tables_from_dataset(test_dataset)
                self.test_track_state = self.track_opt.init(self.test_tables)
            self._tracking_step = self._build_tracking_step()
        else:
            self.train_tables = None

        # data-parallel epoch driving (SURVEY.md §7 step 12 — a NEW
        # capability over the single-GPU reference): frames batch over a
        # device mesh, splat state replicates, gradients psum over ICI.
        # Family adapters run their own batched steps (baseline_steps
        # retrace on [B, ...] frames); tracking refinement runs as a
        # batched row update after each device step.
        self.dp_mesh = None
        if data_parallel and data_parallel > 1:
            from fateavatar_tpu.parallel.data_parallel import (
                make_device_mesh, make_dp_train_step, replicate,
            )

            self.dp_mesh = make_device_mesh(data_parallel)
            if adapter is not None:
                # baseline family steps accept batched frames directly;
                # sharded inputs make XLA insert the ICI psum
                self.dp_step = adapter.step
            else:
                self.dp_step = make_dp_train_step(
                    model, loss_fn, optimizer, self.dp_mesh,
                    maint_cfg, render_cfg,
                )
            self.ts = replicate(self.ts, self.dp_mesh)
            if self.tracking_enabled:
                self._batched_tracking_step = self._build_tracking_step(
                    batched=True)
                self.train_tables = replicate(self.train_tables, self.dp_mesh)
                self.train_track_state = replicate(
                    self.train_track_state, self.dp_mesh)
            self.logger.log(
                f"[dp] training over {data_parallel} devices "
                f"({jax.devices()[0].platform})"
                + (" with tracking refinement" if self.tracking_enabled
                   else "")
                + (f" [{adapter.name}]" if adapter is not None else ""))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _make_frame(self, sample: dict, tables: Optional[TrackingTables],
                    cache: bool = True) -> Frame:
        # All-numpy frame construction (make_camera_np): zero eager device
        # ops per frame. On the tunnelled remote-TPU backend eager jnp ops
        # cost ~ms each and capped the Trainer at 13 it/s while the jitted
        # step ran at 91 — numpy leaves upload inside the step dispatch.
        from fateavatar_tpu.ops.camera import make_camera_np

        h = self.model.cfg.img_height
        w = self.model.cfg.img_width
        idx = sample["idx"]
        expr = np.asarray(sample["expression"], np.float32)
        pose = np.asarray(sample["flame_pose"], np.float32)
        cam_pose = np.asarray(sample["cam_pose"], np.float32)
        T = cam_pose[:3, 3]
        if tables is not None:
            # tracked rows live on device; the camera is then built with
            # the eager jnp path (its T input is a device row)
            expr = tables.expression[idx]
            pose = tables.flame_pose[idx]
            camera = make_camera(
                cam_pose[:3, :3].T, tables.cam_t[idx],
                sample["fovx"], sample["fovy"], w, h,
                intrinsics=sample.get("intrinsics_K"),
            )
        else:
            camera = make_camera_np(
                cam_pose[:3, :3].T, T,
                sample["fovx"], sample["fovy"], w, h,
                intrinsics=sample.get("intrinsics_K"),  # NeRSemble shift
            )
        rgb = np.asarray(sample["ground_truth"]["rgb"], np.float32)
        # the cache is keyed by TRAIN-dataset frame index; callers feeding
        # samples from another dataset (test-set evaluation) pass
        # cache=False or idx 0 would collide with train frame 0
        if cache and self._frame_cache is not None:
            dev = self._frame_cache.get(idx)
            if dev is None:
                dev = jax.device_put(
                    np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8))
                self._frame_cache[idx] = dev
            rgb = dev
        wt = sample.get("world_transform")
        return Frame(
            expression=expr,
            flame_pose=pose,
            camera=camera,
            rgb=rgb,
            bg_color=self.bg_color,
            world_transform=(None if wt is None
                             else np.asarray(wt, np.float32)),
        )


    @staticmethod
    def _rgb_f32(rgb) -> np.ndarray:
        """Host-side float view of a frame's gt (undoes the device cache's
        uint8 encoding; jitted losses convert on-device via as_float_rgb)."""
        arr = np.asarray(jax.device_get(rgb))
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 255.0
        return arr

    def _build_tracking_step(self, batched: bool = False):
        model, loss_fn = self.model, self.loss_fn

        if batched:
            from fateavatar_tpu.train.tracking import make_batched_tracking_step

            def loss_of_frame_b(expr, pose, cam_t, frame_const, shared):
                R, fovx, fovy, rgb = frame_const
                params, mstate = shared
                camera = make_camera(
                    R, cam_t, fovx, fovy,
                    model.cfg.img_width, model.cfg.img_height,
                )
                out = self._forward(params, mstate, expr, pose, camera)
                return loss_fn(out, {"rgb": rgb})["loss"]

            return make_batched_tracking_step(loss_of_frame_b, self.track_opt)

        def loss_of_frame(expr, pose, cam_t, const):
            R, fovx, fovy, rgb, mstate, params = const
            camera = make_camera(
                R, cam_t, fovx, fovy,
                model.cfg.img_width, model.cfg.img_height,
            )
            out = self._forward(params, mstate, expr, pose, camera)
            return loss_fn(out, {"rgb": rgb})["loss"]

        return make_tracking_step(loss_of_frame, self.track_opt)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------


    def _dev_metrics_fn(self):
        """Jitted 4-metric graph, built once per Trainer (a fresh jit
        closure per evaluate() call would recompile every evaluation)."""
        if getattr(self, "_dev_metrics", None) is None:
            from fateavatar_tpu.train.losses import as_float_rgb, d_ssim
            from fateavatar_tpu.train.losses import psnr as psnr_fn

            @jax.jit
            def dev_metrics(img, gt):
                gt = as_float_rgb(gt)
                return {
                    "psnr": psnr_fn(img, gt),
                    "ssim": 1.0 - d_ssim(img, gt),
                    "l1": jnp.mean(jnp.abs(img - gt)),
                    "l2": jnp.mean((img - gt) ** 2),
                }

            self._dev_metrics = dev_metrics
        return self._dev_metrics

    def _maybe_scan_epoch(self):
        """Build (once) the scan-epoch program: with every gt frame
        device-resident, a full epoch of training steps runs as ONE
        ``lax.scan`` dispatch — the end point of the static-shape design
        ("a training run is one compiled program executed N times" becomes
        one compiled program per epoch). Applies to the built-in FateAvatar
        path without tracking/DP and with no mid-epoch snapshots; other
        configurations keep per-step dispatch. Returns the (epoch_fn,
        stacked_frames) pair or None."""
        if getattr(self, "_scan_epoch", None) is not None:
            return self._scan_epoch
        n = len(self.train_dataset)
        eligible = (
            self._frame_cache is not None
            and len(self._frame_cache) >= n
            and self.dp_mesh is None
            and (self.adapter is None
                 or hasattr(self.train_step, "raw"))
        )
        if not eligible:
            return None
        if self.tracking_enabled:
            if self.adapter is not None:
                return None
            return self._build_scan_epoch_tracking(n)
        frames = [
            self._make_frame(self.train_dataset.sample(i), None)
            for i in range(n)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        # the stacked copy supersedes the per-frame cache rows — clear them
        # so scan mode holds ONE copy of the dataset in HBM (evaluate on
        # the train set / snapshots lazily re-upload the frames they touch)
        self._frame_cache.clear()
        self._scan_epoch = (self._build_scan_epoch_fn(), stacked, False)
        self.logger.log(
            f"[scan] epoch compiled as one lax.scan over {n} "
            "device-resident frames")
        return self._scan_epoch

    def _build_scan_epoch_fn(self):
        if self.adapter is None:
            raw_step = make_train_step(
                self.model, self.loss_fn, self.optimizer, self.maint_cfg,
                self.render_cfg, return_raw=True,
            )
        else:
            raw_step = self.train_step.raw

        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(ts, fr):
            def body(ts, f):
                ts, aux = raw_step(ts, f)
                zero = jnp.zeros((), jnp.float32)
                return ts, {"loss": aux["loss"],
                            "psnr": aux.get("psnr", zero),
                            "overflow": aux.get("overflow",
                                                jnp.zeros((), jnp.int32))}
            return jax.lax.scan(body, ts, fr, unroll=self.scan_unroll)

        return epoch_fn

    def set_render_cfg(self, render_cfg: RenderConfig):
        """Swap binning capacities mid-run (adaptive autosizing: the
        validation protocol re-probes and grows the caps when a training
        epoch reports tile overflow — the XLA analogue of the CUDA
        reference's exact per-frame buffer allocation,
        rasterizer_impl.cu:277-285). Rebuilds the jitted closures; the next
        dispatch pays one recompile."""
        if self.adapter is not None or self.dp_mesh is not None:
            raise NotImplementedError(
                "adaptive render_cfg swap supports the built-in single-"
                "device FateAvatar path only")
        self.render_cfg = render_cfg
        self.train_step = make_train_step(
            self.model, self.loss_fn, self.optimizer, self.maint_cfg,
            render_cfg)

        def _forward(p, st, expr, pose, camera, world_transform=None):
            return fateavatar_forward(
                self.model, p, st, expr, pose, camera,
                bg_color=self.bg_color, render_cfg=render_cfg,
                world_transform=world_transform,
            )

        self._forward = _forward
        self._visualize = lambda p, st, expr, pose, camera: (
            fateavatar_visualization(self.model, p, st, expr, pose, camera,
                                     render_cfg=render_cfg))
        # the tracking-refinement steps close over _forward/render_cfg via
        # their jitted loss — rebuild them too or per-step tracking keeps
        # dispatching the executable compiled against the old caps
        if self.tracking_enabled:
            self._tracking_step = self._build_tracking_step()
            if getattr(self, "_batched_tracking_step", None) is not None:
                self._batched_tracking_step = self._build_tracking_step(
                    batched=True)
        scan = getattr(self, "_scan_epoch", None)
        if scan is not None:
            if scan[2]:   # tracking scan-epoch: rebuild via its own builder
                self._scan_epoch = None
                self._scan_epoch = self._build_scan_epoch_tracking(
                    len(self.train_dataset))
            else:         # reuse the device-resident stacked frames
                self._scan_epoch = (self._build_scan_epoch_fn(), scan[1],
                                    False)

    def _build_scan_epoch_tracking(self, n: int):
        """Scan-epoch for TRACKING datasets (the IMAvatar path): each frame
        index is visited exactly once per epoch, so carrying the tracking
        tables through the scan reproduces the per-step loop exactly —
        main step on the row's current params, then the row refinement
        against the post-step model (train/base.py:113-151 order)."""
        model, loss_fn = self.model, self.loss_fn
        W, H = model.cfg.img_width, model.cfg.img_height
        ds = self.train_dataset

        idxs, Rs, fovxs, fovys, rgbs = [], [], [], [], []
        for i in range(n):
            s = ds.sample(i)
            cam_pose = np.asarray(s["cam_pose"], np.float32)
            idxs.append(s["idx"])
            Rs.append(cam_pose[:3, :3].T)
            fovxs.append(np.float32(s["fovx"]))
            fovys.append(np.float32(s["fovy"]))
            f = self._make_frame(s, None, cache=True)
            rgbs.append(f.rgb)
        xs = {
            "idx": jnp.asarray(np.asarray(idxs, np.int32)),
            "R": jnp.asarray(np.stack(Rs)),
            "fovx": jnp.asarray(np.stack(fovxs)),
            "fovy": jnp.asarray(np.stack(fovys)),
            "rgb": jnp.stack([jnp.asarray(r) for r in rgbs]),
        }
        self._frame_cache.clear()

        raw_step = make_train_step(
            self.model, self.loss_fn, self.optimizer, self.maint_cfg,
            self.render_cfg, return_raw=True,
        )
        track_opt = self.track_opt
        bg = self.bg_color
        fwd = self._forward

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def epoch_fn(ts, tables, tstate, xs):
            def body(carry, x):
                ts, tables, tstate = carry
                idx = x["idx"]
                e = tables.expression[idx]
                p = tables.flame_pose[idx]
                t = tables.cam_t[idx]
                camera = make_camera(x["R"], t, x["fovx"], x["fovy"], W, H)
                frame = Frame(expression=e, flame_pose=p, camera=camera,
                              rgb=x["rgb"], bg_color=bg)
                ts, aux = raw_step(ts, frame)

                def loss_of(e, p, t):
                    cam = make_camera(x["R"], t, x["fovx"], x["fovy"], W, H)
                    out = fwd(ts.params, ts.state, e, p, cam)
                    return loss_fn(out, {"rgb": x["rgb"]})["loss"]

                ge, gp, gt = jax.grad(loss_of, argnums=(0, 1, 2))(e, p, t)
                from fateavatar_tpu.train.tracking import TrackingTables
                tables, tstate = track_opt.update_row(
                    tables, tstate,
                    TrackingTables(expression=ge, flame_pose=gp, cam_t=gt),
                    idx)
                zero = jnp.zeros((), jnp.float32)
                return (ts, tables, tstate), {
                    "loss": aux["loss"],
                    "psnr": aux.get("psnr", zero),
                    "overflow": aux.get("overflow", jnp.zeros((), jnp.int32)),
                }
            (ts, tables, tstate), auxs = jax.lax.scan(
                body, (ts, tables, tstate), xs, unroll=self.scan_unroll)
            return ts, tables, tstate, auxs

        self._scan_epoch = (epoch_fn, xs, True)
        self.logger.log(
            f"[scan] tracking epoch compiled as one lax.scan over {n} "
            "device-resident frames (step + row refinement fused)")
        return self._scan_epoch

    def train(self, max_epochs: int):
        for _ in range(self.epoch + 1, max_epochs + 1):
            self.epoch += 1
            self.train_epoch()
            if self.adapter is not None and self.adapter.epoch_hook:
                self.adapter.epoch_hook(self, self.epoch)
            self.save_checkpoint()

    def train_epoch(self):
        # only the scan path repopulates this; clear it so a mode switch
        # (scan -> per-step, e.g. on 1-core CPU where the A/B prefers
        # per-step) can't leave a STALE per-step loss trace for consumers
        # like the fidelity validation's collapse diagnostics
        self.last_epoch_aux = None
        if self.dp_mesh is not None:
            return self._train_epoch_dp()
        # runtime mode selection: on remote (tunnelled) backends the
        # faster of the two stepping modes depends on the session's
        # per-dispatch overhead vs the scan program's loop overhead — keep
        # whichever measured faster once both have run an epoch
        scan = None if getattr(self, "_scan_disabled", False) \
            else self._maybe_scan_epoch()
        if scan is not None:
            self._train_epoch_scan(*scan)
            # _scan_its exists from the SECOND scan epoch on (the first
            # pays the epoch-program compile)
            per_step = getattr(self, "_per_step_its", None)
            scan_its = getattr(self, "_scan_its", None)
            if per_step and scan_its and scan_its < 0.9 * per_step:
                self._scan_disabled = True
                self.logger.log(
                    f"[scan] per-step mode is faster on this backend "
                    f"({per_step:.1f} vs {scan_its:.1f} it/s) — switching "
                    "back to per-step epochs")
            self._scan_checked = True
            return
        ds = self.train_dataset
        order = np.arange(len(ds))
        meters = {"loss": metrics_mod.LossMeter(), "psnr": metrics_mod.Meter("PSNR")}
        t0 = time.perf_counter()
        tables = self.train_tables if self.tracking_enabled else None

        # Device-side aux values are collected and fetched in batches so the
        # host never serializes the dispatch pipeline (the reference syncs on
        # loss.item() every step, train/trainer.py:191-200 — a per-step
        # host round-trip we deliberately avoid).
        pending = []
        ovf_total = 0

        def flush():
            nonlocal ovf_total
            for a in jax.device_get(pending):
                meters["loss"].update(float(a["loss"]))
                if "psnr" in a:
                    meters["psnr"].update(float(a["psnr"]))
                if int(a.get("overflow", 0)) > 0:
                    ovf_total += int(a["overflow"])
                    self.logger.file_only(
                        f"[WARN] {int(a['overflow'])} tile instances dropped "
                        "(raise max_per_tile)"
                    )
            pending.clear()

        steps_done = 0
        t_steady = None
        for sample in Prefetcher(ds, order):
            frame = self._make_frame(sample, tables)
            self.ts, aux = self.train_step(self.ts, frame)
            self.global_step += 1
            steps_done += 1
            if steps_done == 3:
                # steady-state marker: the first dispatches pay compile +
                # one-time cache uploads and would understate this mode
                jax.block_until_ready(aux["loss"])
                t_steady = time.perf_counter()
            pending.append(aux)

            # tracking refinement on the SAME frame (train/trainer.py:173-176):
            # gradient step on the per-frame embedding rows
            if self.tracking_enabled:
                cam_pose = np.asarray(sample["cam_pose"], np.float32)
                const = (
                    jnp.asarray(cam_pose[:3, :3].T),
                    jnp.asarray(sample["fovx"], jnp.float32),
                    jnp.asarray(sample["fovy"], jnp.float32),
                    frame.rgb, self.ts.state, self.ts.params,
                )
                self.train_tables, self.train_track_state = self._tracking_step(
                    self.train_tables, self.train_track_state,
                    jnp.asarray(sample["idx"], jnp.int32), const,
                )

            if len(pending) >= 50:
                flush()
            if (
                self.workspace is not None
                and self.global_step % self.snapshot_interval == 0
            ):
                self.save_snapshot(sample)

        flush()
        dt = time.perf_counter() - t0
        n = len(ds)
        if t_steady is not None and n > 3:
            self._per_step_its = (n - 3) / max(
                time.perf_counter() - t_steady, 1e-9)
        self.last_epoch_stats = {
            "epoch": self.epoch, "mode": "per-step",
            "its": n / max(dt, 1e-9), "loss": meters["loss"].measure(),
            "psnr": meters["psnr"].measure(),
            "overflow": ovf_total,
            "alive": (int(jnp.sum(self.ts.state.alive))
                      if hasattr(self.ts.state, "alive") else None),
        }
        self.logger.log(
            f"[epoch {self.epoch}] {n} frames in {dt:.1f}s "
            f"({n / max(dt, 1e-9):.2f} it/s) | loss={meters['loss'].measure():.5f} "
            f"PSNR={meters['psnr'].measure():.2f}"
            + (f" alive={int(jnp.sum(self.ts.state.alive))}"
               if hasattr(self.ts.state, "alive") else "")
        )

    def _train_epoch_scan(self, epoch_fn, stacked_frames, tracking=False):
        ds = self.train_dataset
        n = len(ds)
        t0 = time.perf_counter()
        step_before = self.global_step
        if tracking:
            (self.ts, self.train_tables, self.train_track_state,
             aux) = epoch_fn(self.ts, self.train_tables,
                             self.train_track_state, stacked_frames)
        else:
            self.ts, aux = epoch_fn(self.ts, stacked_frames)
        aux = jax.device_get(aux)          # [n] per-step scalars, one fetch
        self.global_step += n
        # snapshot cadence at epoch granularity (per-step semantics would
        # fire mid-epoch; scan mode saves one after the crossing epoch)
        if (self.workspace is not None
                and step_before // self.snapshot_interval
                != self.global_step // self.snapshot_interval):
            self.save_snapshot(ds.sample(n - 1))
        dt = time.perf_counter() - t0
        # the FIRST scan epoch pays the epoch-program compile; only count
        # later ones toward the mode-selection measurement
        if getattr(self, "_scan_checked", False):
            self._scan_its = n / max(dt, 1e-9)
        overflow = int(np.sum(aux["overflow"]))
        if overflow > 0:
            self.logger.file_only(
                f"[WARN] {overflow} tile instances dropped "
                "(raise max_per_tile)")
        # keep the per-step scalars on the host: scripts (fidelity
        # validation) use them to localize WHERE in an epoch a loss
        # inflection happens — a few KB per epoch
        self.last_epoch_aux = aux
        self.last_epoch_stats = {
            "epoch": self.epoch, "mode": "scan",
            "its": n / max(dt, 1e-9), "loss": float(np.mean(aux["loss"])),
            "psnr": float(np.mean(aux["psnr"])),
            "overflow": overflow,
            "alive": (int(jnp.sum(self.ts.state.alive))
                      if hasattr(self.ts.state, "alive") else None),
        }
        self.logger.log(
            f"[epoch {self.epoch}] {n} frames in {dt:.1f}s "
            f"({n / max(dt, 1e-9):.2f} it/s, scan) "
            f"| loss={float(np.mean(aux['loss'])):.5f} "
            f"PSNR={float(np.mean(aux['psnr'])):.2f}"
            + (f" alive={int(jnp.sum(self.ts.state.alive))}"
               if hasattr(self.ts.state, "alive") else "")
        )

    def _train_epoch_dp(self):
        """Data-parallel epoch: B frames per device step. The frame order
        wraps to fill the final batch (reference semantics are one step per
        frame; a handful of duplicated tail frames per epoch is the price
        of static batch shapes)."""
        from fateavatar_tpu.parallel.data_parallel import (
            shard_frames, stack_frames,
        )

        ds = self.train_dataset
        B = self.dp_mesh.devices.size
        order = np.arange(len(ds))
        pad = (-len(order)) % B
        if pad:
            order = np.concatenate([order, order[:pad]])
        meters = {"loss": metrics_mod.LossMeter(),
                  "psnr": metrics_mod.Meter("PSNR")}
        t0 = time.perf_counter()
        pending = []
        batch, batch_samples, last_sample = [], [], None
        tables = self.train_tables if self.tracking_enabled else None
        seen: set = set()
        for sample in Prefetcher(ds, order):
            batch.append(self._make_frame(sample, tables))
            batch_samples.append(sample)
            last_sample = sample
            if len(batch) < B:
                continue
            frames = shard_frames(stack_frames(batch), self.dp_mesh)
            self.ts, aux = self.dp_step(self.ts, frames)
            self.global_step += B
            pending.append(aux)

            if self.tracking_enabled:
                # batched tracking refinement on the same frames; padded
                # tail duplicates (wrapped frame order) are masked out
                idxs = np.asarray([s["idx"] for s in batch_samples], np.int32)
                dup = np.zeros(len(idxs), bool)
                for j, i in enumerate(idxs):
                    if int(i) in seen:
                        dup[j] = True     # padded tail wrap-around
                    seen.add(int(i))
                Rm = np.stack([np.asarray(s["cam_pose"], np.float32)[:3, :3].T
                               for s in batch_samples])
                fovx = np.asarray([s["fovx"] for s in batch_samples],
                                  np.float32)
                fovy = np.asarray([s["fovy"] for s in batch_samples],
                                  np.float32)
                consts = (
                    jnp.asarray(Rm), jnp.asarray(fovx), jnp.asarray(fovy),
                    frames.rgb,
                )
                (self.train_tables,
                 self.train_track_state) = self._batched_tracking_step(
                    self.train_tables, self.train_track_state,
                    jnp.asarray(idxs), jnp.asarray(~dup), consts,
                    (self.ts.params, self.ts.state),
                )
                tables = self.train_tables

            batch, batch_samples = [], []
            if len(pending) >= 50:
                for a in jax.device_get(pending):
                    meters["loss"].update(float(a["loss"]))
                pending.clear()
            if (self.workspace is not None
                    and self.global_step % self.snapshot_interval < B):
                self.save_snapshot(last_sample)
        for a in jax.device_get(pending):
            meters["loss"].update(float(a["loss"]))
        dt = time.perf_counter() - t0
        n = len(order)
        self.logger.log(
            f"[epoch {self.epoch}] {n} frames in {dt:.1f}s "
            f"({n / max(dt, 1e-9):.2f} it/s, dp={B}) "
            f"| loss={meters['loss'].measure():.5f}"
            + (f" alive={int(jnp.sum(self.ts.state.alive))}"
               if hasattr(self.ts.state, "alive") else "")
        )

    # ------------------------------------------------------------------
    # evaluation (train/trainer.py:271-381)
    # ------------------------------------------------------------------

    def evaluate(self, mode: str = "test", optim_epoch: Optional[int] = None,
                 save_media: bool = True):
        ds = self.test_dataset if mode == "test" else self.train_dataset
        if ds is None:
            raise ValueError("no test dataset")

        if mode == "test" and self.tracking_enabled:
            self.optimize_tracking(optim_epoch or 50)

        meters = metrics_mod.default_meters(
            lpips_weights_path=self.lpips_weights_path)
        per_frame = []
        frames_out = []
        tables = None
        if self.tracking_enabled:
            tables = self.test_tables if mode == "test" else self.train_tables

        fwd = jax.jit(
            lambda p, s, e, fp, cam, wt=None:
            (self._forward(p, s, e, fp, cam)
             if wt is None else
             self._forward(p, s, e, fp, cam, wt))["rgb_image"]
        )

        # drop meters whose backing network weights are unavailable (LPIPS
        # needs calibrated weights the zero-egress env cannot fetch)
        meters = {
            k: m for k, m in meters.items()
            if getattr(m, "available", True)
        }

        # the four image metrics compute ON DEVICE in one jitted call per
        # frame; scalar results are fetched in a single batched device_get
        # at the end (per-frame eager metric math + blocking fetches cost
        # ~6 host round trips per frame through the remote-TPU tunnel)
        dev_keys = [k for k in ("psnr", "ssim", "l1", "l2") if k in meters]
        host_meters = {k: m for k, m in meters.items() if k not in dev_keys}
        dev_metrics = self._dev_metrics_fn()

        names, pending, host_rows = [], [], []
        for i in range(len(ds)):
            sample = ds.sample(i)
            frame = self._make_frame(sample, tables,
                                     cache=ds is self.train_dataset)
            img = fwd(self.ts.params, self.ts.state, frame.expression,
                      frame.flame_pose, frame.camera, frame.world_transform)
            names.append(sample["img_name"])
            pending.append(dev_metrics(img, frame.rgb))
            hrow = {}
            if host_meters or save_media:
                gt = self._rgb_f32(frame.rgb)
                for k, meter in host_meters.items():
                    meter.update(np.asarray(img), gt)
                    hrow[k] = meter.V_cur
                if save_media:
                    # fetch the prediction as uint8 (4x smaller download —
                    # the fetch, not the render, bounds eval-video speed)
                    img_u8 = np.asarray(jnp.clip(
                        jnp.round(img * 255.0), 0, 255).astype(jnp.uint8))
                    gt_u8 = (np.clip(gt, 0, 1) * 255).astype(np.uint8)
                    frames_out.append(
                        np.concatenate([img_u8, gt_u8], axis=1))
            host_rows.append(hrow)

        for name, vals, hrow in zip(names, jax.device_get(pending),
                                    host_rows):
            row = {"frame": name, **hrow}
            for k in dev_keys:
                meters[k].update_value(float(vals[k]))
                row[k] = meters[k].V_cur
            per_frame.append(row)

        summary = {k: m.measure() for k, m in meters.items()}
        self.logger.log(f"[eval {mode}] " + " ".join(
            f"{k}={v:.4f}" for k, v in summary.items()
        ))

        if self.workspace is not None:
            mpath = os.path.join(
                self.media_dirs["metrics"], f"{mode}_epoch{self.epoch}.json"
            )
            with open(mpath, "w") as f:
                json.dump({"summary": summary, "per_frame": per_frame}, f, indent=2)
            self._plot_metrics(mode, per_frame)
            if save_media and frames_out:
                write_video(
                    os.path.join(
                        self.media_dirs["eval_videos"],
                        f"{mode}_epoch{self.epoch}.mp4",
                    ),
                    frames_out, fps=25,
                )
                save_image(
                    os.path.join(
                        self.media_dirs["eval_images"],
                        f"{mode}_epoch{self.epoch}_frame0.png",
                    ),
                    frames_out[0],
                )
        return summary

    def _plot_metrics(self, mode: str, per_frame: list):
        """Per-frame metric curves (train/trainer.py:576-602 equivalent)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        keys = [k for k in per_frame[0] if k != "frame"] if per_frame else []
        if not keys:
            return
        fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3))
        if len(keys) == 1:
            axes = [axes]
        for ax, key in zip(axes, keys):
            ax.plot([row[key] for row in per_frame])
            ax.set_title(key)
            ax.set_xlabel("frame")
        fig.tight_layout()
        fig.savefig(os.path.join(
            self.media_dirs["metrics"], f"{mode}_epoch{self.epoch}.png"
        ))
        plt.close(fig)

    def optimize_tracking(self, optim_epoch: int = 50, batch: int = 8):
        """Fit test-set tracking rows (train/base.py:198-235): 50 gradient
        steps per frame on (expression, pose, camera translation).

        Rows are independent, so frames run in batches of ``batch`` through
        the vmapped tracking step — 50 x ceil(F/B) dispatches instead of
        50 x F, each with B frames of device work."""
        ds = self.test_dataset
        self.logger.log("==> optimizing test tracking...")
        if getattr(self, "_batched_tracking_step", None) is None:
            self._batched_tracking_step = self._build_tracking_step(
                batched=True)
        F = len(ds)
        for start in range(0, F, batch):
            idxs = list(range(start, min(start + batch, F)))
            mask = [True] * len(idxs)
            while len(idxs) < batch:      # pad; padded rows are masked out
                idxs.append(idxs[-1])
                mask.append(False)
            samples = [ds.sample(i) for i in idxs]
            consts = jax.device_put((
                jnp.asarray(np.stack([
                    np.asarray(s["cam_pose"], np.float32)[:3, :3].T
                    for s in samples])),
                jnp.asarray([s["fovx"] for s in samples], jnp.float32),
                jnp.asarray([s["fovy"] for s in samples], jnp.float32),
                jnp.asarray(np.stack([
                    np.asarray(s["ground_truth"]["rgb"], np.float32)
                    for s in samples])),
            ))
            idx_arr = jnp.asarray(idxs, jnp.int32)
            mask_arr = jnp.asarray(mask)
            shared = (self.ts.params, self.ts.state)
            for _ in range(optim_epoch):
                (self.test_tables,
                 self.test_track_state) = self._batched_tracking_step(
                    self.test_tables, self.test_track_state,
                    idx_arr, mask_arr, consts, shared,
                )

    # ------------------------------------------------------------------
    # media / checkpoints / perf
    # ------------------------------------------------------------------

    def save_snapshot(self, sample: dict):
        """Multi-panel snapshot (train/trainer.py:474-538): pred / gt /
        FLAME-mesh overlay / L1-heat / canonical / grad-heat /
        sampled-points (the mesh overlay replaces the nvdiffrast panel)."""
        from fateavatar_tpu.render.mesh_render import overlay_mesh

        tables = self.train_tables if self.tracking_enabled else None
        frame = self._make_frame(sample, tables)
        # families without diagnostic renders — and world-transform frames
        # (the multi-panel visualization path doesn't thread the
        # model-to-world pose) — get the simple pred/gt/heat snapshot
        if self._visualize is None or frame.world_transform is not None:
            if frame.world_transform is not None:
                out = self._forward(self.ts.params, self.ts.state,
                                    frame.expression, frame.flame_pose,
                                    frame.camera, frame.world_transform)
            else:
                out = self._forward(self.ts.params, self.ts.state,
                                    frame.expression, frame.flame_pose,
                                    frame.camera)
            pred = np.asarray(out["rgb_image"])
            gt = self._rgb_f32(frame.rgb)
            l1 = np.abs(pred - gt).mean(-1, keepdims=True)
            heat = np.concatenate([l1, np.zeros_like(l1), 1.0 - l1], axis=-1)
            save_image_grid(
                os.path.join(self.media_dirs["snapshots"],
                             f"step{self.global_step:08d}.png"),
                [pred, gt, heat], cols=3,
            )
            return
        vis = self._visualize(
            self.ts.params, self.ts.state,
            frame.expression, frame.flame_pose, frame.camera,
        )
        pred = np.asarray(vis["rgb_image"])
        gt = self._rgb_f32(frame.rgb)
        l1 = np.abs(pred - gt).mean(-1, keepdims=True)
        heat = np.concatenate([l1, np.zeros_like(l1), 1.0 - l1], axis=-1)
        mesh_panel = np.asarray(overlay_mesh(
            self._rgb_f32(frame.rgb), vis["verts"][0], self.model.faces,
            frame.camera,
        ))
        save_image_grid(
            os.path.join(
                self.media_dirs["snapshots"], f"step{self.global_step:08d}.png"
            ),
            [pred, gt, mesh_panel, heat, np.asarray(vis["cano_image"]),
             np.asarray(vis["grad_image"]), np.asarray(vis["point_image"])],
            cols=4,
        )

    def checkpoint_tree(self):
        tree = {
            "ts": self.ts,
            "epoch": self.epoch,
            "global_step": self.global_step,
        }
        if self.tracking_enabled:
            tree["train_tables"] = self.train_tables
            tree["train_track_state"] = self.train_track_state
            if self.test_dataset is not None:
                tree["test_tables"] = self.test_tables
                tree["test_track_state"] = self.test_track_state
        return tree

    def save_checkpoint(self):
        if self.ckpt is None:
            return
        self.ckpt.save(self.global_step, self.checkpoint_tree())
        self.logger.log(f"[ckpt] saved step {self.global_step}")

    def load_checkpoint(self, step: Optional[int] = None):
        restored = self.ckpt.restore(self.checkpoint_tree(), step)
        self.ts = restored["ts"]
        self.epoch = int(restored["epoch"])
        self.global_step = int(restored["global_step"])
        if self.tracking_enabled:
            self.train_tables = restored["train_tables"]
            self.train_track_state = restored["train_track_state"]
            if self.test_dataset is not None:
                self.test_tables = restored["test_tables"]
                self.test_track_state = restored["test_track_state"]
        self.logger.log(f"[ckpt] restored step {self.global_step}")

    def fps_performance_test(self, n: int = 100):
        """Forward-only render throughput (train/trainer.py:541-568)."""
        sample = self.train_dataset.sample(0)
        frame = self._make_frame(sample, None)
        fwd = jax.jit(
            lambda e, p: self._forward(
                self.ts.params, self.ts.state, e, p, frame.camera
            )["rgb_image"]
        )
        img = fwd(frame.expression, frame.flame_pose)
        img.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            img = fwd(frame.expression, frame.flame_pose)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        fps = n / dt
        self.logger.log(f"[fps] {fps:.1f} frames/s ({1000 * dt / n:.2f} ms/frame)")
        return fps
