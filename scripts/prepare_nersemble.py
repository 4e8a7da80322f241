"""Export NeRSemble benchmark data to the neutral layout this framework reads.

The reference consumes the proprietary ``nersemble_benchmark`` package
directly at train time (benchmark/nersemble/dataset.py:12-60). This
framework instead reads a plain files-on-disk layout (see
fateavatar_tpu/benchmark/nersemble.py); run THIS script once, on any
machine that has the package + data access, to produce it:

  python scripts/prepare_nersemble.py --root <benchmark_data_root> \
      --participant 393 --out ./nersemble_export \
      --train_sequences EXP-1 EXP-2 --test_sequences FREE

The export logic is a plain function over a duck-typed data manager
(``load_camera_calibration`` / ``load_flame_tracking`` / ``load_image`` /
``load_alpha_map``), so it is unit-testable without the package
(tests/test_nersemble.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _tolist(a):
    return np.asarray(a, np.float64).tolist()


def export_participant(
    manager,
    out_root: str,
    participant: str,
    sequences,
    train_serial: str,
    serials=None,
    export_images: bool = True,
    export_alpha: bool = True,
    log_fn=print,
) -> str:
    """Write ``<out_root>/<participant>/`` (calibration + per-sequence
    FLAME2023 tracking + train-serial images) from a benchmark data
    manager. Returns the participant directory."""
    from PIL import Image

    pdir = os.path.join(out_root, str(participant))
    os.makedirs(pdir, exist_ok=True)

    calib = manager.load_camera_calibration()
    serials = list(serials) if serials is not None else sorted(
        calib.intrinsics)
    calibration = {
        s: {"K": _tolist(calib.intrinsics[s]),
            "world2cam": _tolist(calib.world_2_cam[s])}
        for s in serials
    }
    with open(os.path.join(pdir, "calibration.json"), "w") as f:
        json.dump(calibration, f)

    for seq in sequences:
        tr = manager.load_flame_tracking(seq)
        T = int(np.asarray(tr.expression).shape[0])
        shape = np.asarray(tr.shape, np.float32).reshape(-1)
        scale = float(np.asarray(tr.scale).reshape(-1)[0])
        frames = []
        for t in range(T):
            frames.append({
                "name": f"{t:05d}",
                "expression": _tolist(tr.expression[t]),
                "jaw": _tolist(tr.jaw[t]),
                "neck": _tolist(tr.neck[t]),
                "eyes": _tolist(tr.eyes[t]),
                # model-to-world pose: euler-XYZ rotation + translation
                # (benchmark/nersemble/FLAME.py:262-275)
                "rotation": _tolist(tr.rotation[t]),
                "translation": _tolist(tr.translation[t]),
            })

        sdir = os.path.join(pdir, "sequences", seq)
        os.makedirs(sdir, exist_ok=True)

        native_w = native_h = None
        if not export_images:
            # test-sequence exports still MUST record the native image size
            # — the dataset rescales the calibration K by native/working
            # resolution, and a missing value breaks every submission
            # render's FOV. Probe one frame's shape without saving it.
            try:
                probe_img = np.asarray(manager.load_image(seq, train_serial, 0))
                native_h, native_w = probe_img.shape[:2]
            except Exception:
                log_fn(f"[prepare] WARNING: {seq}: could not probe the "
                       "native image size; set native_width/height in "
                       "flame_params.json manually")
        if export_images:
            img_dir = os.path.join(sdir, "images", train_serial)
            os.makedirs(img_dir, exist_ok=True)
            alpha_dir = os.path.join(sdir, "alpha", train_serial)
            if export_alpha:
                os.makedirs(alpha_dir, exist_ok=True)
            for t in range(T):
                img = np.asarray(manager.load_image(seq, train_serial, t))
                if img.dtype != np.uint8:
                    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                native_h, native_w = img.shape[:2]
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"{t:05d}.png"))
                if export_alpha:
                    try:
                        a = np.asarray(
                            manager.load_alpha_map(seq, train_serial, t))
                    except Exception:
                        export_alpha = False
                        continue
                    if a.ndim == 3:
                        a = a[..., 0]
                    if a.dtype != np.uint8:
                        a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
                    Image.fromarray(a).save(
                        os.path.join(alpha_dir, f"{t:05d}.png"))

        meta = {
            "frames": frames,
            "shape_params": _tolist(shape),
            "scale": scale,
            "n_shape": int(shape.shape[0]),
            "n_exp": int(np.asarray(tr.expression).shape[-1]),
        }
        if native_w is not None:
            meta["native_width"] = int(native_w)
            meta["native_height"] = int(native_h)
        with open(os.path.join(sdir, "flame_params.json"), "w") as f:
            json.dump(meta, f)
        log_fn(f"[prepare] {participant}/{seq}: {T} frames"
               + (f", images {native_w}x{native_h}" if native_w else ""))
    return pdir


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True,
                    help="nersemble_benchmark data root")
    ap.add_argument("--participant", required=True, type=int)
    ap.add_argument("--out", required=True)
    ap.add_argument("--train_sequences", nargs="*", default=None)
    ap.add_argument("--test_sequences", nargs="*", default=None)
    ap.add_argument("--train_serial", default=None)
    args = ap.parse_args()

    try:
        from nersemble_benchmark.constants import (
            BENCHMARK_MONO_FLAME_AVATAR_HOLD_OUT_SERIALS,
            BENCHMARK_MONO_FLAME_AVATAR_SEQUENCES_TEST,
            BENCHMARK_MONO_FLAME_AVATAR_SEQUENCES_TRAIN,
            BENCHMARK_MONO_FLAME_AVATAR_TRAIN_SERIAL,
        )
        from nersemble_benchmark.data.benchmark_data import (
            MonoFlameAvatarDataManager,
        )
    except ImportError as e:
        raise SystemExit(
            "the `nersemble_benchmark` package is required to PREPARE the "
            "export (training/rendering afterwards needs only the exported "
            f"files): {e}")

    manager = MonoFlameAvatarDataManager(args.root, args.participant)
    train_serial = args.train_serial or BENCHMARK_MONO_FLAME_AVATAR_TRAIN_SERIAL
    train_seqs = (args.train_sequences
                  or list(BENCHMARK_MONO_FLAME_AVATAR_SEQUENCES_TRAIN))
    test_seqs = (args.test_sequences
                 or list(BENCHMARK_MONO_FLAME_AVATAR_SEQUENCES_TEST))
    serials = [train_serial, *BENCHMARK_MONO_FLAME_AVATAR_HOLD_OUT_SERIALS]

    export_participant(manager, args.out, str(args.participant), train_seqs,
                       train_serial, serials=serials, export_images=True)
    export_participant(manager, args.out, str(args.participant), test_seqs,
                       train_serial, serials=serials, export_images=False)
    print(f"export complete: {os.path.join(args.out, str(args.participant))}")


if __name__ == "__main__":
    main()
