"""Console + append-only file logging (tools/util.py + train/base.py:237-246
equivalent, without the rich dependency)."""

from __future__ import annotations

import datetime
import os
import sys
from typing import Optional


class Logger:
    def __init__(self, name: str, workspace: Optional[str] = None,
                 quiet: bool = False):
        self.name = name
        self.quiet = quiet
        self.ptr = None
        if workspace is not None:
            os.makedirs(workspace, exist_ok=True)
            self.ptr = open(os.path.join(workspace, f"log_{name}.txt"), "a+")

    def log(self, *args):
        msg = " ".join(str(a) for a in args)
        if not self.quiet:
            print(msg, file=sys.stderr)
        self.file_only(msg)

    def file_only(self, *args):
        if self.ptr:
            stamp = datetime.datetime.now().strftime("%H:%M:%S")
            print(f"[{stamp}]", *args, file=self.ptr)
            self.ptr.flush()

    def close(self):
        if self.ptr:
            self.ptr.close()


def save_image(path: str, img) -> None:
    """[H, W, 3] float [0,1] -> PNG."""
    import numpy as np
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype("uint8")
    Image.fromarray(arr).save(path)


def save_image_grid(path: str, images, cols: Optional[int] = None) -> None:
    """List of [H, W, 3] floats -> one grid PNG (tools/util.py:171 equivalent)."""
    import numpy as np
    from PIL import Image

    imgs = [np.clip(np.asarray(i), 0, 1) for i in images]
    n = len(imgs)
    cols = cols or n
    rows = (n + cols - 1) // cols
    h, w = imgs[0].shape[:2]
    grid = np.ones((rows * h, cols * w, 3), np.float32)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    save_image(path, grid)


def write_video(path: str, frames, fps: int = 25, crf: int = None,
                preset: str = None) -> bool:
    """Write an mp4 via the ffmpeg binary if present; else fall back to an
    animated GIF (the reference uses cv2.VideoWriter, train/trainer.py:302).

    ``crf``/``preset`` select x264 quality — the NeRSemble submission
    encoding is crf=14 preset=slow (run_nersemble_benchmark.py:127-137)."""
    import shutil
    import subprocess
    import numpy as np

    def _u8(f):
        f = np.asarray(f)
        if f.dtype == np.uint8:
            return f
        return (np.clip(f, 0, 1) * 255).astype("uint8")

    frames = [_u8(f) for f in frames]
    if shutil.which("ffmpeg") and path.endswith(".mp4"):
        h, w = frames[0].shape[:2]
        quality = []
        if crf is not None:
            quality += ["-crf", str(crf)]
        if preset is not None:
            quality += ["-preset", preset]
        proc = subprocess.Popen(
            ["ffmpeg", "-y", "-loglevel", "error", "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "-r", str(fps),
             "-i", "-", "-c:v", "libx264", "-pix_fmt", "yuv420p",
             *quality, path],
            stdin=subprocess.PIPE,
        )
        for f in frames:
            proc.stdin.write(f.tobytes())
        proc.stdin.close()
        proc.wait()
        return proc.returncode == 0
    # GIF fallback
    from PIL import Image

    gif_path = path.rsplit(".", 1)[0] + ".gif"
    ims = [Image.fromarray(f) for f in frames]
    ims[0].save(gif_path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)
    return True
