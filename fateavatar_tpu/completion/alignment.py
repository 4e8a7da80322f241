"""FFHQ-style face alignment for the completion pipeline (stage ③/⑦).

Native re-implementation of the reference's affine machinery:

* :func:`get_crop_bound` — FFHQ quad estimation from 68 landmarks
  (tools/crop_utils/affine_util.py:30-70).
* :func:`crop_final` — expanded, border-reflected, edge-blurred crop
  (affine_util.py:83-138).
* :func:`eg3dcamparams` — 25-d EG3D camera label from a world2cam rotation
  (affine_util.py:5-28).
* :func:`matrix2angle` — yaw/pitch/roll extraction (affine_util.py:169-192).
* :func:`refine_quad` — head-center recentering of the quad
  (train/completion.py:428-433); the reference estimates the center with
  3DDFA_V2, here the EXACT projected head center is used (the camera and
  driving mesh are known on our own renders).
* :func:`pose_reject` — the reference's scale/pose/translation rejection
  filters (train/completion.py:415-425).
* :func:`paste_back_images` — stage ⑦ inverse affine paste-back into the
  original framing (train/completion.py:709-816).

All functions are host-side numpy/cv2 (the pipeline stages are offline image
ops, exactly as in the reference).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

# stage-⑦ "magic numbers" (train/completion.py:746-750) — also the
# defaults of crop_final (affine_util.py:87-90)
TOP_EXPAND = 0.1
LEFT_EXPAND = 0.05
BOTTOM_EXPAND = 0.0
RIGHT_EXPAND = 0.05


def eg3dcamparams(R_in: np.ndarray) -> np.ndarray:
    """25-d EG3D camera label: flattened cam2world (16) + intrinsics (9).

    ``R_in`` is a 4x4 world2cam rotation; the label adds the canonical
    camera distance 2.7 and normalized focal 4.2647 (affine_util.py:5-28).
    """
    camera_dist = 2.7
    intrinsics = np.array([[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]],
                          np.float32)
    R = np.asarray(R_in, np.float32).reshape(4, 4)
    t = np.eye(4, dtype=np.float32)
    t[2, 3] = -camera_dist
    convert = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    P = convert @ t @ R
    cam2world = np.linalg.inv(P)
    return np.concatenate([cam2world.reshape(16), intrinsics.reshape(9)])


def get_crop_bound(
    lm: np.ndarray, method: str = "ffhq"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """FFHQ crop quad from 68 (or 106) landmarks (affine_util.py:30-70).

    Returns (quad [4,2], center, x half-axis, y half-axis), quad rows in
    the order [c-x-y, c-x+y, c+x+y, c+x-y].
    """
    lm = np.asarray(lm, np.float64)
    if len(lm) == 106:
        left_e, right_e = lm[104], lm[105]
        nose = lm[49]
        left_m, right_m = lm[84], lm[90]
        center = (lm[1] + lm[31]) * 0.5
    elif len(lm) == 68:
        left_e = np.mean(lm[36:42], axis=0)
        right_e = np.mean(lm[42:48], axis=0)
        nose = lm[33]
        left_m, right_m = lm[48], lm[54]
        center = (lm[0] + lm[16]) * 0.5
    else:
        raise ValueError(f"unknown keypoint count {len(lm)}")

    if method == "ffhq":
        eye_to_eye = right_e - left_e
        eye_avg = (left_e + right_e) * 0.5
        mouth_avg = (left_m + right_m) * 0.5
        eye_to_mouth = mouth_avg - eye_avg
        x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
        x /= np.hypot(*x)
        x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
        y = np.flipud(x) * [-1, 1]
        c = eye_avg + eye_to_mouth * 0.1
    elif method == "default":
        eye_to_eye = right_e - left_e
        eye_avg = (left_e + right_e) * 0.5
        eye_to_nose = nose - eye_avg
        x = eye_to_eye.copy()
        x /= np.hypot(*x)
        x *= max(np.hypot(*eye_to_eye) * 2.4, np.hypot(*eye_to_nose) * 2.75)
        y = np.flipud(x) * [-1, 1]
        c = center
    else:
        raise ValueError(f"unsupported crop method {method!r}")
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    return quad.astype(np.float32), c, x, y


def quad_from_axes(c: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return np.stack([c - x - y, c - x + y, c + x + y, c + x - y]).astype(
        np.float32)


def matrix2angle(R: np.ndarray) -> Tuple[float, float, float]:
    """(yaw, pitch, roll) in radians from a 3x3 rotation
    (affine_util.py:169-192)."""
    R = np.asarray(R, np.float64)
    if R[2, 0] > 0.998:
        z = 0.0
        x = math.pi / 2
        y = z + math.atan2(-R[0, 1], -R[0, 2])
    elif R[2, 0] < -0.998:
        z = 0.0
        x = -math.pi / 2
        y = -z + math.atan2(R[0, 1], R[0, 2])
    else:
        x = math.asin(R[2, 0])
        y = math.atan2(R[2, 1] / math.cos(x), R[2, 2] / math.cos(x))
        z = math.atan2(R[1, 0] / math.cos(x), R[0, 0] / math.cos(x))
    return x, y, z


@dataclass
class PoseFilter:
    """Rejection thresholds of train/completion.py:415-425 (degrees /
    normalized units)."""

    max_yaw: float = 90.0
    max_pitch: float = 80.0
    max_roll: float = 50.0
    min_scale: float = 0.7
    max_scale: float = 1.3
    max_t: float = 1.0


def pose_reject(R: np.ndarray, t3d: np.ndarray = None, s: float = 1.0,
                filt: PoseFilter = PoseFilter()) -> Optional[str]:
    """Return a rejection reason (or None if the view passes) — the scale /
    pose / translation filters of train/completion.py:415-425."""
    if not (filt.min_scale <= s <= filt.max_scale):
        return f"scale {s:.2f}"
    yaw, pitch, roll = (a * 180.0 / math.pi for a in matrix2angle(R))
    if abs(yaw) > filt.max_yaw or abs(pitch) > filt.max_pitch \
            or abs(roll) > filt.max_roll:
        return f"pose ({yaw:.0f},{pitch:.0f},{roll:.0f})"
    if t3d is not None and (abs(t3d[0]) > filt.max_t or abs(t3d[1]) > filt.max_t):
        return f"t3d {t3d[:2]}"
    return None


def refine_quad(c: np.ndarray, x: np.ndarray, y: np.ndarray,
                center_px: np.ndarray, img_size: int = 512,
                s: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Recenter/rescale the quad on the estimated head center
    (train/completion.py:428-433).

    ``center_px`` is the head center in the coordinates of the initial
    512-crop defined by the quad (the reference gets it from 3DDFA's t3d,
    normalized to [-1, 1] with the image-space y flip at :404-406).
    Returns (quad, t3d[2]) — t3d also feeds :func:`pose_reject`.
    """
    half = 0.5 * (img_size - 1)
    t0 = (center_px[0] - half) / half
    t1 = -((center_px[1] - half) / half)
    c = c + x * t0
    c = c - y * t1
    x = x * s
    y = y * s
    return quad_from_axes(c, x, y), np.array([t0, t1])


def crop_final(
    img: np.ndarray,
    size: int = 512,
    quad: np.ndarray = None,
    top_expand: float = TOP_EXPAND,
    left_expand: float = LEFT_EXPAND,
    bottom_expand: float = BOTTOM_EXPAND,
    right_expand: float = RIGHT_EXPAND,
    blur_kernel: Optional[int] = None,
    upsample: int = 2,
    min_size: Optional[int] = 256,
) -> Optional[np.ndarray]:
    """Expanded FFHQ crop with reflected borders and blurred out-of-source
    edges (affine_util.py:83-138). ``img`` float [0,1] HWC; returns float
    [0,1] of shape [crop_h, crop_w, 3] or None if the face is too small."""
    import cv2

    quad = np.asarray(quad, np.float32)
    orig_size = min(np.linalg.norm(quad[1] - quad[0]),
                    np.linalg.norm(quad[2] - quad[1]))
    if min_size is not None and orig_size < min_size:
        return None

    crop_w = int(size * (1 + left_expand + right_expand))
    crop_h = int(size * (1 + top_expand + bottom_expand))
    crop_size = (crop_w, crop_h)
    top = int(size * top_expand)
    left = int(size * left_expand)
    size_m1 = size - 1
    bound = np.array(
        [[left, top], [left, top + size_m1], [left + size_m1, top + size_m1],
         [left + size_m1, top]], np.float32)
    mat = cv2.getAffineTransform(quad[:3], bound[:3])

    img_u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if upsample is None or upsample == 1:
        crop_img = cv2.warpAffine(img_u8, mat, crop_size,
                                  flags=cv2.INTER_LANCZOS4,
                                  borderMode=cv2.BORDER_REFLECT)
    else:
        large = (crop_w * upsample, crop_h * upsample)
        crop_img = cv2.warpAffine(img_u8, upsample * mat, large,
                                  flags=cv2.INTER_LANCZOS4,
                                  borderMode=cv2.BORDER_REFLECT)
        crop_img = cv2.resize(crop_img, crop_size,
                              interpolation=cv2.INTER_AREA)

    # blur the regions that fell outside the source image
    empty = np.full_like(img_u8, 255)
    crop_mask = cv2.warpAffine(empty, mat, crop_size)
    mask_kernel = int(size * 0.02) * 2 + 1
    blur_kernel = int(size * 0.03) * 2 + 1 if blur_kernel is None else blur_kernel
    if crop_mask.mean() < 255:
        blur_mask = cv2.blur(
            crop_mask.astype(np.float32).mean(2), (mask_kernel, mask_kernel)
        )[..., None] / 255.0
        blurred_img = cv2.blur(crop_img, (blur_kernel, blur_kernel), 0)
        crop_img = (crop_img * blur_mask
                    + blurred_img * (1 - blur_mask)).astype(np.uint8)
    return crop_img.astype(np.float32) / 255.0


def paste_back_matrix(quad: np.ndarray, size: int = 512,
                      rescale_ratio: float = 1.0) -> np.ndarray:
    """The 2x3 affine mapping original-frame pixels -> crop pixels used by
    stage ⑦ (train/completion.py:744-778). ``rescale_ratio`` shrinks the
    bound towards the crop centre for rescaled NeRF scenes
    (completion.py:766-772: 2.7 / (2.7 + rescale_factor))."""
    import cv2

    crop_w = int(size * (1 + LEFT_EXPAND + RIGHT_EXPAND))
    crop_h = int(size * (1 + TOP_EXPAND + BOTTOM_EXPAND))
    del crop_w, crop_h  # bound is expressed in crop coords below
    top = int(size * TOP_EXPAND)
    left = int(size * LEFT_EXPAND)
    bound = np.array(
        [[left, top], [left, top + size - 1],
         [left + size - 1, top + size - 1], [left + size - 1, top]],
        np.float32)
    bound = (bound - 256.0) * rescale_ratio + 256.0
    M, _ = cv2.estimateAffine2D(np.asarray(quad, np.float32), bound)
    return M


def paste_back_images(
    pseudo: np.ndarray,
    quad: np.ndarray,
    out_size: int = 512,
    rescale_ratio: float = 1.0,
    bg_color: float = 1.0,
    masks: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stage ⑦: warp provider outputs back into the original framing
    (train/completion.py:709-816).

    ``pseudo`` [V, h, w, 3] float [0,1] (any size — resized to the crop
    frame first, as the reference resizes PTI renders to crop_size at
    :795). Returns (pasted [V, out_size, out_size, 3], valid_mask
    [V, out_size, out_size]). Background fills with ``bg_color`` (the
    reference pastes onto white, :784)."""
    import cv2

    size = out_size
    crop_w = int(size * (1 + LEFT_EXPAND + RIGHT_EXPAND))
    crop_h = int(size * (1 + TOP_EXPAND + BOTTOM_EXPAND))
    M = paste_back_matrix(quad, size, rescale_ratio)
    # cv2.warpAffine maps INPUT->OUTPUT with M; stage ⑦'s PIL transform
    # uses M as OUTPUT->INPUT, so invert for the same semantics
    Minv = cv2.invertAffineTransform(M)

    out_imgs, out_masks = [], []
    for i, img in enumerate(pseudo):
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        u8 = cv2.resize(u8, (crop_w, crop_h), interpolation=cv2.INTER_CUBIC)
        warped = cv2.warpAffine(u8, Minv, (size, size),
                                flags=cv2.INTER_CUBIC)
        valid = cv2.warpAffine(np.ones((crop_h, crop_w), np.float32), Minv,
                               (size, size))
        if masks is not None:
            m8 = cv2.resize(
                np.asarray(masks[i], np.float32), (crop_w, crop_h))
            valid = valid * cv2.warpAffine(m8, Minv, (size, size))
        valid = np.clip(valid, 0.0, 1.0)
        img_f = warped.astype(np.float32) / 255.0
        pasted = img_f * valid[..., None] + bg_color * (1 - valid[..., None])
        out_imgs.append(pasted)
        out_masks.append(valid)
    return np.stack(out_imgs), np.stack(out_masks)
