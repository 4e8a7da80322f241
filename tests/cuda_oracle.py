"""Independent line-by-line NumPy transcription of the CUDA rasterizer.

Second, independently-derived numerical oracle for the golden suite
(VERDICT r2 item #1). Transcribed DIRECTLY from the reference CUDA source

  /root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
    forward.cu        (preprocessCUDA :156-256, renderCUDA :261-374,
                       computeCov3D :118-152, computeCov2D :74-113,
                       computeColorFromSH :20-71)
    backward.cu       (renderCUDA :399-557, computeCov2DCUDA :144-274,
                       computeCov3D :278-341, preprocessCUDA :346-396,
                       computeColorFromSH :20-139)
    auxiliary.h       (ndc2Pix :41, getRect :46, transformPoint4x3/4x4
                       :58-77, transformVec4x3Transpose :89, dnormvdv :107,
                       in_frustum :139-164)
    rasterizer_impl.cu (duplicateWithKeys :70-111, identifyTileRanges
                       :116-139 — stable 64-bit radix sort over
                       (tileID << 32 | float_bits(depth)))

preserving the CUDA code's variable names, operation ORDER, and glm's
column-major ``m[col][row]`` indexing (via the ``Mat3`` wrapper below), so
a reader can diff this file against the .cu files statement by statement.
It was written WITHOUT consulting this repository's JAX implementations
(render/preprocess.py, render/blend_reference.py, render/blend_*.py):
those encode one reading of the CUDA source; this file encodes a second,
and tests/test_cuda_oracle.py reconciles the two (plus both Pallas kernel
paths) to float32 tolerance on every golden scene and on fresh randomized
scenes. All arithmetic is float32 (NumPy 2 / NEP 50 keeps np.float32
scalars float32 under Python-float operands), except:

* per-Gaussian gradient ACCUMULATORS are float64 (the CUDA code uses
  nondeterministically-ordered float32 atomicAdd; any fixed f32 order is
  equally arbitrary, so we accumulate exactly and round once at the end);
* ``ndc2Pix`` computes in float64 and rounds once, mirroring the CUDA
  expression ``((v + 1.0) * S - 1.0) * 0.5`` whose literals are doubles.

Deliberate fork semantics preserved (FateAvatar's vendored rasterizer
differs from stock INRIA 3DGS): ``computeCov3D`` does NOT normalize the
quaternion (forward.cu:127 has the division commented out) and the rot
backward returns dL_dq w.r.t. the AS-PASSED quaternion (backward.cu:340).

One extension beyond the CUDA binding: ``rasterize_backward`` accepts an
optional ``dL_dTfinal`` cotangent because this repo's ``render()`` exposes
``t_final`` as a differentiable output. Its chain rule is identical to the
background term the CUDA code already carries (backward.cu:531-534):
dT_final/dalpha_i = -T_final / (1 - alpha_i) for every blended i, so it
simply joins ``bg_dot_dpixel`` inside the existing expression.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32

# config.h:15-17
BLOCK_X = 16
BLOCK_Y = 16

# auxiliary.h:22-39
SH_C0 = f32(0.28209479177387814)
SH_C1 = f32(0.4886025119029199)
SH_C2 = np.asarray([
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
], f32)
SH_C3 = np.asarray([
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
], f32)


class Mat3:
    """glm::mat3 — column-major storage so ``m[col][row]`` reads like glm.

    ``Mat3(a0..a8)`` fills columns (a0,a1,a2), (a3,a4,a5), (a6,a7,a8)
    exactly like the glm::mat3 constructor; ``A * B`` is the ordinary
    mathematical product (what glm's operator* computes)."""

    __slots__ = ("cols",)

    def __init__(self, *vals):
        if len(vals) == 9:
            v = [f32(x) for x in vals]
            self.cols = [
                np.asarray(v[0:3], f32),
                np.asarray(v[3:6], f32),
                np.asarray(v[6:9], f32),
            ]
        elif len(vals) == 1 and isinstance(vals[0], (int, float)):
            d = f32(vals[0])  # glm::mat3(1.0f) = identity * d
            self.cols = [
                np.asarray([d, 0, 0], f32),
                np.asarray([0, d, 0], f32),
                np.asarray([0, 0, d], f32),
            ]
        else:
            (cols,) = vals
            self.cols = [np.asarray(c, f32) for c in cols]

    def __getitem__(self, c):
        return self.cols[c]

    def __setitem__(self, c, v):
        self.cols[c] = np.asarray(v, f32)

    def math(self):
        """[row, col] view (the matrix as a linear map)."""
        return np.stack(self.cols, axis=1)

    def __mul__(self, other):
        if isinstance(other, Mat3):
            C = (self.math() @ other.math()).astype(f32)
            return Mat3([C[:, 0], C[:, 1], C[:, 2]])
        return NotImplemented

    def __rmul__(self, s):  # 2.0f * M
        return Mat3([f32(s) * c for c in self.cols])

    def transpose(self):
        M = self.math().T
        return Mat3([M[:, 0], M[:, 1], M[:, 2]])


def _dot3(a, b):
    a = np.asarray(a, f32)
    b = np.asarray(b, f32)
    return f32(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


# ---------------------------------------------------------------------------
# auxiliary.h
# ---------------------------------------------------------------------------

def ndc2Pix(v, S):
    # auxiliary.h:41-44 — double literals, one rounding at the float return
    return f32(((np.float64(v) + 1.0) * S - 1.0) * 0.5)


def getRect(px, py, max_radius, grid_x, grid_y):
    # auxiliary.h:46-56 — float division, C truncation-toward-zero int cast
    rect_min = (
        min(grid_x, max(0, int(f32(f32(px) - f32(max_radius)) / f32(BLOCK_X)))),
        min(grid_y, max(0, int(f32(f32(py) - f32(max_radius)) / f32(BLOCK_Y)))),
    )
    rect_max = (
        min(grid_x, max(0, int(f32(f32(px) + f32(max_radius) + f32(BLOCK_X - 1)) / f32(BLOCK_X)))),
        min(grid_y, max(0, int(f32(f32(py) + f32(max_radius) + f32(BLOCK_Y - 1)) / f32(BLOCK_Y)))),
    )
    return rect_min, rect_max


def transformPoint4x3(p, m):
    # auxiliary.h:58-66 (m = flattened transposed matrix, 16 floats)
    x, y, z = f32(p[0]), f32(p[1]), f32(p[2])
    return np.asarray([
        m[0] * x + m[4] * y + m[8] * z + m[12],
        m[1] * x + m[5] * y + m[9] * z + m[13],
        m[2] * x + m[6] * y + m[10] * z + m[14],
    ], f32)


def transformPoint4x4(p, m):
    # auxiliary.h:68-77
    x, y, z = f32(p[0]), f32(p[1]), f32(p[2])
    return np.asarray([
        m[0] * x + m[4] * y + m[8] * z + m[12],
        m[1] * x + m[5] * y + m[9] * z + m[13],
        m[2] * x + m[6] * y + m[10] * z + m[14],
        m[3] * x + m[7] * y + m[11] * z + m[15],
    ], f32)


def transformVec4x3Transpose(p, m):
    # auxiliary.h:89-97
    x, y, z = f32(p[0]), f32(p[1]), f32(p[2])
    return np.asarray([
        m[0] * x + m[1] * y + m[2] * z,
        m[4] * x + m[5] * y + m[6] * z,
        m[8] * x + m[9] * y + m[10] * z,
    ], f32)


def dnormvdv3(v, dv):
    # auxiliary.h:107-117
    sum2 = f32(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    invsum32 = f32(1.0) / f32(np.sqrt(sum2 * sum2 * sum2))
    return np.asarray([
        ((sum2 - v[0] * v[0]) * dv[0] - v[1] * v[0] * dv[1] - v[2] * v[0] * dv[2]) * invsum32,
        (-v[0] * v[1] * dv[0] + (sum2 - v[1] * v[1]) * dv[1] - v[2] * v[1] * dv[2]) * invsum32,
        (-v[0] * v[2] * dv[0] - v[1] * v[2] * dv[1] + (sum2 - v[2] * v[2]) * dv[2]) * invsum32,
    ], f32)


def in_frustum(p_orig, viewmatrix):
    # auxiliary.h:139-164 — only the p_view.z <= 0.2f test is live (the
    # NDC bounds check is commented out in the source)
    p_view = transformPoint4x3(p_orig, viewmatrix)
    return p_view[2] > f32(0.2), p_view


# ---------------------------------------------------------------------------
# forward.cu
# ---------------------------------------------------------------------------

def computeColorFromSH_fwd(idx, deg, means, campos, shs):
    # forward.cu:20-71
    pos = np.asarray(means[idx], f32)
    dir_ = pos - np.asarray(campos, f32)
    dir_ = dir_ / f32(np.sqrt(_dot3(dir_, dir_)))

    sh = np.asarray(shs[idx], f32)           # [M, 3] vec3 rows
    result = SH_C0 * sh[0]

    if deg > 0:
        x, y, z = dir_[0], dir_[1], dir_[2]
        result = result - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]

        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh[4]
                      + SH_C2[1] * yz * sh[5]
                      + SH_C2[2] * (f32(2.0) * zz - xx - yy) * sh[6]
                      + SH_C2[3] * xz * sh[7]
                      + SH_C2[4] * (xx - yy) * sh[8])

            if deg > 2:
                result = (result
                          + SH_C3[0] * y * (f32(3.0) * xx - yy) * sh[9]
                          + SH_C3[1] * xy * z * sh[10]
                          + SH_C3[2] * y * (f32(4.0) * zz - xx - yy) * sh[11]
                          + SH_C3[3] * z * (f32(2.0) * zz - f32(3.0) * xx - f32(3.0) * yy) * sh[12]
                          + SH_C3[4] * x * (f32(4.0) * zz - xx - yy) * sh[13]
                          + SH_C3[5] * z * (xx - yy) * sh[14]
                          + SH_C3[6] * x * (xx - f32(3.0) * yy) * sh[15])
    result = result + f32(0.5)

    clamped = result < f32(0.0)              # forward.cu:67-69
    return np.maximum(result, f32(0.0)), clamped


def computeCov2D(mean, focal_x, focal_y, tan_fovx, tan_fovy, cov3D, viewmatrix):
    # forward.cu:74-113
    t = transformPoint4x3(mean, viewmatrix)

    limx = f32(1.3) * f32(tan_fovx)
    limy = f32(1.3) * f32(tan_fovy)
    txtz = t[0] / t[2]
    tytz = t[1] / t[2]
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]

    J = Mat3(
        focal_x / t[2], 0.0, -(focal_x * t[0]) / (t[2] * t[2]),
        0.0, focal_y / t[2], -(focal_y * t[1]) / (t[2] * t[2]),
        0, 0, 0)

    W = Mat3(
        viewmatrix[0], viewmatrix[4], viewmatrix[8],
        viewmatrix[1], viewmatrix[5], viewmatrix[9],
        viewmatrix[2], viewmatrix[6], viewmatrix[10])

    T = W * J

    Vrk = Mat3(
        cov3D[0], cov3D[1], cov3D[2],
        cov3D[1], cov3D[3], cov3D[4],
        cov3D[2], cov3D[4], cov3D[5])

    cov = T.transpose() * Vrk.transpose() * T

    cov[0][0] = cov[0][0] + f32(0.3)         # forward.cu:110-111
    cov[1][1] = cov[1][1] + f32(0.3)
    return np.asarray([cov[0][0], cov[0][1], cov[1][1]], f32)


def computeCov3D_fwd(scale, mod, rot):
    # forward.cu:118-152
    S = Mat3(1.0)
    S[0] = [f32(mod) * f32(scale[0]), 0, 0]
    S[1] = [0, f32(mod) * f32(scale[1]), 0]
    S[2] = [0, 0, f32(mod) * f32(scale[2])]

    q = np.asarray(rot, f32)                 # NOT normalized (fork semantics)
    r, x, y, z = q[0], q[1], q[2], q[3]

    R = Mat3(
        1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
        2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
        2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y))

    M = S * R
    Sigma = M.transpose() * M

    return np.asarray([
        Sigma[0][0], Sigma[0][1], Sigma[0][2],
        Sigma[1][1], Sigma[1][2], Sigma[2][2],
    ], f32)


def preprocess_forward(P, D, means3D, scales, scale_modifier, rotations,
                       opacities, shs, viewmatrix, projmatrix, cam_pos,
                       W, H, tan_fovx, tan_fovy, focal_x, focal_y,
                       grid_x, grid_y):
    """forward.cu:156-256 (preprocessCUDA), one Python iteration per thread."""
    radii = np.zeros(P, np.int32)
    tiles_touched = np.zeros(P, np.int64)
    depths = np.zeros(P, f32)
    points_xy_image = np.zeros((P, 2), f32)
    cov3Ds = np.zeros((P, 6), f32)
    rgb = np.zeros((P, 3), f32)
    conic_opacity = np.zeros((P, 4), f32)
    clamped = np.zeros((P, 3), bool)

    for idx in range(P):
        ok, p_view = in_frustum(means3D[idx], viewmatrix)
        if not ok:
            continue

        p_orig = np.asarray(means3D[idx], f32)
        p_hom = transformPoint4x4(p_orig, projmatrix)
        p_w = f32(1.0) / (p_hom[3] + f32(0.0000001))
        p_proj = np.asarray([p_hom[0] * p_w, p_hom[1] * p_w, p_hom[2] * p_w], f32)

        cov3D = computeCov3D_fwd(scales[idx], scale_modifier, rotations[idx])
        cov3Ds[idx] = cov3D

        cov = computeCov2D(p_orig, focal_x, focal_y, tan_fovx, tan_fovy,
                           cov3D, viewmatrix)

        det = cov[0] * cov[2] - cov[1] * cov[1]
        if det == f32(0.0):
            continue
        det_inv = f32(1.0) / det
        conic = np.asarray([cov[2] * det_inv, -cov[1] * det_inv,
                            cov[0] * det_inv], f32)

        mid = f32(0.5) * (cov[0] + cov[2])
        lambda1 = mid + f32(np.sqrt(max(f32(0.1), mid * mid - det)))
        lambda2 = mid - f32(np.sqrt(max(f32(0.1), mid * mid - det)))
        my_radius = f32(np.ceil(f32(3.0) * f32(np.sqrt(max(lambda1, lambda2)))))
        point_image = (ndc2Pix(p_proj[0], W), ndc2Pix(p_proj[1], H))
        rect_min, rect_max = getRect(point_image[0], point_image[1],
                                     int(my_radius), grid_x, grid_y)
        if (rect_max[0] - rect_min[0]) * (rect_max[1] - rect_min[1]) == 0:
            continue

        if shs is not None:
            result, cl = computeColorFromSH_fwd(idx, D, means3D, cam_pos, shs)
            rgb[idx] = result
            clamped[idx] = cl

        depths[idx] = p_view[2]
        radii[idx] = int(my_radius)
        points_xy_image[idx] = point_image
        conic_opacity[idx] = [conic[0], conic[1], conic[2], f32(opacities[idx])]
        tiles_touched[idx] = ((rect_max[1] - rect_min[1])
                              * (rect_max[0] - rect_min[0]))

    return dict(radii=radii, tiles_touched=tiles_touched, depths=depths,
                points_xy_image=points_xy_image, cov3Ds=cov3Ds, rgb=rgb,
                conic_opacity=conic_opacity, clamped=clamped)


def duplicate_and_sort(P, geom, grid_x, grid_y):
    """rasterizer_impl.cu:70-139 — duplicateWithKeys + stable radix sort +
    identifyTileRanges. Depths are positive here (z > 0.2 after culling),
    so uint32 ordering of their float bits equals float ordering; CUB's
    radix sort is stable, so instances with bit-equal (tile, depth) keys
    stay in emission order (ascending gaussian index)."""
    keys = []
    values = []
    for idx in range(P):
        if geom["radii"][idx] > 0:
            rect_min, rect_max = getRect(
                geom["points_xy_image"][idx][0],
                geom["points_xy_image"][idx][1],
                int(geom["radii"][idx]), grid_x, grid_y)
            # float32 bit pattern of the depth (astype is a no-op copy in
            # the default f32 mode; it keeps the instance ordering identical
            # when the module is reloaded at float64 for diagnostics)
            depth_bits = np.uint64(
                geom["depths"][idx:idx + 1].astype(np.float32).view(np.uint32)[0])
            for y in range(rect_min[1], rect_max[1]):
                for x in range(rect_min[0], rect_max[0]):
                    key = (np.uint64(y * grid_x + x) << np.uint64(32)) | depth_bits
                    keys.append(key)
                    values.append(idx)
    keys = np.asarray(keys, np.uint64)
    values = np.asarray(values, np.int64)
    order = np.argsort(keys, kind="stable")
    point_list_keys = keys[order]
    point_list = values[order]

    num_tiles = grid_x * grid_y
    ranges = np.zeros((num_tiles, 2), np.int64)
    L = len(point_list_keys)
    for i in range(L):
        currtile = int(point_list_keys[i] >> np.uint64(32))
        if i == 0:
            ranges[currtile][0] = 0
        else:
            prevtile = int(point_list_keys[i - 1] >> np.uint64(32))
            if currtile != prevtile:
                ranges[prevtile][1] = i
                ranges[currtile][0] = i
        if i == L - 1:
            ranges[currtile][1] = L
    return point_list, ranges


def render_forward_blend(point_list, ranges, W, H, geom, bg_color, features,
                         grid_x, grid_y):
    """forward.cu:261-374 (renderCUDA), vectorized across a tile's pixels.

    The per-pixel state machine (T, done, contributor, last_contributor)
    is kept per pixel exactly; vectorization only batches the identical
    per-entry float32 arithmetic across the tile's pixels (each pixel in
    the CUDA kernel is an independent thread, so this changes nothing)."""
    out_color = np.zeros((H, W, 3), f32)
    final_T = np.ones((H, W), f32)
    n_contrib = np.zeros((H, W), np.int64)
    bg = np.asarray(bg_color, f32)
    points_xy = geom["points_xy_image"]
    con_o = geom["conic_opacity"]

    for ty in range(grid_y):
        for tx in range(grid_x):
            r0, r1 = ranges[ty * grid_x + tx]
            pix_min = (tx * BLOCK_X, ty * BLOCK_Y)
            pix_max = (min(pix_min[0] + BLOCK_X, W), min(pix_min[1] + BLOCK_Y, H))
            xs = np.arange(pix_min[0], pix_max[0])
            ys = np.arange(pix_min[1], pix_max[1])
            pxf = np.repeat(xs[None, :], len(ys), 0).astype(f32).ravel()
            pyf = np.repeat(ys[:, None], len(xs), 1).astype(f32).ravel()
            npx = pxf.size

            T = np.ones(npx, f32)
            done = np.zeros(npx, bool)
            last_contributor = np.zeros(npx, np.int64)
            C = np.zeros((npx, 3), f32)

            for j in range(r0, r1):
                gid = int(point_list[j])
                xy = points_xy[gid]
                dx = f32(xy[0]) - pxf
                dy = f32(xy[1]) - pyf
                co = con_o[gid]
                power = (f32(-0.5) * (co[0] * dx * dx + co[2] * dy * dy)
                         - co[1] * dx * dy)
                skip = power > f32(0.0)

                alpha = np.minimum(f32(0.99), co[3] * np.exp(power))
                skip |= alpha < f32(1.0) / f32(255.0)
                test_T = T * (f32(1.0) - alpha)
                terminate = (~done) & (~skip) & (test_T < f32(0.0001))
                accept = (~done) & (~skip) & (test_T >= f32(0.0001))

                feat = np.asarray(features[gid], f32)
                w = alpha * T
                C = np.where(accept[:, None], C + feat[None, :] * w[:, None], C)
                T = np.where(accept, test_T, T)
                last_contributor = np.where(accept, j - r0 + 1,
                                            last_contributor)
                done |= terminate
                if done.all():
                    break

            img = C + T[:, None] * bg[None, :]
            final_T[pix_min[1]:pix_max[1], pix_min[0]:pix_max[0]] = \
                T.reshape(len(ys), len(xs))
            n_contrib[pix_min[1]:pix_max[1], pix_min[0]:pix_max[0]] = \
                last_contributor.reshape(len(ys), len(xs))
            out_color[pix_min[1]:pix_max[1], pix_min[0]:pix_max[0]] = \
                img.reshape(len(ys), len(xs), 3)

    return out_color, final_T, n_contrib


def rasterize_forward(means3D, scales, rotations, opacities, shs, deg,
                      viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                      W, H, bg_color, scale_modifier=1.0,
                      colors_precomp=None):
    """Full forward pass (rasterizer_impl.cu:198-336 driver semantics).

    All array inputs are POST-activation, matching what the Python wrapper
    feeds the CUDA binding (exp'd scales, normalized quaternions, sigmoid
    opacities); ``viewmatrix``/``projmatrix`` are the 16-float flattened
    transposed matrices exactly as torch hands them over.
    """
    means3D = np.asarray(means3D, f32)
    P = means3D.shape[0]
    viewmatrix = np.asarray(viewmatrix, f32).reshape(16)
    projmatrix = np.asarray(projmatrix, f32).reshape(16)
    focal_y = f32(H) / (f32(2.0) * f32(tan_fovy))   # rasterize_points.cu:70-71
    focal_x = f32(W) / (f32(2.0) * f32(tan_fovx))
    grid_x = (W + BLOCK_X - 1) // BLOCK_X
    grid_y = (H + BLOCK_Y - 1) // BLOCK_Y

    geom = preprocess_forward(
        P, deg, means3D, np.asarray(scales, f32), f32(scale_modifier),
        np.asarray(rotations, f32), np.asarray(opacities, f32).reshape(P),
        None if shs is None else np.asarray(shs, f32),
        viewmatrix, projmatrix, np.asarray(campos, f32),
        W, H, f32(tan_fovx), f32(tan_fovy), focal_x, focal_y,
        grid_x, grid_y)

    features = (geom["rgb"] if colors_precomp is None
                else np.asarray(colors_precomp, f32))
    point_list, ranges = duplicate_and_sort(P, geom, grid_x, grid_y)
    out_color, final_T, n_contrib = render_forward_blend(
        point_list, ranges, W, H, geom, bg_color, features, grid_x, grid_y)

    return dict(
        out_color=out_color, final_T=final_T, n_contrib=n_contrib,
        radii=geom["radii"], geom=geom, point_list=point_list, ranges=ranges,
        features=features, P=P, deg=deg, W=W, H=H, grid=(grid_x, grid_y),
        means3D=means3D, scales=np.asarray(scales, f32),
        rotations=np.asarray(rotations, f32), shs=shs,
        viewmatrix=viewmatrix, projmatrix=projmatrix,
        campos=np.asarray(campos, f32), tan_fovx=f32(tan_fovx),
        tan_fovy=f32(tan_fovy), focal_x=focal_x, focal_y=focal_y,
        scale_modifier=f32(scale_modifier), bg_color=np.asarray(bg_color, f32),
        colors_precomp=colors_precomp)


# ---------------------------------------------------------------------------
# backward.cu
# ---------------------------------------------------------------------------

def render_backward_blend(saved, dL_dpixels, dL_dTfinal=None):
    """backward.cu:399-557 (renderCUDA), vectorized across a tile's pixels.

    Per-Gaussian accumulators are float64 stand-ins for the CUDA float32
    atomicAdds (whose order is nondeterministic); rounded to f32 on return.
    """
    W, H = saved["W"], saved["H"]
    grid_x, grid_y = saved["grid"]
    geom = saved["geom"]
    point_list, ranges = saved["point_list"], saved["ranges"]
    colors = saved["features"]
    bg = saved["bg_color"]
    final_Ts = saved["final_T"]
    n_contrib = saved["n_contrib"]
    P = saved["P"]

    dL_dmean2D = np.zeros((P, 3), np.float64)
    dL_dconic2D = np.zeros((P, 4), np.float64)
    dL_dopacity = np.zeros(P, np.float64)
    dL_dcolors = np.zeros((P, 3), np.float64)

    dL_dpixels = np.asarray(dL_dpixels, f32).reshape(H, W, 3)
    if dL_dTfinal is not None:
        dL_dTfinal = np.asarray(dL_dTfinal, f32).reshape(H, W)

    ddelx_dx = f32(0.5 * W)                  # backward.cu:460-461
    ddely_dy = f32(0.5 * H)

    for ty in range(grid_y):
        for tx in range(grid_x):
            r0, r1 = ranges[ty * grid_x + tx]
            toDo = r1 - r0
            if toDo == 0:
                continue
            pix_min = (tx * BLOCK_X, ty * BLOCK_Y)
            pix_max = (min(pix_min[0] + BLOCK_X, W), min(pix_min[1] + BLOCK_Y, H))
            xs = np.arange(pix_min[0], pix_max[0])
            ys = np.arange(pix_min[1], pix_max[1])
            pxf = np.repeat(xs[None, :], len(ys), 0).astype(f32).ravel()
            pyf = np.repeat(ys[:, None], len(xs), 1).astype(f32).ravel()
            npx = pxf.size

            T_final = final_Ts[pix_min[1]:pix_max[1],
                               pix_min[0]:pix_max[0]].reshape(npx).copy()
            T = T_final.copy()
            last_contributor = n_contrib[pix_min[1]:pix_max[1],
                                         pix_min[0]:pix_max[0]].reshape(npx)
            dL_dpixel = dL_dpixels[pix_min[1]:pix_max[1],
                                   pix_min[0]:pix_max[0]].reshape(npx, 3)
            bg_dot_dpixel = (bg[None, :] * dL_dpixel).astype(f32)
            bg_dot_dpixel = (bg_dot_dpixel[:, 0] + bg_dot_dpixel[:, 1]
                             + bg_dot_dpixel[:, 2])
            if dL_dTfinal is not None:
                # repo extension: t_final's own cotangent rides the same
                # -T_final/(1-alpha) chain as the background term
                bg_dot_dpixel = bg_dot_dpixel + dL_dTfinal[
                    pix_min[1]:pix_max[1],
                    pix_min[0]:pix_max[0]].reshape(npx)

            accum_rec = np.zeros((npx, 3), f32)
            last_alpha = np.zeros(npx, f32)
            last_color = np.zeros((npx, 3), f32)

            for k in range(toDo):
                q = toDo - 1 - k             # forward-order index of entry
                gid = int(point_list[r0 + q])
                # contributor-- then skip while contributor >= last_contrib
                active = q < last_contributor

                xy = geom["points_xy_image"][gid]
                dx = f32(xy[0]) - pxf
                dy = f32(xy[1]) - pyf
                co = geom["conic_opacity"][gid]
                power = (f32(-0.5) * (co[0] * dx * dx + co[2] * dy * dy)
                         - co[1] * dx * dy)
                active &= ~(power > f32(0.0))

                G = np.exp(power).astype(f32)
                alpha = np.minimum(f32(0.99), co[3] * G)
                active &= ~(alpha < f32(1.0) / f32(255.0))
                if not active.any():
                    continue

                T = np.where(active, T / (f32(1.0) - alpha), T)
                dchannel_dcolor = alpha * T

                c = np.asarray(colors[gid], f32)
                accum_rec_new = (last_alpha[:, None] * last_color
                                 + (f32(1.0) - last_alpha)[:, None] * accum_rec)
                accum_rec = np.where(active[:, None], accum_rec_new, accum_rec)
                last_color = np.where(active[:, None], c[None, :], last_color)

                dL_dalpha = ((c[None, :] - accum_rec) * dL_dpixel).astype(f32)
                dL_dalpha = dL_dalpha[:, 0] + dL_dalpha[:, 1] + dL_dalpha[:, 2]
                dL_dalpha = dL_dalpha * T
                last_alpha = np.where(active, alpha, last_alpha)

                dL_dalpha = dL_dalpha + (-T_final / (f32(1.0) - alpha)) * bg_dot_dpixel

                dL_dcolors[gid] += (
                    dchannel_dcolor[:, None] * dL_dpixel
                )[active].sum(axis=0, dtype=np.float64)

                dL_dG = co[3] * dL_dalpha
                gdx = G * dx
                gdy = G * dy
                dG_ddelx = -gdx * co[0] - gdy * co[1]
                dG_ddely = -gdy * co[2] - gdx * co[1]

                dL_dmean2D[gid][0] += (dL_dG * dG_ddelx * ddelx_dx)[active].sum(dtype=np.float64)
                dL_dmean2D[gid][1] += (dL_dG * dG_ddely * ddely_dy)[active].sum(dtype=np.float64)

                dL_dconic2D[gid][0] += (f32(-0.5) * gdx * dx * dL_dG)[active].sum(dtype=np.float64)
                dL_dconic2D[gid][1] += (f32(-0.5) * gdx * dy * dL_dG)[active].sum(dtype=np.float64)
                dL_dconic2D[gid][3] += (f32(-0.5) * gdy * dy * dL_dG)[active].sum(dtype=np.float64)

                dL_dopacity[gid] += (G * dL_dalpha)[active].sum(dtype=np.float64)

    return dict(dL_dmean2D=dL_dmean2D.astype(f32),
                dL_dconic2D=dL_dconic2D.astype(f32),
                dL_dopacity=dL_dopacity.astype(f32),
                dL_dcolors=dL_dcolors.astype(f32))


def computeCov2DCUDA_bwd(saved, dL_dconics):
    """backward.cu:144-274 — conic grad -> cov2D -> cov3D + view-mean grad."""
    P = saved["P"]
    geom = saved["geom"]
    view_matrix = saved["viewmatrix"]
    h_x, h_y = saved["focal_x"], saved["focal_y"]
    tan_fovx, tan_fovy = saved["tan_fovx"], saved["tan_fovy"]

    dL_dmeans = np.zeros((P, 3), f32)
    dL_dcov = np.zeros((P, 6), f32)

    for idx in range(P):
        if not geom["radii"][idx] > 0:
            continue
        cov3D = geom["cov3Ds"][idx]
        mean = saved["means3D"][idx]
        dL_dconic = np.asarray([dL_dconics[idx][0], dL_dconics[idx][1],
                                dL_dconics[idx][3]], f32)
        t = transformPoint4x3(mean, view_matrix)

        limx = f32(1.3) * tan_fovx
        limy = f32(1.3) * tan_fovy
        txtz = t[0] / t[2]
        tytz = t[1] / t[2]
        t[0] = min(limx, max(-limx, txtz)) * t[2]
        t[1] = min(limy, max(-limy, tytz)) * t[2]

        x_grad_mul = f32(0.0) if (txtz < -limx or txtz > limx) else f32(1.0)
        y_grad_mul = f32(0.0) if (tytz < -limy or tytz > limy) else f32(1.0)

        J = Mat3(h_x / t[2], 0.0, -(h_x * t[0]) / (t[2] * t[2]),
                 0.0, h_y / t[2], -(h_y * t[1]) / (t[2] * t[2]),
                 0, 0, 0)
        W = Mat3(
            view_matrix[0], view_matrix[4], view_matrix[8],
            view_matrix[1], view_matrix[5], view_matrix[9],
            view_matrix[2], view_matrix[6], view_matrix[10])
        Vrk = Mat3(
            cov3D[0], cov3D[1], cov3D[2],
            cov3D[1], cov3D[3], cov3D[4],
            cov3D[2], cov3D[4], cov3D[5])
        T = W * J
        cov2D = T.transpose() * Vrk.transpose() * T

        a = cov2D[0][0] + f32(0.3)           # backward.cu:197-199
        b = cov2D[0][1]
        c = cov2D[1][1] + f32(0.3)

        denom = a * c - b * b
        dL_da = f32(0.0); dL_db = f32(0.0); dL_dc = f32(0.0)
        denom2inv = f32(1.0) / ((denom * denom) + f32(0.0000001))

        if denom2inv != f32(0.0):
            dL_da = denom2inv * (-c * c * dL_dconic[0] + f32(2.0) * b * c * dL_dconic[1] + (denom - a * c) * dL_dconic[2])
            dL_dc = denom2inv * (-a * a * dL_dconic[2] + f32(2.0) * a * b * dL_dconic[1] + (denom - a * c) * dL_dconic[0])
            dL_db = denom2inv * f32(2.0) * (b * c * dL_dconic[0] - (denom + f32(2.0) * b * b) * dL_dconic[1] + a * b * dL_dconic[2])

            dL_dcov[idx][0] = (T[0][0] * T[0][0] * dL_da + T[0][0] * T[1][0] * dL_db + T[1][0] * T[1][0] * dL_dc)
            dL_dcov[idx][3] = (T[0][1] * T[0][1] * dL_da + T[0][1] * T[1][1] * dL_db + T[1][1] * T[1][1] * dL_dc)
            dL_dcov[idx][5] = (T[0][2] * T[0][2] * dL_da + T[0][2] * T[1][2] * dL_db + T[1][2] * T[1][2] * dL_dc)

            dL_dcov[idx][1] = f32(2.0) * T[0][0] * T[0][1] * dL_da + (T[0][0] * T[1][1] + T[0][1] * T[1][0]) * dL_db + f32(2.0) * T[1][0] * T[1][1] * dL_dc
            dL_dcov[idx][2] = f32(2.0) * T[0][0] * T[0][2] * dL_da + (T[0][0] * T[1][2] + T[0][2] * T[1][0]) * dL_db + f32(2.0) * T[1][0] * T[1][2] * dL_dc
            dL_dcov[idx][4] = f32(2.0) * T[0][2] * T[0][1] * dL_da + (T[0][1] * T[1][2] + T[0][2] * T[1][1]) * dL_db + f32(2.0) * T[1][1] * T[1][2] * dL_dc
        else:
            dL_dcov[idx][:] = 0

        dL_dT00 = f32(2.0) * (T[0][0] * Vrk[0][0] + T[0][1] * Vrk[0][1] + T[0][2] * Vrk[0][2]) * dL_da + \
            (T[1][0] * Vrk[0][0] + T[1][1] * Vrk[0][1] + T[1][2] * Vrk[0][2]) * dL_db
        dL_dT01 = f32(2.0) * (T[0][0] * Vrk[1][0] + T[0][1] * Vrk[1][1] + T[0][2] * Vrk[1][2]) * dL_da + \
            (T[1][0] * Vrk[1][0] + T[1][1] * Vrk[1][1] + T[1][2] * Vrk[1][2]) * dL_db
        dL_dT02 = f32(2.0) * (T[0][0] * Vrk[2][0] + T[0][1] * Vrk[2][1] + T[0][2] * Vrk[2][2]) * dL_da + \
            (T[1][0] * Vrk[2][0] + T[1][1] * Vrk[2][1] + T[1][2] * Vrk[2][2]) * dL_db
        dL_dT10 = f32(2.0) * (T[1][0] * Vrk[0][0] + T[1][1] * Vrk[0][1] + T[1][2] * Vrk[0][2]) * dL_dc + \
            (T[0][0] * Vrk[0][0] + T[0][1] * Vrk[0][1] + T[0][2] * Vrk[0][2]) * dL_db
        dL_dT11 = f32(2.0) * (T[1][0] * Vrk[1][0] + T[1][1] * Vrk[1][1] + T[1][2] * Vrk[1][2]) * dL_dc + \
            (T[0][0] * Vrk[1][0] + T[0][1] * Vrk[1][1] + T[0][2] * Vrk[1][2]) * dL_db
        dL_dT12 = f32(2.0) * (T[1][0] * Vrk[2][0] + T[1][1] * Vrk[2][1] + T[1][2] * Vrk[2][2]) * dL_dc + \
            (T[0][0] * Vrk[2][0] + T[0][1] * Vrk[2][1] + T[0][2] * Vrk[2][2]) * dL_db

        dL_dJ00 = W[0][0] * dL_dT00 + W[0][1] * dL_dT01 + W[0][2] * dL_dT02
        dL_dJ02 = W[2][0] * dL_dT00 + W[2][1] * dL_dT01 + W[2][2] * dL_dT02
        dL_dJ11 = W[1][0] * dL_dT10 + W[1][1] * dL_dT11 + W[1][2] * dL_dT12
        dL_dJ12 = W[2][0] * dL_dT10 + W[2][1] * dL_dT11 + W[2][2] * dL_dT12

        tz = f32(1.0) / t[2]
        tz2 = tz * tz
        tz3 = tz2 * tz

        dL_dtx = x_grad_mul * -h_x * tz2 * dL_dJ02
        dL_dty = y_grad_mul * -h_y * tz2 * dL_dJ12
        dL_dtz = (-h_x * tz2 * dL_dJ00 - h_y * tz2 * dL_dJ11
                  + (f32(2.0) * h_x * t[0]) * tz3 * dL_dJ02
                  + (f32(2.0) * h_y * t[1]) * tz3 * dL_dJ12)

        dL_dmean = transformVec4x3Transpose(
            (dL_dtx, dL_dty, dL_dtz), view_matrix)
        dL_dmeans[idx] = dL_dmean            # overwrite (backward.cu:273)

    return dL_dmeans, dL_dcov


def computeColorFromSH_bwd(idx, deg, max_coeffs, means, campos, shs, clamped,
                           dL_dcolor, dL_dmeans, dL_dshs):
    # backward.cu:20-139
    pos = np.asarray(means[idx], f32)
    dir_orig = pos - np.asarray(campos, f32)
    dir_ = dir_orig / f32(np.sqrt(_dot3(dir_orig, dir_orig)))

    sh = np.asarray(shs[idx], f32)

    dL_dRGB = np.asarray(dL_dcolor[idx], f32).copy()
    dL_dRGB[0] = dL_dRGB[0] * (f32(0.0) if clamped[idx][0] else f32(1.0))
    dL_dRGB[1] = dL_dRGB[1] * (f32(0.0) if clamped[idx][1] else f32(1.0))
    dL_dRGB[2] = dL_dRGB[2] * (f32(0.0) if clamped[idx][2] else f32(1.0))

    dRGBdx = np.zeros(3, f32)
    dRGBdy = np.zeros(3, f32)
    dRGBdz = np.zeros(3, f32)
    x, y, z = dir_[0], dir_[1], dir_[2]

    dL_dsh = dL_dshs[idx]

    dRGBdsh0 = SH_C0
    dL_dsh[0] = dRGBdsh0 * dL_dRGB
    if deg > 0:
        dRGBdsh1 = -SH_C1 * y
        dRGBdsh2 = SH_C1 * z
        dRGBdsh3 = -SH_C1 * x
        dL_dsh[1] = dRGBdsh1 * dL_dRGB
        dL_dsh[2] = dRGBdsh2 * dL_dRGB
        dL_dsh[3] = dRGBdsh3 * dL_dRGB

        dRGBdx = -SH_C1 * sh[3]
        dRGBdy = -SH_C1 * sh[1]
        dRGBdz = SH_C1 * sh[2]

        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z

            dRGBdsh4 = SH_C2[0] * xy
            dRGBdsh5 = SH_C2[1] * yz
            dRGBdsh6 = SH_C2[2] * (f32(2.0) * zz - xx - yy)
            dRGBdsh7 = SH_C2[3] * xz
            dRGBdsh8 = SH_C2[4] * (xx - yy)
            dL_dsh[4] = dRGBdsh4 * dL_dRGB
            dL_dsh[5] = dRGBdsh5 * dL_dRGB
            dL_dsh[6] = dRGBdsh6 * dL_dRGB
            dL_dsh[7] = dRGBdsh7 * dL_dRGB
            dL_dsh[8] = dRGBdsh8 * dL_dRGB

            dRGBdx = dRGBdx + SH_C2[0] * y * sh[4] + SH_C2[2] * f32(2.0) * -x * sh[6] + SH_C2[3] * z * sh[7] + SH_C2[4] * f32(2.0) * x * sh[8]
            dRGBdy = dRGBdy + SH_C2[0] * x * sh[4] + SH_C2[1] * z * sh[5] + SH_C2[2] * f32(2.0) * -y * sh[6] + SH_C2[4] * f32(2.0) * -y * sh[8]
            dRGBdz = dRGBdz + SH_C2[1] * y * sh[5] + SH_C2[2] * f32(2.0) * f32(2.0) * z * sh[6] + SH_C2[3] * x * sh[7]

            if deg > 2:
                dRGBdsh9 = SH_C3[0] * y * (f32(3.0) * xx - yy)
                dRGBdsh10 = SH_C3[1] * xy * z
                dRGBdsh11 = SH_C3[2] * y * (f32(4.0) * zz - xx - yy)
                dRGBdsh12 = SH_C3[3] * z * (f32(2.0) * zz - f32(3.0) * xx - f32(3.0) * yy)
                dRGBdsh13 = SH_C3[4] * x * (f32(4.0) * zz - xx - yy)
                dRGBdsh14 = SH_C3[5] * z * (xx - yy)
                dRGBdsh15 = SH_C3[6] * x * (xx - f32(3.0) * yy)
                dL_dsh[9] = dRGBdsh9 * dL_dRGB
                dL_dsh[10] = dRGBdsh10 * dL_dRGB
                dL_dsh[11] = dRGBdsh11 * dL_dRGB
                dL_dsh[12] = dRGBdsh12 * dL_dRGB
                dL_dsh[13] = dRGBdsh13 * dL_dRGB
                dL_dsh[14] = dRGBdsh14 * dL_dRGB
                dL_dsh[15] = dRGBdsh15 * dL_dRGB

                dRGBdx = dRGBdx + (
                    SH_C3[0] * sh[9] * f32(3.0) * f32(2.0) * xy +
                    SH_C3[1] * sh[10] * yz +
                    SH_C3[2] * sh[11] * f32(-2.0) * xy +
                    SH_C3[3] * sh[12] * f32(-3.0) * f32(2.0) * xz +
                    SH_C3[4] * sh[13] * (f32(-3.0) * xx + f32(4.0) * zz - yy) +
                    SH_C3[5] * sh[14] * f32(2.0) * xz +
                    SH_C3[6] * sh[15] * f32(3.0) * (xx - yy))
                dRGBdy = dRGBdy + (
                    SH_C3[0] * sh[9] * f32(3.0) * (xx - yy) +
                    SH_C3[1] * sh[10] * xz +
                    SH_C3[2] * sh[11] * (f32(-3.0) * yy + f32(4.0) * zz - xx) +
                    SH_C3[3] * sh[12] * f32(-3.0) * f32(2.0) * yz +
                    SH_C3[4] * sh[13] * f32(-2.0) * xy +
                    SH_C3[5] * sh[14] * f32(-2.0) * yz +
                    SH_C3[6] * sh[15] * f32(-3.0) * f32(2.0) * xy)
                dRGBdz = dRGBdz + (
                    SH_C3[1] * sh[10] * xy +
                    SH_C3[2] * sh[11] * f32(4.0) * f32(2.0) * yz +
                    SH_C3[3] * sh[12] * f32(3.0) * (f32(2.0) * zz - xx - yy) +
                    SH_C3[4] * sh[13] * f32(4.0) * f32(2.0) * xz +
                    SH_C3[5] * sh[14] * (xx - yy))

    dL_ddir = np.asarray([_dot3(dRGBdx, dL_dRGB), _dot3(dRGBdy, dL_dRGB),
                          _dot3(dRGBdz, dL_dRGB)], f32)
    dL_dmean = dnormvdv3(dir_orig, dL_ddir)
    dL_dmeans[idx] += dL_dmean


def computeCov3D_bwd(idx, scale, mod, rot, dL_dcov3Ds, dL_dscales, dL_drots):
    # backward.cu:278-341
    q = np.asarray(rot, f32)                 # NOT normalized (fork semantics)
    r, x, y, z = q[0], q[1], q[2], q[3]

    R = Mat3(
        1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
        2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
        2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y))

    S = Mat3(1.0)
    s = f32(mod) * np.asarray(scale, f32)
    S[0] = [s[0], 0, 0]
    S[1] = [0, s[1], 0]
    S[2] = [0, 0, s[2]]

    M = S * R

    dL_dcov3D = dL_dcov3Ds[idx]

    dL_dSigma = Mat3(
        dL_dcov3D[0], f32(0.5) * dL_dcov3D[1], f32(0.5) * dL_dcov3D[2],
        f32(0.5) * dL_dcov3D[1], dL_dcov3D[3], f32(0.5) * dL_dcov3D[4],
        f32(0.5) * dL_dcov3D[2], f32(0.5) * dL_dcov3D[4], dL_dcov3D[5])

    dL_dM = 2.0 * M * dL_dSigma

    Rt = R.transpose()
    dL_dMt = dL_dM.transpose()

    dL_dscales[idx][0] = _dot3(Rt[0], dL_dMt[0])
    dL_dscales[idx][1] = _dot3(Rt[1], dL_dMt[1])
    dL_dscales[idx][2] = _dot3(Rt[2], dL_dMt[2])

    dL_dMt[0] = dL_dMt[0] * s[0]
    dL_dMt[1] = dL_dMt[1] * s[1]
    dL_dMt[2] = dL_dMt[2] * s[2]

    dL_dq = np.zeros(4, f32)
    dL_dq[0] = f32(2.0) * z * (dL_dMt[0][1] - dL_dMt[1][0]) + f32(2.0) * y * (dL_dMt[2][0] - dL_dMt[0][2]) + f32(2.0) * x * (dL_dMt[1][2] - dL_dMt[2][1])
    dL_dq[1] = f32(2.0) * y * (dL_dMt[1][0] + dL_dMt[0][1]) + f32(2.0) * z * (dL_dMt[2][0] + dL_dMt[0][2]) + f32(2.0) * r * (dL_dMt[1][2] - dL_dMt[2][1]) - f32(4.0) * x * (dL_dMt[2][2] + dL_dMt[1][1])
    dL_dq[2] = f32(2.0) * x * (dL_dMt[1][0] + dL_dMt[0][1]) + f32(2.0) * r * (dL_dMt[2][0] - dL_dMt[0][2]) + f32(2.0) * z * (dL_dMt[1][2] + dL_dMt[2][1]) - f32(4.0) * y * (dL_dMt[2][2] + dL_dMt[0][0])
    dL_dq[3] = f32(2.0) * r * (dL_dMt[0][1] - dL_dMt[1][0]) + f32(2.0) * x * (dL_dMt[2][0] + dL_dMt[0][2]) + f32(2.0) * y * (dL_dMt[1][2] + dL_dMt[2][1]) - f32(4.0) * z * (dL_dMt[1][1] + dL_dMt[0][0])

    # backward.cu:338-340: dnormvdv commented out in this fork
    dL_drots[idx] = dL_dq


def preprocess_backward(saved, dL_dmean2D, dL_dconic, dL_dcolor):
    """BACKWARD::preprocess (backward.cu:559-622): computeCov2DCUDA then
    the mean-projection / SH / cov3D chains of preprocessCUDA:346-396."""
    P, deg = saved["P"], saved["deg"]
    geom = saved["geom"]
    proj = saved["projmatrix"]
    means = saved["means3D"]
    shs = saved["shs"]
    M = 0 if shs is None else np.asarray(shs).shape[1]

    dL_dmeans, dL_dcov3D = computeCov2DCUDA_bwd(saved, dL_dconic)

    dL_dsh = np.zeros((P, max(M, 1), 3), f32)
    dL_dscale = np.zeros((P, 3), f32)
    dL_drot = np.zeros((P, 4), f32)

    for idx in range(P):
        if not geom["radii"][idx] > 0:
            continue

        m = means[idx]
        m_hom = transformPoint4x4(m, proj)
        m_w = f32(1.0) / (m_hom[3] + f32(0.0000001))

        mul1 = (proj[0] * m[0] + proj[4] * m[1] + proj[8] * m[2] + proj[12]) * m_w * m_w
        mul2 = (proj[1] * m[0] + proj[5] * m[1] + proj[9] * m[2] + proj[13]) * m_w * m_w
        dL_dmean = np.asarray([
            (proj[0] * m_w - proj[3] * mul1) * dL_dmean2D[idx][0] + (proj[1] * m_w - proj[3] * mul2) * dL_dmean2D[idx][1],
            (proj[4] * m_w - proj[7] * mul1) * dL_dmean2D[idx][0] + (proj[5] * m_w - proj[7] * mul2) * dL_dmean2D[idx][1],
            (proj[8] * m_w - proj[11] * mul1) * dL_dmean2D[idx][0] + (proj[9] * m_w - proj[11] * mul2) * dL_dmean2D[idx][1],
        ], f32)
        dL_dmeans[idx] += dL_dmean

        if shs is not None:
            computeColorFromSH_bwd(idx, deg, M, means, saved["campos"], shs,
                                   geom["clamped"], dL_dcolor, dL_dmeans,
                                   dL_dsh)

        computeCov3D_bwd(idx, saved["scales"][idx], saved["scale_modifier"],
                         saved["rotations"][idx], dL_dcov3D, dL_dscale,
                         dL_drot)

    return dict(dL_dmeans3D=dL_dmeans, dL_dcov3D=dL_dcov3D, dL_dsh=dL_dsh,
                dL_dscale=dL_dscale, dL_drot=dL_drot)


def rasterize_backward(saved, dL_dpixels, dL_dTfinal=None):
    """Full backward pass (rasterizer_impl.cu:340-434 driver semantics).

    Returns gradients w.r.t. the POST-activation inputs: means3D, mean2D
    (NDC-scaled, the densification-stats signal), conic, opacity, colors,
    cov3D, sh, scales, rotations.
    """
    blend = render_backward_blend(saved, dL_dpixels, dL_dTfinal)
    prep = preprocess_backward(saved, blend["dL_dmean2D"],
                               blend["dL_dconic2D"], blend["dL_dcolors"])
    return {**blend, **prep}
