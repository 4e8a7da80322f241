"""Generate the synthetic verify assets (INSTA subject + FLAME pickle +
UV template OBJ + config) used by .claude/skills/verify/SKILL.md to drive
the training CLI end-to-end without licensed FLAME assets.

Usage: python scripts/make_verify_assets.py [OUT_DIR]   (default /tmp/fav_verify)
Prints the generated config path.
"""

import json
import os
import pickle
import sys

import numpy as np


def fibonacci_sphere(n, radius=0.1):
    idx = np.arange(n, dtype=np.float64)
    phi = np.arccos(1.0 - 2.0 * (idx + 0.5) / n)
    theta = np.pi * (1.0 + 5.0**0.5) * idx
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    ) * radius
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    tri = pts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = (nrm * tri.mean(axis=1)).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]
    return pts.astype(np.float32), faces


def main(out_root="/tmp/fav_verify", res=64, n_verts=96, n_frames=4):
    rng = np.random.default_rng(0)
    os.makedirs(out_root, exist_ok=True)

    # ---- FLAME pickle (plain numpy dict, loader.load_flame_pickle) ----
    verts, faces = fibonacci_sphere(n_verts)
    J = 5
    j_reg = np.abs(rng.normal(size=(J, n_verts))).astype(np.float32)
    j_reg /= j_reg.sum(axis=1, keepdims=True)
    w = np.abs(rng.normal(size=(n_verts, J))).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    flame = {
        "v_template": verts,
        "shapedirs": (rng.normal(size=(n_verts, 3, 400)) * 0.01).astype(np.float32),
        "posedirs": (rng.normal(size=(n_verts, 3, 36)) * 0.001).astype(np.float32),
        "J_regressor": j_reg,
        "weights": w,
        "f": faces,
        "kintree_table": np.array([[-1, 0, 1, 1, 1], [0, 1, 2, 3, 4]], np.int64),
    }
    flame_path = os.path.join(out_root, "generic_model.pkl")
    with open(flame_path, "wb") as f:
        pickle.dump(flame, f)

    # ---- landmark embedding (static 68 + dynamic 79x17 contour) ----
    lmk = {
        "full_lmk_faces_idx": rng.integers(0, len(faces), 68).astype(np.int64),
        "full_lmk_bary_coords": rng.dirichlet(np.ones(3), 68),
        "static_lmk_faces_idx": rng.integers(0, len(faces), 51).astype(np.int64),
        "static_lmk_bary_coords": rng.dirichlet(np.ones(3), 51),
        "dynamic_lmk_faces_idx": rng.integers(0, len(faces), (79, 17)).astype(np.int64),
        "dynamic_lmk_bary_coords": rng.dirichlet(np.ones(3), (79, 17)),
    }
    lmk_path = os.path.join(out_root, "landmark_embedding.npy")
    np.save(lmk_path, lmk, allow_pickle=True)

    # ---- template OBJ with spherical-projection UVs ----
    obj_path = os.path.join(out_root, "head_template.obj")
    u = 0.5 + np.arctan2(verts[:, 1], verts[:, 0]) / (2 * np.pi)
    v = 0.5 + verts[:, 2] / (2 * np.abs(verts[:, 2]).max() + 1e-9)
    with open(obj_path, "w") as f:
        for p in verts:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for a, b in zip(u, v):
            f.write(f"vt {a} {b}\n")
        for tri in faces:
            f.write("f " + " ".join(f"{i+1}/{i+1}" for i in tri) + "\n")

    # ---- INSTA dataset layout ----
    from PIL import Image

    root = os.path.join(out_root, "insta", "subj")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    for sub in ("exp", "eyes", "jaw", "shape"):
        os.makedirs(os.path.join(root, "flame", sub), exist_ok=True)
    counter = 0
    for split, n in (("train", n_frames), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"{counter:05d}"   # INSTA reader sorts by int(stem)
            counter += 1
            Image.fromarray(
                (rng.random((res, res, 3)) * 255).astype("uint8")
            ).save(os.path.join(root, "images", f"{name}.png"))
            np.savetxt(os.path.join(root, "flame", "exp", f"{name}.txt"),
                       rng.normal(size=100) * 0.1)
            eye6d = np.concatenate([np.eye(3)[:2].ravel()] * 2)
            np.savetxt(os.path.join(root, "flame", "eyes", f"{name}.txt"), eye6d)
            np.savetxt(os.path.join(root, "flame", "jaw", f"{name}.txt"),
                       np.eye(3)[:2].ravel())
            np.savetxt(os.path.join(root, "flame", "shape", f"{name}.txt"),
                       rng.normal(size=300) * 0.1)
            c2w = np.eye(4)
            c2w[2, 3] = -1.0
            frames.append({
                "file_path": f"images/{name}.png",
                "exp_path": f"flame/exp/{name}.txt",
                "transform_matrix": c2w.tolist(),
            })
        # fl 2000@512 puts the r=0.1 sphere head at ~400 px from z=1 —
        # real-capture framing (face fills most of the frame); fl 800 left
        # it at 160 px, below the FFHQ-align 256-px floor
        # (train_generate_pseudo min_face_size = res/2), which silently
        # disabled the crop->PTI->paste-back path in the e2e chain
        meta = {"frames": frames, "fl_x": 2000.0 * res / 512, "fl_y": 2000.0 * res / 512,
                "cx": res / 2, "cy": res / 2, "w": res, "h": res}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)

    # ---- config ----
    cfg = f"""name: verify
workspace: {out_root}/workspace

dataset:
  root_path: {root}
  img_res: [{res}, {res}]

loss:
  rgb_weight: 1.0
  vgg_weight: 0.0
  dssim_weight: 0.25

model:
  name: fateavatar
  tex_size: 16

training:
  max_points_num: 512
  densify_interval: 8
  prune_interval: 11

render:
  impl: xla
  max_per_tile: 256

assets:
  flame_model_path: {flame_path}
  template_mesh_path: {obj_path}
  landmark_embedding_path: {lmk_path}
"""
    cfg_path = os.path.join(out_root, "config.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    print(cfg_path)
    return cfg_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_root", nargs="?", default="/tmp/fav_verify")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--n-verts", type=int, default=96)
    ap.add_argument("--n-frames", type=int, default=4)
    a = ap.parse_args()
    main(a.out_root, res=a.res, n_verts=a.n_verts, n_frames=a.n_frames)
