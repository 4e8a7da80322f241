"""Convert a torchvision VGG16 checkpoint to this framework's JAX format.

The perceptual loss (train/losses.py:vgg_perceptual_loss) consumes plain
numpy conv weights. In a connected environment, produce them once:

  python scripts/convert_vgg16.py --out weights/vgg16_jax.npz
      [--torch_ckpt /path/to/vgg16-397923af.pth]

Without --torch_ckpt, torchvision attempts its standard download (needs
network). The resulting .npz is what ``assets.vgg16_weights_path`` in the
config should point to — losses.load_vgg16_from_torch also accepts the raw
torch .pth directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--torch_ckpt", default=None)
    args = parser.parse_args()

    from fateavatar_tpu.train.losses import load_vgg16_from_torch

    if args.torch_ckpt:
        params = load_vgg16_from_torch(args.torch_ckpt)
    else:
        import torch
        import torchvision

        model = torchvision.models.vgg16(
            weights=torchvision.models.VGG16_Weights.DEFAULT
        )
        tmp = args.out + ".torch.pth"
        torch.save(model.state_dict(), tmp)
        params = load_vgg16_from_torch(tmp)
        os.remove(tmp)

    np.savez(
        args.out,
        **{f"w{i}": np.asarray(w) for i, (w, b) in enumerate(params)},
        **{f"b{i}": np.asarray(b) for i, (w, b) in enumerate(params)},
    )
    print(f"wrote {args.out} ({len(params)} conv layers)")


if __name__ == "__main__":
    main()
