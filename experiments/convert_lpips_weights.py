#!/usr/bin/env python
"""Convert official LPIPS (VGG) torch checkpoints to the npz layout
consumed by normal_clustering_nerf_tpu.metrics.lpips.

Inputs (any machine with the files; run once, commit/copy the npz):
  --vgg    torchvision vgg16 state_dict .pth  (features.N.weight/bias)
  --lin    lpips package 'vgg.pth' linear-head checkpoint
           (lin{i}.model.1.weight, shape (1, C, 1, 1))
  --out    output npz path (default weights/lpips_vgg.npz)

Torch conv weights (out,in,kh,kw) are transposed to HWIO.
"""
import argparse
import os

import numpy as np

# torchvision vgg16 features module indices of the 13 convs, in order
_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    args = ap.parse_args()

    import torch

    vgg = torch.load(args.vgg, map_location="cpu")
    if hasattr(vgg, "state_dict"):
        vgg = vgg.state_dict()
    lin = torch.load(args.lin, map_location="cpu")

    out = {}
    for name, idx in zip(_NAMES, _TORCH_CONV_IDX):
        w = vgg[f"features.{idx}.weight"].numpy()      # (out,in,kh,kw)
        b = vgg[f"features.{idx}.bias"].numpy()
        out[f"{name}_w"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"{name}_b"] = b
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        out[f"lin{i}"] = lin[key].numpy().reshape(-1)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
