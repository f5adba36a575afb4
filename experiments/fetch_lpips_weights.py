#!/usr/bin/env python
"""Fetch + verify + convert the official LPIPS(VGG) weights to
weights/lpips_vgg.npz (one-time, on any machine WITH network egress;
this build environment has none, which is why the artifact ships as a
documented fetch instead of a committed 55 MB blob).

Sources (the exact checkpoints the reference's torchmetrics LPIPS
loads, reference: metrics/rgb_metrics.py:124-162):
  * torchvision VGG16 ImageNet features:
      https://download.pytorch.org/models/vgg16-397923af.pth
    sha256 pinned below (torchvision convention: the '397923af' URL
    suffix is the first 8 hex digits of the file's sha256, verified
    on download here in full 8-digit-prefix form).
  * LPIPS v0.1 linear heads (richzhang/PerceptualSimilarity):
      https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/
      master/lpips/weights/v0.1/vgg.pth
    (~7 KB; structural validation below + sha256 echoed for pinning.)

Usage:
    python experiments/fetch_lpips_weights.py [--out weights/lpips_vgg.npz]

Then run any eval with --eval_lpips; metrics/lpips.py picks the npz up
from weights/lpips_vgg.npz (or $NCNERF_LPIPS_WEIGHTS).
"""
import argparse
import hashlib
import os
import sys
import tempfile
import urllib.request

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
VGG16_SHA256_PREFIX = "397923af"  # torchvision hash-in-filename pin
LIN_URL = ("https://raw.githubusercontent.com/richzhang/"
           "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")


def _fetch(url: str, dest: str):
    print(f"fetching {url}", file=sys.stderr)
    urllib.request.urlretrieve(url, dest)
    h = hashlib.sha256(open(dest, "rb").read()).hexdigest()
    print(f"  sha256 {h}", file=sys.stderr)
    return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        vgg_p = os.path.join(td, "vgg16.pth")
        lin_p = os.path.join(td, "lin.pth")
        h = _fetch(VGG16_URL, vgg_p)
        if not h.startswith(VGG16_SHA256_PREFIX):
            raise SystemExit(
                f"vgg16 checkpoint hash mismatch: got {h[:8]}, "
                f"pinned {VGG16_SHA256_PREFIX}")
        _fetch(LIN_URL, lin_p)

        # structural validation of the lin head before converting
        import torch
        lin = torch.load(lin_p, map_location="cpu")
        expect_c = [64, 128, 256, 512, 512]
        for i, c in enumerate(expect_c):
            w = lin[f"lin{i}.model.1.weight"]
            assert tuple(w.shape) == (1, c, 1, 1), (i, tuple(w.shape))

        sys.argv = ["convert", "--vgg", vgg_p, "--lin", lin_p,
                    "--out", args.out]
        from convert_lpips_weights import main as convert_main
        convert_main()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
