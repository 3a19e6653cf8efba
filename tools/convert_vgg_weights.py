#!/usr/bin/env python
"""Convert a torchvision VGG16 state_dict to the .npz loaded by
`open_genie_tpu.modules.vgg.load_torch_vgg16_npz`.

Run on any machine with the torchvision checkpoint available (this
environment has no network egress to fetch it):

  python tools/convert_vgg_weights.py vgg16-397923af.pth vgg16.npz

Accepts either a raw `state_dict` .pth or a torchvision model file.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="torchvision vgg16 .pth state_dict")
    ap.add_argument("dst", help="output .npz")
    args = ap.parse_args()

    import torch

    obj = torch.load(args.src, map_location="cpu", weights_only=False)
    state = obj.state_dict() if hasattr(obj, "state_dict") else obj

    out = {}
    for k, v in state.items():
        if k.startswith("features.") and (
            k.endswith(".weight") or k.endswith(".bias")
        ):
            out[k] = v.detach().cpu().numpy().astype(np.float32)
    assert out, "no features.* conv params found -- is this a VGG16 state_dict?"
    np.savez(args.dst, **out)
    print(f"wrote {len(out)} arrays to {args.dst}")


if __name__ == "__main__":
    main()
