#!/usr/bin/env python
"""Pack a video dataset into the native .gvid container.

Sources: a directory tree of mp4s (`root/env/split/*.mp4`, the reference
Platformer2D layout) or the built-in synthetic generator.

  python tools/make_gvid.py --out data/train.gvid --synthetic --num-videos 256
  python tools/make_gvid.py --out data/train.gvid --mp4-root data --env Coinrun --split train
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from open_genie_tpu.data.native import write_gvid  # noqa: E402
from open_genie_tpu.data.video import SyntheticVideo  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--mp4-root", default=None)
    ap.add_argument("--env", default="Coinrun")
    ap.add_argument("--split", default="train")
    ap.add_argument("--num-videos", type=int, default=256)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    if args.synthetic or not args.mp4_root:
        ds = SyntheticVideo(
            num_videos=args.num_videos, num_frames=args.frames,
            height=args.size, width=args.size,
        )
        videos = np.stack([ds[i] for i in range(len(ds))])
    else:
        from open_genie_tpu.data.video import Platformer2D

        ds = Platformer2D(
            root=args.mp4_root, env_name=args.env, split=args.split,
            num_frames=args.frames, padding="repeat",
        )
        videos = np.stack([ds[i] for i in range(len(ds))])

    write_gvid(args.out, videos)
    print(f"wrote {videos.shape} to {args.out}")


if __name__ == "__main__":
    main()
