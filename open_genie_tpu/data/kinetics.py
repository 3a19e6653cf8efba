"""Kinetics-style class-folder video dataset.

Equivalent of the reference's `LightningKinetics`
(`/root/reference/genie/dataset.py:9-93`, a torchvision `Kinetics` wrapper):
a `root/split/<class>/*.{mp4,avi}` tree decoded with OpenCV. Returns
channels-last `(T, H, W, C)` float clips; class labels are available via
`labels`/`classes` for consumers that want them (the generative models
ignore them, as the reference does).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from open_genie_tpu.data.video import HAS_CV2, Platformer2D, VideoDataset


class KineticsFolder(VideoDataset):
    def __init__(
        self,
        root: str,
        split: str = "train",
        frames_per_clip: int = 16,
        step_between_clips: int = 1,
        frame_rate: Optional[int] = None,  # accepted for API compat
        extensions: Tuple[str, ...] = ("avi", "mp4"),
        padding: str = "repeat",
        randomize: bool = False,
        transform=None,
        seed: int = 0,
    ) -> None:
        assert HAS_CV2, "OpenCV is required for Kinetics-style datasets"
        self.root = os.path.join(root, split)
        self.frames_per_clip = frames_per_clip
        self.padding = padding
        self.randomize = randomize
        self.transform = transform or (lambda x: x)
        self.rng = np.random.default_rng(seed)

        self.classes: List[str] = sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )
        self.samples: List[Tuple[str, int]] = []
        for ci, cls in enumerate(self.classes):
            cdir = os.path.join(self.root, cls)
            for f in sorted(os.listdir(cdir)):
                if f.rsplit(".", 1)[-1].lower() in extensions:
                    self.samples.append((os.path.join(cdir, f), ci))

        # Reuse the mp4 slicing machinery.
        self._reader = Platformer2D.__new__(Platformer2D)
        self._reader.padding = padding
        self._reader.rng = self.rng

    @property
    def labels(self) -> List[int]:
        return [ci for _, ci in self.samples]

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> np.ndarray:
        path, _ = self.samples[idx]
        start = None if self.randomize else 0
        video = self._reader.load_video_slice(
            path, self.frames_per_clip, start
        )
        return self.transform(video)

    def get_with_label(self, idx: int) -> Tuple[np.ndarray, int]:
        return self[idx], self.samples[idx][1]
