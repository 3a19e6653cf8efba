"""VGG16 feature extractor (Flax) for the perceptual loss.

TPU-native replacement for the reference's torchvision VGG16 + forward-hook
probes (`/root/reference/genie/module/loss.py:34-103`,
`genie/module/misc.py:13-69`): instead of mutating hooks, the network
returns the requested intermediate activations explicitly.

Layer naming follows torchvision's `vgg16().features` indices so the
reference's `feat_layers` strings (e.g. 'features.6', 'features.13') work
unchanged, and so converted torchvision weights map one-to-one. Use
`tools/convert_vgg_weights.py` to convert a torchvision `state_dict` to the
`.npz` this module loads (pretrained weights cannot be downloaded in an
egress-free environment; with no weight file the loss still functions as a
random-feature perceptual metric, which is well-defined and commonly used).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 `features` schedule: (layer_index, out_channels) for
# convs; 'M' marks maxpool. ReLU indices are conv_index + 1.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]

VGG16_RELU_LAYERS = [
    "features.1", "features.3", "features.6", "features.8", "features.11",
    "features.13", "features.15", "features.18", "features.20", "features.22",
    "features.25", "features.27", "features.29",
]


def _layer_schedule():
    """Yield (torchvision_index, kind, features) covering the conv stack."""
    idx = 0
    for entry in VGG16_CFG:
        if entry == "M":
            yield idx, "pool", None
            idx += 1
        else:
            yield idx, "conv", entry
            idx += 1
            yield idx, "relu", None
            idx += 1


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning feature taps at `feat_layers`.

    Input: `(B, H, W, 3)` channels-last frames in [0, 1] (the reference
    feeds raw frames with no ImageNet normalization, `loss.py:92-99`;
    replicated here).
    """

    feat_layers: Tuple[str, ...] = (
        "features.6", "features.13", "features.18", "features.25",
    )

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        taps = {}
        want = set(self.feat_layers)
        max_wanted = max(
            int(name.split(".")[1]) for name in want if name.startswith("features.")
        )
        for idx, kind, features in _layer_schedule():
            if kind == "conv":
                x = nn.Conv(
                    features,
                    kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)),
                    name=f"conv_{idx}",
                )(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            name = f"features.{idx}"
            if name in want:
                taps[name] = x
            if idx >= max_wanted:
                break
        missing = want - set(taps)
        assert not missing, f"feat_layers not found in VGG16 trunk: {missing}"
        return taps


def load_torch_vgg16_npz(path: str) -> dict:
    """Load converted torchvision VGG16 weights into this module's params.

    The `.npz` holds `features.{i}.weight` (OIHW) / `features.{i}.bias`
    arrays as produced by `tools/convert_vgg_weights.py`.
    """
    data = np.load(path)
    params = {}
    for idx, kind, _ in _layer_schedule():
        if kind != "conv":
            continue
        w = data[f"features.{idx}.weight"]  # (O, I, kh, kw)
        b = data[f"features.{idx}.bias"]
        params[f"conv_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
            "bias": jnp.asarray(b),
        }
    return {"params": params}
