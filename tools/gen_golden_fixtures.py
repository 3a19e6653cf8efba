"""Generate golden parity fixtures by RUNNING the reference implementation.

Produces `tests/fixtures/golden_reference.npz`: inputs, parameters, and
reference outputs for the deterministic numeric contracts SURVEY.md §4 /
BASELINE.md pin:

  * CausalConv3d left-pad outputs over stride/dilation/kernel cases
    (`/root/reference/genie/module/video.py:106-200`)
  * LFQ codes / indices / entropy+commit loss terms
    (`/root/reference/genie/module/quantization.py:78-133`)
  * MaskGIT schedules, linear/cosine/arccos
    (`/root/reference/genie/dynamics.py:167-195`)
  * Hinge GAN loss values (`/root/reference/genie/module/loss.py:161-162`)

Run offline (torch-capable box): `python tools/gen_golden_fixtures.py`.
The committed .npz is the test dependency -- torch is NOT needed to run
the test suite (`tests/test_golden_parity.py`).
"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
sys.path.insert(0, REF)

# The reference package __init__ pulls in torchvision + lightning, which
# this image lacks and the fixtures don't need -- stub them so the numeric
# modules (video/quantization/dynamics) import cleanly.
import types  # noqa: E402


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _LightningModule:
    pass


tv = _stub("torchvision")
tv.models = _stub("torchvision.models", get_model=lambda *a, **k: None)
_stub(
    "lightning",
    LightningModule=_LightningModule,
    pytorch=_stub("lightning.pytorch"),
)
sys.modules["lightning.pytorch"].callbacks = _stub(
    "lightning.pytorch.callbacks", Callback=object
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_reference.npz",
)

torch.manual_seed(0)
rng = np.random.default_rng(0)
data: dict = {}


# ------------------------------------------------------------------ #
# 1. CausalConv3d: stride / dilation / kernel cases
# ------------------------------------------------------------------ #
from genie.module.video import CausalConv3d  # noqa: E402

CONV_CASES = {
    "k3": dict(kernel_size=3),
    "k3_s2": dict(kernel_size=3, stride=2),
    "k3_d2": dict(kernel_size=3, dilation=2),
    "k1": dict(kernel_size=1),
    "k311": dict(kernel_size=(3, 1, 1)),
    "k3_st211": dict(kernel_size=3, stride=(2, 1, 1)),
}
C_IN, C_OUT = 2, 3
x_conv = rng.standard_normal((1, C_IN, 5, 6, 6)).astype(np.float32)
data["conv/input"] = x_conv  # channels-first (B, C, T, H, W)

for name, kw in CONV_CASES.items():
    layer = CausalConv3d(C_IN, C_OUT, **kw)
    w = rng.standard_normal(tuple(layer.conv3d.weight.shape)).astype(np.float32) * 0.2
    b = rng.standard_normal(C_OUT).astype(np.float32) * 0.1
    with torch.no_grad():
        layer.conv3d.weight.copy_(torch.from_numpy(w))
        layer.conv3d.bias.copy_(torch.from_numpy(b))
        y = layer(torch.from_numpy(x_conv)).numpy()
    data[f"conv/{name}/weight"] = w  # (O, I, kt, kh, kw)
    data[f"conv/{name}/bias"] = b
    data[f"conv/{name}/out"] = y    # (B, O, T', H', W')


# ------------------------------------------------------------------ #
# 2. LFQ: codes / indices (eval) + loss terms (train)
# ------------------------------------------------------------------ #
from genie.module.quantization import LookupFreeQuantization  # noqa: E402

D_LFQ = 6
x_lfq = rng.standard_normal((2, 40, D_LFQ)).astype(np.float32)
lfq = LookupFreeQuantization(codebook_dim=D_LFQ, input_dim=D_LFQ)  # no proj
lfq.eval()
with torch.no_grad():
    (codes, idxs), _ = lfq(torch.from_numpy(x_lfq))
data["lfq/input"] = x_lfq
data["lfq/codes"] = codes.numpy()
data["lfq/idxs"] = idxs.numpy().astype(np.int64)

# Training-mode loss terms at a beta where the 64-code softmax is benign.
BETA = 1.0
lfq.train()
(codes_t, _), loss = lfq(torch.from_numpy(x_lfq), beta=BETA)
inp = torch.from_numpy(x_lfq).reshape(2, 40, 1, D_LFQ)
from genie.module.quantization import entropy as ref_entropy  # noqa: E402
from einops import einsum, rearrange, reduce  # noqa: E402

inp_prob = (2 * einsum(inp, lfq.codebook, "... i d, j d -> ... i j") * BETA).softmax(-1)
inp_prob = rearrange(inp_prob, "b n ... -> (b n) ...")
avg_prob = reduce(inp_prob, "... c d -> c d", "mean")
data["lfq/beta"] = np.float32(BETA)
data["lfq/sample_entropy"] = ref_entropy(inp_prob).mean().detach().numpy()
data["lfq/avg_entropy"] = ref_entropy(avg_prob).mean().detach().numpy()
data["lfq/commit_loss"] = (
    torch.nn.functional.mse_loss(inp, inp.sign().detach()).detach().numpy()
)
data["lfq/total_loss"] = loss.detach().numpy()  # inp_ent + 1.0*avg_ent, *0.1 + commit*0.25


# ------------------------------------------------------------------ #
# 3. MaskGIT schedules
# ------------------------------------------------------------------ #
import importlib  # noqa: E402

dyn_mod = importlib.import_module("genie.dynamics")
DynamicsModel = dyn_mod.DynamicsModel
get_schedule = DynamicsModel.get_schedule

for steps in (8, 16, 25):
    for which in ("linear", "cosine", "arccos"):
        sch = get_schedule(None, steps, (16, 16), which=which)
        data[f"schedule/{which}/{steps}"] = sch.numpy().astype(np.int64)


# ------------------------------------------------------------------ #
# 4. Hinge GAN loss values on fixed scores
# ------------------------------------------------------------------ #
fake = rng.standard_normal(32).astype(np.float32) * 2
real = rng.standard_normal(32).astype(np.float32) * 2
fs, rs = torch.from_numpy(fake), torch.from_numpy(real)
data["hinge/fake_scores"] = fake
data["hinge/real_scores"] = real
data["hinge/gen_loss"] = (-fs.mean()).numpy()
data["hinge/dis_loss"] = (
    (torch.relu(1 + fs) + torch.relu(1 - rs)).mean().numpy()
)

# ------------------------------------------------------------------ #
# 5. VGG16 trunk golden activations (torchvision semantics)
# ------------------------------------------------------------------ #
# torchvision cannot be installed here, but its vgg16().features layer
# sequence is fixed public architecture: Conv2d(3x3, pad 1) + ReLU per cfg
# entry, MaxPool2d(2,2) at 'M'. Weights are generated DETERMINISTICALLY
# (seeded numpy, He-ish scale) so the test rebuilds them without the .npz
# having to ship 60 MB of floats; only activations are stored.
import torch.nn as tnn  # noqa: E402

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
VGG_TAPS = ("features.6", "features.13", "features.18", "features.25")
VGG_SEED = 1234


def vgg_random_state_dict():
    """Deterministic torchvision-named state dict (shared with the test)."""
    vrng = np.random.default_rng(VGG_SEED)
    state = {}
    idx, c_in = 0, 3
    for entry in VGG16_CFG:
        if entry == "M":
            idx += 1
            continue
        fan = 9 * c_in
        state[f"features.{idx}.weight"] = (
            vrng.standard_normal((entry, c_in, 3, 3)) / np.sqrt(fan)
        ).astype(np.float32)
        state[f"features.{idx}.bias"] = (
            vrng.standard_normal(entry) * 0.01
        ).astype(np.float32)
        c_in = entry
        idx += 2  # conv + relu
    return state


def build_torch_vgg_features():
    layers = []
    c_in = 3
    for entry in VGG16_CFG:
        if entry == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(c_in, entry, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            c_in = entry
    return tnn.Sequential(*layers)


vgg = build_torch_vgg_features()
vgg_state = vgg_random_state_dict()
vgg.load_state_dict({
    k[len("features."):]: torch.from_numpy(v) for k, v in vgg_state.items()
})
vgg.eval()

x_vgg = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
data["vgg/input"] = x_vgg  # (B, 3, H, W) channels-first
want_idx = {int(t.split(".")[1]) for t in VGG_TAPS}
with torch.no_grad():
    h = torch.from_numpy(x_vgg)
    for i, layer in enumerate(vgg):
        h = layer(h)
        if i in want_idx:
            data[f"vgg/tap/{i}"] = h.numpy()  # (B, C, H', W')
        if i >= max(want_idx):
            break
data["vgg/seed"] = np.int64(VGG_SEED)


# ------------------------------------------------------------------ #
# 6. RoPE: RotaryEmbedding outputs per kind/offset
# ------------------------------------------------------------------ #
from genie.module.attention import RotaryEmbedding  # noqa: E402

D_ROPE = 8
x_rope = rng.standard_normal((2, 6, D_ROPE)).astype(np.float32)
data["rope/input"] = x_rope
for kind in ("1d", "2d", "const"):
    rot = RotaryEmbedding(D_ROPE, kind=kind)
    with torch.no_grad():
        data[f"rope/{kind}/out"] = rot(torch.from_numpy(x_rope)).numpy()
        data[f"rope/{kind}/out_off3"] = rot(
            torch.from_numpy(x_rope), offset=3
        ).numpy()


os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **data)
print(f"wrote {OUT}: {len(data)} arrays")
for k in sorted(data):
    v = np.asarray(data[k])
    print(f"  {k}: {v.shape} {v.dtype}")
