"""Roofline / MFU accounting for compiled XLA programs.

The reference publishes no utilization numbers (SURVEY.md §6); this module
makes "how far from the hardware ceiling" a first-class, printable fact:
per-program FLOPs and HBM bytes come from XLA's own cost model
(`compiled.cost_analysis()`), peaks from a per-device-kind table, and the
bound classification from comparing achieved arithmetic intensity to the
machine balance (peak_flops / peak_bw), per the standard roofline model
(Williams et al. 2009; jax-ml.github.io/scaling-book's mental model).

Peak numbers are the published per-chip specs (bf16 dense FLOP/s, HBM
bandwidth). Unknown device kinds fall back to v5e with a warning -- the
BASELINE.md target hardware.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

# device_kind substring -> (bf16 peak FLOP/s, HBM bytes/s, label)
PEAKS = (
    ("v6 lite", (918e12, 1640e9, "v6e")),
    ("v6e", (918e12, 1640e9, "v6e")),
    ("v5 lite", (197e12, 819e9, "v5e")),
    ("v5e", (197e12, 819e9, "v5e")),
    ("v5p", (459e12, 2765e9, "v5p")),
    ("v4", (275e12, 1228e9, "v4")),
    ("v3", (123e12, 900e9, "v3")),
    ("v2", (45e12, 700e9, "v2")),
)


@dataclass
class Peaks:
    flops: float  # bf16 FLOP/s
    bw: float  # HBM bytes/s
    label: str

    @property
    def balance(self) -> float:
        """Machine balance (FLOP/byte): programs below it are HBM-bound."""
        return self.flops / self.bw


def device_peaks(device=None) -> Peaks:
    """Peak specs for a jax device (default: first visible device)."""
    import jax

    device = device or jax.devices()[0]
    kind = (getattr(device, "device_kind", "") or "").lower()
    for sub, (f, b, label) in PEAKS:
        if sub in kind:
            return Peaks(f, b, label)
    # CPU test platform or unrecognized kind: report against the BASELINE
    # target chip so numbers stay comparable.
    return Peaks(197e12, 819e9, f"v5e?(kind={kind or 'unknown'})")


def cost_analysis(compiled) -> dict:
    """`{flops, bytes}` from a compiled executable's XLA cost model.

    `compiled` is the result of `jax.jit(f).lower(*args).compile()`.
    Returns zeros if the backend exposes no cost model (never raises --
    profiling tools must degrade, not die)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax: list of dicts
            cost = cost[0] if cost else {}
        return {
            "flops": float(cost.get("flops", 0.0)),
            "bytes": float(cost.get("bytes accessed", 0.0)),
        }
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def summarize(name: str, seconds: float, cost: dict,
              peaks: Optional[Peaks] = None) -> str:
    """One roofline report line: achieved TFLOP/s, MFU, GB/s, %HBM peak,
    and the bound classification (program intensity vs machine balance)."""
    peaks = peaks or device_peaks()
    fl, by = cost.get("flops", 0.0), cost.get("bytes", 0.0)
    tfps = fl / seconds / 1e12
    mfu = fl / seconds / peaks.flops
    gbs = by / seconds / 1e9
    hbm = by / seconds / peaks.bw
    if fl and by:
        intensity = fl / by
        bound = "HBM-bound" if intensity < peaks.balance else "MXU-bound"
        bound += f" (AI {intensity:.0f} vs balance {peaks.balance:.0f} F/B)"
    else:
        bound = "no cost model"
    return (
        f"{name}: {seconds * 1e3:.1f} ms | {fl / 1e9:.2f} GFLOP @ "
        f"{tfps:.2f} TFLOP/s = {mfu * 100:.2f}% MFU [{peaks.label}] | "
        f"{by / 1e6:.1f} MB @ {gbs:.0f} GB/s = {hbm * 100:.1f}% HBM | {bound}"
    )
