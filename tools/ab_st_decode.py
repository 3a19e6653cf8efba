"""On-chip A/B of the fused Pallas decode kernels (`ops/pallas/st_decode`).

Runs the canonical rollout bench section (16 frames, 25 MaskGIT
steps/frame, B=1) once per `OGT_PALLAS_DECODE` mode in a fresh
subprocess (modes compile different programs; a fresh process keeps the
dispatch caches honest) and prints a comparison table. The XLA decode
branch (mode unset) is the control.

This is the gate-lifting experiment promised in
`ops/pallas/st_decode.py`: the kernels are parity-pinned on CPU
(tests/test_st_decode_pallas.py) but ship opt-in until a chip run shows
a win. Scratch diagnostics -- not part of the bench contract; results
land in PARITY.md.

Usage: python tools/ab_st_decode.py [--repeats 3] [--modes attn,full]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODES = ("", "attn", "fuse-attn", "full", "fuse")  # "" = XLA control


def run_mode(mode: str, repeats: int, timeout: float) -> dict | None:
    env = dict(os.environ)
    env.pop("OGT_PALLAS_DECODE", None)
    if mode:
        env["OGT_PALLAS_DECODE"] = mode
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--section", "rollout", "--repeats", str(repeats)]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        print(f"  {mode or 'xla':>9}: TIMEOUT after {timeout:.0f}s")
        return None
    dt = time.perf_counter() - t0
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        err = (proc.stderr or proc.stdout).strip().splitlines()
        # surface the actual exception line, not the traceback footer
        tail = [l for l in err if "Error" in l or "error" in l][-2:] or err[-2:]
        print(f"  {mode or 'xla':>9}: FAILED rc={proc.returncode} "
              f"after {dt:.0f}s: {' | '.join(l.strip()[:200] for l in tail)}")
        return None
    result["wall_s"] = dt
    print(f"  {mode or 'xla':>9}: {result['rollout_fps']:6.2f} fps "
          f"(section wall {dt:.0f}s incl. compile)")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--modes", default=None,
                    help="comma list; default: xla control + all kernel modes")
    args = ap.parse_args()
    modes = MODES if args.modes is None else tuple(
        "" if m in ("xla", "") else m for m in args.modes.split(","))

    print(f"# st_decode kernel A/B, rollout 16f x 25spf, repeats={args.repeats}")
    results = {}
    for mode in modes:
        r = run_mode(mode, args.repeats, args.timeout)
        if r:
            results[mode or "xla"] = r
    if "xla" in results:
        base = results["xla"]["rollout_fps"]
        for m, r in results.items():
            if m != "xla":
                print(f"# {m}: {r['rollout_fps'] / base:+.1%} vs XLA"
                      .replace("+-", "-"))
    print(json.dumps({m: r["rollout_fps"] for m, r in results.items()}))


if __name__ == "__main__":
    main()
