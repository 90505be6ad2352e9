#!/usr/bin/env python
"""Multi-seed int8 accuracy-gate sweep + per-stage sensitivity table.

Round-3 left two open int8 questions (VERDICT r3 weak #3):

  1. int8-head-static's re_5 came back 93.8 once vs 100 before — noise
     or regression?  Answer: run the overfit gate over N seeds and
     report mean +- spread per mode, bf16 included as the noise floor.
  2. every trunk-quantized mode loses rotation (re_5 <= 43.8) with only
     a compounded-error hypothesis.  Answer: quantize ONE trunk stage
     at a time (overfit_synth --int8-stages -> int8-trunk0..3) and
     attribute the loss per stage.

Each seed is a fresh scene render + fresh model init + fresh 300-step
train (tools/overfit_synth.py --seed S --int8 --int8-stages), run in a
subprocess so jit caches and RNG never leak across seeds.  Aggregated
table goes to stdout; raw per-seed JSON to --out.

Usage (chip, ~8 min/seed):
    python tools/int8_gate_sweep.py --seeds 3 [--mesh tetra] \
        --out /tmp/int8_sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

# values may be "nan" on a degenerate eval — parse them, don't drop the
# whole RESULT line (a dropped tag used to KeyError the aggregation
# AFTER all seeds had already burned their chip time)
_NUM = r"(?:[\d.]+|nan|inf)"
RESULT_RE = re.compile(
    r"RESULT\[(?P<tag>[^\]]+)\] ad_10=(?P<ad_10>%s) "
    r"re_5=(?P<re_5>%s) te_2=(?P<te_2>%s) AUCad=(?P<AUCad>%s)"
    % (_NUM, _NUM, _NUM, _NUM))


def run_seed(seed: int, mesh: str, workdir: str) -> dict[str, dict]:
    cmd = [sys.executable, "tools/overfit_synth.py", "--mesh", mesh,
           "--int8", "--int8-stages", "--seed", str(seed),
           "--out", os.path.join(workdir, f"seed{seed}")]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=2400,  # a hung seed must not block the sweep forever
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"seed {seed} failed rc={proc.returncode}")
    out: dict[str, dict] = {}
    for m in RESULT_RE.finditer(proc.stdout):
        out[m.group("tag")] = {k: float(m.group(k))
                               for k in ("ad_10", "re_5", "te_2", "AUCad")}
    if not out:
        raise RuntimeError(f"seed {seed}: no RESULT lines parsed")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--mesh", default="tetra",
                   help="tetra = asymmetric, the rotation-sensitive rig")
    p.add_argument("--out", default="/tmp/int8_sweep.json")
    p.add_argument("--workdir", default="/tmp/int8_sweep")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    per_seed = {}
    for s in range(args.seeds):
        per_seed[s] = run_seed(s, args.mesh, args.workdir)
        print(f"seed {s} done: "
              + ", ".join(f"{t}:re_5={v['re_5']:.1f}"
                          for t, v in per_seed[s].items()))

    # union of tags in first-seen order, tolerant of a seed missing one
    # (crashed/unparsed mode): aggregate over the seeds that have it
    tags = list(dict.fromkeys(
        t for res in per_seed.values() for t in res))
    print(f"\n{args.seeds}-seed gate sweep ({args.mesh}):")
    print(f"{'mode':>18} | " + " | ".join(
        f"{k:>16}" for k in ("ad_10", "re_5", "te_2", "AUCad")))
    agg = {}
    for t in tags:
        row = {}
        have = [s for s in per_seed if t in per_seed[s]]
        if len(have) < len(per_seed):
            print(f"WARNING: {t} present in only {len(have)}/"
                  f"{len(per_seed)} seeds")
        for k in ("ad_10", "re_5", "te_2", "AUCad"):
            vals = [per_seed[s][t][k] for s in have]
            lo, hi = min(vals), max(vals)
            mean = sum(vals) / len(vals)
            row[k] = {"mean": mean, "min": lo, "max": hi}
        agg[t] = row
        print(f"{t:>18} | " + " | ".join(
            f"{row[k]['mean']:6.1f} [{row[k]['min']:5.1f}-"
            f"{row[k]['max']:5.1f}]" for k in row))

    with open(args.out, "w") as f:
        json.dump({"mesh": args.mesh, "seeds": args.seeds,
                   "per_seed": {str(k): v for k, v in per_seed.items()},
                   "aggregate": agg}, f, indent=1)
    print(f"\nraw -> {args.out}")


if __name__ == "__main__":
    main()
