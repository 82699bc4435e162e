"""Sustained-throughput report from a run's ``metrics.jsonl``.

The round-4 long-run protocol (docs/results.md): the per-epoch
``train/rays_per_s`` logged by ``_finalize_epoch`` IS the finalize-to-
finalize cycle rate (counts validation, checkpointing, logging).  This
script aggregates it, skipping the first-epoch compile cycle and the
annotated pipeline-drain last cycle.

    python scripts/sustained_rate.py <log_dir>/<exp_name>/metrics.jsonl
"""
import json
import sys

import numpy as np


def report(path: str, skip_first: int = 1, skip_last: int = 1):
    recs = [json.loads(l) for l in open(path)]
    rates = [r["train/rays_per_s"] for r in recs if "train/rays_per_s" in r]
    times = [r["time"] for r in recs if "train/rays_per_s" in r]
    n = len(rates)
    if n == 0:
        sys.exit("no train/rays_per_s records (only the vanilla trainer "
                 "logs the finalize-to-finalize rate)")
    core = rates[skip_first: n - skip_last] if n > skip_first + skip_last else rates
    # cycle stats over the SAME core window as the rates: dts[i] is the
    # cycle ending at times[i+1], so the core cycles are dts[skip_first-1
    # : -skip_last] (the compile cycle precedes times[0] entirely, but a
    # late-compiled remainder program or the drain cycle would otherwise
    # skew the mean against the reported rays/s)
    dts = np.diff(times)
    core_dts = (dts[max(0, skip_first - 1): len(dts) - skip_last]
                if len(dts) > skip_first + skip_last else dts)
    out = {
        "epochs": n,
        "mean_rays_per_s": round(float(np.mean(core)), 1),
        "median_rays_per_s": round(float(np.median(core)), 1),
        "p5_rays_per_s": round(float(np.percentile(core, 5)), 1),
        "mean_cycle_s": round(float(np.mean(core_dts)), 3) if len(core_dts) else None,
        "wall_s": round(times[-1] - times[0], 1) if n > 1 else None,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    report(sys.argv[1], *(int(a) for a in sys.argv[2:]))
