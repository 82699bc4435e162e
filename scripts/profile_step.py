"""Profiler artifact for the flagship train step (VERDICT round-3 item 7).

Runs the exact bench.py program (batch 4096, 64c+192f samples, bf16 fused
kernels, stash backward, fwd+bwd+adam inside one ``lax.scan``) under
``jax.profiler.trace`` on the real chip, then parses the trace-viewer JSON
into a per-op device-time table so the overlap claims in docs/kernels.md
are backed by a trace instead of derived timings.

Reference analog: the reference has no profiling story; its published
0.12 s/step (README.md:136-142) is a wall-clock anchor only.

Run (real TPU):
    python scripts/profile_step.py --iters 10 --out benchmarks/profile_flagship.json

Outputs ONE json artifact: per-op totals (microseconds, count, share of
device time), grouped into MLP-kernel vs non-MLP buckets, plus the raw
top-N rows for the docs table.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_traced(iters: int, batch: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_params, _make_rays
    from bench import make_scan_steps

    key = jax.random.PRNGKey(0)
    params = _flagship_params(key)
    optimizer = optax.adam(5e-4, eps=1e-8)
    opt_state = optimizer.init(params)
    rays = _make_rays(jax.random.fold_in(key, 1), batch)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (batch, 3))
    run = make_scan_steps(optimizer, jnp.bfloat16, iters)

    # compile + warmup outside the trace window
    p, o, loss = run(params, opt_state, rays, rgbs, jax.random.fold_in(key, 9))
    float(loss)

    with jax.profiler.trace(trace_dir):
        p, o, loss = run(p, o, rays, rgbs, jax.random.fold_in(key, 10))
        float(loss)  # host fetch = sync; keeps the whole run in-window
    return iters


def load_trace_events(trace_dir: str):
    """Trace-viewer JSON: complete events (ph=X) on named process/thread
    lanes; metadata events (ph=M) name them."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    return doc.get("traceEvents", doc if isinstance(doc, list) else [])


def summarize(events, iters: int):
    # lane names: pid/tid -> name, via metadata events
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    def is_device_lane(pid, tid):
        pn = pid_names.get(pid, "")
        tn = tid_names.get((pid, tid), "")
        txt = f"{pn} {tn}".lower()
        # XProf device lanes: "/device:TPU:0" process with per-core
        # "XLA Op"/"Steps"/"TensorFlow Ops" style threads; host lanes say
        # python/Thread. Keep lanes that mention tpu/xla ops.
        return ("tpu" in txt or "xla" in txt) and "python" not in txt

    per_op = {}
    lanes = set()
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if not is_device_lane(pid, tid):
            continue
        tn = tid_names.get((pid, tid), "").lower()
        # keep op-level lanes, not step/annotation/whole-module aggregates
        if "step" in tn:
            continue
        if "module" in tn:
            # whole-program span (one per dispatch) = the step-time anchor
            module_us += float(e["dur"])
            continue
        lanes.add((pid_names.get(pid, ""), tid_names.get((pid, tid), "")))
        name = e["name"]
        # the while-loop wrapper on the op lane nests every op below it —
        # counting it would double the total
        if name.startswith(("while", "jit_", "body")):
            continue
        rec = per_op.setdefault(name, {"us": 0.0, "count": 0})
        rec["us"] += float(e["dur"])
        rec["count"] += 1
    total_us = sum(r["us"] for r in per_op.values())
    rows = [
        {
            "op": name,
            "total_us": round(rec["us"], 1),
            "count": rec["count"],
            "us_per_step": round(rec["us"] / max(iters, 1), 1),
            "pct": round(100.0 * rec["us"] / max(total_us, 1e-9), 2),
        }
        for name, rec in sorted(
            per_op.items(), key=lambda kv: -kv[1]["us"]
        )
    ]
    return rows, total_us, module_us, sorted(lanes)


def bucket(rows):
    """MLP-kernel vs everything else, by op name.  The fused Pallas MLP
    custom-vjp shows up on the op lane as ``jvp__.N`` (differentiated
    forward, stash-writing) and ``transpose_jvp___.N`` (stash backward)
    spans; the searchsorted Pallas kernel keeps its jit name."""
    def kind(op):
        o = op.lower()
        if any(k in o for k in ("sort", "searchsorted", "rank", "sample")):
            return "sampling_sort"
        if o.startswith(("jvp", "transpose_jvp")) or "mosaic" in o or \
                "custom-call" in o or "custom_call" in o:
            return "pallas_mlp"
        return "other_xla"

    agg = {}
    for r in rows:
        agg.setdefault(kind(r["op"]), 0.0)
        agg[kind(r["op"])] += r["total_us"]
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--trace_dir", default="/tmp/flagship_trace")
    ap.add_argument("--out", default="benchmarks/profile_flagship.json")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", action="store_true",
                    help="re-parse an existing trace_dir without rerunning")
    args = ap.parse_args()

    import jax

    if not args.parse_only:
        if jax.default_backend() == "tpu":
            from nerf_pl_tpu.utils.profiling import enable_compilation_cache

            enable_compilation_cache()
        os.makedirs(args.trace_dir, exist_ok=True)
        run_traced(args.iters, args.batch, args.trace_dir)
    iters = args.iters
    events = load_trace_events(args.trace_dir)
    rows, total_us, module_us, lanes = summarize(events, iters)
    out = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "iters": iters,
        "step_ms_from_module_span": round(module_us / max(iters, 1) / 1e3, 2),
        "op_lane_total_us_per_step": round(total_us / max(iters, 1), 1),
        "lanes": [" / ".join(l) for l in lanes],
        "buckets_us_per_step": {
            k: round(v / max(iters, 1), 1) for k, v in bucket(rows).items()
        },
        "top_ops": rows[: args.top],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("backend", "step_ms_from_module_span",
                       "op_lane_total_us_per_step", "buckets_us_per_step")}))
    print(f"wrote {args.out} ({len(rows)} ops)")


if __name__ == "__main__":
    main()
