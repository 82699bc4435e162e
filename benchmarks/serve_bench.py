"""Serving benchmark: measured req/s + latency for the batching render
server under concurrent clients (VERDICT round-3 item 1).

Starts ``tools/serve.py``'s server in-process (random-init weights unless
--ckpt_path is given — serving throughput does not depend on the weights),
fires C concurrent HTTP clients issuing real requests, and reports req/s,
p50/p95 latency per concurrency level, A/B with batching disabled
(--max_batch 1) to isolate what coalescing buys.  On the remote-tunneled
TPU each device dispatch costs ~0.5 s of latency regardless of batch size,
so coalescing 16 requests into one program is the difference between a
serving story and a convoy.

Reference analog: offline batched inference ``/root/reference/eval.py:58-86``
(no server, no concurrency).

Run (real TPU):
    python benchmarks/serve_bench.py --img_wh 200 --n_requests 48
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def percentile(xs, p):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    k = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
    return xs[k]


def run_clients(url: str, wh: int, concurrency: int, n_requests: int):
    """C threads issue n_requests total (round-robin thetas); returns
    (elapsed_s, per-request latencies)."""
    lat: list = []
    lock = threading.Lock()
    per = [n_requests // concurrency] * concurrency
    for i in range(n_requests - sum(per)):
        per[i] += 1

    def client(cid: int, n: int):
        for j in range(n):
            theta = 0.1 * (cid + concurrency * j)
            t0 = time.monotonic()
            with urllib.request.urlopen(
                f"{url}/render?theta={theta}&img_wh={wh}&format=npy",
                timeout=600,
            ) as r:
                r.read()
            dt = time.monotonic() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client, args=(i, per[i]))
               for i in range(concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.monotonic() - t0, lat


def bench_server(ckpt: str, wh: int, max_batch: int, max_wait_ms: float,
                 levels, n_requests: int, n_samples: int, n_importance: int):
    from nerf_pl_tpu.tools.serve import build_server, get_opts

    args = get_opts([
        "--ckpt_path", ckpt, "--port", "0", "--img_wh", str(wh),
        "--N_samples", str(n_samples), "--N_importance", str(n_importance),
        "--max_batch", str(max_batch), "--max_wait_ms", str(max_wait_ms),
    ])
    print(f"[serve_bench] warming max_batch={max_batch} "
          f"(tiers compile once each)...", flush=True)
    t0 = time.monotonic()
    srv = build_server(args)
    print(f"[serve_bench] warm in {time.monotonic() - t0:.1f}s", flush=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    rows = []
    for c in levels:
        b0 = srv.service.batches
        elapsed, lat = run_clients(url, wh, c, n_requests)
        rows.append({
            "max_batch": max_batch,
            "concurrency": c,
            "n_requests": n_requests,
            "req_per_s": round(n_requests / elapsed, 2),
            "p50_ms": round(percentile(lat, 50) * 1e3, 1),
            "p95_ms": round(percentile(lat, 95) * 1e3, 1),
            "device_batches": srv.service.batches - b0,
        })
        print(json.dumps(rows[-1]), flush=True)
    srv.shutdown()
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", default=None)
    ap.add_argument("--img_wh", type=int, default=200)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=64)
    ap.add_argument("--n_requests", type=int, default=48)
    ap.add_argument("--levels", type=int, nargs="*", default=[1, 4, 16])
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    ap.add_argument("--skip_unbatched", action="store_true",
                    help="skip the max_batch=1 A/B baseline")
    ap.add_argument("--out", default=None, help="write rows as JSON here")
    args = ap.parse_args(argv)

    ckpt = args.ckpt_path
    if ckpt is None:
        import jax

        from nerf_pl_tpu.models.nerf import init_nerf
        from nerf_pl_tpu.training.checkpoints import save_checkpoint

        ckpt = tempfile.mktemp(suffix=".ckpt")
        save_checkpoint(ckpt, {"params": {
            "coarse": init_nerf(jax.random.PRNGKey(0)),
            "fine": init_nerf(jax.random.PRNGKey(1)),
        }})

    rows = bench_server(ckpt, args.img_wh, args.max_batch, args.max_wait_ms,
                        args.levels, args.n_requests, args.N_samples,
                        args.N_importance)
    if not args.skip_unbatched:
        rows += bench_server(ckpt, args.img_wh, 1, args.max_wait_ms,
                             args.levels, args.n_requests, args.N_samples,
                             args.N_importance)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    print(json.dumps({"serve_bench": rows}))


if __name__ == "__main__":
    main()
