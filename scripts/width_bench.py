"""--arch_width bench: train-step throughput at non-reference trunk widths.

The width-ceiling study (docs/results.md) showed the MXU runs bias+relu
chains at ~175 TF/s at widths 1024-2048 but only ~107 at the reference's
W=256 — per-layer latency dominates small widths.  ``--arch_width``
exposes the wide tier for research/serving variants; this script measures
what it actually delivers end to end (full coarse+fine render, fwd+bwd+
adam, same scan-program shape as bench.py), plus model TFLOP/s so the
number is comparable across widths.

Run (real TPU):
    python scripts/width_bench.py --widths 256 1024 --batch 4096 --iters 20
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mlp_flops_per_point(W: int, D: int = 8, cx: int = 63, cd: int = 27) -> float:
    """Forward matmul FLOPs per sample point (2*m*n per (m,n) matvec)."""
    f = 2 * cx * W                      # layer 0
    f += (D - 2) * 2 * W * W            # layers 1..7 minus the skip layer
    f += 2 * (W + cx) * W               # skip layer
    f += 2 * W * 1                      # sigma head
    f += 2 * W * W                      # xyz_final
    f += 2 * (W + cd) * (W // 2)        # dir layer
    f += 2 * (W // 2) * 3               # rgb head
    return float(f)


def make_scan_steps(optimizer, compute_dtype, iters, remat_fine):
    """bench.py's scan program + the --remat_fine escape hatch (wide
    widths: the XLA path's f32 residuals at W>=1024 OOM without remat)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_pl_tpu.ops.rendering import render_rays

    def loss_fn(params, rays, rgbs, key):
        out = render_rays(
            params["coarse"], params["fine"], rays, key,
            N_samples=64, N_importance=128, perturb=1.0, noise_std=1.0,
            white_back=True, compute_dtype=compute_dtype,
            use_fused=jax.default_backend() == "tpu",
            fused_channel_io=True, remat_fine=remat_fine,
        )
        return jnp.mean((out["rgb_coarse"] - rgbs) ** 2) + jnp.mean(
            (out["rgb_fine"] - rgbs) ** 2
        )

    @jax.jit
    def run(params, opt_state, rays, rgbs, key):
        def body(carry, i):
            params, opt_state = carry
            k = jax.random.fold_in(key, i)
            loss, grads = jax.value_and_grad(loss_fn)(params, rays, rgbs, k)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(iters)
        )
        return params, opt_state, losses[-1]

    return run


def bench_width(width: int, batch: int, iters: int, n_coarse=64, n_fine=128,
                remat_fine=False):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _make_rays
    from nerf_pl_tpu.models.nerf import init_nerf

    key = jax.random.PRNGKey(0)
    kc, kf = jax.random.split(key)
    params = {"coarse": init_nerf(kc, W=width), "fine": init_nerf(kf, W=width)}
    optimizer = optax.adam(5e-4, eps=1e-8)
    opt_state = optimizer.init(params)
    rays = _make_rays(jax.random.fold_in(key, 1), batch)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (batch, 3))
    run = make_scan_steps(optimizer, jnp.bfloat16, iters, remat_fine)

    p, o, loss = run(params, opt_state, rays, rgbs, jax.random.fold_in(key, 9))
    float(loss)
    t0 = time.perf_counter()
    p, o, loss = run(p, o, rays, rgbs, jax.random.fold_in(key, 10))
    final = float(loss)
    dt = time.perf_counter() - t0
    assert jnp.isfinite(final), final

    rays_s = batch * iters / dt
    # points/ray: coarse pass n_coarse + fine pass (n_coarse + n_fine)
    pts_per_ray = n_coarse + (n_coarse + n_fine)
    # fwd+bwd ~= 3x fwd matmul work (dgrad + wgrad)
    model_tf = rays_s * pts_per_ray * 3 * mlp_flops_per_point(width) / 1e12
    return {
        "width": width,
        "batch": batch,
        "remat_fine": remat_fine,
        "rays_per_s": round(rays_s, 1),
        "pts_per_s": round(rays_s * pts_per_ray, 1),
        "model_tflops_fwd_bwd": round(model_tf, 1),
        "sec_per_step": round(dt / iters, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat_fine", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "tpu":
        from nerf_pl_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()

    rows = []
    for w in args.widths:
        try:
            r = bench_width(w, args.batch, args.iters,
                            remat_fine=args.remat_fine)
        except Exception as e:  # noqa: BLE001 — keep measuring other widths
            r = {"width": w, "batch": args.batch,
                 "error": f"{type(e).__name__}: {str(e)[:160]}"}
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
