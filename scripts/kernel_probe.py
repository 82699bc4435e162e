"""Micro-probe of the fused-MLP kernel configs on the real TPU.

Times kernel-only throughput (TFLOP/s on the padded matmul work) for the
forward and fwd+bwd paths across block sizes, plus the pre-embedded kernel
(no in-kernel sin/cos) to isolate whether the VPU transcendental pipeline
bounds the forward pass.

Each measured computation depends on the scan carry (backend gotcha: loop-
invariant code gets hoisted), and timing syncs by fetching a scalar.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.models.embedding import posenc
from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.ops import fused_mlp as fm

P = 4096 * 192  # fine-pass point count at batch 4096
ITERS = 20
MACS_PER_PT = 686_000  # padded MACs/pt fwd (see fused_mlp.py layer dims)


def report(name, dt, flops_factor):
    tf = flops_factor * 2 * MACS_PER_PT * P * ITERS / dt / 1e12
    print(f"{name:40s} {dt/ITERS*1e3:8.2f} ms/iter  {tf:7.1f} TF/s", flush=True)


def timeit(name, step, flops_factor):
    @jax.jit
    def go(c0):
        def body(c, _):
            return step(c), ()

        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    c = float(go(jnp.float32(0.0)))  # compile + warm
    t0 = time.perf_counter()
    c = float(go(jnp.float32(c * 1e-30)))
    dt = time.perf_counter() - t0
    assert np.isfinite(c)
    report(name, dt, flops_factor)


def main():
    key = jax.random.PRNGKey(0)
    params = init_nerf(key)
    xyz = jax.random.normal(jax.random.fold_in(key, 1), (P, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    x_emb = jnp.pad(
        jnp.concatenate([posenc(xyz, 10), posenc(dirs, 4)], axis=1),
        ((0, 0), (0, fm.CIN - 90)),
    )

    def raw_fwd(block):
        def step(c):
            out = fm.fused_nerf_apply_raw(
                params, xyz + c * 1e-20, dirs, block=(block, block)
            )
            return jnp.mean(out)

        return step

    def padded_fwd(block):
        def step(c):
            out = fm.fused_nerf_apply(params, (x_emb + c * 1e-20)[:, :90],
                                      block=block)
            return jnp.mean(out)

        return step

    def raw_grad(bf, bb):
        def loss(p, c):
            out = fm.fused_nerf_apply_raw(p, xyz + c * 1e-20, dirs,
                                          block=(bf, bb))
            return jnp.mean(out**2)

        def step(c):
            g = jax.grad(loss)(params, c)
            return jnp.mean(g["xyz_layers"][0]["w"])

        return step

    for blk in (1024, 2048):
        try:
            timeit(f"raw fwd block={blk}", raw_fwd(blk), 1)
        except Exception as e:
            print(f"raw fwd block={blk} FAILED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)
    try:
        timeit("padded fwd block=1024 (no sin/cos)", padded_fwd(1024), 1)
    except Exception as e:
        print(f"padded fwd FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)
    for bf, bb in ((1024, 512), (2048, 512), (1024, 256)):
        try:
            timeit(f"raw fwd+bwd blocks=({bf},{bb})", raw_grad(bf, bb), 4)
        except Exception as e:
            print(f"raw fwd+bwd ({bf},{bb}) FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
