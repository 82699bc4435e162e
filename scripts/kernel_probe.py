"""Micro-probe of the fused-MLP kernel configs on the real TPU.

Times kernel-only throughput (TFLOP/s on the padded matmul work) for:
  * the production raw fwd / fwd+bwd kernels at candidate block sizes;
  * the pre-embedded kernel (no in-kernel sin) to isolate the embed cost;
  * two bare matmul-chain kernels (pure bf16 chain vs +bias/relu/f32
    accum) to establish the achievable MXU ceiling for these shapes.

Each measured computation depends on the scan carry (backend gotcha: loop-
invariant code gets hoisted), large inputs are passed as arguments (a
closure capture becomes a program constant and blows the remote-compile
upload limit), and timing syncs by fetching a scalar.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_pl_tpu.models.embedding import posenc
from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.ops import fused_mlp as fm

P = 4096 * 192  # fine-pass point count at batch 4096
ITERS = 20
MACS_PER_PT = 686_000  # padded MACs/pt fwd (see fused_mlp.py layer dims)


def report(name, dt, flops):
    tf = flops * ITERS / dt / 1e12
    print(f"{name:44s} {dt/ITERS*1e3:8.2f} ms/iter  {tf:7.1f} TF/s",
          flush=True)


def timeit(name, step, flops, data=None):
    @jax.jit
    def go(c0, data):
        def body(c, _):
            return step(c, data), ()

        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    try:
        c = float(go(jnp.float32(0.0), data))  # compile + warm
        t0 = time.perf_counter()
        c = float(go(jnp.float32(c * 1e-30), data))
        dt = time.perf_counter() - t0
        assert np.isfinite(c)
        report(name, dt, flops)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:140]}", flush=True)


def _chain_kernel(x_ref, w0_ref, w_ref, out_ref, *, fancy):
    if fancy:  # bias+relu, f32 accum, per-layer casts — like production
        h = jnp.maximum(
            jnp.dot(x_ref[:].astype(jnp.bfloat16), w0_ref[:],
                    preferred_element_type=jnp.float32), 0.0)
        for _ in range(7):
            h = jnp.maximum(
                jnp.dot(h.astype(jnp.bfloat16), w_ref[:],
                        preferred_element_type=jnp.float32) + 0.1, 0.0)
        out_ref[:] = h[:, :128]
    else:  # pure bf16 matmul chain
        h = jnp.dot(x_ref[:].astype(jnp.bfloat16), w0_ref[:],
                    preferred_element_type=jnp.bfloat16)
        for _ in range(7):
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.bfloat16)
        out_ref[:] = h[:, :128].astype(jnp.float32)


def chain(block, fancy):
    w0 = jax.random.normal(jax.random.PRNGKey(3), (128, 256),
                           jnp.bfloat16) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 256),
                          jnp.bfloat16) * 0.06

    def step(c, x):
        out = pl.pallas_call(
            functools.partial(_chain_kernel, fancy=fancy),
            grid=(P // block,),
            in_specs=[
                pl.BlockSpec((block, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        )(x + c * 1e-20, w0, w)
        return jnp.mean(out)

    flops = 2 * P * (128 * 256 + 7 * 256 * 256)
    return step, flops


def main():
    key = jax.random.PRNGKey(0)
    params = init_nerf(key)
    xyz = jax.random.normal(jax.random.fold_in(key, 1), (P, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    x_emb = jnp.concatenate([posenc(xyz, 10), posenc(dirs, 4)], axis=1)
    fwd_flops = 2 * P * MACS_PER_PT

    def raw_fwd(block):
        def step(c, _):
            out = fm.fused_nerf_apply_raw(
                params, xyz + c * 1e-20, dirs, block=(block, block)
            )
            return jnp.mean(out)

        return step

    def padded_fwd(block):
        def step(c, x):
            out = fm.fused_nerf_apply(params, x + c * 1e-20, block=block)
            return jnp.mean(out)

        return step

    def raw_grad(bf, bb, stash=None):
        def loss(p, c):
            out = fm.fused_nerf_apply_raw(p, xyz + c * 1e-20, dirs,
                                          block=(bf, bb), stash_blocks=stash)
            return jnp.mean(out**2)

        def step(c, _):
            g = jax.grad(loss)(params, c)
            return jnp.mean(g["xyz_layers"][0]["w"])

        return step

    s, f = chain(1024, fancy=False)
    timeit("chain pure-bf16 block=1024", s, f,
           jax.random.normal(key, (P, 128), jnp.float32))
    s, f = chain(1024, fancy=True)
    timeit("chain bias/relu/f32 block=1024", s, f,
           jax.random.normal(key, (P, 128), jnp.float32))
    timeit("padded fwd block=1024 (no sin)", padded_fwd(1024), fwd_flops,
           x_emb)
    timeit("raw fwd block=1024", raw_fwd(1024), fwd_flops)
    timeit("raw fwd+bwd blocks=(2048,768)", raw_grad(2048, 768),
           4 * fwd_flops)
    for sf, sb in ((512, 512), (768, 512), (768, 768), (1024, 512)):
        timeit(f"raw fwd+bwd STASH blocks=({sf},{sb})",
               raw_grad(2048, 768, stash=(sf, sb)), 4 * fwd_flops)


if __name__ == "__main__":
    main()
