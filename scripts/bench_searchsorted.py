"""Benchmark the native-kernel slot: Pallas rank-searchsorted vs the XLA
alternatives on the real TPU (SURVEY.md §7's open claim; VERDICT round-2
next #3).

Shapes: the flagship fine-sampling step — batch 4096 rays, 65-wide CDF
(N_samples+1), 128 importance draws (reference ``models/rendering.py:37``
``sample_pdf(z_vals_mid, weights[:,1:-1], N_importance)``).

Contenders:
  * ``searchsorted_pallas`` — the production branchless rank kernel
    (``ops/searchsorted.py``);
  * ``searchsorted_jnp``    — the (B, K, M) broadcast-compare-sum left to XLA;
  * sort-based              — concat CDF row + queries, one stable argsort,
    rank = #seq-elements before each query (the classic formulation the
    survey asks to compare against);
  * plus the full ``sample_pdf`` op with each backend, to bound the
    end-to-end impact.

Timing per CLAUDE.md gotchas: computation depends on the scan carry (no
loop-invariant hoisting), inputs passed as arguments, sync by fetching a
scalar.  Run on a HEALTHY tunnel; first compiles ~1 min total.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.ops.sampling import sample_pdf
from nerf_pl_tpu.ops.searchsorted import searchsorted_jnp, searchsorted_pallas

B, M, K = 4096, 65, 128
ITERS = 50


def searchsorted_sort(seq, vals):
    """side='right' via one stable argsort of [seq_row | query_row]."""
    comb = jnp.concatenate([seq, vals], axis=1)  # (B, M+K)
    order = jnp.argsort(comb, axis=1, stable=True)  # seq wins ties -> 'right'
    seq_before = jnp.cumsum((order < M).astype(jnp.int32), axis=1)  # (B, M+K)
    inv = jnp.argsort(order, axis=1, stable=True)
    return jnp.take_along_axis(seq_before, inv, axis=1)[:, M:]


def timeit(name, step, data):
    @jax.jit
    def go(c0, data):
        def body(c, _):
            return step(c, data), ()

        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c

    c = float(go(jnp.float32(0.0), data))  # compile + warm
    t0 = time.perf_counter()
    c = float(go(jnp.float32(c * 1e-30), data))
    dt = time.perf_counter() - t0
    assert np.isfinite(c)
    print(f"{name:40s} {dt / ITERS * 1e6:9.1f} us/iter", flush=True)
    return dt / ITERS


def main():
    key = jax.random.PRNGKey(0)
    w = jax.random.uniform(key, (B, M - 1)) + 1e-3
    cdf = jnp.cumsum(w / w.sum(1, keepdims=True), axis=1)
    cdf = jnp.concatenate([jnp.zeros((B, 1)), cdf], axis=1)  # (B, 65)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, K))
    rays = jnp.concatenate(
        [jnp.zeros((B, 6)), jnp.full((B, 1), 2.0), jnp.full((B, 1), 6.0)], 1
    )
    weights = jax.random.uniform(jax.random.fold_in(key, 2), (B, M - 2))

    # correctness cross-check first (on-device; interpret off-TPU)
    interp = jax.default_backend() != "tpu"
    r_jnp = searchsorted_jnp(cdf, u)
    r_pal = searchsorted_pallas(cdf, u, interpret=interp)
    r_sort = searchsorted_sort(cdf, u)
    np.testing.assert_array_equal(np.asarray(r_jnp), np.asarray(r_pal))
    np.testing.assert_array_equal(np.asarray(r_jnp), np.asarray(r_sort))
    print("all three backends agree on ranks")

    def mk(fn):
        def step(c, data):
            cdf, u = data
            out = fn(cdf, u + c * 1e-20)
            return jnp.float32(jnp.sum(out))

        return step

    timeit("searchsorted: pallas rank kernel", mk(
        functools.partial(searchsorted_pallas, interpret=interp)), (cdf, u))
    timeit("searchsorted: jnp broadcast-sum", mk(searchsorted_jnp), (cdf, u))
    timeit("searchsorted: sort-based", mk(searchsorted_sort), (cdf, u))

    def pdf_step(c, data):
        rays, weights, u = data
        z = sample_pdf(rays, weights, K, key=None, u=u + c * 1e-20,
                       jitter=u)
        return jnp.float32(jnp.sum(z))

    timeit("sample_pdf (production backend)", pdf_step, (rays, weights, u))


if __name__ == "__main__":
    main()
