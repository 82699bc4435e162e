"""Batched row-wise ``searchsorted`` — the framework's native-kernel slot.

This replaces the reference's only native component, the ``torchsearchsorted``
C++/CUDA submodule (reference: ``.gitmodules``, used at
``models/rendering.py:2,37`` and ``models/rendering_rgb_sm.py:2,40``): for each
row ``b``, find insertion indices of ``values[b, k]`` into the sorted row
``sorted_seq[b, :]``.

TPU design: the rows are tiny (the per-ray CDF is N_samples-1 ≈ 63 wide) and
the batch is huge, so a per-thread binary search (the CUDA design) is the
wrong shape for a 8x128-lane VPU.  Instead we use a branchless *rank* kernel:
``index = sum_m [values >= row[m]]`` (``side='right'``; ``>`` for 'left'),
which is a fixed-length loop of fully vectorized compare+accumulate over the
row dimension — no gathers, no divergence.  The Pallas kernel keeps one
(block_b, M) slab of rows and one (block_b, K) slab of queries resident in
VMEM and emits the int32 ranks; XLA can't fuse this pattern as tightly because
it materializes the (B, K, M) broadcast through a reduce, so the kernel also
saves HBM traffic.  Measured on v5e at the flagship 4096×65/128 shape
(``scripts/bench_searchsorted.py``, docs/results.md): this kernel 561 µs vs
641 µs for the jnp fallback vs 9 045 µs for a sort-based formulation.

A pure-jnp fallback (same math) is used on CPU and as the reference for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def searchsorted_jnp(sorted_seq: jnp.ndarray, values: jnp.ndarray, side: str = "right"):
    """Reference implementation: (B, M), (B, K) -> int32 (B, K)."""
    if side == "right":
        cmp = values[:, :, None] >= sorted_seq[:, None, :]
    elif side == "left":
        cmp = values[:, :, None] > sorted_seq[:, None, :]
    else:
        raise ValueError(f"side must be 'left' or 'right', got {side}")
    return cmp.sum(axis=-1).astype(jnp.int32)


def _rank_kernel(seq_ref, val_ref, out_ref, *, M: int, right: bool):
    vals = val_ref[:]  # (BB, K)
    acc = jnp.zeros(vals.shape, dtype=jnp.int32)
    # fixed-length branchless rank: one vectorized compare per row element
    for m in range(M):
        col = seq_ref[:, m : m + 1]  # (BB, 1)
        hit = (vals >= col) if right else (vals > col)
        acc = acc + hit.astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("side", "block_b", "interpret")
)
def searchsorted_pallas(
    sorted_seq: jnp.ndarray,
    values: jnp.ndarray,
    side: str = "right",
    block_b: int = 256,
    interpret: bool = False,
):
    B, M = sorted_seq.shape
    Bv, K = values.shape
    assert B == Bv, (B, Bv)
    grid = (pl.cdiv(B, block_b),)
    kernel = functools.partial(_rank_kernel, M=M, right=(side == "right"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=4 * B * (M + 2 * K),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sorted_seq, values)


# ---------------------------------------------------------------------------
# Rank + in-bin interpolation endpoints, one pass (the det-sampler op).
#
# The det-mode ``sample_pdf`` needs ``lo = cdf[ind]`` / ``hi = cdf[ind + 1]``
# (``ind = clip(rank - 1, 0, M - 2)`` over the M-wide CDF row) to place each
# u within its bin.  Gathering those two values per draw measured 65 ms per
# 32768-ray eval chunk on v5e (TPU gathers; 164k vs 246k rays/s whole-image —
# docs/results.md round 3).  Because each CDF row is sorted and starts at 0,
# the endpoints are expressible as masked REDUCTIONS over the row — the same
# fully-vectorized compare+accumulate shape as the rank itself:
#   lo = max_{m < M-1} (row[m] if row[m] <= u else 0)
#   hi = min_{m >= 1} (row[m] if row[m] >  u else row[M-1])
# (strictly-increasing rows — sample_pdf adds eps to every weight; the
# row[M-1] default makes hi the row tail when u >= every entry, matching the
# clipped-gather semantics exactly).  So one kernel pass emits rank, lo, hi
# with zero gathers.
# ---------------------------------------------------------------------------
def searchsorted_interp_jnp(sorted_seq: jnp.ndarray, values: jnp.ndarray):
    """(B, M), (B, K) -> (ranks int32, lo, hi); side='right' semantics."""
    c = sorted_seq[:, None, :]  # (B, 1, M)
    v = values[:, :, None]  # (B, K, 1)
    hit = v >= c
    ranks = hit.sum(axis=-1).astype(jnp.int32)
    last = sorted_seq[:, -1:][:, None, :]  # (B, 1, 1)
    lo = jnp.max(
        jnp.where(hit[..., :-1], c[..., :-1], 0.0), axis=-1
    )
    hi = jnp.min(
        jnp.where(~hit[..., 1:], c[..., 1:], last), axis=-1
    )
    return ranks, lo, hi


def _rank_interp_kernel(seq_ref, val_ref, out_ref, lo_ref, hi_ref, *, M: int):
    vals = val_ref[:]  # (BB, K)
    acc = jnp.zeros(vals.shape, dtype=jnp.int32)
    last = seq_ref[:, M - 1 : M]
    lo = jnp.zeros_like(vals)
    hi = jnp.broadcast_to(last, vals.shape)
    for m in range(M):
        col = seq_ref[:, m : m + 1]  # (BB, 1)
        hit = vals >= col
        acc = acc + hit.astype(jnp.int32)
        if m < M - 1:
            lo = jnp.maximum(lo, jnp.where(hit, col, 0.0))
        if m >= 1:
            hi = jnp.minimum(hi, jnp.where(hit, last, col))
    out_ref[:] = acc
    lo_ref[:] = lo
    hi_ref[:] = hi


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def searchsorted_interp_pallas(
    sorted_seq: jnp.ndarray,
    values: jnp.ndarray,
    block_b: int = 256,
    interpret: bool = False,
):
    B, M = sorted_seq.shape
    Bv, K = values.shape
    assert B == Bv, (B, Bv)
    grid = (pl.cdiv(B, block_b),)
    kernel = functools.partial(_rank_interp_kernel, M=M)
    f32 = jax.ShapeDtypeStruct((B, K), values.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, K), jnp.int32), f32, f32],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * K * M,
            bytes_accessed=4 * B * (M + 4 * K),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sorted_seq, values)


def searchsorted_interp(sorted_seq, values):
    """Rank + bin endpoints (side='right'); Pallas on TPU, jnp elsewhere.

    Inputs are stop-gradiented like ``searchsorted`` (the det sampler's
    z placement is detached in the reference too)."""
    sorted_seq = jax.lax.stop_gradient(sorted_seq)
    values = jax.lax.stop_gradient(values)
    if jax.default_backend() == "tpu":
        return searchsorted_interp_pallas(sorted_seq, values)
    return searchsorted_interp_jnp(sorted_seq, values)


def searchsorted(sorted_seq, values, side: str = "right"):
    """Batched searchsorted; dispatches to the Pallas kernel on TPU.

    Insertion indices are piecewise-constant in the inputs (zero derivative
    a.e.), so the inputs are stop-gradiented — this also keeps the Pallas
    call out of autodiff linearization when a consumer differentiates around
    it (the reference likewise detaches, ``models/rendering.py:253-255``).
    """
    sorted_seq = jax.lax.stop_gradient(sorted_seq)
    values = jax.lax.stop_gradient(values)
    if jax.default_backend() == "tpu":
        return searchsorted_pallas(sorted_seq, values, side=side)
    return searchsorted_jnp(sorted_seq, values, side=side)
