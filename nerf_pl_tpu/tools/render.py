"""Whole-image rendering: fixed-shape chunked renderer for val/eval.

The reference bounds memory with Python chunk loops (``train.py:53-63``,
``eval.py:65-67``).  Under jit we instead pad the H*W rays to a multiple of a
static ``chunk``, reshape to ``(n_chunks, chunk, 8)`` and ``lax.map`` the
batch renderer over chunks — one compiled program per (image size, chunk).
On a mesh, chunks are sharded across devices via ``shard_map`` (each chip
renders its share of the image, results concatenate on the ray axis), the
TPU equivalent of sharding eval rays across GPUs (SURVEY.md §2.3).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rendering import render_rays

from ..parallel.mesh import shard_map


def _render_chunked(params, rays_chunks, keys, render_kwargs):
    def one(args):
        rays, key = args
        return render_rays(
            params.get("coarse"), params.get("fine"), rays, key, **render_kwargs
        )

    return jax.lax.map(one, (rays_chunks, keys))


@functools.partial(
    jax.jit, static_argnames=("chunk", "render_kwargs_tuple", "mesh")
)
def _render_image_jit(params, rays, key, chunk, render_kwargs_tuple, mesh):
    render_kwargs = dict(render_kwargs_tuple)
    n = rays.shape[0]
    n_chunks = n // chunk
    rays_chunks = rays.reshape(n_chunks, chunk, rays.shape[-1])
    keys = jax.random.split(key, n_chunks)

    if mesh is None or mesh.devices.size == 1:
        out = _render_chunked(params, rays_chunks, keys, render_kwargs)
    else:
        fn = shard_map(
            lambda p, rc, ks: _render_chunked(p, rc, ks, render_kwargs),
            mesh,
            in_specs=(P(), P("rays"), P("rays")),
            out_specs=P("rays"),
        )
        out = fn(params, rays_chunks, keys)
    return {k: v.reshape(-1, *v.shape[2:]) for k, v in out.items()}


def plan_chunks(n: int, chunk: int, d: int):
    """Chunk/padding plan for n rays over d devices -> (chunk, n_chunks,
    n_pad), where n_chunks divides d and n_chunks*chunk >= n.

    Never renders (much) more padding than rays: the chunk is capped at one
    device's share of the image.  (A d*256 floor here once inflated a
    64-ray val image on 8 devices to 16k padded rays — 256x wasted compute,
    enough to trip XLA:CPU's 40 s collective-rendezvous watchdog on an
    oversubscribed host and abort the process mid-validation.)
    """
    chunk = min(chunk, max(8, -(-n // d)))
    n_chunks = -(-n // chunk)
    n_chunks = -(-n_chunks // d) * d
    return chunk, n_chunks, n_chunks * chunk - n


def render_image(
    params: Dict[str, Any],
    rays: jnp.ndarray,  # (N, 8)
    key: jax.Array,
    chunk: int = 32 * 1024,
    mesh: Optional[Mesh] = None,
    **render_kwargs,
) -> Dict[str, jnp.ndarray]:
    """Render N rays with bounded memory; returns the render_rays dict."""
    # whole-image rendering is the memory-bound path where the packed
    # channel-major ray IO pays off (+26% at 800², docs/results.md); default
    # it on whenever the fused kernel runs, unless the caller overrode it
    if render_kwargs.get("use_fused"):
        render_kwargs.setdefault("fused_channel_io", True)
        # NOTE --arch_width wide trunks stay on the XLA path even here
        # (forward-only): the generalized resident-weights kernel measured
        # 93.4k vs XLA's 112.0k rays/s at W=512 eval on chip — at wide
        # widths XLA's chain already runs ~132 TF/s, above the W=256 chain
        # ceiling, so the kernel's HBM savings no longer pay (docs/
        # results.md round 4).  Opt in explicitly with fused_wide_infer.
    n = rays.shape[0]
    d = 1 if mesh is None else mesh.devices.size
    chunk, n_chunks, n_pad = plan_chunks(n, chunk, d)
    if n_pad:
        rays = jnp.concatenate([rays, jnp.broadcast_to(rays[-1:], (n_pad, rays.shape[-1]))])
    # multi-process (one controller per host): inputs must be GLOBAL arrays —
    # place the host-identical rays/key replicated on the mesh, and gather
    # the sharded output back to replicated so every host can read the full
    # image (eval/metrics run on every process in lockstep)
    multiproc = mesh is not None and jax.process_count() > 1
    if multiproc:
        from jax.sharding import NamedSharding

        rep = NamedSharding(mesh, P())
        rays = jax.device_put(rays, rep)
        key = jax.device_put(key, rep)
    out = _render_image_jit(
        params, rays, key, chunk, tuple(sorted(render_kwargs.items())), mesh
    )
    if multiproc:
        # hand back host numpy: downstream eager math must not re-enter
        # multi-device dispatch outside the processes' lockstep regions
        out = jax.device_get(jax.jit(lambda t: t, out_shardings=rep)(out))
    if n_pad:
        out = {k: v[:n] for k, v in out.items()}
    return out
