"""The NeRF MLP as a pure-pytree parameter dict + jittable apply function.

Behavioral contract (reference: ``models/nerf.py:41-123``):
  * D=8 hidden layers of width W=256, ReLU.
  * Skip connection: before layer index ``i in skips`` (default ``[4]``), the
    raw embedded xyz is concatenated *in front* of the hidden activation
    (``cat([input_xyz, h])``).
  * Heads: ``sigma = Linear(W, 1)`` with NO activation (relu applied later in
    the renderer), ``xyz_encoding_final = Linear(W, W)`` (no activation),
    then ``cat([final, dir_embedded]) -> Linear(W+27, W//2) + ReLU ->
    Linear(W//2, 3) + sigmoid`` for rgb.  Output is ``cat([rgb, sigma], -1)``.
  * ``sigma_only`` fast path takes only the 63-channel xyz embedding and
    returns ``(B, 1)`` sigma.

TPU notes: all layers are (B, 256) x (256, 256) matmuls — ideal MXU shapes
when B is a multiple of the 128-lane tile.  We keep params in float32 and
optionally cast activations/weights to a ``compute_dtype`` (bfloat16 for
speed) with float32 MXU accumulation via ``preferred_element_type``.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

NeRFParams = Dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Torch ``nn.Linear`` default init: kaiming-uniform(a=sqrt(5)) for the
    weight — which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the
    same bound for the bias.  Matching the reference's init distribution keeps
    training dynamics comparable."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    # stored as (fan_in, fan_out) so apply is x @ w + b (no transpose on TPU)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nerf(
    key: jax.Array,
    D: int = 8,
    W: int = 256,
    in_channels_xyz: int = 63,
    in_channels_dir: int = 27,
    skips: Sequence[int] = (4,),
) -> NeRFParams:
    """Create the parameter pytree for one NeRF MLP (coarse or fine)."""
    keys = jax.random.split(key, D + 4)
    layers = []
    for i in range(D):
        if i == 0:
            fan_in = in_channels_xyz
        elif i in skips:
            fan_in = W + in_channels_xyz
        else:
            fan_in = W
        layers.append(_linear_init(keys[i], fan_in, W))
    return {
        "xyz_layers": layers,
        "xyz_final": _linear_init(keys[D], W, W),
        "dir_layer": _linear_init(keys[D + 1], W + in_channels_dir, W // 2),
        "sigma": _linear_init(keys[D + 2], W, 1),
        "rgb": _linear_init(keys[D + 3], W // 2, 3),
    }
    # NOTE: no static metadata lives in the pytree — ``nerf_apply`` infers
    # D / W / skips / channel split from the (static) weight shapes, so the
    # params remain a clean all-float pytree for optax/donation/sharding.


def _dense(p, x, compute_dtype):
    w = p["w"].astype(compute_dtype)
    return (
        jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
        + p["b"]
    )


def nerf_apply(
    params: NeRFParams,
    x: jnp.ndarray,
    sigma_only: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Apply the NeRF MLP.

    Args:
      x: ``(B, in_channels_xyz)`` when ``sigma_only`` else
         ``(B, in_channels_xyz + in_channels_dir)`` embedded inputs.
    Returns:
      ``(B, 1)`` sigma when ``sigma_only`` else ``(B, 4)`` rgb+sigma
      (reference ``models/nerf.py:83-123`` ordering: rgb first, sigma last).
    """
    layers = params["xyz_layers"]
    cx = layers[0]["w"].shape[0]  # in_channels_xyz
    W = layers[0]["w"].shape[1]
    # a layer whose fan-in exceeds W receives the skip concat of input_xyz
    skips = tuple(
        i for i in range(1, len(layers)) if layers[i]["w"].shape[0] == W + cx
    )

    if sigma_only:
        input_xyz = x
        input_dir = None
    else:
        input_xyz = x[..., :cx]
        input_dir = x[..., cx:]

    h = input_xyz
    for i, layer in enumerate(layers):
        if i in skips:
            h = jnp.concatenate([input_xyz, h], axis=-1)
        h = jax.nn.relu(_dense(layer, h, compute_dtype))

    sigma = _dense(params["sigma"], h, compute_dtype)
    if sigma_only:
        return sigma

    final = _dense(params["xyz_final"], h, compute_dtype)
    d = jnp.concatenate([final, input_dir], axis=-1)
    d = jax.nn.relu(_dense(params["dir_layer"], d, compute_dtype))
    rgb = jax.nn.sigmoid(_dense(params["rgb"], d, compute_dtype))
    return jnp.concatenate([rgb, sigma], axis=-1)


def num_params(params: NeRFParams) -> int:
    return sum(int(l.size) for l in jax.tree_util.tree_leaves(params))
