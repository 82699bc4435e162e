"""Ray generation and NDC warping (pure functions, numpy/jax agnostic).

Behavioral contract (reference: ``datasets/ray_utils.py``):
  * ``get_ray_directions(H, W, focal)``: pinhole directions
    ``((i - W/2)/f, -(j - H/2)/f, -1)`` over an integer pixel meshgrid —
    deliberately WITHOUT the +0.5 pixel-center offset
    (``datasets/ray_utils.py:19-22``), which matters for parity.
  * ``get_rays(directions, c2w)``: rotate into world frame, normalize the
    direction, broadcast the camera origin (``datasets/ray_utils.py:27-50``).
  * ``get_ndc_rays``: shift origins to the near plane then apply the
    projective NDC warp (``datasets/ray_utils.py:53-93``).

These run once per dataset load (host side, numpy) or inside eval jit; they
are not hot.  We implement them with ``jax.numpy`` so they can also be traced.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_ray_directions(H: int, W: int, focal: float) -> np.ndarray:
    """(H, W, 3) un-normalized camera-frame ray directions (numpy, host)."""
    j, i = np.meshgrid(
        np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32),
        indexing="ij",
    )
    directions = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], axis=-1
    )
    return directions


def get_rays(directions, c2w):
    """World-frame rays for one image.

    Args:
      directions: (H, W, 3) or (N, 3) camera-frame directions.
      c2w: (3, 4) camera-to-world matrix.
    Returns:
      rays_o, rays_d: both (N, 3); rays_d is normalized.
    """
    # jax if EITHER input is traced/device-side (mixed inputs under jit)
    xp = (jnp if isinstance(directions, jnp.ndarray)
          or isinstance(c2w, jnp.ndarray) else np)
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / xp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = xp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def get_ndc_rays(H: int, W: int, focal: float, near, rays_o, rays_d):
    """Warp world-space rays into NDC (used by forward-facing LLFF scenes)."""
    xp = (jnp if isinstance(rays_o, jnp.ndarray)
          or isinstance(rays_d, jnp.ndarray) else np)
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    rays_o = xp.stack([o0, o1, o2], axis=-1)
    rays_d = xp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
