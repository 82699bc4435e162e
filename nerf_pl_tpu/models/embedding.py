"""Positional (Fourier-feature) encoding.

Behavioral contract (reference: ``models/nerf.py:4-38``): embed ``x`` to
``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]`` — the identity is
included first, then per-frequency sin followed by cos, frequencies
``2^0 .. 2^(N-1)`` when ``logscale`` else linear in ``[1, 2^(N-1)]``.
Output channels = ``in_channels * (2*N_freqs + 1)``.

TPU notes: this is a pure elementwise VPU op; XLA fuses it into the consumer
matmul's input pipeline, so no Pallas kernel is needed.  We compute all
frequencies in one broadcast multiply rather than a Python loop over bands.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def _freq_bands(n_freqs: int, logscale: bool) -> np.ndarray:
    if logscale:
        return 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    return np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)


def posenc(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """Encode ``x (..., C)`` to ``(..., C*(2*n_freqs+1))``.

    Channel order matches the reference exactly: identity, then for each
    frequency band the full sin(C) block then cos(C) block.
    """
    if n_freqs == 0:
        return x
    bands = jnp.asarray(_freq_bands(n_freqs, logscale), dtype=x.dtype)
    # (..., 1, C) * (F, 1) -> (..., F, C)
    xb = x[..., None, :] * bands[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave per-frequency [sin_f, cos_f] blocks: (..., F, 2, C)
    sc = jnp.stack([sin, cos], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)


@dataclasses.dataclass(frozen=True)
class Embedding:
    """Stateless positional-encoding module (parity with reference Embedding).

    ``Embedding(3, 10)`` -> 63 output channels (xyz);
    ``Embedding(3, 4)``  -> 27 output channels (dir).
    """

    in_channels: int
    N_freqs: int
    logscale: bool = True

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 * self.N_freqs + 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return posenc(x, self.N_freqs, self.logscale)
