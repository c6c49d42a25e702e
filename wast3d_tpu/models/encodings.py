"""Positional encodings (NeRF-style), pure jnp.

Parity with `/root/reference/nerf2nerf/networks.py:73-138`: the classic
NeRF `Embedder` (optional input passthrough, log/linear frequency bands,
sin+cos) and the simpler `NeRFPositionalEncoding` (sin/cos at
2^linspace(0, max_freq_log2, num_freqs) bands).
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp


class Embedder:
    """NeRF positional embedding (reference `Embedder`, `networks.py:73-107`)."""

    def __init__(
        self,
        input_dims: int = 3,
        include_input: bool = True,
        max_freq_log2: int = 10,
        num_freqs: int = 10,
        log_sampling: bool = True,
        periodic_fns=(jnp.sin, jnp.cos),
    ):
        self.include_input = include_input
        if log_sampling:
            self.freq_bands = 2.0 ** jnp.linspace(0.0, max_freq_log2, num_freqs)
        else:
            self.freq_bands = jnp.linspace(2.0**0.0, 2.0**max_freq_log2, num_freqs)
        self.periodic_fns = periodic_fns
        self.out_dim = (input_dims if include_input else 0) + input_dims * len(
            periodic_fns
        ) * num_freqs

    def embed(self, x: jnp.ndarray) -> jnp.ndarray:
        parts: List[jnp.ndarray] = [x] if self.include_input else []
        for freq in self.freq_bands:
            for fn in self.periodic_fns:
                parts.append(fn(x * freq))
        return jnp.concatenate(parts, axis=-1)


def nerf_positional_encoding(
    x: jnp.ndarray, max_freq_log2: float = 10.0, num_freqs: int = 6
) -> jnp.ndarray:
    """Reference `NeRFPositionalEncoding.forward` (`networks.py:113-138`):
    x [..., 3] -> [..., 1, 2*num_freqs*3]-style sin/cos features (sin and
    cos blocks concatenated along the last axis)."""
    bands = 2.0 ** jnp.linspace(0.0, max_freq_log2, num_freqs)  # [F]
    xe = x[..., None]  # [..., 3, 1]
    sin = jnp.sin(bands * xe)  # [..., 3, F]
    cos = jnp.cos(bands * xe)
    enc = jnp.concatenate([sin, cos], axis=-1)  # [..., 3, 2F]
    return enc.reshape(*x.shape[:-1], -1)
