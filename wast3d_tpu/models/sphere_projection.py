"""SphereProjectionModel: learned sphere projector MLP (flax).

Parity with `/root/reference/nerf2nerf/networks.py:160-214` — an
experimental model (imported for side effects by the aux scripts,
`aux_save_clusters_clean.py:19`): positional-encode 3D points
(num_freqs=2, max_freq_log2=2), a 2-layer ReLU encoder, a linear head
predicting a 3x3 matrix, and a 2-layer decoder producing projected
points. Kept for capability parity with the reference's experiments.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wast3d_tpu.models.encodings import nerf_positional_encoding


class SphereProjectionModel(nn.Module):
    hidden_dim: int = 128
    output_dim: int = 3
    num_freqs: int = 2
    max_freq_log2: float = 2.0

    @nn.compact
    def __call__(self, points: jnp.ndarray):
        """points [N, 3] -> (projected [N, output_dim], rot [N, 3, 3])."""
        enc = nerf_positional_encoding(
            points, max_freq_log2=self.max_freq_log2, num_freqs=self.num_freqs
        )  # [N, 3 * 2 * num_freqs]
        h = nn.relu(nn.Dense(self.hidden_dim)(enc))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        rot = nn.Dense(9)(h).reshape(-1, 3, 3)
        d = nn.relu(nn.Dense(self.hidden_dim)(h))
        out = nn.Dense(self.output_dim)(d)
        return out, rot
