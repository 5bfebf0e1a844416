"""Progressive accumulation state (the reference's implicit checkpoint).

Reference main.cpp:484-489, 805-806: running mean
`new = sample/(n+1) + prev*n/(n+1)`, generalized to sample *batches*:
`mean' = (mean*n + batch_sum) / (n + k)`. The state (mean image + sample
count + seed) is trivially serializable — see tpu_ray.utils.checkpoint.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AccumState:
    mean: jax.Array     # [H,W,3] f32 running mean of linear radiance
    samples: jax.Array  # [] i32 samples accumulated so far

    @staticmethod
    def zeros(height: int, width: int) -> "AccumState":
        return AccumState(
            mean=jnp.zeros((height, width, 3), jnp.float32),
            samples=jnp.zeros((), jnp.int32),
        )


def accumulate(state: AccumState, batch_sum, batch_samples) -> AccumState:
    """Fold a batch of `batch_samples` sample sums into the running mean."""
    n = state.samples.astype(jnp.float32)
    k = jnp.asarray(batch_samples, jnp.float32)
    mean = (state.mean * n + batch_sum) / (n + k)
    return AccumState(mean=mean, samples=state.samples + batch_samples)
