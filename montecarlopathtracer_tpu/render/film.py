"""Progressive film: running-mean accumulation and tonemapping.

The reference's only persistent render state is the per-pixel running
mean keyed by a pass counter:
``c = (c * prevCount + batch) / (prevCount + 1)`` (CUTracer.cu:214-217),
or in gamma space for the HLSL backend (rtx.hlsl:400-404). The film here
generalizes this to weighted batches (each batch may carry a different
sample count) and keeps everything in linear float32 — so the film +
count is an exact, restartable checkpoint, unlike the reference's
8-bit PNG dumps (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Film:
    """Linear running-mean image plus accumulated sample weight."""

    color: jnp.ndarray  # f32[H, W, 3], mean radiance so far
    weight: jnp.ndarray  # f32[], total accumulated sample weight

    def tree_flatten(self):
        return (self.color, self.weight), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def zeros(cls, height: int, width: int) -> "Film":
        return cls(
            color=jnp.zeros((height, width, 3), jnp.float32),
            weight=jnp.zeros((), jnp.float32),
        )


def film_update(film: Film, batch_mean: jnp.ndarray, batch_weight) -> Film:
    """Fold a batch mean with the given weight into the running mean.

    With ``batch_weight = 1`` per equal-spp batch this is exactly the
    reference recurrence (CUTracer.cu:215-217).
    """
    w = jnp.asarray(batch_weight, jnp.float32)
    new_weight = film.weight + w
    color = (film.color * film.weight + batch_mean * w) / jnp.maximum(
        new_weight, 1e-20
    )
    return Film(color=color, weight=new_weight)


def tonemap_linear(color: jnp.ndarray) -> np.ndarray:
    """Linear → 8-bit with clipping, no gamma — the CVMCTracer output
    transform (main.cpp:19-29 writes color × 255)."""
    arr = np.asarray(color)
    return np.clip(arr * 255.0, 0.0, 255.0).astype(np.uint8)


def tonemap_gamma(color: jnp.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Linear → gamma-encoded 8-bit — the MCRT display transform
    (rtx.hlsl:402 stores pow(mean, 1/2.2))."""
    arr = np.asarray(color)
    enc = np.power(np.clip(arr, 0.0, None), 1.0 / gamma)
    return np.clip(enc * 255.0, 0.0, 255.0).astype(np.uint8)
