"""Progressive film: running-mean accumulation and tonemapping.

The reference's only persistent render state is the per-pixel running
mean keyed by a pass counter:
``c = (c * prevCount + batch) / (prevCount + 1)`` (CUTracer.cu:214-217),
or in gamma space for the HLSL backend (rtx.hlsl:400-404). The film here
generalizes this to weighted batches (each batch may carry a different
sample count) and keeps everything in float32 — so the film + count is
an exact, restartable checkpoint, unlike the reference's 8-bit PNG dumps
(SURVEY.md §5 checkpoint/resume).

Two accumulation spaces:

- ``film_update`` — linear running mean (the CUDA estimator; unbiased).
- ``film_update_gamma`` — the MCRT estimator, which averages in gamma
  space: ``new = ((old^2.2 * prev + batch) / (prev+1))^(1/2.2)``
  (rtx.hlsl:400-404). Kept for strict backend parity; note it is a
  *different* (biased) estimator, not just a display transform.

The film also carries a scalar second-moment accumulator (`m2`,
Welford over batch means) so the renderer can report an online noise
estimate per pass — the reference has no observability at all
(SURVEY.md §5 metrics gap).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Film:
    """Running-mean image plus accumulated sample weight.

    ``m2`` is the Welford second-moment scalar: the pixel-mean of
    ``Σ_k w_k · (b_k − M_{k−1}) · (b_k − M_k)`` over batches ``b_k``.
    ``variance_of_mean()`` turns it into a per-pixel variance estimate
    of the current film mean.
    """

    color: jnp.ndarray  # f32[H, W, 3], mean radiance so far
    weight: jnp.ndarray  # f32[], total accumulated sample weight
    m2: jnp.ndarray  # f32[], Welford second moment (batch-mean spread)

    def tree_flatten(self):
        return (self.color, self.weight, self.m2), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def zeros(cls, height: int, width: int) -> "Film":
        return cls(
            color=jnp.zeros((height, width, 3), jnp.float32),
            weight=jnp.zeros((), jnp.float32),
            m2=jnp.zeros((), jnp.float32),
        )

    def variance_of_mean(self):
        """Estimated variance of the film mean (scalar, averaged over
        pixels/channels): ``m2 / weight²`` by the Welford identity with
        per-batch weight folded in. Zero until two batches exist."""
        w = jnp.maximum(self.weight, 1e-20)
        return self.m2 / (w * w)


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
    # Welford: m2 += mean_px[ w · (b − M_{k−1}) · (b − M_k) ]. Guard the
    # first batch (film.weight == 0), where the deviation from the
    # undefined prior mean must not count.
    dev = jnp.mean(w * (batch_mean - film.color) * (batch_mean - color))
    m2 = film.m2 + jnp.where(film.weight > 0.0, dev, 0.0)
    return Film(color=color, weight=new_weight, m2=m2)


def film_update_gamma(
    film: Film, batch_mean: jnp.ndarray, batch_weight, gamma: float = 2.2
) -> Film:
    """MCRT's gamma-space progressive average (rtx.hlsl:400-404).

    The stored film is gamma-encoded; each update decodes, folds the
    linear batch in, re-encodes:
    ``new = ((old^γ · prev + batch · w) / (prev + w))^(1/γ)``.
    """
    w = jnp.asarray(batch_weight, jnp.float32)
    new_weight = film.weight + w
    lin = jnp.power(jnp.maximum(film.color, 0.0), gamma)
    mixed = (lin * film.weight + batch_mean * w) / jnp.maximum(
        new_weight, 1e-20
    )
    color = jnp.power(jnp.maximum(mixed, 0.0), 1.0 / gamma)
    dev = jnp.mean(w * (batch_mean - lin) * (batch_mean - mixed))
    m2 = film.m2 + jnp.where(film.weight > 0.0, dev, 0.0)
    return Film(color=color, weight=new_weight, m2=m2)


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


def tonemap_identity(color: jnp.ndarray) -> np.ndarray:
    """8-bit passthrough for a film that already stores encoded values
    (the ``film_update_gamma`` accumulation mode)."""
    arr = np.asarray(color)
    return np.clip(arr * 255.0, 0.0, 255.0).astype(np.uint8)
