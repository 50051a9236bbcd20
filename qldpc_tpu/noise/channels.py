"""On-device noise channels and syndrome generation.

The reference samples errors on the host with numpy inside every driver
(code capacity: studies/study.py:54; doubled-error channel:
paperResults.py:61-64; phenomenological syndrome flips:
studies/study.py:58-60). Here sampling is a first-class, jittable,
batched device operation keyed by ``jax.random`` so the Monte-Carlo engine
never crosses the host boundary.

Every channel has signature ``(key, p, batch) -> errors`` (plus
syndrome-noise outputs where applicable) and is registered by name.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "uniform_prior_llr",
    "syndrome_of",
    "code_capacity",
    "doubled_channel",
    "phenomenological",
    "get_channel",
    "CHANNELS",
]


def uniform_prior_llr(n: int, p) -> jax.Array:
    """Uniform channel prior ``log((1-p)/p)`` per variable (study.py:42)."""
    p = jnp.asarray(p, jnp.float32)
    return jnp.broadcast_to(jnp.log((1.0 - p) / p), (n,))


def syndrome_of(H, errors: jax.Array) -> jax.Array:
    """Batched ``e @ H^T mod 2`` as an MXU matmul; (B, n) -> (B, m)."""
    Hf = jnp.asarray(np.asarray(H), jnp.float32)
    s = jnp.dot(
        errors.astype(jnp.float32), Hf.T, preferred_element_type=jnp.float32
    )
    return jnp.mod(s, 2.0).astype(jnp.int8)


def code_capacity(key: jax.Array, p, batch: int, n: int) -> jax.Array:
    """iid Bernoulli(p) bit flips on each of n qubits."""
    return jax.random.bernoulli(key, p, (batch, n)).astype(jnp.int8)


def doubled_channel(key: jax.Array, p, batch: int, n: int) -> jax.Array:
    """``e = e1 XOR e2`` with e_i ~ Bernoulli(p): the reference's
    X-after-Z-correction depolarizing proxy (paperResults.py:61-64).
    Equivalent to Bernoulli(2p(1-p)), sampled that way in one draw."""
    p = jnp.asarray(p, jnp.float32)
    return jax.random.bernoulli(key, 2.0 * p * (1.0 - p), (batch, n)).astype(jnp.int8)


def phenomenological(
    key: jax.Array, p, batch: int, n: int, m: int, q=None
) -> tuple[jax.Array, jax.Array]:
    """Code-capacity data errors plus Bernoulli(q) syndrome-bit flips
    (the commented-out model at studies/study.py:58-60; q defaults to p).

    Returns ``(errors (B, n), syndrome_flips (B, m))``; the caller XORs the
    flips into the true syndrome.
    """
    kq, ke = jax.random.split(key)
    q = p if q is None else q
    errors = jax.random.bernoulli(ke, p, (batch, n)).astype(jnp.int8)
    flips = jax.random.bernoulli(kq, q, (batch, m)).astype(jnp.int8)
    return errors, flips


CHANNELS: dict[str, Callable] = {
    "code-capacity": code_capacity,
    "doubled": doubled_channel,
    "phenomenological": phenomenological,
}


def get_channel(name: str) -> Callable:
    try:
        return CHANNELS[name]
    except KeyError:
        raise KeyError(f"unknown channel {name!r}; known: {list(CHANNELS)}") from None
