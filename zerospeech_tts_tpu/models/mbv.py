"""MBV discretizer — the heart of the system (SURVEY.md §2; ref model.py
:~60-100 gumbel_softmax / sample_gumbel + the encoder-mode switch).

Multilabel-Binary Vectors: each latent dimension is an independent binary
{on, off} choice, sampled with straight-through Gumbel-softmax during
training and hard-thresholded at inference. These binary vectors ARE the
ZeroSpeech challenge's discrete units (written to text files for the
bitrate metric).

The straight-through estimator uses the stop-gradient identity
``hard + sg(0) = soft + sg(hard - soft)`` — no custom_vjp needed, XLA
fuses it away (SURVEY.md §7 step 4).

Encoder modes (ref ``enc_mode``): ``binary`` (MBV), ``one_hot`` (single
Gumbel-softmax over the whole latent vocabulary), ``continues``
(reference's spelling; no discretization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(rng: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    u = jax.random.uniform(rng, shape, dtype=dtype, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_softmax(logits: jnp.ndarray, temperature: float, rng: jax.Array, axis: int = -1):
    """Soft Gumbel-softmax sample along ``axis``."""
    g = sample_gumbel(rng, logits.shape, logits.dtype)
    return jax.nn.softmax((logits + g) / temperature, axis=axis)


def straight_through(soft: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Hard one-hot forward, soft gradients backward."""
    hard = jax.nn.one_hot(jnp.argmax(soft, axis=axis), soft.shape[axis], axis=axis, dtype=soft.dtype)
    return soft + jax.lax.stop_gradient(hard - soft)


def discretize(
    logits: jnp.ndarray,
    mode: str,
    temperature: float,
    rng: jax.Array | None,
    hard: bool = True,
) -> jnp.ndarray:
    """Encoder logits [..., D, 2] -> latent [..., D].

    binary:   per-dim 2-way Gumbel-softmax over {on, off}; returns the "on"
              coordinate (straight-through if hard).
    one_hot:  Gumbel-softmax over the D axis using the "on" logits.
    continues: raw "on" logits, no discretization.

    rng=None selects deterministic inference (no Gumbel noise, hard argmax)
    — the exact unit extraction used for the challenge bitrate artifact.
    """
    on_logits = logits[..., 0]
    if mode == "continues":
        return on_logits

    if rng is None:
        if mode == "binary":
            return (logits[..., 0] > logits[..., 1]).astype(logits.dtype)
        if mode == "one_hot":
            d = on_logits.shape[-1]
            return jax.nn.one_hot(jnp.argmax(on_logits, axis=-1), d, dtype=logits.dtype)
        raise ValueError(f"unknown enc_mode {mode!r}")

    if mode == "binary":
        soft = gumbel_softmax(logits, temperature, rng, axis=-1)
        out = straight_through(soft, axis=-1) if hard else soft
        return out[..., 0]
    if mode == "one_hot":
        soft = gumbel_softmax(on_logits, temperature, rng, axis=-1)
        return straight_through(soft, axis=-1) if hard else soft
    raise ValueError(f"unknown enc_mode {mode!r}")


def hard_units(logits: jnp.ndarray) -> jnp.ndarray:
    """Deterministic binary units as int32 (challenge unit-file payload)."""
    return (logits[..., 0] > logits[..., 1]).astype(jnp.int32)


def unit_bits(logits: jnp.ndarray, mode: str = "binary") -> jnp.ndarray:
    """Mode-aware deterministic 0/1 unit rows for the challenge dump.

    binary:   per-dim threshold (MBV — the flagship artifact).
    one_hot:  argmax one-hot row (exactly one bit set per frame).
    continues: no discrete latent exists in this mode; the dump is the
              sign of the raw logit (on > off), which is the binary
              reading of the same head — decode still uses the raw
              logits (see discretize), only the text artifact needs bits.
    """
    if mode == "one_hot":
        on = logits[..., 0]
        return jax.nn.one_hot(jnp.argmax(on, axis=-1), on.shape[-1], dtype=jnp.int32)
    return hard_units(logits)  # binary + continues: threshold the head
