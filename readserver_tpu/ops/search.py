"""Batched lockstep backward search (the hot path, SURVEY.md §3.2).

The reference iterates one k-mer at a time through
``l' = C(c) + Occ(c, l-1)`` / ``u' = C(c) + Occ(c, u) - 1`` (inclusive
bounds, SGA convention).  Here the whole batch advances one character per
``lax.scan`` step over half-open intervals:

    l' = C[c] + occ(c, l);   u' = C[c] + occ(c, u)

with masking for variable-length queries and already-empty intervals (no
data-dependent control flow under jit).  Both ranks of a step are fused
into one ``[2B]`` gather so each scan step is a single row-gather +
popcount pass.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from readserver_tpu import alphabet
from readserver_tpu.ops import rank as rank_ops
from readserver_tpu.ops.types import DeviceIndex


def encode_query_batch(
    kmers: Sequence[np.ndarray | str | bytes], max_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-mers → (codes int32 [B, max_len] left-aligned 0-padded, lengths)."""
    B = len(kmers)
    out = np.zeros((B, max_len), dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for b, km in enumerate(kmers):
        codes = km if isinstance(km, np.ndarray) else alphabet.encode(km)
        L = len(codes)
        if L == 0 or L > max_len:
            raise ValueError(f"query length {L} outside [1, {max_len}]")
        out[b, :L] = codes
        lengths[b] = L
    return out, lengths


def backward_search(
    index: DeviceIndex,
    kmers: jax.Array,     # int32 [B, K], codes 1..4 left-aligned, 0 padding
    lengths: jax.Array,   # int32 [B]
    rank_fn=None,
) -> tuple[jax.Array, jax.Array]:
    """→ half-open interval ``(l, u)`` per query, int32 [B] each.

    ``count = u - l`` (occ monotonicity keeps ``l <= u`` throughout).
    ``rank_fn(c, i) -> occ`` may be overridden (Pallas kernel / sharded
    merge); default is the jnp fused-row rank.
    """
    B, K = kmers.shape
    if rank_fn is None:
        def rank_fn(c, i):
            return rank_ops.occ(index, c, i)

    C = index.C
    n = index.n
    l0 = jnp.zeros(B, dtype=jnp.int32)
    u0 = jnp.full(B, n, dtype=jnp.int32)

    # scan right-to-left: step t processes character position j = K-1-t
    cols = jnp.flip(kmers.T, axis=0)               # [K, B]
    js = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)  # [K]

    def step(carry, xs):
        l, u = carry
        c, j = xs
        active = (j < lengths) & (l < u)
        # fuse both ranks into one gather: [2B] positions, same chars
        cc = jnp.concatenate([c, c])
        ii = jnp.concatenate([l, u])
        occ2 = rank_fn(cc, ii)
        base = jnp.take(C, c)
        l2 = base + occ2[:B]
        u2 = base + occ2[B:]
        l = jnp.where(active, l2, l)
        u = jnp.where(active, u2, u)
        return (l, u), None

    (l, u), _ = jax.lax.scan(step, (l0, u0), (cols, js))
    return l, u


def interval_counts(l: jax.Array, u: jax.Array) -> jax.Array:
    return (u - l).astype(jnp.int32)
