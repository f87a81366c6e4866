"""Lockstep LF-walk: SA rows → read IDs / offsets / sample attribution.

The reference walks each result row through ``i ← C(BWT[i]) + Occ(BWT[i], i)``
until it hits ``$``, then looks the ``$``-rank up in RocksDB
(SURVEY.md §3.3).  Here every row of every query interval walks in lockstep
under a ``fori_loop`` bounded by the max read length, with masks for
finished rows; the ``$``-rank indexes the dense on-device ``dollar_map``,
and sample attribution is a second gather + ``segment_sum``.

A key fusion: when the current symbol is ``$`` (code 0), the LF rank
``occ(0, i)`` *is* the ``$``-rank — so one rank per step serves both the
walk and the terminal read-ID lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from readserver_tpu.ops import rank as rank_ops
from readserver_tpu.ops.types import DeviceIndex


def resolve_rows(
    index: DeviceIndex,
    rows: jax.Array,      # int32 [R] starting SA rows
    valid: jax.Array,     # bool  [R]
    max_steps: int | None = None,
    rank_fn=None,
    sym_fn=None,
) -> tuple[jax.Array, jax.Array]:
    """→ ``(read_id, offset)`` int32 [R]; -1 where invalid/unterminated."""
    if max_steps is None:
        max_steps = index.max_read_len
    if rank_fn is None:
        def rank_fn(c, i):
            return rank_ops.occ(index, c, i)
    if sym_fn is None:
        def sym_fn(i):
            return rank_ops.read_symbol(index, i)

    C = index.C
    R = rows.shape[0]
    state = (
        jnp.where(valid, rows, 0),
        ~valid,                                  # done
        jnp.full(R, -1, dtype=jnp.int32),        # read_id
        jnp.full(R, -1, dtype=jnp.int32),        # offset
    )

    def body(t, state):
        cur, done, read_id, offset = state
        c = sym_fn(cur)                          # [R] int32 0..4
        o = rank_fn(c, cur)                      # occ(c, cur)
        hit = (c == 0) & ~done
        rid = jnp.take(
            index.dollar_map,
            jnp.clip(o, 0, max(index.num_reads - 1, 0)),
            axis=0,
        )
        read_id = jnp.where(hit, rid, read_id)
        offset = jnp.where(hit, t, offset)
        done = done | (c == 0)
        nxt = jnp.take(C, c) + o                 # LF step
        cur = jnp.where(done, cur, nxt)
        return cur, done, read_id, offset

    _, _, read_id, offset = jax.lax.fori_loop(0, max_steps, body, state)
    return read_id, offset


def expand_intervals(
    l: jax.Array, u: jax.Array, max_hits: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Intervals [B] → flattened candidate rows [B*max_hits].

    Returns ``(rows, valid, query_seg)``.  Like the reference server, hit
    enumeration is capped per query (``max_hits``); counts are always exact
    via ``u - l``.
    """
    B = l.shape[0]
    span = jnp.arange(max_hits, dtype=jnp.int32)          # [H]
    rows = (l[:, None] + span[None, :]).reshape(-1)
    valid = (span[None, :] < (u - l)[:, None]).reshape(-1)
    seg = jnp.repeat(jnp.arange(B, dtype=jnp.int32), max_hits)
    return jnp.where(valid, rows, 0), valid, seg


def resolve_intervals(
    index: DeviceIndex,
    l: jax.Array,
    u: jax.Array,
    max_hits: int,
    **kw,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """→ ``(read_id, offset, valid)``, each [B, max_hits]."""
    rows, valid, _ = expand_intervals(l, u, max_hits)
    read_id, offset = resolve_rows(index, rows, valid, **kw)
    B = l.shape[0]
    return (
        read_id.reshape(B, max_hits),
        offset.reshape(B, max_hits),
        valid.reshape(B, max_hits),
    )


def sample_histogram(
    index: DeviceIndex,
    read_id: jax.Array,   # int32 [B, H]
    valid: jax.Array,     # bool  [B, H]
) -> jax.Array:
    """Per-query per-sample hit counts [B, num_samples] via segment_sum —
    the population-attribution answer of BASELINE.json config 5."""
    B, H = read_id.shape
    S = max(index.num_samples, 1)
    rid = jnp.clip(read_id, 0, max(index.num_reads - 1, 0))
    sample = jnp.take(index.read_to_sample, rid, axis=0)  # [B, H]
    seg = jnp.arange(B, dtype=jnp.int32)[:, None] * S + sample
    flat = jax.ops.segment_sum(
        valid.astype(jnp.int32).reshape(-1),
        seg.reshape(-1),
        num_segments=B * S,
    )
    return flat.reshape(B, S)
