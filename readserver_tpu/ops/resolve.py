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
    # constant-init carries derive from `rows` (0*rows) so they inherit its
    # varying-axes type under any shard_map context (dp/shard agnostic)
    zero = rows * 0
    state = (
        jnp.where(valid, rows, 0),
        ~valid,                                  # done
        zero - 1,                                # read_id
        zero - 1,                                # offset
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


def resolve_rows_fast(
    index: DeviceIndex,
    rows: jax.Array,      # int32 [R] starting SA rows
    valid: jax.Array,     # bool  [R]
) -> tuple[jax.Array, jax.Array]:
    """Sampled-LF walk: ``(read_id, offset)`` int32 [R] in < sample_rate
    steps, one gather per step.

    Uses the precomputed LF array (``lf[i] = C[BWT[i]] + occ(BWT[i], i)``,
    sign bit marking sampled rows).  A walk ends either at a ``$``
    (``lf value < num_reads`` — that value IS the dollar_map key) or at a
    sampled row, whose mark-rank indexes the dense (read_id, offset) pair
    table.  Walk bound = sample_rate, not max read length.
    """
    assert index.lf is not None and index.sample_rate > 0
    R = rows.shape[0]
    # dynamic read count (C[1] == num_$ == num_reads): valid per-shard
    # under document sharding where each shard's m differs; clip bounds
    # below use the static (padded) array lengths, which is always safe
    m = index.C[1]
    n_marked = index.sample_pairs.shape[0]

    def lookup_terminal(cur, steps):
        """cur is terminal (either $-row or sampled row) — produce ids."""
        raw = jnp.take(index.lf, cur, axis=0)
        is_marked = raw < 0
        val = raw & jnp.int32(0x7FFFFFFF)
        # $ path: val = dollar rank
        rid_d = jnp.take(
            index.dollar_map,
            jnp.clip(val, 0, max(index.dollar_map.shape[0] - 1, 0)),
        )
        # sampled path: mark-rank → (read_id, offset)
        slot = rank_ops.occ_rows(
            index.mark_rank,
            jnp.zeros_like(cur),
            cur,
            rows_per_symbol=index.mark_rank.shape[0],
            log2_block=index.log2_block,
            words_per_block=index.words_per_block,
        )
        pair = jnp.take(
            index.sample_pairs,
            jnp.clip(slot, 0, max(n_marked - 1, 0)),
            axis=0,
        )
        rid = jnp.where(is_marked, pair[:, 0], rid_d)
        off = jnp.where(is_marked, pair[:, 1] + steps, steps)
        return rid, off

    def body(t, state):
        cur, done, steps = state
        raw = jnp.take(index.lf, cur, axis=0)
        is_term = (raw < 0) | ((raw & jnp.int32(0x7FFFFFFF)) < m)

        step_now = ~done & ~is_term
        nxt = raw & jnp.int32(0x7FFFFFFF)
        cur = jnp.where(step_now, nxt, cur)
        steps = steps + step_now.astype(jnp.int32)
        done = done | is_term
        return cur, done, steps

    state = (
        jnp.where(valid, rows, 0),
        ~valid,
        rows * 0,  # steps; 0*rows inherits rows' varying-axes type
    )
    cur, done, steps = jax.lax.fori_loop(0, index.sample_rate, body, state)
    rid, off = lookup_terminal(cur, steps)
    rid = jnp.where(valid & done, rid, -1)
    off = jnp.where(valid & done, off, -1)
    return rid, off


def resolve_rows_marked(
    index: DeviceIndex,
    rows: jax.Array,      # int32 [R] starting SA rows
    valid: jax.Array,     # bool  [R]
) -> tuple[jax.Array, jax.Array]:
    """Mark-walk resolve: the bounded (≤ sample_rate steps) walk WITHOUT
    the 4 B/sym ``lf`` array.

    The HBM budgeter (index/budget.py) drops ``lf`` first at chr20+ scale;
    this path keeps the walk bound using only the mark tier (0.75 B/sym):
    per step one sym4 gather (symbol), one rank-row gather (the LF step),
    and one mark-row gather (terminal test + slot rank, fused by
    :func:`rank_ops.bit_rank_and_test`) — 3 gathers/step vs the lf path's
    1 and the unbounded slow walk's 2 × max_read_len.
    """
    assert index.mark_rank is not None and index.sample_rate > 0
    C = index.C
    kw = dict(
        log2_block=index.log2_block, words_per_block=index.words_per_block
    )

    def body(t, state):
        cur, done, steps = state
        c = rank_ops.read_symbol(index, cur)
        _, marked = rank_ops.bit_rank_and_test(index.mark_rank, cur, **kw)
        is_term = marked | (c == 0)
        o = rank_ops.occ(index, c, cur)
        step_now = ~done & ~is_term
        cur = jnp.where(step_now, jnp.take(C, c) + o, cur)
        steps = steps + step_now.astype(jnp.int32)
        done = done | is_term
        return cur, done, steps

    state = (jnp.where(valid, rows, 0), ~valid, rows * 0)
    cur, done, steps = jax.lax.fori_loop(0, index.sample_rate, body, state)

    # terminal lookup: marked row → sampled (read_id, offset) pair;
    # $-row (BWT[cur] == 0) → occ(0, cur) IS the $-rank
    slot, marked = rank_ops.bit_rank_and_test(index.mark_rank, cur, **kw)
    o0 = rank_ops.occ(index, jnp.zeros_like(cur), cur)
    rid_d = jnp.take(
        index.dollar_map,
        jnp.clip(o0, 0, max(index.dollar_map.shape[0] - 1, 0)),
    )
    n_marked = index.sample_pairs.shape[0]
    pair = jnp.take(
        index.sample_pairs,
        jnp.clip(slot, 0, max(n_marked - 1, 0)),
        axis=0,
    )
    rid = jnp.where(marked, pair[:, 0], rid_d)
    off = jnp.where(marked, pair[:, 1] + steps, steps)
    rid = jnp.where(valid & done, rid, -1)
    off = jnp.where(valid & done, off, -1)
    return rid, off


def resolve_rows_dsa(
    index: DeviceIndex,
    rows: jax.Array,      # int32 [R] SA rows
    valid: jax.Array,     # bool  [R]
) -> tuple[jax.Array, jax.Array]:
    """Direct resolution: ``(read_id, offset)`` in ONE gather, no walk.

    ``dsa[row] = read_id << dsa_bits | offset`` (index/packing.pack_dsa)
    — the whole reference LF-walk + RocksDB lookup (SURVEY.md §3.3)
    collapses into a single HBM transaction per hit row.
    """
    assert index.dsa is not None and index.dsa_bits > 0
    p = jnp.take(index.dsa, jnp.where(valid, rows, 0), axis=0)
    bits = index.dsa_bits
    rid = (p >> bits).astype(jnp.int32)
    off = (p & jnp.uint32((1 << bits) - 1)).astype(jnp.int32)
    return jnp.where(valid, rid, -1), jnp.where(valid, off, -1)


def _fused_plane_pop(words: jax.Array, within: jax.Array) -> jax.Array:
    """words uint32 [R, W], within int32 [R] → masked popcount int32 [R]."""
    one = jnp.uint32(1)
    W = words.shape[1]
    word_base = jnp.arange(W, dtype=jnp.int32) * 32
    bits = jnp.clip(within[:, None] - word_base[None, :], 0, 32)
    partial = (one << jnp.minimum(bits, 31).astype(jnp.uint32)) - one
    mask = jnp.where(bits >= 32, jnp.uint32(0xFFFFFFFF), partial)
    pops = jax.lax.population_count(words & mask)
    return jnp.sum(pops, axis=1).astype(jnp.int32)


def _fused_bit_at(words: jax.Array, within: jax.Array) -> jax.Array:
    w = jnp.take_along_axis(words, (within >> 5)[:, None], axis=1)[:, 0]
    return ((w >> (within & 31).astype(jnp.uint32)) & jnp.uint32(1)) != 0


def _fused_step_fields(index: DeviceIndex, cur: jax.Array):
    """One fused-row gather → (symbol, occ(symbol, cur), marked, mark_slot).

    Row layout (index/packing.pack_fused_rows): columns 0..4 = occ
    checkpoints, 5 = mark-rank checkpoint, then 4 bitplanes of W words
    each: dollar, base-low, base-high, mark.
    """
    W = index.words_per_block
    row = jnp.take(index.fused_rows, cur >> index.log2_block, axis=0)
    within = cur & (index.block_size - 1)
    dollar = row[:, 6 : 6 + W]
    b0 = row[:, 6 + W : 6 + 2 * W]
    b1 = row[:, 6 + 2 * W : 6 + 3 * W]
    mk = row[:, 6 + 3 * W : 6 + 4 * W]
    is_dollar = _fused_bit_at(dollar, within)
    lo = _fused_bit_at(b0, within)
    hi = _fused_bit_at(b1, within)
    c = jnp.where(
        is_dollar,
        0,
        1 + lo.astype(jnp.int32) + 2 * hi.astype(jnp.int32),
    )
    # occ(c, cur): XNOR-match the target bits against the planes ($ rows
    # have zeroed base planes, so mask them out; for c == $ the dollar
    # plane IS the match plane)
    full = jnp.uint32(0xFFFFFFFF)
    t0x = jnp.where(lo, full, jnp.uint32(0))[:, None]
    t1x = jnp.where(hi, full, jnp.uint32(0))[:, None]
    match = (~(b0 ^ t0x)) & (~(b1 ^ t1x)) & (~dollar)
    match = jnp.where(is_dollar[:, None], dollar, match)
    ck = jnp.take_along_axis(row, c[:, None], axis=1)[:, 0].astype(jnp.int32)
    o = ck + _fused_plane_pop(match, within)
    marked = _fused_bit_at(mk, within)
    slot = row[:, 5].astype(jnp.int32) + _fused_plane_pop(mk, within)
    return c, o, marked, slot


def resolve_rows_fused(
    index: DeviceIndex,
    rows: jax.Array,      # int32 [R] starting SA rows
    valid: jax.Array,     # bool  [R]
) -> tuple[jax.Array, jax.Array]:
    """Fused-row walk: the bounded (≤ sample_rate steps) resolve at ONE
    gather per step.

    Same contract as :func:`resolve_rows_marked` but each step reads a
    single 64-byte fused row (symbol planes + occ checkpoints + mark
    plane in one transaction) instead of 3 separate gathers — the walk
    tier for chr20+ scale where the 4 B/sym ``dsa``/``lf`` tiers don't
    fit next to the 2-step search tier (index/budget.py).
    """
    assert index.fused_rows is not None and index.sample_rate > 0
    C = index.C

    def body(t, state):
        cur, done, steps = state
        c, o, marked, _ = _fused_step_fields(index, cur)
        is_term = marked | (c == 0)
        step_now = ~done & ~is_term
        cur = jnp.where(step_now, jnp.take(C, c) + o, cur)
        steps = steps + step_now.astype(jnp.int32)
        done = done | is_term
        return cur, done, steps

    state = (jnp.where(valid, rows, 0), ~valid, rows * 0)
    cur, done, steps = jax.lax.fori_loop(0, index.sample_rate, body, state)

    # terminal lookup: marked row → sampled pair; $-row → occ(0, cur) IS
    # the $-rank (c == 0 forces the dollar plane as match plane above)
    c, o, marked, slot = _fused_step_fields(index, cur)
    rid_d = jnp.take(
        index.dollar_map,
        jnp.clip(o, 0, max(index.dollar_map.shape[0] - 1, 0)),
    )
    n_marked = index.sample_pairs.shape[0]
    pair = jnp.take(
        index.sample_pairs,
        jnp.clip(slot, 0, max(n_marked - 1, 0)),
        axis=0,
    )
    rid = jnp.where(marked, pair[:, 0], rid_d)
    off = jnp.where(marked, pair[:, 1] + steps, steps)
    rid = jnp.where(valid & done, rid, -1)
    off = jnp.where(valid & done, off, -1)
    return rid, off


def select_walk(index: DeviceIndex, **slow_kw):
    """The best resolve strategy the shipped tiers support, best-first:
    dsa (1 gather, no walk) > lf (1×4B gather/step) > fused (1×64B
    gather/step) > marks (3 gathers/step) > slow (2 gathers × read_len)."""
    if index.dsa is not None and index.dsa_bits > 0:
        return lambda r, v: resolve_rows_dsa(index, r, v)
    if index.lf is not None and index.sample_rate > 0:
        return lambda r, v: resolve_rows_fast(index, r, v)
    if index.fused_rows is not None and index.sample_rate > 0:
        return lambda r, v: resolve_rows_fused(index, r, v)
    if index.mark_rank is not None and index.sample_rate > 0:
        return lambda r, v: resolve_rows_marked(index, r, v)
    return lambda r, v: resolve_rows(index, r, v, **slow_kw)


def resolve_intervals(
    index: DeviceIndex,
    l: jax.Array,
    u: jax.Array,
    max_hits: int,
    use_fast: bool | None = None,
    row_budget: int | None = None,
    **kw,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """→ ``(read_id, offset, valid)``, each [B, max_hits].

    With ``row_budget`` set, valid rows are compacted (prefix-sum scatter)
    into a static budget before the LF-walk and scattered back after — on
    typical 30x workloads only ~40% of the padded B·max_hits lanes are
    real hits, so a budget of B·max_hits/2 nearly halves the walk's gather
    volume without changing any answer (rows beyond the budget are
    dropped; their queries were already ``hits_truncated`` or become so).
    """
    rows, valid, _ = expand_intervals(l, u, max_hits)
    if use_fast is False:
        # explicit opt-out of every accelerated tier (parity tests)
        walk = lambda r, v: resolve_rows(index, r, v, **kw)
    elif use_fast is True:
        # explicit request for the lf sampled walk (parity tests)
        walk = lambda r, v: resolve_rows_fast(index, r, v)
    else:
        walk = select_walk(index, **kw)

    B = l.shape[0]
    F = B * max_hits
    if index.dsa is not None and index.dsa_bits > 0 and use_fast is None:
        # direct tier: one gather per lane — cheaper than the compaction
        # scatter/gather round-trip, so ignore row_budget entirely
        read_id, offset = walk(rows, valid)
    elif row_budget is not None and row_budget < F:
        R_c = row_budget
        pos = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
        keep = valid & (pos < R_c)
        slot = jnp.where(keep, pos, R_c)  # R_c = overflow slot, dropped
        comp_rows = jnp.zeros(R_c, dtype=rows.dtype).at[slot].set(
            rows, mode="drop"
        )
        comp_valid = jnp.zeros(R_c, dtype=bool).at[slot].set(
            keep, mode="drop"
        )
        # original flat index of each compact slot (F = dropped)
        orig = jnp.full(R_c, F, dtype=jnp.int32).at[slot].set(
            jnp.arange(F, dtype=jnp.int32), mode="drop"
        )
        rid_c, off_c = walk(comp_rows, comp_valid)
        read_id = jnp.full(F, -1, dtype=jnp.int32).at[orig].set(
            rid_c, mode="drop"
        )
        offset = jnp.full(F, -1, dtype=jnp.int32).at[orig].set(
            off_c, mode="drop"
        )
        valid = valid & keep
    else:
        read_id, offset = walk(rows, valid)
    return (
        read_id.reshape(B, max_hits),
        offset.reshape(B, max_hits),
        valid.reshape(B, max_hits),
    )


def exact_sample_histogram(
    index: DeviceIndex,
    l: jax.Array,         # int32 [B]
    u: jax.Array,         # int32 [B]
    window: int,
    max_rows: int | None = None,
    **walk_kw,
) -> tuple[jax.Array, jax.Array]:
    """Exact per-sample attribution over FULL intervals — no hit cap.

    The capped path (``resolve_intervals`` + ``sample_histogram``) stops at
    ``max_hits`` rows per query, which silently truncates population-scale
    presence histograms (BASELINE.json config 5 answers).  Here the
    CONCATENATION of all query intervals is swept as one dense worklist:
    iteration ``t`` resolves global rows ``[t·window, (t+1)·window)`` — a
    searchsorted over the count prefix sums maps each global slot back to
    its (query, SA row) — so no lane is wasted on exhausted queries and the
    total gather volume is exactly ``Σ counts`` walks.  A ``lax.while_loop``
    runs until the worklist is empty (or ``max_rows``, the safety valve for
    adversarially frequent k-mers).

    Returns ``(hist int32 [B, num_samples], complete bool [B])`` —
    ``complete[b]`` is False only when the ``max_rows`` cap cut query b off.
    The cap binds in whole ``window`` rounds (the loop exits before the
    first round whose START is past the cap), so the effective row limit
    rounds up to a window multiple — callers that need a tight cap should
    pass a window at or below it.
    """
    B = l.shape[0]
    S = max(index.num_samples, 1)
    # int64 throughout the worklist bookkeeping: a batch's summed interval
    # counts can exceed 2^31 for repetitive k-mers at population scale
    # (the sharded path already does this — parallel/sharded.py)
    counts = (u - l).astype(jnp.int64)
    cum = jnp.cumsum(counts)                      # [B] int64
    total = cum[B - 1]
    span = jnp.arange(window, dtype=jnp.int64)    # [W]

    walk = select_walk(index, **walk_kw)

    def cond(state):
        t, _ = state
        done = t * window >= total
        if max_rows is not None:
            done = done | (t * window >= max_rows)
        return ~done

    def body(state):
        t, hist = state
        g = t * window + span                     # global worklist slots
        valid = g < total
        q = jnp.searchsorted(cum, g, side="right").astype(jnp.int32)
        qc = jnp.minimum(q, B - 1)
        prev = jnp.where(qc > 0, jnp.take(cum, jnp.maximum(qc - 1, 0)), 0)
        # per-interval offset fits int32 (interval count < n < 2^31/shard)
        rows = jnp.take(l, qc) + (g - prev).astype(l.dtype)
        rid, _ = walk(jnp.where(valid, rows, 0), valid)
        sample = jnp.take(
            index.read_to_sample,
            jnp.clip(rid, 0, max(index.num_reads - 1, 0)),
        )
        seg = qc * S + sample
        hist = hist + jax.ops.segment_sum(
            valid.astype(jnp.int32), seg, num_segments=B * S
        ).reshape(B, S)
        return t + 1, hist

    zero = jnp.zeros((B, S), dtype=jnp.int32) + (l[:, None] * 0)
    t_end, hist = jax.lax.while_loop(cond, body, (jnp.int64(0), zero))
    # rows are swept in concatenated order, so query b completed iff its
    # interval's end fell inside the processed prefix (always true
    # without a max_rows cap: the loop only exits at >= total)
    complete = cum <= t_end * window
    return hist, complete


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
