"""Pallas formulation of the batched rank (occ) hot op.

The engine's rank is one row fetch from the fused rank-block table plus a
masked popcount (ops/rank.py).  Two device-side ways to fetch B random
rows from HBM:

1. **XLA row gather** (``jnp.take``) — what ops/rank.py uses.  Measured on
   v5e at B=262144 over a 109MB table: ~40-60M rows/s (per-row cost
   ≈ 12ns + 1.3ns per word; improves with batch size and cache residency).
2. **Pallas per-row DMA** (this file) — a ``PrefetchScalarGridSpec`` grid
   with the row index as a scalar-prefetch operand and a one-row block per
   grid step; the pipeline double-buffers the row DMAs.  Each step moves
   20 bytes and does a handful of VPU ops, so throughput is bounded by the
   per-step DMA issue rate (~1µs) → ~1M rows/s: **~50x slower than the
   XLA gather**.  TPU has no per-lane gather DMA engine accessible from
   Pallas, so a hand-written kernel cannot beat XLA's native gather for
   this access pattern — the win from Pallas would have to come from
   fusing *across* scan steps, which the sequential data dependence of
   backward search (next step's rows depend on this step's ranks) makes
   impossible without speculation.

Keeping this kernel serves three purposes: it documents the measurement
that justified the XLA-gather design (run ``compare_rank_impls``), it is
the parity reference for the packed-row bit layout independent of XLA's
gather lowering, and it is the starting point for future fused-step
experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readserver_tpu.ops import rank as rank_ops
from readserver_tpu.ops.types import DeviceIndex


def _rank_kernel(row_idx_ref, within_ref, row_ref, out_ref, *, words: int):
    """One grid step = one query: row_ref is the (1, row_words) block the
    index_map selected from the scalar-prefetched row index."""
    i = pl.program_id(0)
    within = within_ref[i]
    base = row_ref[0, 0].astype(jnp.int32)
    word_base = jax.lax.broadcasted_iota(jnp.int32, (1, words), 1) * 32
    bits = jnp.clip(within - word_base, 0, 32)
    partial = (jnp.uint32(1) << jnp.minimum(bits, 31).astype(jnp.uint32)) - (
        jnp.uint32(1)
    )
    mask = jnp.where(bits >= 32, jnp.uint32(0xFFFFFFFF), partial)
    words_v = row_ref[0:1, 1 : 1 + words]
    pops = jax.lax.population_count(words_v & mask)
    out_ref[0] = base + jnp.sum(pops).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rows_per_symbol", "log2_block",
                                             "words_per_block", "interpret"))
def occ_pallas_rows(
    rank_rows: jax.Array,
    c: jax.Array,
    i: jax.Array,
    *,
    rows_per_symbol: int,
    log2_block: int,
    words_per_block: int,
    interpret: bool = False,
) -> jax.Array:
    """Pallas equivalent of ops/rank.occ_rows — identical results."""
    B = c.shape[0]
    block = i >> log2_block
    within = i - (block << log2_block)
    flat = c * rows_per_symbol + block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (row indices, withins)
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, rank_rows.shape[1]),
                lambda q, idx_ref, within_ref: (idx_ref[q], 0),
            ),
        ],
        out_specs=pl.BlockSpec((1,), lambda q, idx_ref, within_ref: (q,)),
    )
    kernel = functools.partial(_rank_kernel, words=words_per_block)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        interpret=interpret,
    )(flat.astype(jnp.int32), within.astype(jnp.int32), rank_rows)


def occ_pallas(
    index: DeviceIndex, c: jax.Array, i: jax.Array, interpret: bool = False
) -> jax.Array:
    """Drop-in Pallas version of ops.rank.occ."""
    return occ_pallas_rows(
        index.rank_rows,
        c,
        i,
        rows_per_symbol=index.rows_per_symbol,
        log2_block=index.log2_block,
        words_per_block=index.words_per_block,
        interpret=interpret,
    )


def compare_rank_impls(index: DeviceIndex, B: int = 65536, iters: int = 10,
                       seed: int = 0) -> dict:
    """Measure XLA-gather rank vs Pallas per-row-DMA rank on this device.

    Returns {"xla_rows_per_s": ..., "pallas_rows_per_s": ..., "equal": ...}.
    """
    import time

    rng = np.random.default_rng(seed)
    c = jax.device_put(rng.integers(0, 5, size=B).astype(np.int32))
    ii = jax.device_put(rng.integers(0, index.n + 1, size=B).astype(np.int32))

    f_xla = jax.jit(lambda c, i: rank_ops.occ(index, c, i))
    f_pal = jax.jit(lambda c, i: occ_pallas(index, c, i))

    r1 = np.asarray(f_xla(c, ii))
    r2 = np.asarray(f_pal(c, ii))
    out = {"equal": bool(np.array_equal(r1, r2))}
    for name, f in [("xla", f_xla), ("pallas", f_pal)]:
        t0 = time.perf_counter()
        acc = [f(c, ii) for _ in range(iters)]
        np.asarray(jnp.stack(acc).sum())  # force completion
        dt = (time.perf_counter() - t0) / iters
        out[f"{name}_rows_per_s"] = round(B / dt)
    return out
