"""Pallas formulation of the batched rank (occ) hot op.

The engine's rank is one row fetch from the fused rank-block table plus a
masked popcount (ops/rank.py).  Two device-side ways to fetch B random
rows from HBM:

1. **XLA row gather** (``jnp.take``) — what ops/rank.py uses.  Measured on
   v5e at B=262144 over a 109MB table: ~40-60M rows/s (per-row cost
   ≈ 12ns + 1.3ns per word; improves with batch size and cache residency).
2. **Pallas per-row DMA** (this file) — a scalar-prefetch grid where each
   step stages a tile of rows into VMEM with pipelined single-row DMAs,
   then does the masked popcount vectorized.  Verified correct in
   interpret mode; on real v5e the Mosaic compiler REJECTS it:

       Mosaic failed to compile TPU kernel: Slice shape along
       dimension 1 must be aligned to tiling (128), but is 5.

   i.e. DMA slices must be whole 128-lane tiles (512 bytes for uint32),
   so a 20-byte random row fetch is *inexpressible* as a Pallas DMA —
   the minimum addressable transfer is 512B (and ≥4KB with the (8,·)
   sublane rule).  A tile-granular workaround would move ≥200x the
   needed bytes per rank and still pay ~µs DMA issue cost per row.
   This settles the design question measured, not assumed: XLA's native
   gather (which can issue sub-tile row fetches) is the only viable
   path for batched rank on this hardware, and the Pallas win would
   have to come from fusing *across* scan steps — ruled out by the
   sequential data dependence of backward search.

Keeping this kernel serves three purposes: it documents the measurement
that justified the XLA-gather design (run ``compare_rank_impls``), it is
a parity reference for the packed-row bit layout independent of XLA's
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

TILE = 128   # queries per grid step
PIPE = 8     # DMA slots in flight


def _rank_kernel(idx_ref, within_ref, rows_hbm, out_ref, scratch, sems,
                 *, words: int, row_words: int):
    """One grid step: stage TILE rows via pipelined DMAs, then popcount."""
    t = pl.program_id(0)
    base = t * TILE

    def dma(j):
        # all static indices as int32: under x64, bare Python ints lower
        # as i64, which Mosaic memref ops reject
        row = idx_ref[base + jnp.int32(j)]
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row, 1), :],
            scratch.at[pl.ds(jnp.int32(j), 1), pl.ds(0, row_words)],
            sems.at[jnp.int32(j % PIPE)],
        )

    for j in range(PIPE):
        dma(j).start()
    for j in range(TILE):
        dma(j).wait()
        if j + PIPE < TILE:
            dma(j + PIPE).start()

    rows = scratch[:, 0:row_words]               # (TILE, row_words) uint32
    within = within_ref[:].reshape(TILE, 1)      # (TILE, 1) int32
    base_w = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE, words), 1) * 32
    )
    # explicit-dtype min/max: jnp.clip with python-int bounds hits a
    # RecursionError in this jax version's ufunc dispatch inside kernels
    bits = jnp.minimum(
        jnp.maximum(within - base_w, jnp.int32(0)), jnp.int32(32)
    )
    partial = (
        jnp.uint32(1)
        << jnp.minimum(bits, jnp.int32(31)).astype(jnp.uint32)
    ) - jnp.uint32(1)
    mask = jnp.where(bits >= 32, jnp.uint32(0xFFFFFFFF), partial)
    pops = jax.lax.population_count(rows[:, 1 : 1 + words] & mask)
    # Mosaic: no unsigned reductions, no 64-bit — sum in int32 explicitly
    out_ref[:] = rows[:, 0].astype(jnp.int32) + jnp.sum(
        pops.astype(jnp.int32), axis=1, dtype=jnp.int32
    )


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_symbol", "log2_block", "words_per_block",
                     "interpret"),
)
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
    """Pallas equivalent of ops/rank.occ_rows — identical results.

    B is padded to a multiple of TILE internally.
    """
    B = c.shape[0]
    Bp = -(-B // TILE) * TILE
    block = i >> log2_block
    within = i - (block << log2_block)
    flat = c * rows_per_symbol + block
    if Bp != B:
        flat = jnp.pad(flat, (0, Bp - B))
        within = jnp.pad(within, (0, Bp - B))
    row_words = rank_rows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row indices (drive the DMAs)
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda t, idx: (t,)),   # withins
            pl.BlockSpec(memory_space=pltpu.ANY),         # row table (HBM)
        ],
        out_specs=pl.BlockSpec((TILE,), lambda t, idx: (t,)),
        scratch_shapes=[
            # lane-aligned scratch (128-wide); rows land in the first
            # row_words columns
            pltpu.VMEM((TILE, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((PIPE,)),
        ],
    )
    kernel = functools.partial(
        _rank_kernel, words=words_per_block, row_words=row_words
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp,), jnp.int32),
        interpret=interpret,
    )(flat.astype(jnp.int32), within.astype(jnp.int32), rank_rows)
    return out[:B]


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
    out: dict = {}
    try:
        r2 = np.asarray(f_pal(c, ii))
        out["equal"] = bool(np.array_equal(r1, r2))
        impls = [("xla", f_xla), ("pallas", f_pal)]
    except Exception as e:  # Mosaic tiling rejection on real TPU
        out["pallas_error"] = str(e).split("\n")[0][:200]
        impls = [("xla", f_xla)]
    for name, f in impls:
        t0 = time.perf_counter()
        acc = [f(c, ii) for _ in range(iters)]
        np.asarray(jnp.stack(acc).sum())  # force completion
        dt = (time.perf_counter() - t0) / iters
        out[f"{name}_rows_per_s"] = round(B / dt)
    return out
