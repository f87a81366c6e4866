"""Document sharding: per-read-subset sub-indexes, merge-at-the-end.

This is the decomposition the reference actually deployed: the population
BWT was *split across backend servers by sample subset*, each backend a
complete FM-index over its own reads, and the front end summed per-shard
counts (SURVEY.md §1 L5, §2.3 "data parallel" / "shard parallel" rows).
It complements the interval sharding in ``sharded.py``:

* **interval sharding** (BASELINE.json's pinned design): one global BWT
  split by position; exact global SA intervals; one psum per scan step;
  requires a global build (or a merge) — in-core scale.
* **document sharding** (this file): each shard built independently
  in-core from its read partition — the only build-feasible path at
  whole-human scale — and the query program is embarrassingly parallel:
  every shard runs the complete search+resolve on the (replicated) batch
  with NO per-step collectives; counts psum once at the end, hit sets
  concatenate, read ids map to the global space by per-shard offsets
  (the merged-index ordering of index/merge.py, so answers are identical
  to a monolithic build).

The ops refactor that enables this: every per-shard quantity the search
and resolve need (n, num_reads) is read dynamically from the shard's C
array, so one program serves shards of different sizes padded to common
array shapes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from readserver_tpu.index.builder import PackedIndex
from readserver_tpu.ops import resolve as resolve_ops
from readserver_tpu.ops import search as search_ops
from readserver_tpu.ops.lut import build_prefix_lut
from readserver_tpu.ops.types import DeviceIndex


@dataclass(frozen=True)
class DocShardedIndex:
    """S stacked, zero-padded DeviceIndexes + global id offsets."""

    # stacked array fields (leading dim S)
    rank_rows: jax.Array
    sym4: jax.Array
    C: jax.Array              # int32 [S, 6]
    dollar_map: jax.Array
    read_to_sample: jax.Array
    read_lengths: jax.Array
    lf: jax.Array | None
    mark_rank: jax.Array | None
    sample_pairs: jax.Array | None
    # direct/fused resolve tiers (ops/resolve), stacked per shard: with
    # dsa each shard resolves its own hits in ONE local gather — no walk
    # and still no per-step collectives (the doc decomposition's point)
    dsa: jax.Array | None
    fused_rows: jax.Array | None
    lut: jax.Array | None     # int32 [S, 4^p, 2] per-shard prefix LUTs
    read_offsets: jax.Array   # int64 [S] global read-id base per shard
    # shared statics (padded maxima)
    num_shards: int = dataclasses.field(metadata=dict(static=True), default=1)
    num_samples: int = dataclasses.field(metadata=dict(static=True), default=1)
    rows_per_symbol: int = dataclasses.field(metadata=dict(static=True), default=1)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=128)
    words_per_block: int = dataclasses.field(metadata=dict(static=True), default=4)
    max_read_len: int = dataclasses.field(metadata=dict(static=True), default=256)
    sample_rate: int = dataclasses.field(metadata=dict(static=True), default=0)
    lut_p: int = dataclasses.field(metadata=dict(static=True), default=0)
    dsa_bits: int = dataclasses.field(metadata=dict(static=True), default=0)


_DOC_ARRAYS = [
    "rank_rows", "sym4", "C", "dollar_map", "read_to_sample",
    "read_lengths", "lf", "mark_rank", "sample_pairs", "dsa", "fused_rows",
    "lut", "read_offsets",
]
_DOC_META = [
    "num_shards", "num_samples", "rows_per_symbol", "block_size",
    "words_per_block", "max_read_len", "sample_rate", "lut_p", "dsa_bits",
]

jax.tree_util.register_dataclass(
    DocShardedIndex, data_fields=_DOC_ARRAYS, meta_fields=_DOC_META
)


def _pad_stack(arrays: list[np.ndarray]) -> np.ndarray:
    """Stack along a new axis, zero-padding every dim to the max."""
    shape = tuple(
        max(a.shape[d] for a in arrays) for d in range(arrays[0].ndim)
    )
    out = np.zeros((len(arrays),) + shape, dtype=arrays[0].dtype)
    for s, a in enumerate(arrays):
        out[(s,) + tuple(slice(0, d) for d in a.shape)] = a
    return out


def build_doc_sharded(
    partitions: Sequence[PackedIndex], lut_p: int = 0
) -> DocShardedIndex:
    """Independent per-partition indexes → stacked doc-sharded index.

    Global read ids follow partition order then within-partition order
    (the index/merge.py ordering).  ``lut_p > 0`` builds a per-shard
    prefix LUT (each shard's p-mer intervals are in its own SA space).
    """
    if not partitions:
        raise ValueError("no partitions")
    devs = [DeviceIndex.from_packed(p) for p in partitions]
    has_fr = all(d.lf is not None for d in devs)
    # dsa packs (read_id << bits); shards must agree on bits to share one
    # program (they do whenever read-length distributions match)
    bits = {d.dsa_bits for d in devs}
    has_dsa = all(d.dsa is not None for d in devs) and len(bits) == 1
    has_fused = all(d.fused_rows is not None for d in devs) and all(
        d.sample_pairs is not None for d in devs
    )
    luts = None
    if lut_p:
        luts = _pad_stack(
            [np.asarray(build_prefix_lut(d, lut_p)) for d in devs]
        )
    read_offsets = np.zeros(len(partitions), dtype=np.int64)
    np.cumsum(
        [p.num_reads for p in partitions[:-1]], out=read_offsets[1:]
    )
    kw = dict(
        rank_rows=_pad_stack([np.asarray(d.rank_rows) for d in devs]),
        sym4=_pad_stack([np.asarray(d.sym4) for d in devs]),
        C=_pad_stack([np.asarray(d.C) for d in devs]),
        dollar_map=_pad_stack([np.asarray(d.dollar_map) for d in devs]),
        read_to_sample=_pad_stack(
            [np.asarray(d.read_to_sample) for d in devs]
        ),
        read_lengths=_pad_stack([np.asarray(d.read_lengths) for d in devs]),
        lf=_pad_stack([np.asarray(d.lf) for d in devs]) if has_fr else None,
        mark_rank=_pad_stack([np.asarray(d.mark_rank) for d in devs])
        if has_fr
        else None,
        sample_pairs=_pad_stack([np.asarray(d.sample_pairs) for d in devs])
        if (has_fr or has_fused)
        else None,
        dsa=_pad_stack([np.asarray(d.dsa) for d in devs]) if has_dsa else None,
        fused_rows=_pad_stack([np.asarray(d.fused_rows) for d in devs])
        if has_fused
        else None,
        dsa_bits=devs[0].dsa_bits if has_dsa else 0,
        lut=luts,
        read_offsets=read_offsets,
        num_shards=len(partitions),
        num_samples=max(max(p.num_samples for p in partitions), 1),
        rows_per_symbol=max(d.rows_per_symbol for d in devs),
        block_size=devs[0].block_size,
        words_per_block=devs[0].words_per_block,
        max_read_len=max(d.max_read_len for d in devs),
        sample_rate=devs[0].sample_rate if (has_fr or has_fused) else 0,
        lut_p=lut_p,
    )
    # rows_per_symbol must describe the PADDED rank_rows layout: re-pad
    # each shard's table so symbol planes start at multiples of the max
    rps = kw["rows_per_symbol"]
    R = devs[0].rank_rows.shape[1]
    fixed = np.zeros((len(devs), 5, rps, R), dtype=np.uint32)
    for s, d in enumerate(devs):
        t = np.asarray(d.rank_rows).reshape(5, d.rows_per_symbol, R)
        fixed[s, :, : d.rows_per_symbol] = t
    kw["rank_rows"] = fixed.reshape(len(devs), 5 * rps, R)
    return DocShardedIndex(**kw)


def doc_specs(didx: DocShardedIndex) -> DocShardedIndex:
    kw = {}
    for f in _DOC_ARRAYS:
        v = getattr(didx, f)
        kw[f] = None if v is None else P("shard", *([None] * (np.ndim(v) - 1)))
    for f in _DOC_META:
        kw[f] = getattr(didx, f)
    return DocShardedIndex(**kw)


def place_doc_sharded(didx: DocShardedIndex, mesh) -> DocShardedIndex:
    specs = doc_specs(didx)
    kw = {}
    for f in _DOC_ARRAYS:
        v = getattr(didx, f)
        kw[f] = (
            None
            if v is None
            else jax.device_put(np.asarray(v), NamedSharding(mesh, getattr(specs, f)))
        )
    for f in _DOC_META:
        kw[f] = getattr(didx, f)
    return DocShardedIndex(**kw)


def _local_device_index(didx: DocShardedIndex) -> DeviceIndex:
    """Per-device view: squeeze the stacked dim into a DeviceIndex."""
    has_fr = didx.lf is not None
    return DeviceIndex(
        rank_rows=didx.rank_rows[0],
        sym4=didx.sym4[0],
        C=didx.C[0],
        dollar_map=didx.dollar_map[0],
        read_to_sample=didx.read_to_sample[0],
        read_lengths=didx.read_lengths[0],
        lf=didx.lf[0] if has_fr else None,
        mark_rank=didx.mark_rank[0] if has_fr else None,
        sample_pairs=(
            didx.sample_pairs[0] if didx.sample_pairs is not None else None
        ),
        dsa=didx.dsa[0] if didx.dsa is not None else None,
        fused_rows=(
            didx.fused_rows[0] if didx.fused_rows is not None else None
        ),
        n=0,  # unused: search/resolve read n, m dynamically from C
        num_reads=int(didx.dollar_map.shape[1]),
        num_samples=didx.num_samples,
        num_blocks=didx.rows_per_symbol - 1,
        block_size=didx.block_size,
        words_per_block=didx.words_per_block,
        max_read_len=didx.max_read_len,
        sample_rate=didx.sample_rate,
        dsa_bits=didx.dsa_bits,
    )


def _doc_query_body(
    didx, kmers, lengths, *,
    max_hits: int, row_budget, exact_hist: bool = False,
    exact_max_rows: int | None = None,
):
    """Per-shard complete query; collectives only at the very end."""
    local = _local_device_index(didx)
    if didx.lut_p:
        l, u = search_ops.backward_search_lut(
            local, didx.lut[0], didx.lut_p, kmers, lengths
        )
    else:
        l, u = search_ops.backward_search(local, kmers, lengths)
    rid, off, valid = resolve_ops.resolve_intervals(
        local, l, u, max_hits, row_budget=row_budget
    )
    # local → global read ids
    rid_g = jnp.where(
        valid, rid + didx.read_offsets[0].astype(jnp.int32), -1
    )
    count = (u - l).astype(jnp.int64)
    total = jax.lax.psum(count, "shard")  # the front-end merge, once
    # per-sample attribution: sample ids are already global
    B, H = rid.shape
    S = didx.num_samples
    if exact_hist:
        # exact attribution (no hit cap): each shard sweeps its own FULL
        # intervals (ops/resolve.exact_sample_histogram dense worklist);
        # per-shard hists psum into the global answer
        hist, complete = resolve_ops.exact_sample_histogram(
            local, l, u, window=B * H, max_rows=exact_max_rows
        )
        hist = jax.lax.psum(hist, "shard")
        hist_complete = (
            jax.lax.psum(complete.astype(jnp.int32), "shard")
            == didx.num_shards
        )
    else:
        sample = jnp.take(
            didx.read_to_sample[0],
            jnp.clip(rid, 0, didx.read_to_sample.shape[1] - 1),
            axis=0,
        )
        seg = (
            jnp.repeat(jnp.arange(B, dtype=jnp.int32), H)
            * S + sample.reshape(-1)
        )
        hist = jax.ops.segment_sum(
            valid.astype(jnp.int32).reshape(-1), seg, num_segments=B * S
        ).reshape(B, S)
        hist = jax.lax.psum(hist, "shard")
        hist_complete = total <= H  # capped: only exact when fully resolved
    # per-shard outputs carry a leading size-1 axis that shard_map tiles
    # into the stacked [S, ...] result
    return dict(
        count=total,
        shard_count=count[None],
        read_id=rid_g[None],
        offset=off[None],
        valid=valid[None],
        sample_hist=hist,
        hist_complete=hist_complete,
    )


def make_doc_query_fn(
    didx: DocShardedIndex, mesh, max_hits: int = 64, row_budget=None,
    exact_hist: bool = False, exact_max_rows: int | None = None,
):
    """jit'd doc-sharded query fn.

    Queries are replicated across 'shard' (every shard answers for its own
    reads); per-shard hit tensors come back stacked on a leading shard
    axis for the host to concatenate — exactly the reference's front-end
    merge, moved on-device for counts/histograms and to one all-gather
    for hit sets.
    """
    specs = doc_specs(didx)
    fn = jax.shard_map(
        partial(
            _doc_query_body,
            max_hits=max_hits,
            row_budget=row_budget,
            exact_hist=exact_hist,
            exact_max_rows=exact_max_rows,
        ),
        mesh=mesh,
        in_specs=(specs, P(None, None), P(None)),
        out_specs=dict(
            count=P(),
            shard_count=P("shard", None),
            read_id=P("shard", None, None),
            offset=P("shard", None, None),
            valid=P("shard", None, None),
            sample_hist=P(),
            hist_complete=P(),
        ),
    )
    return jax.jit(fn)
