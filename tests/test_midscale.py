"""Mid-scale CI tier (~20M symbols, marked slow): exercises real block
counts (hundreds of thousands of rank blocks), the k-step tier auto-gating,
and wide-batch parity — the layout/overflow regime the toy corpora
(tiny=20k, small=300k symbols) never reach.  SURVEY.md §4's oracle-diff
idiom at a scale where the naive scan is only affordable via the 2-bit
window multiset."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from readserver_tpu.corpus import simulate
from readserver_tpu.index import builder
from readserver_tpu.ops import (
    DeviceIndex,
    backward_search,
    backward_search_pair,
    build_prefix_lut,
    encode_query_batch,
    resolve_intervals,
)
from readserver_tpu.oracle.naive import window_multiset_counts


@pytest.fixture(scope="module")
def mid():
    corpus = simulate.simulate_config("ecoli", scale=0.15)  # ~21M symbols
    packed = builder.build_index(corpus.reads, sample_ids=corpus.sample_ids)
    return corpus, packed


@pytest.mark.slow
def test_midscale_build_shape(mid):
    corpus, packed = mid
    assert packed.n > 15_000_000  # genuinely mid-scale
    assert packed.num_blocks > 200_000  # real block counts
    # auto tier selection: n < TRIPLE_TIER_MAX_N keeps the 3-step tier
    assert packed.n <= builder.TRIPLE_TIER_MAX_N
    assert packed.rank3_blocks is not None
    # checkpoint columns are strictly monotone per plane and end at C diffs
    rb = packed.rank_blocks
    for c in range(5):
        ck = rb[c, :, 0].astype(np.int64)
        assert (np.diff(ck) >= 0).all()
        assert ck[-1] == packed.symbol_counts[c]


@pytest.mark.slow
def test_midscale_search_resolve_parity(mid):
    corpus, packed = mid
    k = corpus.spec.kmer_len
    B = 512
    kmers = simulate.sample_query_kmers_fast(
        corpus, B, k, seed=5, miss_frac=0.15
    ).astype(np.int32)
    lengths = np.full(B, k, dtype=np.int32)
    dev = DeviceIndex.from_packed(packed)
    l1, u1 = jax.jit(backward_search)(dev, kmers, lengths)
    lut = build_prefix_lut(dev, 8)
    l2, u2 = jax.jit(
        lambda d, km: backward_search_pair(d, km, lut, 8)
    )(dev, kmers)
    l1, u1, l2, u2 = map(np.asarray, (l1, u1, l2, u2))
    # 3-step+LUT path bit-identical to plain (canonical empties included)
    assert np.array_equal(l1, l2) and np.array_equal(u1, u2)
    # oracle parity for the whole batch via the exact window multiset
    mat = np.stack(corpus.reads)
    want = window_multiset_counts(mat, kmers.astype(np.uint8))
    assert np.array_equal((u1 - l1).astype(np.int64), want)
    # resolve parity: every reported (read, offset) spells its k-mer
    H = 16
    rid, off, valid = jax.jit(
        lambda d, a, b: resolve_intervals(d, a, b, max_hits=H)
    )(dev, l1, u1)
    rid, off, valid = map(np.asarray, (rid, off, valid))
    sel = np.random.default_rng(3).choice(B, 48, replace=False)
    for qi in sel:
        v = valid[qi]
        assert int(v.sum()) == min(int(u1[qi] - l1[qi]), H)
        for r, o in zip(rid[qi][v], off[qi][v]):
            assert np.array_equal(
                mat[r, o : o + k].astype(np.int32), kmers[qi]
            ), qi


@pytest.mark.slow
def test_midscale_chr20_serving_shape(mid):
    """The exact tier shape the chr20 budget plan ships ({rank2, fused} —
    see index/budget.py) resolves bit-identically to the full tier set at
    real block counts: the fused walk's masked-popcount plane decode must
    agree with dsa across hundreds of thousands of blocks."""
    corpus, packed = mid
    k = corpus.spec.kmer_len
    B = 256
    kmers = simulate.sample_query_kmers_fast(
        corpus, B, k, seed=9, miss_frac=0.1
    ).astype(np.int32)
    lengths = np.full(B, k, dtype=np.int32)
    full = DeviceIndex.from_packed(packed)
    chr20_shape = DeviceIndex.from_packed(packed, tiers={"rank2", "fused"})
    assert chr20_shape.dsa is None and chr20_shape.lf is None
    assert chr20_shape.fused_rows is not None

    def run(dev):
        l, u = backward_search(dev, kmers, lengths)
        return resolve_intervals(dev, l, u, max_hits=16)

    a = jax.tree_util.tree_map(np.asarray, jax.jit(run)(full))
    b = jax.tree_util.tree_map(np.asarray, jax.jit(run)(chr20_shape))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_triple_tier_gating(monkeypatch, tiny_corpus):
    """Auto kstep drops to 2 above TRIPLE_TIER_MAX_N (the 16 B/sym tier is
    capacity-gated, builder.py)."""
    monkeypatch.setattr(builder, "TRIPLE_TIER_MAX_N", 1)
    packed = builder.build_index(tiny_corpus.reads[:50])
    assert packed.rank2_blocks is not None
    assert packed.rank3_blocks is None
