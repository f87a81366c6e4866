"""Interleave merge (csrc/merge.cpp + NumPy fallback) and from-BWT packing:
both must be bit-identical to the read-level rebuild path, and a bare BWT
must round-trip to a fully working index (import path)."""

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.index import build_index
from readserver_tpu.index.from_bwt import index_from_bwt, invert_bwt
from readserver_tpu.index.merge import (
    merge_bwts,
    merge_indexes,
    merge_indexes_interleave,
)
from readserver_tpu.index.packing import unpack_sym4
from readserver_tpu.native import native_available


def _random_reads(rng, n, lo=8, hi=60):
    return [
        rng.integers(1, 5, size=int(rng.integers(lo, hi))).astype(np.uint8)
        for _ in range(n)
    ]


def _bwt_of(idx):
    return unpack_sym4(np.asarray(idx.sym4), idx.n)


def _assert_indexes_identical(a, b, check_samples=True):
    assert a.n == b.n and a.num_reads == b.num_reads
    assert np.array_equal(a.C, b.C)
    assert np.array_equal(_bwt_of(a), _bwt_of(b))
    assert np.array_equal(a.rank_blocks, b.rank_blocks)
    assert np.array_equal(a.dollar_map, b.dollar_map)
    assert np.array_equal(a.read_lengths, b.read_lengths)
    assert np.array_equal(a.read_offsets, b.read_offsets)
    assert np.array_equal(a.corpus_packed, b.corpus_packed)
    if check_samples:
        assert np.array_equal(a.read_to_sample, b.read_to_sample)
    assert a.sample_rate == b.sample_rate
    assert np.array_equal(a.lf, b.lf)
    assert np.array_equal(a.mark_rank, b.mark_rank)
    assert np.array_equal(a.sample_pairs, b.sample_pairs)


def test_merge_bwts_numpy_fallback_matches_native(rng):
    if not native_available():
        pytest.skip("native merge not built")
    r1 = _random_reads(rng, 40)
    r2 = _random_reads(rng, 25)
    b1 = _bwt_of(build_index(r1))
    b2 = _bwt_of(build_index(r2))
    maxlen = max(max(len(r) for r in r1), max(len(r) for r in r2))

    native = merge_bwts(b1, len(r1), b2, len(r2), maxlen)
    # force the NumPy path: make the native symbol uncallable for one call
    import readserver_tpu.native as nat

    real = nat.bwt_merge2_native
    nat.bwt_merge2_native = None
    try:
        fallback = merge_bwts(b1, len(r1), b2, len(r2), maxlen)
    finally:
        nat.bwt_merge2_native = real
    assert np.array_equal(native[0], fallback[0])
    assert np.array_equal(native[1], fallback[1])


def test_interleave_merge_identical_to_rebuild(rng):
    parts = [_random_reads(rng, n) for n in (30, 17, 44)]
    idxs = [build_index(p) for p in parts]
    a = merge_indexes(idxs)
    b = merge_indexes_interleave(idxs)
    _assert_indexes_identical(a, b)


def test_interleave_merge_duplicate_reads_across_sources(rng):
    # identical reads in both sources: ties must keep A-before-B ordering
    shared = _random_reads(rng, 10)
    r1 = shared + _random_reads(rng, 5)
    r2 = list(shared)  # exact duplicates
    idxs = [build_index(r1), build_index(r2)]
    a = merge_indexes(idxs)
    b = merge_indexes_interleave(idxs)
    _assert_indexes_identical(a, b)


def test_interleave_merge_short_reads(rng):
    r1 = [np.array([c], dtype=np.uint8) for c in (1, 2, 3)] + _random_reads(
        rng, 4, lo=2, hi=5
    )
    r2 = [np.array([4], dtype=np.uint8), np.array([1, 1], dtype=np.uint8)]
    a = merge_indexes([build_index(r1), build_index(r2)])
    b = merge_indexes_interleave([build_index(r1), build_index(r2)])
    _assert_indexes_identical(a, b)


def test_invert_bwt_reconstructs_corpus(rng):
    reads = _random_reads(rng, 50)
    idx = build_index(reads)
    rec, dollar_map, lengths = invert_bwt(_bwt_of(idx))
    assert np.array_equal(dollar_map, idx.dollar_map)
    # read numbering from a bare BWT is sentinel-row order == original
    # input order (build_index numbers sentinels by input read index)
    assert np.array_equal(lengths, idx.read_lengths)
    for got, want in zip(rec, reads):
        assert np.array_equal(got, want)


def test_index_from_bwt_identical_to_build(rng):
    reads = _random_reads(rng, 60)
    direct = build_index(reads)
    imported = index_from_bwt(_bwt_of(direct))
    _assert_indexes_identical(direct, imported, check_samples=False)


def test_index_from_bwt_rejects_garbage():
    with pytest.raises(ValueError):
        index_from_bwt(np.array([1, 2, 3], dtype=np.uint8))  # no sentinel
    with pytest.raises(ValueError):
        index_from_bwt(np.array([9], dtype=np.uint8))  # bad code
