"""2-step (pair-rank) backward search: must equal the 1-step search bit
for bit — plain, with LUT, odd/even remainders, empty intervals — and the
pair tier must survive artifact round trip, merge, and from-BWT packing."""

import jax
import numpy as np
import pytest

from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index import artifact, build_index
from readserver_tpu.index.from_bwt import index_from_bwt
from readserver_tpu.index.merge import merge_indexes_interleave
from readserver_tpu.index.packing import (
    PAIR_INVALID,
    pair_codes_from_lf,
    unpack_sym4,
)
from readserver_tpu.ops import (
    DeviceIndex,
    backward_search,
    backward_search_lut,
    backward_search_pair,
    build_prefix_lut,
    encode_query_batch,
)


@pytest.fixture(scope="module")
def setup(tiny_corpus):
    packed = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    assert packed.rank2_blocks is not None and packed.C2 is not None
    assert packed.rank3_blocks is not None and packed.C3 is not None
    return tiny_corpus, packed, DeviceIndex.from_packed(packed)


def _batch(corpus, n, k, seed, miss_frac=0.3):
    kms = sample_query_kmers(corpus, n, k, seed=seed, miss_frac=miss_frac)
    return encode_query_batch(kms, k)


def _assert_equiv(l1, u1, l2, u2):
    """Counts equal everywhere; non-empty intervals bit-identical.  (Empty
    intervals freeze at different step granularities between the 1-step
    and 2-step paths — both are canonically 'count 0'.)"""
    l1, u1, l2, u2 = map(np.asarray, (l1, u1, l2, u2))
    assert np.array_equal(u1 - l1, u2 - l2)
    ne = (u1 - l1) > 0
    assert np.array_equal(l1[ne], l2[ne])
    assert np.array_equal(u1[ne], u2[ne])


@pytest.mark.parametrize("k", [31, 30, 8, 2, 1])
def test_pair_matches_single_step(setup, k):
    corpus, packed, dev = setup
    codes, lengths = _batch(corpus, 32, min(k, corpus.spec.kmer_len), seed=k)
    l1, u1 = jax.jit(backward_search)(dev, codes, lengths)
    l2, u2 = jax.jit(backward_search_pair)(dev, codes)
    _assert_equiv(l1, u1, l2, u2)


@pytest.mark.parametrize("p", [3, 4])
def test_pair_with_lut_matches(setup, p):
    corpus, packed, dev = setup
    k = corpus.spec.kmer_len
    codes, lengths = _batch(corpus, 32, k, seed=77)
    lut = build_prefix_lut(dev, p)
    l1, u1 = jax.jit(
        lambda d, t, c, ln: backward_search_lut(d, t, p, c, ln)
    )(dev, lut, codes, lengths)
    l2, u2 = jax.jit(
        lambda d, t, c: backward_search_pair(d, c, t, p)
    )(dev, lut, codes)
    _assert_equiv(l1, u1, l2, u2)


def test_pair_miss_heavy(setup):
    corpus, packed, dev = setup
    k = corpus.spec.kmer_len
    codes, lengths = _batch(corpus, 64, k, seed=5, miss_frac=1.0)
    l1, u1 = jax.jit(backward_search)(dev, codes, lengths)
    l2, u2 = jax.jit(backward_search_pair)(dev, codes)
    assert np.array_equal(np.asarray(u1 - l1), np.asarray(u2 - l2))
    assert int(np.asarray(u2 - l2).max()) == 0


def test_pair_codes_invalid_rows(setup):
    corpus, packed, dev = setup
    from readserver_tpu.index.packing import compute_lf

    bwt = unpack_sym4(packed.sym4, packed.n)
    lf = compute_lf(bwt, packed.C)
    pair = pair_codes_from_lf(bwt, lf)
    # invalid exactly on suffix-offset-<2 rows: 2 per read
    assert int((pair == PAIR_INVALID).sum()) == 2 * packed.num_reads
    assert pair.max() <= PAIR_INVALID


def test_pair_tier_round_trips(setup, tmp_path):
    corpus, packed, dev = setup
    artifact.save_artifact(packed, tmp_path / "idx")
    back = artifact.load_artifact(tmp_path / "idx", mmap=False)
    for f in ("rank2_blocks", "C2", "rank3_blocks", "C3"):
        assert np.array_equal(getattr(back, f), getattr(packed, f)), f

    # merge + from-bwt preserve the tiers bit-for-bit vs a direct build
    half = len(corpus.reads) // 2
    merged = merge_indexes_interleave(
        [build_index(corpus.reads[:half]), build_index(corpus.reads[half:])]
    )
    direct = build_index(corpus.reads)
    imported = index_from_bwt(unpack_sym4(direct.sym4, direct.n))
    for f in ("rank2_blocks", "C2", "rank3_blocks", "C3"):
        assert np.array_equal(getattr(merged, f), getattr(direct, f)), f
        assert np.array_equal(getattr(imported, f), getattr(direct, f)), f


@pytest.mark.parametrize("miss", [0.0, 0.5, 1.0])
def test_early_exit_identical(setup, miss):
    corpus, packed, dev = setup
    k = corpus.spec.kmer_len
    codes, lengths = _batch(corpus, 48, k, seed=int(miss * 10), miss_frac=miss)
    for fn, kw in [
        (backward_search, dict(lengths=lengths)),
        (backward_search_pair, {}),
    ]:
        l1, u1 = jax.jit(lambda d, c: fn(d, c, **kw))(dev, codes)
        l2, u2 = jax.jit(lambda d, c: fn(d, c, early_exit=True, **kw))(
            dev, codes
        )
        assert np.array_equal(np.asarray(l1), np.asarray(l2))
        assert np.array_equal(np.asarray(u1), np.asarray(u2))


def test_early_exit_mixed_lengths(setup):
    corpus, packed, dev = setup
    k = corpus.spec.kmer_len
    kms = sample_query_kmers(corpus, 24, k, seed=3, miss_frac=0.4)
    kms = [km[: 5 + (i % (k - 5))] for i, km in enumerate(kms)]
    codes, lengths = encode_query_batch(kms, k)
    l1, u1 = jax.jit(backward_search)(dev, codes, lengths)
    l2, u2 = jax.jit(
        lambda d, c, ln: backward_search(d, c, ln, early_exit=True)
    )(dev, codes, lengths)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.array_equal(np.asarray(u1), np.asarray(u2))


def test_pair_absent_raises(tiny_corpus):
    packed = build_index(tiny_corpus.reads[:50], pair_rank=False)
    assert packed.rank2_blocks is None and packed.rank3_blocks is None
    dev = DeviceIndex.from_packed(packed)
    codes, _ = encode_query_batch(["ACGT"], 4)
    with pytest.raises(ValueError):
        backward_search_pair(dev, codes)


@pytest.mark.parametrize("k", [31, 30, 29, 4, 3])
def test_kstep2_only_matches(setup, k):
    """pair-only index (kstep=2): remainder schedule without triples."""
    corpus, packed, dev = setup
    p2 = build_index(corpus.reads, kstep=2)
    assert p2.rank3_blocks is None and p2.rank2_blocks is not None
    dev2 = DeviceIndex.from_packed(p2)
    codes, lengths = _batch(corpus, 24, min(k, corpus.spec.kmer_len), seed=k)
    l1, u1 = jax.jit(backward_search)(dev2, codes, lengths)
    l2, u2 = jax.jit(backward_search_pair)(dev2, codes)
    l3, u3 = jax.jit(backward_search_pair)(dev, codes)  # triple tier
    _assert_equiv(l1, u1, l2, u2)
    _assert_equiv(l1, u1, l3, u3)


def test_triple_codes_invalid_rows(setup):
    from readserver_tpu.index.packing import (
        TRIPLE_INVALID,
        compute_lf,
        triple_codes_from_lf,
    )

    corpus, packed, dev = setup
    bwt = unpack_sym4(packed.sym4, packed.n)
    lf = compute_lf(bwt, packed.C)
    triple = triple_codes_from_lf(bwt, lf)
    # invalid exactly on suffix-offset-<3 rows: 3 per read
    assert int((triple == TRIPLE_INVALID).sum()) == 3 * packed.num_reads
