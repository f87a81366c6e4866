"""Resolve parity: lockstep LF-walk read-ID/offset/sample attribution equals
the oracle's per-row walks and the naive read scan (SURVEY.md §3.3, §4.2)."""

import jax
import numpy as np
import pytest

from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index.builder import build_index
from readserver_tpu.ops import (
    DeviceIndex,
    backward_search,
    encode_query_batch,
    resolve_intervals,
    sample_histogram,
)
from readserver_tpu.oracle import OracleFMIndex, naive_find_reads


@pytest.fixture(scope="module")
def setup(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads)
    packed = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    dev = DeviceIndex.from_packed(packed)
    return tiny_corpus, fm, dev


MAX_HITS = 64


def _device_hits(dev, kmers, k):
    codes, lengths = encode_query_batch(kmers, k)

    @jax.jit
    def run(dev, codes, lengths):
        l, u = backward_search(dev, codes, lengths)
        rid, off, valid = resolve_intervals(dev, l, u, MAX_HITS)
        return l, u, rid, off, valid

    l, u, rid, off, valid = run(dev, codes, lengths)
    return map(np.asarray, (l, u, rid, off, valid))


def test_hits_match_oracle(setup):
    corpus, fm, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 48, k, seed=6, miss_frac=0.2)
    l, u, rid, off, valid = _device_hits(dev, kmers, k)
    for b, km in enumerate(kmers):
        want = fm.find_reads(km)
        if len(want) > MAX_HITS:
            continue
        got = sorted(
            (int(r), int(o))
            for r, o, v in zip(rid[b], off[b], valid[b])
            if v
        )
        assert got == want, f"query {b}"


def test_hits_match_naive(setup):
    corpus, _, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 32, k, seed=7)
    _, _, rid, off, valid = _device_hits(dev, kmers, k)
    for b, km in enumerate(kmers):
        want = naive_find_reads(corpus.reads, km)
        if len(want) > MAX_HITS:
            continue
        got = sorted(
            (int(r), int(o))
            for r, o, v in zip(rid[b], off[b], valid[b])
            if v
        )
        assert got == want


def test_every_row_terminates(setup):
    corpus, _, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 32, k, seed=8, miss_frac=0.0)
    _, _, rid, off, valid = _device_hits(dev, kmers, k)
    assert np.all(rid[valid] >= 0), "unterminated LF walk"
    assert np.all(off[valid] >= 0)
    assert np.all(off[valid] <= corpus.spec.read_len)


def test_sample_histogram(setup):
    corpus, fm, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 24, k, seed=9)
    codes, lengths = encode_query_batch(kmers, k)

    @jax.jit
    def run(dev, codes, lengths):
        l, u = backward_search(dev, codes, lengths)
        rid, off, valid = resolve_intervals(dev, l, u, MAX_HITS)
        return sample_histogram(dev, rid, valid), l, u

    hist, l, u = run(dev, codes, lengths)
    hist = np.asarray(hist)
    sample_of = corpus.sample_ids
    for b, km in enumerate(kmers):
        want_hits = fm.find_reads(km)
        if len(want_hits) > MAX_HITS:
            continue
        want = np.zeros(dev.num_samples, dtype=np.int64)
        for r, _ in want_hits:
            want[sample_of[r]] += 1
        assert np.array_equal(hist[b], want), f"query {b}"


def test_exact_histogram_no_int32_wrap(setup):
    """Summed interval counts past 2^31 must not wrap the worklist
    prefix-sum (population-scale repetitive k-mers): with a small
    max_rows cap every such query must report complete=False."""
    import jax.numpy as jnp

    from readserver_tpu.ops import exact_sample_histogram

    _, _, dev = setup
    # synthetic giant intervals: 3 queries x 1.2e9 rows = 3.6e9 > 2^31
    l = jnp.zeros(3, dtype=jnp.int32)
    u = jnp.full(3, 1_200_000_000, dtype=jnp.int32)
    hist, complete = jax.jit(
        lambda d, l, u: exact_sample_histogram(
            d, l, u, window=256, max_rows=1024
        )
    )(dev, l, u)
    assert not bool(np.asarray(complete).any())
    assert np.all(np.asarray(hist) >= 0)
