"""Fast-resolve parity: the sampled-LF walk must produce exactly the same
(read_id, offset) hit sets as the slow symbol-by-symbol walk and the oracle,
including all sampling edge cases (offsets on/off multiples of the rate,
reads shorter than the rate, duplicate reads)."""

import jax
import numpy as np
import pytest

from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index.builder import build_index
from readserver_tpu.index.packing import compute_lf, unpack_sym4
from readserver_tpu.ops import (
    DeviceIndex,
    backward_search,
    encode_query_batch,
    resolve_intervals,
)
from readserver_tpu.oracle import OracleFMIndex


@pytest.fixture(scope="module", params=[8, 32])
def setup(tiny_corpus, request):
    fm = OracleFMIndex(tiny_corpus.reads)
    packed = build_index(
        tiny_corpus.reads,
        sample_ids=tiny_corpus.sample_ids,
        sample_rate=request.param,
    )
    dev = DeviceIndex.from_packed(packed)
    assert dev.lf is not None and dev.sample_rate == request.param
    return tiny_corpus, fm, dev


def test_lf_array_matches_oracle(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads[:200])
    packed = build_index(tiny_corpus.reads[:200])
    lf = np.asarray(packed.lf) & 0x7FFFFFFF
    # LF[i] must equal C[BWT[i]] + occ(BWT[i], i) for every row
    for i in range(0, packed.n, 37):
        c = int(fm.bwt[i])
        assert lf[i] == int(fm.C[c]) + fm.occ(c, i), i


def test_fast_equals_slow(setup):
    corpus, _, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 64, k, seed=51, miss_frac=0.2)
    codes, lengths = encode_query_batch(kmers, k)

    @jax.jit
    def both(dev, codes, lengths):
        l, u = backward_search(dev, codes, lengths)
        fast = resolve_intervals(dev, l, u, 32, use_fast=True)
        slow = resolve_intervals(dev, l, u, 32, use_fast=False)
        return fast, slow

    (fr, fo, fv), (sr, so, sv) = both(dev, codes, lengths)
    assert np.array_equal(np.asarray(fv), np.asarray(sv))
    assert np.array_equal(np.asarray(fr), np.asarray(sr))
    assert np.array_equal(np.asarray(fo), np.asarray(so))


def test_fast_matches_oracle(setup):
    corpus, fm, dev = setup
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 48, k, seed=52, miss_frac=0.1)
    codes, lengths = encode_query_batch(kmers, k)

    @jax.jit
    def run(dev, codes, lengths):
        l, u = backward_search(dev, codes, lengths)
        return l, u, *resolve_intervals(dev, l, u, 32, use_fast=True)

    l, u, rid, off, valid = map(np.asarray, run(dev, codes, lengths))
    for b, km in enumerate(kmers):
        want = fm.find_reads(km)
        if len(want) > 32:
            continue
        got = sorted(
            (int(r), int(o)) for r, o, v in zip(rid[b], off[b], valid[b]) if v
        )
        assert got == want, f"query {b}"


def test_row_budget_compaction(setup):
    """Compacted resolve returns identical hits when the budget covers all
    valid rows, and drops (only) overflow rows when it doesn't.

    Uses a walk-tier index (no dsa): the direct tier deliberately ignores
    row_budget — one gather per lane is cheaper than the compaction
    scatter, so nothing is ever dropped there (ops/resolve.py)."""
    corpus, fm, dev_full = setup
    from readserver_tpu.index.builder import build_index as _bi

    dev = DeviceIndex.from_packed(
        _bi(corpus.reads, sample_ids=corpus.sample_ids),
        tiers={"marks", "lf"},
    )
    assert dev.dsa is None
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 32, k, seed=53, miss_frac=0.2)
    codes, lengths = encode_query_batch(kmers, k)
    H = 32

    from functools import partial

    @partial(jax.jit, static_argnames=("budget",))
    def run(dev, codes, lengths, budget):
        l, u = backward_search(dev, codes, lengths)
        full = resolve_intervals(dev, l, u, H)
        comp = resolve_intervals(dev, l, u, H, row_budget=budget)
        return full, comp

    (fr, fo, fv), (cr, co, cv) = run(dev, codes, lengths, 32 * H)  # ample
    assert np.array_equal(np.asarray(fv), np.asarray(cv))
    assert np.array_equal(np.asarray(fr), np.asarray(cr))
    assert np.array_equal(np.asarray(fo), np.asarray(co))

    # tight budget: every surviving hit must still be correct
    (_, _, _), (cr, co, cv) = run(dev, codes, lengths, 64)
    cr, co, cv = map(np.asarray, (cr, co, cv))
    assert cv.sum() <= 64
    for b, km in enumerate(kmers):
        want = dict(fm.find_reads(km))
        for r, o, v in zip(cr[b], co[b], cv[b]):
            if v:
                assert want.get(int(r)) is not None


def test_short_reads_no_samples():
    # every read shorter than the sample rate: $-terminal path only
    reads = ["ACGTACGT", "TTGGCCAA", "ACGTACGT"]
    packed = build_index(reads, sample_rate=32)
    dev = DeviceIndex.from_packed(packed)
    fm = OracleFMIndex(reads)
    codes, lengths = encode_query_batch(["ACGT", "CCAA"], 8)

    @jax.jit
    def run(dev, codes, lengths):
        l, u = backward_search(dev, codes, lengths)
        return resolve_intervals(dev, l, u, 8, use_fast=True)

    rid, off, valid = map(np.asarray, run(dev, codes, lengths))
    for b, km in enumerate(["ACGT", "CCAA"]):
        got = sorted(
            (int(r), int(o)) for r, o, v in zip(rid[b], off[b], valid[b]) if v
        )
        assert got == fm.find_reads(km), km
