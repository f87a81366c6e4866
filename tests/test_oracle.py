"""Oracle self-consistency: FM-index answers == naive scans (SURVEY.md §4.1).

The oracle is the parity anchor for everything else, so it is itself pinned
to the obviously-correct naive substring scan, plus adversarial $-semantics
cases (k-mers must never match across read boundaries)."""

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.oracle import (
    OracleFMIndex,
    naive_count,
    naive_find_reads,
    suffix_array_ints,
)


def test_suffix_array_matches_bruteforce(rng):
    for _ in range(20):
        n = int(rng.integers(1, 60))
        t = rng.integers(0, 5, size=n)
        sa = suffix_array_ints(t)
        suffixes = sorted(range(n), key=lambda i: tuple(t[i:]))
        assert sa.tolist() == suffixes


def test_counts_match_naive(tiny_corpus, rng):
    fm = OracleFMIndex(tiny_corpus.reads)
    kmers = sample_query_kmers(tiny_corpus, 100, tiny_corpus.spec.kmer_len, seed=1)
    for km in kmers:
        assert fm.count(km) == naive_count(tiny_corpus.reads, km)


def test_hits_match_naive(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads)
    kmers = sample_query_kmers(tiny_corpus, 30, tiny_corpus.spec.kmer_len, seed=2)
    for km in kmers:
        assert fm.find_reads(km) == naive_find_reads(tiny_corpus.reads, km)


def test_no_cross_read_matches():
    # "AC" occurs inside reads; "CA" only across the boundary of read0+read1
    reads = ["AAAC", "CAAA"]
    fm = OracleFMIndex(reads)
    assert fm.count("AC") == 1
    assert fm.count("CA") == 1  # within read 1 only ("CAAA" has CA at 0)
    assert fm.count("ACCA") == 0  # spans the boundary — must not match
    assert fm.count("CAAAA") == 0  # longer than any single-read occurrence


def test_duplicate_reads_distinct_dollars():
    reads = ["ACGT", "ACGT", "ACGT"]
    fm = OracleFMIndex(reads)
    assert fm.count("ACGT") == 3
    hits = fm.find_reads("CGT")
    assert hits == [(0, 1), (1, 1), (2, 1)]


def test_dollar_map_is_permutation(small_corpus):
    fm = OracleFMIndex(small_corpus.reads[:200])
    assert sorted(fm.dollar_map.tolist()) == list(range(fm.num_reads))


def test_extract_read_roundtrip(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads)
    for i in [0, 1, len(tiny_corpus.reads) - 1]:
        assert np.array_equal(fm.extract_read(i), tiny_corpus.reads[i])


def test_full_read_query_finds_exactly_its_reads():
    reads = ["ACGTACGTAA", "TTTTACGTAC", "GGGGGGGGGG"]
    fm = OracleFMIndex(reads)
    assert fm.find_reads("ACGTACGTAA") == [(0, 0)]
    assert fm.find_reads("GGGGGGGGGG") == [(2, 0)]


def test_alphabet_roundtrip(rng):
    codes = rng.integers(1, 5, size=101).astype(np.uint8)
    s = alphabet.decode(codes)
    assert np.array_equal(alphabet.encode(s), codes)
    packed = alphabet.pack_2bit(codes)
    assert np.array_equal(alphabet.unpack_2bit(packed, len(codes)), codes)
    rc = alphabet.revcomp(codes)
    assert np.array_equal(alphabet.revcomp(rc), codes)


def test_encode_rejects_bad_chars():
    with pytest.raises(ValueError):
        alphabet.encode("ACGTN")


def test_window_multiset_counts_matches_naive(rng):
    from readserver_tpu.oracle.naive import (
        naive_count_matrix,
        window_multiset_counts,
    )

    m, L, k = 50, 40, 9
    mat = rng.integers(1, 5, size=(m, L)).astype(np.uint8)
    qs = []
    for i in range(32):
        if i % 3 == 0:  # absent-likely random k-mer
            qs.append(rng.integers(1, 5, size=k).astype(np.uint8))
        else:  # present k-mer drawn from a read
            r, o = int(rng.integers(0, m)), int(rng.integers(0, L - k + 1))
            qs.append(mat[r, o : o + k].copy())
    q = np.stack(qs)
    got = window_multiset_counts(mat, q)
    want = np.array([naive_count_matrix(mat, qi) for qi in q])
    assert np.array_equal(got, want)


def test_window_multiset_counts_k31_boundary(rng):
    from readserver_tpu.oracle.naive import window_multiset_counts

    mat = rng.integers(1, 5, size=(8, 31)).astype(np.uint8)
    # k == L: exactly one window per read; query each read in full
    got = window_multiset_counts(mat, mat)
    for i in range(8):
        want = int((mat == mat[i]).all(axis=1).sum())
        assert int(got[i]) == want
