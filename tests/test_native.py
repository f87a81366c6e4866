"""Native SA-IS vs the NumPy doubling sorter: exact equality on random
integer texts (including sentinel-shaped multi-string texts) — the
kernel-level unit tests of SURVEY.md §4.3 for the build stack."""

import numpy as np
import pytest

from readserver_tpu.index.builder import concat_with_sentinels
from readserver_tpu.oracle.fm import suffix_array_ints

native = pytest.importorskip("readserver_tpu.native")

if not native.native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_sais_random_small(rng):
    for trial in range(30):
        n = int(rng.integers(1, 200))
        K = int(rng.integers(2, 8))
        t = rng.integers(0, K, size=n).astype(np.int32)
        got = native.sais_int32(t, K)
        want = suffix_array_ints(t)
        assert got.tolist() == want.tolist(), f"trial {trial}"


def test_sais_binary_runs(rng):
    # long runs stress the LMS naming path
    t = np.repeat(rng.integers(0, 2, size=50), rng.integers(1, 20, size=50))
    t = t.astype(np.int32)
    assert native.sais_int32(t, 2).tolist() == suffix_array_ints(t).tolist()


def test_sais_single_char():
    # shorter suffixes of a constant text sort first: SA = n-1, n-2, ..., 0
    t = np.zeros(100, dtype=np.int32)
    assert native.sais_int32(t, 1).tolist() == list(range(99, -1, -1))


def test_sais_multistring_text(tiny_corpus):
    reads = tiny_corpus.reads[:100]
    text, _, _ = concat_with_sentinels(reads)
    K = len(reads) + 4
    got = native.sais_int32(text, K)
    want = suffix_array_ints(text)
    assert np.array_equal(got, want.astype(np.int32))


def test_bwt_from_sa_matches_numpy(tiny_corpus):
    reads = tiny_corpus.reads[:100]
    m = len(reads)
    text, _, _ = concat_with_sentinels(reads)
    sa = native.sais_int32(text, m + 4)
    got = native.bwt_from_sa(text, sa, m)
    n = len(text)
    prev = np.where(sa > 0, sa - 1, n - 1)
    raw = text[prev]
    want = np.where(raw < m, 0, raw - (m - 1)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_sais_rejects_bad_input():
    with pytest.raises(RuntimeError):
        native.sais_int32(np.array([0, 5, 1], dtype=np.int32), 3)  # char >= K


def test_large_alphabet(rng):
    # alphabet far larger than text length (many unique sentinels)
    n = 500
    t = rng.permutation(10_000)[:n].astype(np.int32)
    got = native.sais_int32(t, 10_000)
    want = suffix_array_ints(t)
    assert np.array_equal(got, want.astype(np.int32))
