"""Naive substring-count oracle — the reference's demo-test idiom.

The reference validates its demo index by diffing served counts against a
naive scan of the raw reads (SURVEY.md §3.5, §4 "oracle-diff integration
tests"). Same here: counts are overlapping occurrences within each read
(never across read boundaries — each read is its own string).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from readserver_tpu import alphabet


def _as_codes(x: np.ndarray | str | bytes) -> np.ndarray:
    return x if isinstance(x, np.ndarray) else alphabet.encode(x)


def _occurrences_in(read: np.ndarray, pat: np.ndarray) -> list[int]:
    k = len(pat)
    if k == 0 or k > len(read):
        return []
    # windowed comparison; overlapping matches count
    windows = np.lib.stride_tricks.sliding_window_view(read, k)
    return np.flatnonzero((windows == pat).all(axis=1)).tolist()


def naive_count(reads: Sequence[np.ndarray | str | bytes], kmer) -> int:
    pat = _as_codes(kmer)
    return sum(len(_occurrences_in(_as_codes(r), pat)) for r in reads)


def naive_count_matrix(reads_matrix: np.ndarray, kmer) -> int:
    """Vectorized overlapping-occurrence count over an equal-length read
    matrix [m, L] — the bench-scale parity spot-check (millions of reads)."""
    pat = _as_codes(kmer)
    k = len(pat)
    m, L = reads_matrix.shape
    if k > L:
        return 0
    total = 0
    for off in range(L - k + 1):
        total += int((reads_matrix[:, off : off + k] == pat).all(axis=1).sum())
    return total


def naive_find_reads(
    reads: Sequence[np.ndarray | str | bytes], kmer
) -> list[tuple[int, int]]:
    """All ``(read_id, offset)`` hits, sorted — one entry per occurrence."""
    pat = _as_codes(kmer)
    hits: list[tuple[int, int]] = []
    for i, r in enumerate(reads):
        for off in _occurrences_in(_as_codes(r), pat):
            hits.append((i, off))
    return sorted(hits)
