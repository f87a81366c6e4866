"""Merge + RLE interchange tests: merged index == direct build of the
concatenated cohort (bit-identical BWT), RLE roundtrips exactly."""

import numpy as np
import pytest

from readserver_tpu.corpus import simulate
from readserver_tpu.index import build_index
from readserver_tpu.index import rle
from readserver_tpu.index.merge import merge_indexes
from readserver_tpu.index.packing import unpack_sym4
from readserver_tpu.oracle import OracleFMIndex


def _split_corpus(corpus, parts):
    per = len(corpus.reads) // parts
    chunks = []
    for s in range(parts):
        lo, hi = s * per, (s + 1) * per if s < parts - 1 else len(corpus.reads)
        chunks.append(corpus.reads[lo:hi])
    return chunks


def test_merge_equals_direct_build(tiny_corpus):
    chunks = _split_corpus(tiny_corpus, 3)
    per_sample = [
        build_index(c, sample_ids=np.zeros(len(c), np.int32)) for c in chunks
    ]
    merged = merge_indexes(per_sample)
    all_reads = [r for c in chunks for r in c]
    direct = build_index(
        all_reads,
        sample_ids=np.concatenate(
            [np.full(len(c), i, np.int32) for i, c in enumerate(chunks)]
        ),
    )
    assert merged.n == direct.n
    assert np.array_equal(
        unpack_sym4(merged.sym4, merged.n), unpack_sym4(direct.sym4, direct.n)
    )
    assert np.array_equal(merged.dollar_map, direct.dollar_map)
    assert np.array_equal(merged.read_to_sample, direct.read_to_sample)
    assert merged.num_samples == 3


def test_merged_queries_match_oracle(tiny_corpus):
    chunks = _split_corpus(tiny_corpus, 2)
    merged = merge_indexes([build_index(c) for c in chunks])
    fm = OracleFMIndex([r for c in chunks for r in c])
    assert np.array_equal(merged.C, fm.C)
    assert np.array_equal(
        unpack_sym4(merged.sym4, merged.n), fm.bwt
    )


def test_rle_roundtrip(tiny_corpus, tmp_path):
    packed = build_index(tiny_corpus.reads[:300])
    bwt = unpack_sym4(packed.sym4, packed.n)
    runs = rle.encode_rle(bwt)
    assert np.array_equal(rle.decode_rle(runs), bwt)
    # long-run splitting: compression actually happened on run-heavy data
    assert len(runs) < packed.n

    path = tmp_path / "pop.rlebwt"
    rle.write_rle_bwt(path, bwt, packed.num_reads)
    back, m = rle.read_rle_bwt(path)
    assert m == packed.num_reads
    assert np.array_equal(back, bwt)


def test_rle_long_runs():
    bwt = np.concatenate(
        [np.full(100, 3, np.uint8), np.full(7, 0, np.uint8), np.full(35, 1, np.uint8)]
    )
    runs = rle.encode_rle(bwt)
    assert np.array_equal(rle.decode_rle(runs), bwt)
    lens = (runs >> 3).astype(int)
    assert lens.max() <= rle.MAX_RUN and lens.min() >= 1


def test_rle_rejects_garbage(tmp_path):
    p = tmp_path / "bad"
    p.write_bytes(b'{"magic": "nope"}\n\x00\x01')
    with pytest.raises(ValueError):
        rle.read_rle_bwt(p)
