"""Builder parity: packed index reproduces the oracle's BWT exactly, and
the fused rank-block layout reproduces exact occ values (SURVEY.md §4.3
checkpoint-boundary edge cases included)."""

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.config import IndexConfig
from readserver_tpu.index import artifact as artifact_mod
from readserver_tpu.index import packing
from readserver_tpu.index.builder import build_index, concat_with_sentinels
from readserver_tpu.oracle import OracleFMIndex


@pytest.fixture(scope="module")
def built(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads)
    idx = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    return fm, idx


def test_bwt_matches_oracle(built):
    fm, idx = built
    unpacked = packing.unpack_sym4(idx.sym4, idx.n)
    assert np.array_equal(unpacked, fm.bwt)


def test_c_and_counts_match(built):
    fm, idx = built
    assert np.array_equal(idx.C, fm.C)
    assert np.array_equal(idx.symbol_counts, fm.symbol_counts)


def test_dollar_map_matches(built):
    fm, idx = built
    assert np.array_equal(idx.dollar_map.astype(np.int64), fm.dollar_map)


def test_rank_blocks_exact_occ(built, rng):
    fm, idx = built
    # random positions + all block boundaries ±1 + both ends
    S = idx.config.block_size
    probes = set(rng.integers(0, idx.n + 1, size=200).tolist())
    for b in range(0, idx.n + 1, S):
        probes.update({b - 1, b, b + 1})
    probes = [p for p in probes if 0 <= p <= idx.n]
    for c in range(alphabet.NUM_SYMBOLS):
        for i in probes:
            assert packing.occ_scalar(
                idx.rank_blocks, idx.config, c, i
            ) == fm.occ(c, i), (c, i)


def test_concat_sentinel_layout():
    reads = [alphabet.encode(s) for s in ["ACG", "T", "GGCC"]]
    text, starts, lengths = concat_with_sentinels(reads)
    assert starts.tolist() == [0, 4, 6]
    assert lengths.tolist() == [3, 1, 4]
    m = 3
    # sentinels are 0,1,2 at read ends; bases are shifted by m-1
    assert text[3] == 0 and text[5] == 1 and text[10] == 2
    assert text[0] == m - 1 + 1  # 'A'


def test_small_block_size_config(tiny_corpus):
    cfg = IndexConfig(block_size=64, row_words=4)
    fm = OracleFMIndex(tiny_corpus.reads[:50])
    idx = build_index(tiny_corpus.reads[:50], config=cfg)
    for c in range(5):
        for i in [0, 1, 63, 64, 65, idx.n // 2, idx.n]:
            assert packing.occ_scalar(idx.rank_blocks, cfg, c, i) == fm.occ(c, i)


def test_artifact_roundtrip(built, tmp_path):
    _, idx = built
    path = artifact_mod.save_artifact(idx, tmp_path / "idx")
    loaded = artifact_mod.load_artifact(path)
    assert loaded.n == idx.n
    assert loaded.num_reads == idx.num_reads
    assert loaded.config == idx.config
    for name in ["C", "rank_blocks", "sym4", "dollar_map", "read_offsets"]:
        assert np.array_equal(getattr(loaded, name), getattr(idx, name)), name
    assert loaded.sample_names == idx.sample_names


def test_extract_read(built, tiny_corpus):
    _, idx = built
    for i in [0, len(tiny_corpus.reads) // 2, len(tiny_corpus.reads) - 1]:
        assert np.array_equal(idx.extract_read(i), tiny_corpus.reads[i])


def test_read_names_roundtrip_artifact(tmp_path, tiny_corpus):
    from readserver_tpu.index import artifact

    reads = tiny_corpus.reads[:20]
    names = [f"r{i:03d}" for i in range(20)]
    meta = [bytes([i]) * (i % 4) for i in range(20)]
    packed = build_index(reads, read_names=names, read_meta=meta)
    artifact.save_artifact(packed, tmp_path / "idx")
    loaded = artifact.load_artifact(tmp_path / "idx")
    for i in (0, 7, 19):
        assert loaded.read_name(i) == names[i]
        assert loaded.read_meta(i) == meta[i]
    # absent payload stays absent
    bare = build_index(reads)
    assert bare.read_name(0) is None and bare.read_meta(0) is None


def test_read_names_survive_merge(tiny_corpus):
    from readserver_tpu.index.merge import merge_indexes, merge_indexes_interleave

    a = build_index(
        tiny_corpus.reads[:10], read_names=[f"a{i}" for i in range(10)]
    )
    b = build_index(
        tiny_corpus.reads[10:25], read_names=[f"b{i}" for i in range(15)]
    )
    for fn in (merge_indexes, merge_indexes_interleave):
        m = fn([a, b])
        assert m.read_name(0) == "a0"
        assert m.read_name(9) == "a9"
        assert m.read_name(10) == "b0"
        assert m.read_name(24) == "b14"


def test_extract_read_touches_only_its_bytes(built, tiny_corpus, monkeypatch):
    """extract_read must decode O(read_len) packed bytes, not the corpus."""
    from readserver_tpu import alphabet as _al
    from readserver_tpu.index import builder as _b

    _, idx = built
    seen = []
    real = _al.unpack_2bit

    def spy(packed, n):
        seen.append(len(np.asarray(packed)))
        return real(packed, n)

    monkeypatch.setattr(_b.alphabet, "unpack_2bit", spy)
    for i in range(len(tiny_corpus.reads)):
        assert np.array_equal(idx.extract_read(i), tiny_corpus.reads[i])
        assert seen[-1] <= len(tiny_corpus.reads[i]) // 4 + 2
    with pytest.raises(IndexError):
        idx.extract_read(-1)
    with pytest.raises(IndexError):
        idx.extract_read(idx.num_reads)
