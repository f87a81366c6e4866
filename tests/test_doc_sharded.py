"""Document-sharding parity: per-partition sub-indexes queried under one
SPMD program must answer exactly like a monolithic index over the merged
read list (the reference's split-by-sample deployment, SURVEY.md §1 L5)."""

import numpy as np
import pytest

from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index.builder import build_index
from readserver_tpu.ops import encode_query_batch
from readserver_tpu.oracle import OracleFMIndex
from readserver_tpu.parallel import make_mesh
from readserver_tpu.parallel.doc_sharded import (
    build_doc_sharded,
    make_doc_query_fn,
    place_doc_sharded,
)

MAX_HITS = 32
SHARDS = 4


@pytest.fixture(scope="module")
def setup(tiny_corpus):
    reads = tiny_corpus.reads
    per = len(reads) // SHARDS
    partitions = []
    sample_base = 0
    for s in range(SHARDS):
        lo = s * per
        hi = (s + 1) * per if s < SHARDS - 1 else len(reads)
        chunk = reads[lo:hi]
        # global sample ids: one sample per partition here
        partitions.append(
            build_index(
                chunk, sample_ids=np.full(len(chunk), s, dtype=np.int32)
            )
        )
    # monolithic truth over the same global read ordering
    fm = OracleFMIndex(reads)
    sample_of = np.concatenate(
        [
            np.full(p.num_reads, s, dtype=np.int32)
            for s, p in enumerate(partitions)
        ]
    )
    return tiny_corpus, partitions, fm, sample_of


@pytest.mark.parametrize("lut_p", [0, 5])
def test_doc_sharded_counts_and_hits(setup, lut_p):
    corpus, partitions, fm, sample_of = setup
    import jax

    mesh = make_mesh(data_parallel=1, num_shards=SHARDS,
                     devices=jax.devices()[:SHARDS])
    didx = place_doc_sharded(
        build_doc_sharded(partitions, lut_p=lut_p), mesh
    )
    # fix padded num_samples to the true global count for the histogram
    qfn = make_doc_query_fn(didx, mesh, max_hits=MAX_HITS)
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 32, k, seed=81, miss_frac=0.2)
    codes, lengths = encode_query_batch(kmers, k)
    out = {k2: np.asarray(v) for k2, v in qfn(didx, codes, lengths).items()}

    for b, km in enumerate(kmers):
        want_hits = fm.find_reads(km)
        assert out["count"][b] == len(want_hits), f"count q{b}"
        # union of per-shard hit sets == monolithic hit set (global ids)
        got = []
        truncated = False
        for s in range(SHARDS):
            for r, o, v in zip(
                out["read_id"][s, b], out["offset"][s, b], out["valid"][s, b]
            ):
                if v:
                    got.append((int(r), int(o)))
            if out["shard_count"][s, b] > MAX_HITS:
                truncated = True
        if truncated:
            continue
        assert sorted(got) == want_hits, f"hits q{b}"
        # attribution
        want_hist = np.zeros(didx.num_samples, dtype=np.int64)
        for rid, _ in want_hits:
            want_hist[sample_of[rid]] += 1
        assert np.array_equal(out["sample_hist"][b], want_hist), f"hist q{b}"


def test_doc_engine_end_to_end(setup):
    """QueryEngine over partition list: counts, hits, attribution, and
    read retrieval against the monolithic oracle."""
    import jax

    from readserver_tpu import alphabet
    from readserver_tpu.config import ServeConfig
    from readserver_tpu.serve import QueryEngine

    corpus, partitions, fm, sample_of = setup
    mesh = make_mesh(data_parallel=1, num_shards=SHARDS,
                     devices=jax.devices()[:SHARDS])
    eng = QueryEngine(
        partitions, ServeConfig(batch_size=16, max_hits=MAX_HITS), mesh=mesh
    )
    eng.warmup()
    kmers = [
        alphabet.decode(km)
        for km in sample_query_kmers(corpus, 10, corpus.spec.kmer_len, seed=83)
    ]
    for r in eng.query_batch(kmers):
        want = fm.find_reads(r.kmer)
        assert r.count == len(want)
        if r.hits_truncated:
            continue
        got = sorted((h["read_id"], h["offset"]) for h in r.hits)
        assert got == want, r.kmer
        for h in r.hits:
            assert h["sample_id"] == sample_of[h["read_id"]]
            seq = eng.read_sequence(h["read_id"])
            assert r.kmer in seq
            assert seq == alphabet.decode(corpus.reads[h["read_id"]])


def test_doc_sharded_per_shard_counts_sum(setup):
    corpus, partitions, fm, _ = setup
    import jax

    mesh = make_mesh(data_parallel=1, num_shards=SHARDS,
                     devices=jax.devices()[:SHARDS])
    didx = place_doc_sharded(build_doc_sharded(partitions), mesh)
    qfn = make_doc_query_fn(didx, mesh, max_hits=MAX_HITS)
    k = corpus.spec.kmer_len
    kmers = sample_query_kmers(corpus, 16, k, seed=82)
    codes, lengths = encode_query_batch(kmers, k)
    out = qfn(didx, codes, lengths)
    assert np.array_equal(
        np.asarray(out["shard_count"]).sum(axis=0), np.asarray(out["count"])
    )
