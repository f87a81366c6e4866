"""Config-5 shape: multi-sample cohort with per-sample hit attribution
(BASELINE.json:11), scaled down for CI.  128 samples, population queries,
attribution parity vs the oracle on both single-device and sharded paths."""

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.config import ServeConfig
from readserver_tpu.corpus import simulate
from readserver_tpu.index.builder import build_index
from readserver_tpu.oracle import OracleFMIndex
from readserver_tpu.parallel import make_mesh
from readserver_tpu.serve import QueryEngine


@pytest.fixture(scope="module")
def cohort():
    corpus = simulate.simulate_config("cohort", scale=0.004)
    assert corpus.spec.num_samples == 128
    packed = build_index(
        corpus.reads,
        sample_ids=corpus.sample_ids,
        sample_names=[f"s{i:03d}" for i in range(128)],
    )
    return corpus, packed, OracleFMIndex(corpus.reads)


def _expected_hist(fm, corpus, km, num_samples):
    want = np.zeros(num_samples, dtype=np.int64)
    for rid, _ in fm.find_reads(km):
        want[corpus.sample_ids[rid]] += 1
    return want


def test_cohort_attribution_single_device(cohort):
    corpus, packed, fm = cohort
    assert packed.num_samples == 128
    eng = QueryEngine(packed, ServeConfig(batch_size=32, max_hits=64))
    kmers = [
        alphabet.decode(km)
        for km in simulate.sample_query_kmers(
            corpus, 16, corpus.spec.kmer_len, seed=71, miss_frac=0.2
        )
    ]
    for r in eng.query_batch(kmers):
        want = _expected_hist(fm, corpus, r.kmer, 128)
        if r.hits_truncated:
            continue
        got = np.zeros(128, dtype=np.int64)
        for name, c in (r.sample_hist or {}).items():
            got[int(name[1:])] = c
        assert np.array_equal(got, want), r.kmer
        assert r.count == int(want.sum())


def test_cohort_attribution_sharded(cohort):
    corpus, packed, fm = cohort
    mesh = make_mesh(data_parallel=2, num_shards=4)
    eng = QueryEngine(
        packed,
        ServeConfig(batch_size=32, max_hits=64, num_shards=4),
        mesh=mesh,
    )
    kmers = [
        alphabet.decode(km)
        for km in simulate.sample_query_kmers(
            corpus, 12, corpus.spec.kmer_len, seed=72, miss_frac=0.1
        )
    ]
    for r in eng.query_batch(kmers):
        if r.hits_truncated:
            continue
        want = _expected_hist(fm, corpus, r.kmer, 128)
        got = np.zeros(128, dtype=np.int64)
        for name, c in (r.sample_hist or {}).items():
            got[int(name[1:])] = c
        assert np.array_equal(got, want), r.kmer


def _motif_corpus(rng, num_samples=16, reads_per_sample=20, L=60, k=11):
    """Reads that ALL contain one shared k-mer motif → count >> max_hits."""
    motif = rng.integers(1, 5, size=k).astype(np.uint8)
    reads, sample_ids = [], []
    for s in range(num_samples):
        for _ in range(reads_per_sample):
            r = rng.integers(1, 5, size=L).astype(np.uint8)
            off = int(rng.integers(0, L - k + 1))
            r[off : off + k] = motif
            reads.append(r)
            sample_ids.append(s)
    return motif, reads, np.asarray(sample_ids, dtype=np.int32)


@pytest.mark.parametrize("path", ["single", "interval", "doc"])
def test_exact_attribution_beyond_hit_cap(rng, path):
    """count >> max_hits: the histogram must still equal the oracle exactly
    (BASELINE.json config 5 — attribution is NOT capped at max_hits)."""
    from readserver_tpu import alphabet as alpha
    from readserver_tpu.oracle import OracleFMIndex

    motif, reads, sample_ids = _motif_corpus(rng)
    S = int(sample_ids.max()) + 1
    fm = OracleFMIndex(reads)
    cfg = ServeConfig(batch_size=8, max_hits=8)
    if path == "single":
        packed = build_index(reads, sample_ids=sample_ids)
        eng = QueryEngine(packed, cfg)
    elif path == "interval":
        from readserver_tpu.parallel import make_mesh

        packed = build_index(reads, sample_ids=sample_ids)
        mesh = make_mesh(data_parallel=2, num_shards=4)
        eng = QueryEngine(
            packed, ServeConfig(batch_size=8, max_hits=8, num_shards=4),
            mesh=mesh,
        )
    else:
        from readserver_tpu.parallel import make_mesh

        half = len(reads) // 2
        parts = [
            build_index(reads[:half], sample_ids=sample_ids[:half]),
            build_index(reads[half:], sample_ids=sample_ids[half:]),
        ]
        import jax

        mesh = make_mesh(
            data_parallel=1, num_shards=2, devices=jax.devices()[:2]
        )
        eng = QueryEngine(parts, cfg, mesh=mesh)

    km = alpha.decode(motif)
    (r,) = eng.query_batch([km])
    want_total = fm.count(motif)
    assert want_total > 8 * len(getattr(eng, "partitions", [1]))  # >> cap
    assert r.count == want_total
    assert r.hits_truncated  # hit LIST stays capped...
    assert r.sample_hist_complete  # ...but attribution is exact
    want = np.zeros(S, dtype=np.int64)
    for rid, _ in fm.find_reads(motif):
        if path == "doc":
            # doc partitions re-id reads; sample ids preserved by split
            want[sample_ids[rid]] += 1
        else:
            want[sample_ids[rid]] += 1
    got = np.zeros(S, dtype=np.int64)
    for name, c in (r.sample_hist or {}).items():
        got[int(name.split("_")[-1])] = c
    assert np.array_equal(got, want)


def test_exact_attribution_sweep_cap(rng):
    """max_sweep_rows cuts the sweep off → sample_hist_complete=False."""
    motif, reads, sample_ids = _motif_corpus(rng, num_samples=4)
    packed = build_index(reads, sample_ids=sample_ids)
    eng = QueryEngine(
        packed, ServeConfig(batch_size=4, max_hits=4, max_sweep_rows=16)
    )
    from readserver_tpu import alphabet as alpha

    (r,) = eng.query_batch([alpha.decode(motif)])
    assert r.count > 16
    assert not r.sample_hist_complete
