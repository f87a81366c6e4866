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
