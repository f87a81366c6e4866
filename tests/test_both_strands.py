"""Reverse-complement (both-strands) queries: engine batch API, dispatcher
fold, REST flag — counts must equal naive(km) + naive(rc(km)) with the
palindrome counted once."""

import asyncio
import json
import urllib.request

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.config import ServeConfig
from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index.builder import build_index
from readserver_tpu.oracle import naive_count
from readserver_tpu.serve import Dispatcher, QueryEngine
from readserver_tpu.serve.engine import rc_string
from readserver_tpu.serve.http import RestServer


@pytest.fixture(scope="module")
def engine(tiny_corpus):
    packed = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    eng = QueryEngine(
        packed, ServeConfig(batch_size=64, max_hits=64, batch_deadline_ms=5.0)
    )
    eng.warmup()
    return eng


def _kmer_strs(corpus, n, seed):
    kms = sample_query_kmers(corpus, n, corpus.spec.kmer_len, seed=seed)
    return [alphabet.decode(km) for km in kms]


def _want(corpus, km):
    rc = rc_string(km)
    w = naive_count(corpus.reads, km)
    if rc != km:
        w += naive_count(corpus.reads, rc)
    return w


def test_rc_string():
    assert rc_string("ACGT") == "ACGT"  # palindrome
    assert rc_string("AACCG") == "CGGTT"
    assert rc_string("T") == "A"


def test_engine_both_strands_counts(engine, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 16, seed=41)
    for r in engine.count_batch(kmers, both_strands=True):
        assert r.count == _want(tiny_corpus, r.kmer), r.kmer


def test_engine_both_strands_palindrome(engine, tiny_corpus):
    # palindromic k-mer must not double count
    km = "ACGT"
    (r,) = engine.count_batch([km], both_strands=True)
    assert r.count == naive_count(tiny_corpus.reads, km)


def test_engine_both_strands_hits(engine, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 6, seed=42)
    for r in engine.query_batch(kmers, both_strands=True):
        assert r.count == _want(tiny_corpus, r.kmer)
        rc = rc_string(r.kmer)
        for h in r.hits:
            read = alphabet.decode(tiny_corpus.reads[h["read_id"]])
            probe = r.kmer if h["strand"] == "+" else rc
            assert read[h["offset"] : h["offset"] + len(probe)] == probe
        if not r.hits_truncated:
            assert len(r.hits) == r.count
        if r.sample_hist is not None:
            assert sum(r.sample_hist.values()) == len(r.hits)


def test_dispatcher_both_strands(engine, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 10, seed=43)

    async def go():
        d = Dispatcher(engine)
        await d.start()
        res = await asyncio.gather(
            *[d.submit(km, counts_only=True, both_strands=True) for km in kmers]
        )
        await d.stop()
        return res

    for km, r in zip(kmers, asyncio.run(go())):
        assert r.kmer == km
        assert r.count == _want(tiny_corpus, km)


def test_rest_both_strands(engine, tiny_corpus):
    km = _kmer_strs(tiny_corpus, 1, seed=44)[0]

    async def go():
        server = RestServer(Dispatcher(engine), "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        loop = asyncio.get_running_loop()

        def fetch(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=30
            ) as r:
                return json.loads(r.read())

        count = await loop.run_in_executor(
            None, fetch, f"/count?kmer={km}&both_strands=1"
        )
        reads = await loop.run_in_executor(
            None, fetch, f"/reads?kmer={km}&both_strands=1"
        )
        await server.stop()
        return count, reads

    count, reads = asyncio.run(go())
    assert count["count"] == _want(tiny_corpus, km)
    assert reads["count"] == count["count"]
    assert all(h["strand"] in "+-" for h in reads["hits"])
