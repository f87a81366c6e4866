"""Serving-tier tests: engine batch API, async dispatcher, REST endpoint
(the parity-harness shape of SURVEY.md §4.5 — JSON answers diffed against
the oracle), plus dispatcher concurrency behavior."""

import asyncio
import json
import urllib.request

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.config import ServeConfig
from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index.builder import build_index
from readserver_tpu.oracle import OracleFMIndex, naive_count
from readserver_tpu.serve import Dispatcher, QueryEngine
from readserver_tpu.serve.http import RestServer


@pytest.fixture(scope="module")
def engine(tiny_corpus):
    packed = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    eng = QueryEngine(
        packed, ServeConfig(batch_size=64, max_hits=32, batch_deadline_ms=5.0)
    )
    eng.warmup()
    return eng


@pytest.fixture(scope="module")
def fm(tiny_corpus):
    return OracleFMIndex(tiny_corpus.reads)


def _kmer_strs(corpus, n, seed):
    kms = sample_query_kmers(corpus, n, corpus.spec.kmer_len, seed=seed)
    return [alphabet.decode(km) for km in kms]


def test_engine_counts(engine, fm, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 20, seed=31)
    for r in engine.count_batch(kmers):
        assert r.count == fm.count(r.kmer)


def test_engine_full_query(engine, fm, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 10, seed=32)
    for r in engine.query_batch(kmers):
        want = fm.find_reads(r.kmer)
        assert r.count == len(want) or r.hits_truncated
        got = sorted((h["read_id"], h["offset"]) for h in r.hits)
        if not r.hits_truncated:
            assert got == want
        for h in r.hits:
            assert h["sample_id"] == tiny_corpus.sample_ids[h["read_id"]]


def test_engine_read_sequence(engine, tiny_corpus):
    seq = engine.read_sequence(5)
    assert seq == alphabet.decode(tiny_corpus.reads[5])


def test_dispatcher_batches_concurrent_queries(engine, fm, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 40, seed=33)

    async def go():
        d = Dispatcher(engine)
        await d.start()
        results = await asyncio.gather(
            *[d.submit(km, counts_only=True) for km in kmers]
        )
        snap = d.metrics.snapshot()
        await d.stop()
        return results, snap

    results, snap = asyncio.run(go())
    for km, r in zip(kmers, results):
        assert r.count == fm.count(km)
    assert snap["queries"] == 40
    assert snap["batches"] <= 40  # batching actually happened (usually ≪ 40)
    assert snap["p50_latency_ms"] is not None


def test_dispatcher_propagates_errors(engine):
    async def go():
        d = Dispatcher(engine)
        await d.start()
        with pytest.raises(ValueError):
            await d.submit("NOTDNA", counts_only=True)
        ok = await d.submit("ACGT", counts_only=True)
        await d.stop()
        return ok

    assert asyncio.run(go()).count >= 0


def test_rest_endpoints(engine, fm, tiny_corpus):
    kmers = _kmer_strs(tiny_corpus, 4, seed=34)

    async def go():
        server = RestServer(Dispatcher(engine), "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        loop = asyncio.get_running_loop()

        def fetch(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=30
            ) as r:
                return r.status, json.loads(r.read())

        out = {}
        out["count"] = await loop.run_in_executor(
            None, fetch, f"/count?kmer={kmers[0]}"
        )
        out["reads"] = await loop.run_in_executor(
            None, fetch, f"/reads?kmer={kmers[1]}&sequences=1"
        )
        out["samples"] = await loop.run_in_executor(
            None, fetch, f"/samples?kmer={kmers[2]}"
        )
        out["health"] = await loop.run_in_executor(None, fetch, "/health")
        out["stats"] = await loop.run_in_executor(None, fetch, "/stats")

        def fetch_raw(path):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=30
                ) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        out["missing"] = await loop.run_in_executor(None, fetch_raw, "/count")
        out["badroute"] = await loop.run_in_executor(None, fetch_raw, "/nope")
        out["badkmer"] = await loop.run_in_executor(
            None, fetch_raw, "/count?kmer=XYZ"
        )
        await server.stop()
        return out

    out = asyncio.run(go())
    status, body = out["count"]
    assert status == 200 and body["count"] == fm.count(body["kmer"])
    status, body = out["reads"]
    assert status == 200
    for h in body["hits"]:
        seq = h["sequence"]
        assert body["kmer"] in seq
        assert seq == alphabet.decode(tiny_corpus.reads[h["read_id"]])
    status, body = out["samples"]
    assert status == 200 and isinstance(body["samples"], dict)
    assert sum(body["samples"].values()) == min(body["count"], 32)
    assert out["health"][0] == 200 and out["health"][1]["status"] == "ok"
    assert out["stats"][0] == 200 and out["stats"][1]["queries"] >= 4
    assert out["missing"] == 400
    assert out["badroute"] == 404
    assert out["badkmer"] == 400


def test_rest_count_parity_corpus(engine, tiny_corpus):
    """Replay a query corpus through REST and diff against naive counts —
    the reference's demo-test idiom end-to-end (SURVEY.md §3.5)."""
    kmers = _kmer_strs(tiny_corpus, 12, seed=35)

    async def go():
        server = RestServer(Dispatcher(engine), "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        loop = asyncio.get_running_loop()

        def fetch(km):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/count?kmer={km}", timeout=30
            ) as r:
                return json.loads(r.read())

        res = await asyncio.gather(
            *[loop.run_in_executor(None, fetch, km) for km in kmers]
        )
        await server.stop()
        return res

    for body in asyncio.run(go()):
        want = naive_count(tiny_corpus.reads, body["kmer"])
        assert body["count"] == want


def test_rest_batch_post_and_keepalive(engine, fm, tiny_corpus):
    """POST /batch answers a whole query list in one request, and one
    keep-alive connection serves many requests (the wire-level batching
    the device batching deserves)."""
    import http.client

    kmers = _kmer_strs(tiny_corpus, 8, seed=36)

    async def go():
        server = RestServer(Dispatcher(engine), "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        loop = asyncio.get_running_loop()

        def batch_and_keepalive():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            body = json.dumps({"kmers": kmers, "mode": "count"})
            conn.request("POST", "/batch", body=body,
                         headers={"Content-Type": "application/json"})
            r1 = json.loads(conn.getresponse().read())
            # same connection, second request (keep-alive)
            body = json.dumps({"kmers": kmers[:3], "mode": "samples"})
            conn.request("POST", "/batch", body=body)
            r2 = json.loads(conn.getresponse().read())
            # and a GET on the same connection
            conn.request("GET", f"/count?kmer={kmers[0]}")
            r3 = json.loads(conn.getresponse().read())
            conn.close()
            return r1, r2, r3

        out = await loop.run_in_executor(None, batch_and_keepalive)
        await server.stop()
        return out

    r1, r2, r3 = asyncio.run(go())
    assert len(r1["results"]) == len(kmers)
    for res in r1["results"]:
        assert res["count"] == fm.count(res["kmer"])
    for res in r2["results"]:
        assert res["samples_exact"]
        assert sum(res["samples"].values()) == res["count"]
    assert r3["count"] == fm.count(kmers[0])


def test_rest_read_endpoint_and_names(tiny_corpus):
    """/read returns name/sequence/sample by id; /reads hits carry stored
    ingest names (the RocksDB name/metadata tier, SURVEY.md §2.1)."""
    reads = tiny_corpus.reads[:50]
    names = [f"SRR000.{i}/1" for i in range(len(reads))]
    meta = [f"flowcell=F{i%3}".encode() for i in range(len(reads))]
    packed = build_index(
        reads,
        sample_ids=tiny_corpus.sample_ids[:50],
        read_names=names,
        read_meta=meta,
    )
    eng = QueryEngine(packed, ServeConfig(batch_size=16, max_hits=16))
    assert eng.read_name(7) == "SRR000.7/1"
    assert eng.read_meta(7) == b"flowcell=F1"

    async def go():
        server = RestServer(Dispatcher(eng), "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        loop = asyncio.get_running_loop()

        def fetch(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=30
            ) as r:
                return json.loads(r.read())

        km = alphabet.decode(reads[3][: tiny_corpus.spec.kmer_len])
        out = {
            "read": await loop.run_in_executor(None, fetch, "/read?id=3"),
            "hits": await loop.run_in_executor(
                None, fetch, f"/reads?kmer={km}"
            ),
        }
        await server.stop()
        return out

    out = asyncio.run(go())
    assert out["read"]["name"] == "SRR000.3/1"
    assert out["read"]["sequence"] == alphabet.decode(reads[3])
    import base64

    assert base64.b64decode(out["read"]["meta_b64"]) == b"flowcell=F0"
    by_id = {h["read_id"]: h for h in out["hits"]["hits"]}
    assert 3 in by_id and by_id[3]["name"] == "SRR000.3/1"
