"""Failure recovery + checkpoint/resume semantics (SURVEY.md §5).

The index is immutable, so recovery = artifact reload (the reference's
restart-on-crash model).  These tests pin that contract: a rebuilt engine
from the same artifact answers identically; a shard-count change (elastic
re-deployment) answers identically; a corrupted artifact fails loudly; an
interrupted save is detected (manifest-last protocol)."""

import json

import numpy as np
import pytest

from readserver_tpu import alphabet
from readserver_tpu.config import ServeConfig
from readserver_tpu.corpus.simulate import sample_query_kmers
from readserver_tpu.index import artifact as artifact_mod
from readserver_tpu.index.builder import build_index
from readserver_tpu.parallel import make_mesh
from readserver_tpu.serve import QueryEngine


@pytest.fixture(scope="module")
def saved(tiny_corpus, tmp_path_factory):
    packed = build_index(tiny_corpus.reads, sample_ids=tiny_corpus.sample_ids)
    path = artifact_mod.save_artifact(
        packed, tmp_path_factory.mktemp("rec") / "idx"
    )
    return path, tiny_corpus


def _answers(engine, kmers):
    return [(r.kmer, r.count) for r in engine.count_batch(kmers)]


def test_restart_from_artifact_identical(saved):
    path, corpus = saved
    kmers = [
        alphabet.decode(km)
        for km in sample_query_kmers(corpus, 16, corpus.spec.kmer_len, seed=61)
    ]
    cfg = ServeConfig(batch_size=32)
    e1 = QueryEngine(artifact_mod.load_artifact(path), cfg)
    a1 = _answers(e1, kmers)
    del e1  # simulated crash: engine dies, device state lost
    e2 = QueryEngine(artifact_mod.load_artifact(path), cfg)
    assert _answers(e2, kmers) == a1


def test_elastic_shard_count_change(saved):
    path, corpus = saved
    kmers = [
        alphabet.decode(km)
        for km in sample_query_kmers(corpus, 8, corpus.spec.kmer_len, seed=62)
    ]
    import jax

    answers = []
    for shards in (2, 4):  # re-deploy same artifact at different widths
        mesh = make_mesh(
            data_parallel=1,
            num_shards=shards,
            devices=jax.devices()[:shards],
        )
        eng = QueryEngine(
            artifact_mod.load_artifact(path),
            ServeConfig(batch_size=32, num_shards=shards),
            mesh=mesh,
        )
        answers.append(_answers(eng, kmers))
    assert answers[0] == answers[1]


def test_incomplete_save_detected(saved, tmp_path):
    path, _ = saved
    broken = tmp_path / "broken"
    broken.mkdir()
    # copy arrays but no manifest — the manifest-last protocol means an
    # interrupted save leaves no manifest, and loading must fail cleanly
    for f in path.glob("*.npy"):
        (broken / f.name).write_bytes(f.read_bytes())
    assert not artifact_mod.artifact_exists(broken)
    with pytest.raises(FileNotFoundError):
        artifact_mod.load_artifact(broken)


def test_manifest_version_mismatch(saved, tmp_path):
    path, _ = saved
    clone = tmp_path / "clone"
    clone.mkdir()
    for f in path.iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    mf = json.loads((clone / "manifest.json").read_text())
    mf["format_version"] = 999
    (clone / "manifest.json").write_text(json.dumps(mf))
    with pytest.raises(ValueError, match="format"):
        artifact_mod.load_artifact(clone)


def test_dispatcher_canary_health(saved):
    """The dispatcher's /health canary goes through the full device path —
    the liveness probe of SURVEY.md §5 'Failure detection'."""
    import asyncio

    from readserver_tpu.serve import Dispatcher

    path, _ = saved
    eng = QueryEngine(artifact_mod.load_artifact(path), ServeConfig(batch_size=8))

    async def go():
        d = Dispatcher(eng)
        await d.start()
        r = await d.submit("A", counts_only=True)
        await d.stop()
        return r

    assert asyncio.run(go()).count >= 0
