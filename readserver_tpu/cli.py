"""CLI: build / query / serve / simulate — the reference's scripts+demo
surface (SURVEY.md §3.4-§3.5) as one entry point.

    python -m readserver_tpu.cli build --config ecoli --out data/idx
    python -m readserver_tpu.cli build --fastq reads.fq --out data/idx
    python -m readserver_tpu.cli query --index data/idx --kmer ACGTT --hits
    python -m readserver_tpu.cli serve --index data/idx --port 8080
    python -m readserver_tpu.cli simulate --config lambda --out reads.fasta
    python -m readserver_tpu.cli merge s1_idx s2_idx --out pop
    python -m readserver_tpu.cli import-bwt --bwt pop.rlebwt --out data/idx
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ingest_file(args) -> tuple[list, list]:
    """FASTA/FASTQ/BAM ingest (trim → N-split → min-len) → (reads, names)."""
    from readserver_tpu.corpus import io as cio

    reads = []
    read_names = []
    if getattr(args, "bam", None):
        from readserver_tpu.corpus import bam as cbam

        records = (
            (name, seq[: cio.mott_trim_len(quals, args.qual_trim)]
             if (args.qual_trim > 0 and quals is not None) else seq)
            for name, seq, quals in cbam.read_bam(args.bam)
        )
    elif args.fastq:
        records = (
            (name, seq[: cio.mott_trim_len(quals, args.qual_trim)]
             if args.qual_trim > 0 else seq)
            for name, seq, quals in cio.read_fastq_quals(args.fastq)
        )
    else:
        records = cio.read_fasta(args.fasta)
    for name, seq in records:
        segs = cio.normalize_read(seq, min_len=args.min_len)
        for j, s in enumerate(segs):
            reads.append(s)
            # N-split reads keep their ingest name, suffixed per segment
            read_names.append(name if len(segs) == 1 else f"{name}.{j}")
    return reads, read_names


def cmd_build(args) -> int:
    import numpy as np

    from readserver_tpu.index import artifact, build_index

    t0 = time.time()
    sample_ids = None
    sample_names = None
    read_names = None
    if args.fastq or args.fasta or args.bam:
        reads, read_names = _ingest_file(args)
    else:
        from readserver_tpu.corpus import simulate

        corpus = simulate.simulate_config(args.config, scale=args.scale)
        reads = corpus.reads
        sample_ids = corpus.sample_ids
        sample_names = [
            f"sample_{i:03d}" for i in range(int(np.max(sample_ids)) + 1)
        ]
    if args.rlo:
        from readserver_tpu.corpus.io import rlo_order

        order = rlo_order(reads)
        reads = [reads[i] for i in order]
        if sample_ids is not None:
            sample_ids = np.asarray(sample_ids)[order]
        if read_names is not None:
            read_names = [read_names[i] for i in order]
    print(f"# {len(reads)} reads", file=sys.stderr)
    if args.doc_shards > 1:
        from readserver_tpu.index.cohort import build_cohort

        build_cohort(
            reads, sample_ids, args.doc_shards, args.out,
            sample_names=sample_names, read_names=read_names,
        )
        print(
            f"# built cohort of {args.doc_shards} shards, "
            f"{len(reads)} reads in {time.time()-t0:.1f}s → {args.out}",
            file=sys.stderr,
        )
        return 0
    packed = build_index(
        reads, sample_ids=sample_ids, sample_names=sample_names,
        read_names=read_names,
    )
    artifact.save_artifact(packed, args.out)
    print(
        f"# built n={packed.n} reads={packed.num_reads} "
        f"in {time.time()-t0:.1f}s → {args.out}",
        file=sys.stderr,
    )
    return 0


def cmd_append(args) -> int:
    """Streaming ingest: add a read batch to an existing cohort artifact
    as a new doc shard — no rebuild (index/cohort.append_to_cohort)."""
    from readserver_tpu.index.cohort import append_to_cohort, is_cohort

    if not is_cohort(args.cohort):
        print(
            f"error: {args.cohort} is not a cohort artifact; append "
            "requires one (rebuild with `build --doc-shards N`)",
            file=sys.stderr,
        )
        return 2
    t0 = time.time()
    if args.fastq or args.fasta or args.bam:
        reads, read_names = _ingest_file(args)
    else:
        from readserver_tpu.corpus import simulate

        corpus = simulate.simulate_config(args.config, scale=args.scale)
        reads, read_names = corpus.reads, None
    append_to_cohort(
        args.cohort,
        reads,
        sample_names=[args.sample] if args.sample else None,
        read_names=read_names,
    )
    print(
        f"# appended {len(reads)} reads as a new shard in "
        f"{time.time()-t0:.1f}s → {args.cohort}",
        file=sys.stderr,
    )
    return 0


def cmd_upgrade(args) -> int:
    """Synthesize missing tiers into an existing artifact, in place —
    the anti-orphaning path (index/upgrade.py): a tier-set evolution
    costs one LF walk over the stored BWT, never an SA-IS rebuild."""
    import json as _json
    from pathlib import Path

    from readserver_tpu.index.cohort import COHORT_MANIFEST, is_cohort
    from readserver_tpu.index.upgrade import upgrade_artifact

    t0 = time.time()
    kstep = args.kstep or None
    rate = args.sample_rate or None
    targets = [Path(args.index)]
    if is_cohort(args.index):
        manifest = _json.loads(
            (Path(args.index) / COHORT_MANIFEST).read_text()
        )
        targets = [Path(args.index) / s for s in manifest["shards"]]
    total = []
    for tgt in targets:
        added = upgrade_artifact(tgt, kstep=kstep, sample_rate=rate)
        total += added
        print(
            f"# {tgt}: " + (f"added {', '.join(added)}" if added
                            else "already current"),
            file=sys.stderr,
        )
    print(
        f"# upgrade done ({len(total)} arrays added) in "
        f"{time.time()-t0:.1f}s",
        file=sys.stderr,
    )
    return 0


def cmd_compact(args) -> int:
    """Merge a cohort's doc shards down (interleave merge, read order and
    global sample space preserved) — undoes append fan-out."""
    from pathlib import Path

    from readserver_tpu.index.cohort import COHORT_MANIFEST, compact_cohort

    t0 = time.time()
    compact_cohort(args.cohort, target_shards=args.target_shards)
    manifest = json.loads(
        (Path(args.cohort) / COHORT_MANIFEST).read_text()
    )
    print(
        f"# compacted to {manifest['num_shards']} shards "
        f"({manifest['num_reads']} reads) in {time.time()-t0:.1f}s "
        f"→ {args.cohort}",
        file=sys.stderr,
    )
    return 0


def _load_engine(index_path: str, batch_size: int, num_shards: int,
                 warmup_k: tuple = ()):
    """Load one artifact (single/interval-sharded) or a comma-separated
    list of artifacts (document-sharded, one per shard)."""
    import jax

    from readserver_tpu.config import ServeConfig
    from readserver_tpu.index import artifact
    from readserver_tpu.serve import QueryEngine

    from readserver_tpu.index.cohort import is_cohort, load_cohort

    if is_cohort(index_path):
        parts, _ = load_cohort(index_path, mmap=False)
        if len(jax.devices()) >= len(parts):
            from readserver_tpu.parallel import make_mesh

            mesh = make_mesh(
                data_parallel=1,
                num_shards=len(parts),
                devices=jax.devices()[: len(parts)],
            )
            return QueryEngine(
                parts,
                ServeConfig(batch_size=batch_size,
                            warmup_query_lengths=warmup_k),
                mesh=mesh,
            )
        # fewer devices than shards: time-multiplexed front end
        from readserver_tpu.serve.engine import MultiEngine

        return MultiEngine(
            parts,
            ServeConfig(batch_size=batch_size,
                        warmup_query_lengths=warmup_k),
        )
    paths = index_path.split(",")
    if len(paths) > 1:
        from readserver_tpu.parallel import make_mesh

        parts = [artifact.load_artifact(p, mmap=False) for p in paths]
        mesh = make_mesh(
            data_parallel=1,
            num_shards=len(parts),
            devices=jax.devices()[: len(parts)],
        )
        return QueryEngine(
            parts,
            ServeConfig(batch_size=batch_size,
                        warmup_query_lengths=warmup_k),
            mesh=mesh,
        )
    packed = artifact.load_artifact(index_path, mmap=False)
    cfg = ServeConfig(batch_size=batch_size, num_shards=num_shards,
                      warmup_query_lengths=warmup_k)
    mesh = None
    if num_shards > 1:
        from readserver_tpu.parallel import make_mesh

        mesh = make_mesh(data_parallel=1, num_shards=num_shards)
    return QueryEngine(packed, cfg, mesh=mesh)


def cmd_import_bwt(args) -> int:
    """Import a bare RLE-BWT file (e.g. built by reference-stack tools)
    into a full artifact; corpus + metadata reconstructed by inversion."""
    from readserver_tpu.index import artifact
    from readserver_tpu.index.from_bwt import index_from_bwt
    from readserver_tpu.index.rle import read_rle_bwt

    t0 = time.time()
    bwt, num_reads = read_rle_bwt(args.bwt)
    packed = index_from_bwt(bwt)
    if packed.num_reads != num_reads:
        print(
            f"# warning: header said {num_reads} reads, BWT encodes "
            f"{packed.num_reads}",
            file=sys.stderr,
        )
    artifact.save_artifact(packed, args.out)
    print(
        f"# imported n={packed.n} reads={packed.num_reads} "
        f"in {time.time()-t0:.1f}s → {args.out}",
        file=sys.stderr,
    )
    return 0


def cmd_merge(args) -> int:
    """Merge per-sample artifacts into one population artifact
    (the reference's bwt-merge stage)."""
    from readserver_tpu.index import artifact
    from readserver_tpu.index.merge import merge_indexes, merge_indexes_interleave

    t0 = time.time()
    parts = [artifact.load_artifact(p, mmap=False) for p in args.inputs]
    fn = merge_indexes if args.rebuild else merge_indexes_interleave
    merged = fn(parts)
    artifact.save_artifact(merged, args.out)
    print(
        f"# merged {len(parts)} indexes: n={merged.n} reads={merged.num_reads} "
        f"samples={merged.num_samples} in {time.time()-t0:.1f}s → {args.out}",
        file=sys.stderr,
    )
    return 0


def cmd_query(args) -> int:
    engine = _load_engine(args.index, max(len(args.kmer), 16), args.shards)
    if args.hits or args.samples:
        results = engine.query_batch(args.kmer, both_strands=args.both_strands)
    else:
        results = engine.count_batch(args.kmer, both_strands=args.both_strands)
    for r in results:
        out = {"kmer": r.kmer, "count": r.count}
        if args.hits:
            out["hits"] = r.hits
            out["hits_truncated"] = r.hits_truncated
        if args.samples:
            out["samples"] = r.sample_hist
        print(json.dumps(out))
    return 0


def _warmup_k(args) -> tuple:
    """--warmup-k "31,21" → uniform query lengths precompiled at startup
    (each sliced length is its own XLA shape; see ServeConfig)."""
    raw = getattr(args, "warmup_k", "") or ""
    return tuple(int(x) for x in raw.split(",") if x.strip())


def cmd_serve(args) -> int:
    import asyncio

    from readserver_tpu.serve.http import serve_forever

    if args.coordinator:
        # multi-host serving rig (SURVEY.md §2.4): every host runs this
        # command with its process id; process 0 fronts REST and
        # broadcasts each batch tick, the rest follow in lockstep
        import jax

        from readserver_tpu.config import ServeConfig
        from readserver_tpu.index import artifact
        from readserver_tpu.parallel.multihost import (
            init_multihost,
            make_global_mesh,
        )
        from readserver_tpu.serve import QueryEngine

        init_multihost(args.coordinator, args.num_processes, args.process_id)
        mesh = make_global_mesh(args.shards if args.shards > 1 else None)
        packed = artifact.load_artifact(args.index, mmap=False)
        cfg = ServeConfig(
            batch_size=args.batch,
            num_shards=int(mesh.shape["shard"]),
            data_parallel=int(mesh.shape["dp"]),
            warmup_query_lengths=_warmup_k(args),
        )
        engine = QueryEngine(packed, cfg, mesh=mesh)
        if jax.process_index() != 0:
            engine.follow()
            return 0
        engine.warmup()
        try:
            asyncio.run(serve_forever(engine, args.host, args.port))
        except KeyboardInterrupt:
            pass
        finally:
            engine.stop_followers()
        return 0

    engine = _load_engine(args.index, args.batch, args.shards,
                          warmup_k=_warmup_k(args))
    engine.warmup()
    try:
        asyncio.run(serve_forever(engine, args.host, args.port))
    except KeyboardInterrupt:
        pass
    return 0


def cmd_simulate(args) -> int:
    from readserver_tpu import alphabet
    from readserver_tpu.corpus import io as cio, simulate

    corpus = simulate.simulate_config(args.config, scale=args.scale)
    cio.write_fasta(
        args.out,
        (
            (f"read_{i}_s{corpus.sample_ids[i]}", alphabet.decode(r))
            for i, r in enumerate(corpus.reads)
        ),
    )
    print(f"# wrote {len(corpus.reads)} reads → {args.out}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="readserver_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index artifact")
    b.add_argument("--config", default="tiny", help="simulated config name")
    b.add_argument("--scale", type=float, default=1.0)
    b.add_argument("--fastq", help="build from a FASTQ file instead")
    b.add_argument("--fasta", help="build from a FASTA file instead")
    b.add_argument("--bam", help="build from a BAM file instead "
                   "(primary records; reverse-strand un-flipped)")
    b.add_argument("--min-len", type=int, default=20)
    b.add_argument("--qual-trim", type=int, default=0,
                   help="Mott-style 3' quality trim threshold for FASTQ "
                        "ingest (phred; 0 = off)")
    b.add_argument("--rlo", action="store_true",
                   help="reverse-lexicographic read sort before indexing")
    b.add_argument("--doc-shards", type=int, default=1,
                   help="build a document-sharded cohort artifact of N "
                        "independent sub-indexes (out-of-core path)")
    b.add_argument("--out", required=True)
    b.set_defaults(fn=cmd_build)

    ab = sub.add_parser(
        "append",
        help="append reads to a cohort artifact as a new doc shard "
             "(streaming ingest — no rebuild)",
    )
    ab.add_argument("cohort", help="existing cohort artifact directory")
    ab.add_argument("--fastq")
    ab.add_argument("--fasta")
    ab.add_argument("--bam")
    ab.add_argument("--config", default="tiny",
                    help="simulated config (when no file given)")
    ab.add_argument("--scale", type=float, default=1.0)
    ab.add_argument("--min-len", type=int, default=20)
    ab.add_argument("--qual-trim", type=int, default=0)
    ab.add_argument("--sample", default="",
                    help="sample name for the appended batch (one new "
                         "sample id; default autogenerated)")
    ab.set_defaults(fn=cmd_append)

    cp = sub.add_parser(
        "compact",
        help="merge a cohort's doc shards down (interleave merge)",
    )
    cp.add_argument("cohort", help="cohort artifact directory")
    cp.add_argument("--target-shards", type=int, default=1)
    cp.set_defaults(fn=cmd_compact)

    up = sub.add_parser(
        "upgrade",
        help="synthesize missing tiers into an existing artifact in "
             "place (no rebuild; cohorts upgrade shard by shard)",
    )
    up.add_argument("index", help="artifact or cohort directory")
    up.add_argument("--kstep", type=int, default=0,
                    help="deepest k-step tier to ensure (0 = auto by n)")
    up.add_argument("--sample-rate", type=int, default=0,
                    help="mark density for synthesized resolve tiers "
                         "(0 = the artifact's recorded rate)")
    up.set_defaults(fn=cmd_upgrade)

    q = sub.add_parser("query", help="query an index artifact")
    q.add_argument("--index", required=True)
    q.add_argument("--kmer", nargs="+", required=True)
    q.add_argument("--hits", action="store_true")
    q.add_argument("--samples", action="store_true")
    q.add_argument("--both-strands", action="store_true",
                   help="also search the reverse complement")
    q.add_argument("--shards", type=int, default=1)
    q.set_defaults(fn=cmd_query)

    ib = sub.add_parser("import-bwt", help="RLE-BWT file → index artifact")
    ib.add_argument("--bwt", required=True)
    ib.add_argument("--out", required=True)
    ib.set_defaults(fn=cmd_import_bwt)

    mg = sub.add_parser("merge", help="merge per-sample artifacts")
    mg.add_argument("inputs", nargs="+", help="input artifact paths")
    mg.add_argument("--out", required=True)
    mg.add_argument("--interleave", action="store_true",
                    help="(default; kept for compatibility) BWT interleave "
                         "merge — no suffix re-sort")
    mg.add_argument("--rebuild", action="store_true",
                    help="read-level rebuild merge instead of interleave "
                         "(re-sorts all suffixes; only for tiny inputs)")
    mg.set_defaults(fn=cmd_merge)

    s = sub.add_parser("serve", help="REST server over an index artifact")
    s.add_argument("--index", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--batch", type=int, default=256)
    s.add_argument("--shards", type=int, default=1)
    s.add_argument("--warmup-k", default="",
                   help="comma-separated uniform query lengths to "
                        "precompile at startup (e.g. 31)")
    s.add_argument("--coordinator", default="",
                   help="host:port of process 0 — joins a multi-host "
                        "jax.distributed group (run one serve per host)")
    s.add_argument("--num-processes", type=int, default=1)
    s.add_argument("--process-id", type=int, default=0)
    s.set_defaults(fn=cmd_serve)

    m = sub.add_parser("simulate", help="write a simulated corpus as FASTA")
    m.add_argument("--config", default="tiny")
    m.add_argument("--scale", type=float, default=1.0)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_simulate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
