"""CLI round trip: build from FASTA → merge artifacts (interleave) →
export RLE → import-bwt → query; counts stay parity with naive search
at every hop (the reference's demo.sh shape, SURVEY.md §3.5)."""

import json

import numpy as np

from readserver_tpu import alphabet
from readserver_tpu.cli import main
from readserver_tpu.corpus import io as cio
from readserver_tpu.index import artifact
from readserver_tpu.index.packing import unpack_sym4
from readserver_tpu.index.rle import write_rle_bwt
from readserver_tpu.oracle import naive_count


def _mk_reads(rng, n):
    return [
        alphabet.decode(rng.integers(1, 5, size=40).astype(np.uint8))
        for _ in range(n)
    ]


def test_cli_round_trip(tmp_path, capsys, rng):
    f1, f2 = tmp_path / "s1.fa", tmp_path / "s2.fa"
    reads1, reads2 = _mk_reads(rng, 30), _mk_reads(rng, 20)
    cio.write_fasta(f1, ((f"r{i}", s) for i, s in enumerate(reads1)))
    cio.write_fasta(f2, ((f"r{i}", s) for i, s in enumerate(reads2)))

    idx1, idx2 = str(tmp_path / "idx1"), str(tmp_path / "idx2")
    pop = str(tmp_path / "pop")
    assert main(["build", "--fasta", str(f1), "--out", idx1]) == 0
    assert main(["build", "--fasta", str(f2), "--out", idx2]) == 0
    assert main(["merge", idx1, idx2, "--interleave", "--out", pop]) == 0

    all_reads = [alphabet.encode(s) for s in reads1 + reads2]
    km = reads1[0][5:25]
    capsys.readouterr()
    assert main(["query", "--index", pop, "--kmer", km]) == 0
    body = json.loads(capsys.readouterr().out.strip())
    assert body["count"] == naive_count(all_reads, km)

    # RLE export → import-bwt → same counts
    packed = artifact.load_artifact(pop, mmap=False)
    rle_path = tmp_path / "pop.rlebwt"
    write_rle_bwt(rle_path, unpack_sym4(packed.sym4, packed.n), packed.num_reads)
    imp = str(tmp_path / "imported")
    assert main(["import-bwt", "--bwt", str(rle_path), "--out", imp]) == 0
    capsys.readouterr()
    assert main(["query", "--index", imp, "--kmer", km]) == 0
    body = json.loads(capsys.readouterr().out.strip())
    assert body["count"] == naive_count(all_reads, km)


def test_cli_query_both_strands(tmp_path, capsys, rng):
    f1 = tmp_path / "s.fa"
    reads = _mk_reads(rng, 15)
    cio.write_fasta(f1, ((f"r{i}", s) for i, s in enumerate(reads)))
    idx = str(tmp_path / "idx")
    assert main(["build", "--fasta", str(f1), "--out", idx]) == 0

    km = reads[3][10:30]
    rc = alphabet.decode(alphabet.revcomp(alphabet.encode(km)))
    codes = [alphabet.encode(s) for s in reads]
    want = naive_count(codes, km) + (naive_count(codes, rc) if rc != km else 0)
    capsys.readouterr()
    assert main(
        ["query", "--index", idx, "--kmer", km, "--both-strands"]
    ) == 0
    body = json.loads(capsys.readouterr().out.strip())
    assert body["count"] == want
