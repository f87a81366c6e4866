"""Corpus tooling: FASTA/FASTQ roundtrip, N-splitting normalizer, RLO sort
invariance (counts unchanged, ids permuted consistently)."""

import numpy as np

from readserver_tpu import alphabet
from readserver_tpu.corpus import (
    normalize_read,
    read_fasta,
    read_fastq,
    rlo_sort,
    write_fasta,
)
from readserver_tpu.index.builder import build_index
from readserver_tpu.oracle import OracleFMIndex, naive_count


def test_fasta_roundtrip(tmp_path):
    recs = [("r1", "ACGT"), ("r2", "GGGGTTTT"), ("r3", "A" * 70)]
    path = tmp_path / "x.fasta"
    write_fasta(path, recs)
    assert list(read_fasta(path)) == recs


def test_fastq_parse(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@a desc\nACGT\n+\nIIII\n@b\nTTGG\n+\n!!!!\n")
    assert list(read_fastq(p)) == [("a", "ACGT"), ("b", "TTGG")]


def test_normalizer_splits_on_n():
    segs = normalize_read("ACGT" * 10 + "N" + "TTTT" * 10, min_len=20)
    assert len(segs) == 2
    assert alphabet.decode(segs[0]) == "ACGT" * 10
    segs = normalize_read("ACGTN" * 5, min_len=4)
    assert all(alphabet.decode(s) == "ACGT" for s in segs)
    assert normalize_read("NNNNNN") == []


def test_rlo_sort_order_and_permutation(tiny_corpus):
    reads = tiny_corpus.reads[:100]
    sids = np.arange(100, dtype=np.int32)  # unique id per read
    out, perm_sids = rlo_sort(reads, sids)
    # reverse-lexicographic order
    revs = [tuple(r[::-1]) for r in out]
    assert revs == sorted(revs)
    # permutation consistent: sample id still identifies the original read
    for r, sid in zip(out, perm_sids):
        assert np.array_equal(r, reads[int(sid)])


def test_rlo_counts_invariant(tiny_corpus):
    reads = tiny_corpus.reads[:150]
    out, _ = rlo_sort(reads, None)
    fm = OracleFMIndex(out)
    packed = build_index(out)
    for km in [reads[0][:11], reads[5][10:21], reads[9][:15]]:
        assert fm.count(km) == naive_count(reads, km)
    assert packed.num_reads == len(reads)


def test_mott_trim():
    from readserver_tpu.corpus.io import mott_trim_len

    # all high quality: nothing trimmed
    assert mott_trim_len(np.full(50, 35), threshold=20) == 50
    # low-quality tail: cut exactly at the drop
    q = np.concatenate([np.full(40, 35), np.full(10, 5)])
    assert mott_trim_len(q, threshold=20) == 40
    # one bad base inside a good tail survives (penalty never net-positive)
    q2 = np.full(50, 35)
    q2[45] = 2
    assert mott_trim_len(q2, threshold=20) == 50
    # entirely bad read trims to nothing
    assert mott_trim_len(np.full(30, 2), threshold=20) == 0
    # phred-string form (ASCII-33): 'I'=40 good, '#'=2 bad
    assert mott_trim_len("I" * 30 + "#" * 8, threshold=20) == 30
    assert mott_trim_len("", threshold=20) == 0


def test_cli_fastq_qual_trim(tmp_path):
    from readserver_tpu import cli

    fq = tmp_path / "r.fq"
    good, bad = "ACGTACGTACGTACGTACGTACGT", "GGGGGGGG"
    fq.write_text(
        f"@r1\n{good}{bad}\n+\n{'I'*len(good)}{'#'*len(bad)}\n"
        f"@r2\n{good}\n+\n{'I'*len(good)}\n"
    )
    out = tmp_path / "idx"
    assert cli.main([
        "build", "--fastq", str(fq), "--out", str(out), "--qual-trim", "20",
    ]) == 0
    from readserver_tpu.index import artifact

    packed = artifact.load_artifact(out, mmap=False)
    assert packed.num_reads == 2
    assert sorted(np.asarray(packed.read_lengths).tolist()) == [24, 24]
