"""Pallas rank kernel parity (interpret mode on the CPU test harness;
real-device timing lives in kernels.compare_rank_impls, SURVEY.md §4.3)."""

import numpy as np
import pytest

from readserver_tpu.index.builder import build_index
from readserver_tpu.kernels.pallas_rank import occ_pallas
from readserver_tpu.ops import DeviceIndex
from readserver_tpu.oracle import OracleFMIndex


@pytest.fixture(scope="module")
def setup(tiny_corpus):
    fm = OracleFMIndex(tiny_corpus.reads[:300])
    packed = build_index(tiny_corpus.reads[:300])
    dev = DeviceIndex.from_packed(packed)
    return fm, dev


def test_pallas_rank_matches_oracle(setup, rng):
    fm, dev = setup
    B = 64
    c = rng.integers(0, 5, size=B).astype(np.int32)
    i = rng.integers(0, dev.n + 1, size=B).astype(np.int32)
    got = np.asarray(occ_pallas(dev, c, i, interpret=True))
    want = np.array([fm.occ(int(cc), int(ii)) for cc, ii in zip(c, i)])
    assert np.array_equal(got, want)


def test_pallas_rank_block_edges(setup):
    fm, dev = setup
    S = dev.block_size
    probes = [0, 1, S - 1, S, S + 1, 2 * S, dev.n - 1, dev.n]
    c = np.array([i % 5 for i in range(len(probes))], dtype=np.int32)
    i = np.array(probes, dtype=np.int32)
    got = np.asarray(occ_pallas(dev, c, i, interpret=True))
    want = np.array([fm.occ(int(cc), int(ii)) for cc, ii in zip(c, i)])
    assert np.array_equal(got, want)
