"""Multi-sample index merge (the reference's ``bwt-merge`` stage).

The reference merges per-sample RLE-BWTs with an interleave-vector merge
because at merge time it no longer has cheap access to the raw reads
(SURVEY.md §2.1 "BWT merge", §3.4).  This framework's artifact keeps the
2-bit-packed corpus as the payload cold store, so the same stage is a
read-level concatenation (preserving per-sample read order and offsetting
sample ids) followed by a linear-time native SA-IS rebuild — simpler, and
at in-core scales faster than O(passes·n) interleave refinement.  The
result is bit-identical to an interleave merge: the multi-string BWT is a
pure function of the ordered read list.

Beyond-host-memory cohorts (whole-human, config 4/5 at full scale) are
built per shard instead; see parallel/sharded.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from readserver_tpu import alphabet
from readserver_tpu.config import IndexConfig
from readserver_tpu.index.builder import PackedIndex, build_index


def _reads_of(index: PackedIndex) -> list[np.ndarray]:
    total = int(index.read_offsets[-1])
    allb = alphabet.unpack_2bit(np.asarray(index.corpus_packed), total)
    return [
        allb[int(index.read_offsets[i]) : int(index.read_offsets[i + 1])]
        for i in range(index.num_reads)
    ]


def merge_indexes(
    indexes: Sequence[PackedIndex],
    config: IndexConfig | None = None,
    fast_resolve: bool = True,
) -> PackedIndex:
    """Merge per-sample (or per-batch) indexes into one population index.

    Read order is index order then within-index order (matching the
    reference's sample-then-read `$` ordering); sample ids are offset so
    every input keeps distinct samples.
    """
    if not indexes:
        raise ValueError("nothing to merge")
    reads: list[np.ndarray] = []
    sample_ids: list[np.ndarray] = []
    sample_names: list[str] = []
    offset = 0
    for idx in indexes:
        reads.extend(_reads_of(idx))
        sample_ids.append(np.asarray(idx.read_to_sample, dtype=np.int32) + offset)
        ns = max(idx.num_samples, 1)
        names = list(idx.sample_names) or [f"sample_{offset}"]
        sample_names.extend(names[:ns] + [f"sample_{offset + i}" for i in range(len(names), ns)])
        offset += ns
    return build_index(
        reads,
        sample_ids=np.concatenate(sample_ids),
        config=config or indexes[0].config,
        sample_names=sample_names,
        fast_resolve=fast_resolve,
        sample_rate=indexes[0].sample_rate or 32,
    )
