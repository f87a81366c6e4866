#!/usr/bin/env python
"""Generate the build-time parity cache for an EXISTING bench artifact.

``bench.py`` writes ``parity_cache.npz`` (a fixed query sample + exact
oracle counts from the sorted window multiset) automatically when it
builds an artifact; this script backfills the cache for artifacts built
before the mechanism existed, so the bench's count-parity check costs two
binary searches per query instead of a full multiset sort per run
(~45 min at chr20 scale).

    python scripts/build_parity_cache.py chr20 [scale]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    config = sys.argv[1] if len(sys.argv) > 1 else "ecoli"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    from bench import PARITY_CACHE, bench_cache, build_parity_cache
    from readserver_tpu.corpus import simulate

    cache = bench_cache(config, scale)
    if not cache.exists():
        print(f"no artifact cache at {cache}", file=sys.stderr)
        return 1
    t0 = time.time()
    corpus = simulate.simulate_config(config, scale=scale)
    print(
        f"# simulated {len(corpus.reads)} reads in {time.time()-t0:.0f}s",
        flush=True,
    )
    t0 = time.time()
    counts = build_parity_cache(cache, corpus, corpus.spec.kmer_len)
    print(
        f"done {cache / PARITY_CACHE}: {len(counts)} oracle counts "
        f"(present: {(counts > 0).sum()}) in {time.time()-t0:.0f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
