#!/usr/bin/env python
"""Pre-build (and cache) a bench config's index artifact.

The measurement ladder's larger rungs (chr20 30x: n ~= 1.94e9 symbols,
BASELINE.json config 3) take ~an hour of host SA-IS time; this script lets
the build run detached from the bench itself:

    python scripts/build_bench_index.py chr20
    python bench.py --config chr20 --resolve   # loads the cached artifact

Prints RSS checkpoints so long builds are observable.
"""
from __future__ import annotations

import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    config = sys.argv[1] if len(sys.argv) > 1 else "chr20"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    from bench import get_packed

    t0 = time.time()
    packed, _spec = get_packed(config, scale)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(
        f"done config={config} scale={scale:g} n={packed.n} "
        f"reads={packed.num_reads} wall={time.time()-t0:.0f}s peak_rss={rss:.1f}GiB",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
