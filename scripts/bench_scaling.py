#!/usr/bin/env python
"""Multi-process scaling efficiency on the CPU rig (BASELINE.json metric 3).

Real multi-host TPU hardware is unavailable in this environment (one
tunneled chip), so the 1 → N host efficiency pinned by BASELINE.json
("≥80% at 2+ hosts") is proxied the only way that is honestly measurable
here: the SAME global workload over the SAME total virtual device count,
run (a) as one process and (b) as N processes joined through
``jax.distributed`` with real cross-process collectives.  The ratio
isolates exactly the thing multi-host adds — cross-process collective +
dispatch overhead — while holding compute constant; ICI-vs-gRPC transport
differences remain unmeasurable until a pod slice exists (ROADMAP).

Writes BENCH_scaling.json at the repo root and prints one JSON line:

    {"metric": "multihost_scaling_efficiency", "value": 0.93, ...}
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_group(
    nproc: int,
    local_devices: int,
    batch_global: int,
    iters: int,
    config: str,
    num_shards: int = 0,
) -> dict:
    """Launch an nproc multihost_bench group; return process 0's JSON."""
    port = _free_port()
    cmd = [
        sys.executable, "-m", "readserver_tpu.bench.multihost_bench",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc),
        "--local-devices", str(local_devices),
        "--batch", str(batch_global // nproc),
        "--iters", str(iters),
        "--config", config,
        "--num-shards", str(num_shards),
    ]
    procs = [
        subprocess.Popen(
            cmd + ["--process-id", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"group member failed:\n{out[-2000:]}")
    line = [l for l in outs[0].splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="small")
    ap.add_argument("--batch", type=int, default=512,
                    help="GLOBAL batch (split across processes)")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8,
                    help="total virtual devices (constant across runs)")
    ap.add_argument("--nprocs", default="2,4",
                    help="comma-separated process counts to measure")
    ap.add_argument("--num-shards", type=int, default=2,
                    help="shard-axis size, held CONSTANT across every "
                         "run (within-host for all nprocs measured)")
    args = ap.parse_args()
    nprocs = [int(x) for x in args.nprocs.split(",")]

    t0 = time.time()
    # Control A — SAME (dp, shard) mesh as every N-process run: the only
    # varied factor below is the process count (VERDICT r4 weak #1: the
    # old control ran shard=devices, a different program whose psum
    # fan-in and per-shard table sizes differ).
    one_same = run_group(
        1, args.devices, args.batch, args.iters, args.config,
        num_shards=args.num_shards,
    )
    # Control B — the DEPLOYMENT shape a real 1-host serving process
    # would pick (shard axis = all local devices); ratio vs this mixes
    # decomposition change with process count, recorded for operators.
    one_deploy = run_group(
        1, args.devices, args.batch, args.iters, args.config,
        num_shards=args.devices,
    )
    assert one_same["parity_bad"] == 0 and one_deploy["parity_bad"] == 0
    runs = {}
    for n in nprocs:
        r = run_group(
            n, args.devices // n, args.batch, args.iters, args.config,
            num_shards=args.num_shards,
        )
        assert r["parity_bad"] == 0
        assert (r["shards"], r["dp"]) == (one_same["shards"], one_same["dp"])
        runs[n] = r
    eff_same = {
        n: round(r["value"] / one_same["value"], 3) for n, r in runs.items()
    }
    eff_deploy = {
        n: round(r["value"] / one_deploy["value"], 3)
        for n, r in runs.items()
    }
    headline = min(eff_same.values())
    result = {
        "metric": "multihost_scaling_efficiency",
        "value": headline,
        "unit": "qps_Nproc / qps_1proc, identical (dp,shard) mesh",
        "vs_baseline": round(headline / 0.8, 3),  # target >= 0.8
        "config": args.config,
        "global_batch": args.batch,
        "devices": args.devices,
        "num_shards": args.num_shards,
        "dp": one_same["dp"],
        "qps_1proc_same_shape": one_same["value"],
        "qps_1proc_deployment_shape": one_deploy["value"],
        "qps_nproc": {n: r["value"] for n, r in runs.items()},
        "eff_same_shape": eff_same,
        "eff_deployment_shape": eff_deploy,
        "note": (
            "CPU-rig proxy: same total virtual devices, workload, and "
            "(dp,shard) mesh across every run — the only varied factor "
            "in eff_same_shape is the jax.distributed process count. "
            "eff_deployment_shape compares against the 1-host serving "
            "shape (shard=all local devices) and additionally folds in "
            "the decomposition change (no pod slice available — "
            "BASELINE.md)"
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    (REPO / "BENCH_scaling.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
