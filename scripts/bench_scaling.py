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
    ap.add_argument("--devices", type=int, default=4,
                    help="total virtual devices (constant across runs)")
    ap.add_argument("--nproc", type=int, default=2)
    args = ap.parse_args()

    t0 = time.time()
    one = run_group(1, args.devices, args.batch, args.iters, args.config)
    many = run_group(
        args.nproc, args.devices // args.nproc, args.batch, args.iters,
        args.config,
    )
    assert one["parity_bad"] == 0 and many["parity_bad"] == 0
    eff = many["value"] / one["value"] if one["value"] else 0.0
    result = {
        "metric": "multihost_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "qps_Nproc / qps_1proc at fixed devices+workload",
        "vs_baseline": round(eff / 0.8, 3),  # target >= 0.8
        "config": args.config,
        "global_batch": args.batch,
        "devices": args.devices,
        "processes": args.nproc,
        "qps_1proc": one["value"],
        "qps_nproc": many["value"],
        "shards_1proc": one["shards"],
        "shards_nproc": many["shards"],
        "note": (
            "CPU-rig proxy: same total virtual devices and workload, 1 vs "
            "N jax.distributed processes; isolates cross-process "
            "collective overhead (no pod slice available — BASELINE.md)"
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    (REPO / "BENCH_scaling.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
