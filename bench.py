#!/usr/bin/env python
"""Benchmark: k-mer backward-searches/s per chip + p50 batch latency.

The headline metric of BASELINE.json ("≥1M k-mer backward-searches/s per
v5e chip").  Builds (once, cached under data/) the named config's index,
loads it into HBM, and times the jitted lockstep search over pre-staged
device batches.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is value / 1e6 (the reference target; no published reference
numbers are recoverable — see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

TARGET_PER_CHIP = 1_000_000.0


def get_packed(config_name: str, scale: float):
    from readserver_tpu.corpus import simulate
    from readserver_tpu.index import artifact, build_index

    cache = REPO / "data" / f"bench_{config_name}_s{scale:g}_v4"
    if artifact.artifact_exists(cache):
        return artifact.load_artifact(cache, mmap=False), simulate.CONFIGS[config_name]
    t0 = time.time()
    corpus = simulate.simulate_config(config_name, scale=scale)
    print(
        f"# simulated {len(corpus.reads)} reads in {time.time()-t0:.0f}s",
        file=sys.stderr,
    )
    t0 = time.time()
    packed = build_index(corpus.reads, sample_ids=corpus.sample_ids)
    print(
        f"# built index n={packed.n} in {time.time()-t0:.0f}s", file=sys.stderr
    )
    artifact.save_artifact(packed, cache)
    return packed, corpus.spec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ecoli")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--lut-order", type=int, default=-1,
                    help="prefix LUT order; -1 = auto, 0 = disabled")
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--resolve", action="store_true",
                    help="also time the search+resolve+attribution step")
    ap.add_argument("--profile", default="",
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the pre-timing parity self-check")
    ap.add_argument("--no-pair", action="store_true",
                    help="disable the 2-step (pair-rank) search tier")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from readserver_tpu.corpus import simulate
    from readserver_tpu.index.builder import PackedIndex  # noqa: F401
    from readserver_tpu.ops import (
        DeviceIndex,
        backward_search,
        backward_search_lut,
        backward_search_pair,
        build_prefix_lut,
        default_lut_order,
        resolve_intervals,
    )

    dev_kind = jax.devices()[0].device_kind
    packed, spec = get_packed(args.config, args.scale)
    # rebuild corpus cheaply for query sampling (reads derive from the seed)
    corpus = simulate.simulate_config(args.config, scale=args.scale)
    k = spec.kmer_len

    def mark(msg):
        print(f"# [{time.time()-T0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    T0 = time.time()
    index = DeviceIndex.from_packed(packed)
    jax.block_until_ready(index.rank_rows)
    mark("index on device")
    p = default_lut_order(packed.n) if args.lut_order < 0 else args.lut_order
    p = min(p, k)
    t0 = time.time()
    lut = build_prefix_lut(index, p) if p else None
    if lut is not None:
        jax.block_until_ready(lut)
        print(f"# prefix LUT p={p} built in {time.time()-t0:.1f}s",
              file=sys.stderr)
    B, R = args.batch, args.iters
    kmers = simulate.sample_query_kmers_fast(
        corpus, B * (R + args.warmup), k, seed=1, miss_frac=0.1
    ).astype(np.int32)
    lengths = np.full(B, k, dtype=np.int32)
    batches = [
        jax.device_put(kmers[i * B : (i + 1) * B])
        for i in range(R + args.warmup)
    ]
    lengths_d = jax.device_put(lengths)
    jax.block_until_ready(batches)
    mark(f"{len(batches)} query batches staged")

    # NB: pass the LUT as an argument — closing over it bakes a
    # multi-MB constant into the executable and inflates compile time
    use_pair = index.rank2_rows is not None and not args.no_pair
    if use_pair:
        _f = jax.jit(
            lambda idx, lut_, km, ln: backward_search_pair(
                idx, km, lut_, p if lut_ is not None else 0
            )
        )
        count_fn = lambda idx, km, ln: _f(idx, lut, km, ln)
    elif lut is not None:
        _f = jax.jit(
            lambda idx, lut_, km, ln: backward_search_lut(idx, lut_, p, km, ln)
        )
        count_fn = lambda idx, km, ln: _f(idx, lut, km, ln)
    else:
        count_fn = jax.jit(lambda idx, km, ln: backward_search(idx, km, ln))

    # warmup: compile + axon first-transfer handshake
    out = count_fn(index, batches[0], lengths_d)
    jax.block_until_ready(out)
    mark("search compiled + first batch ran")
    np.asarray(out[0])
    mark("first device->host transfer done")
    for i in range(args.warmup):
        jax.block_until_ready(count_fn(index, batches[i], lengths_d))
    mark("warmup done")

    parity_checked = False
    if not args.no_parity:
        # parity self-check before timing (SURVEY.md §4: oracle-diff idiom):
        # LUT path == plain path on one batch, plus naive counts on a few
        l1, u1 = count_fn(index, batches[0], lengths_d)
        l2, u2 = jax.jit(backward_search)(index, batches[0], lengths_d)
        l1, u1 = np.asarray(l1), np.asarray(u1)
        l2, u2 = np.asarray(l2), np.asarray(u2)
        ne = (u2 - l2) > 0  # empty intervals: counts must agree (bounds
        # freeze at different step granularity on the pair path)
        if not (np.array_equal(u1 - l1, u2 - l2)
                and np.array_equal(l1[ne], l2[ne])
                and np.array_equal(u1[ne], u2[ne])):
            print(json.dumps({"error": "fast/plain path mismatch"}))
            return 1
        if packed.n < 300_000_000:  # naive scan affordable
            from readserver_tpu.oracle.naive import naive_count_matrix
            mat = np.stack(corpus.reads)
            counts = np.asarray(u1) - np.asarray(l1)
            for qi in (0, 1):
                want = naive_count_matrix(mat, kmers[qi].astype(np.uint8))
                if int(counts[qi]) != want:
                    print(json.dumps({"error": f"parity fail q{qi}: "
                                      f"{int(counts[qi])} != {want}"}))
                    return 1
            del mat
        parity_checked = True
        mark("parity self-check passed")

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else None
    )
    if profile_cm is not None:
        profile_cm.__enter__()
    # throughput: dispatch all, block once
    t0 = time.perf_counter()
    outs = [
        count_fn(index, batches[args.warmup + i], lengths_d) for i in range(R)
    ]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
        mark(f"profiler trace written to {args.profile}")
    searches_per_s = B * R / dt

    # p50 latency: per-batch blocking
    lat = []
    for i in range(min(R, 16)):
        t1 = time.perf_counter()
        jax.block_until_ready(count_fn(index, batches[args.warmup + i], lengths_d))
        lat.append(time.perf_counter() - t1)
    p50_ms = float(np.median(lat) * 1e3)

    extras = {}
    if args.resolve:
        # full query step (search + LF-resolve + attribution) at a batch
        # size tuned for the resolve row expansion (B*max_hits rows walk)
        Br, H = 16384, 32
        from readserver_tpu.ops import sample_histogram

        def _res(idx, km, ln):
            l, u = backward_search(idx, km, ln)
            rid, off, valid = resolve_intervals(idx, l, u, max_hits=H)
            return u - l, rid, off, sample_histogram(idx, rid, valid)

        res_fn = jax.jit(_res)
        rb = [b[:Br] for b in batches]
        rlen = lengths_d[:Br]
        mark("resolve path compiling")
        np.asarray(res_fn(index, rb[0], rlen)[0])
        mark("resolve path timing")
        t2 = time.perf_counter()
        NR = 8
        outs = [res_fn(index, rb[i % len(rb)], rlen) for i in range(NR)]
        total = np.asarray(jnp.stack([o[0] for o in outs]).sum())
        extras["resolve_queries_per_s"] = round(Br * NR / (time.perf_counter() - t2))
        extras["resolve_fast_path"] = bool(index.lf is not None)

    result = {
        "metric": "kmer_backward_searches_per_s_per_chip",
        "value": round(searches_per_s),
        "unit": "searches/s",
        "vs_baseline": round(searches_per_s / TARGET_PER_CHIP, 3),
        "p50_batch_latency_ms": round(p50_ms, 3),
        "config": args.config,
        "scale": args.scale,
        "batch": B,
        "kmer_len": k,
        "n_symbols": packed.n,
        "prefix_lut_order": p,
        "pair_rank": use_pair,
        "kstep": (3 if index.rank3_rows is not None else 2) if use_pair else 1,
        "parity_checked": parity_checked,
        "device": dev_kind,
        **extras,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
