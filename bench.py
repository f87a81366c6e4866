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


# per-config resolve mark density: at chr20 the budgeter serves resolve
# through the fused-row walk (the 4 B/sym dsa tier doesn't fit next to the
# 2-step search tier), so halve the walk bound there; pairs cost is ~0.5 B/sym
SAMPLE_RATES = {"chr20": 16, "wg": 16}


def bench_cache(config_name: str, scale: float) -> Path:
    return REPO / "data" / f"bench_{config_name}_s{scale:g}_v5"


PARITY_CACHE = "parity_cache.npz"
PARITY_N = 512


def build_parity_cache(cache_dir: Path, corpus, k: int, nq: int = PARITY_N):
    """Precompute oracle counts for a fixed query sample, saved next to the
    artifact.  The in-situ oracle (sorted multiset of ALL read windows) costs
    ~200s at ecoli scale and ~45min at chr20 scale per bench run; paying it
    ONCE at build time keeps the driver's bare ``python bench.py`` within
    its window at every ladder rung (VERDICT r3 #1)."""
    from readserver_tpu.corpus import simulate
    from readserver_tpu.oracle.naive import window_multiset_counts

    qs = simulate.sample_query_kmers_fast(
        corpus, nq, k, seed=12345, miss_frac=0.15
    )
    counts = window_multiset_counts(np.stack(corpus.reads), qs)
    tmp = cache_dir / (PARITY_CACHE + ".tmp.npz")
    np.savez(tmp, queries=qs, counts=counts)
    tmp.rename(cache_dir / PARITY_CACHE)
    return counts


def get_packed(config_name: str, scale: float):
    from readserver_tpu.corpus import simulate
    from readserver_tpu.index import artifact, build_index

    cache = bench_cache(config_name, scale)
    if artifact.artifact_exists(cache):
        return artifact.load_artifact(cache, mmap=True), simulate.CONFIGS[config_name]
    t0 = time.time()
    corpus = simulate.simulate_config(config_name, scale=scale)
    print(
        f"# simulated {len(corpus.reads)} reads in {time.time()-t0:.0f}s",
        file=sys.stderr,
    )
    t0 = time.time()
    packed = build_index(
        corpus.reads,
        sample_ids=corpus.sample_ids,
        sample_rate=SAMPLE_RATES.get(config_name, 32),
    )
    print(
        f"# built index n={packed.n} in {time.time()-t0:.0f}s", file=sys.stderr
    )
    artifact.save_artifact(packed, cache)
    t0 = time.time()
    build_parity_cache(cache, corpus, corpus.spec.kmer_len)
    print(
        f"# parity cache ({PARITY_N} oracle counts) in {time.time()-t0:.0f}s",
        file=sys.stderr,
    )
    return packed, corpus.spec


def pick_auto_config() -> str:
    """Bare ``python bench.py`` benches the deepest measurement-ladder rung
    whose artifact is already cached (BASELINE.json pins chr20 as config 3;
    the driver runs the bare command, so chr20 must be the default once its
    ~20 GB artifact exists).  Falls back to ecoli (buildable in minutes)."""
    from readserver_tpu.index import artifact

    for name in ("chr20", "ecoli"):
        if artifact.artifact_exists(bench_cache(name, 1.0)):
            return name
    return "ecoli"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="auto",
                    help="bench config; 'auto' = deepest cached ladder rung")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--lut-order", type=int, default=-1,
                    help="prefix LUT order; -1 = auto, 0 = disabled")
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--no-resolve", action="store_true",
                    help="skip timing the search+resolve+attribution step")
    ap.add_argument("--resolve", action="store_true",
                    help="deprecated (resolve timing is on by default)")
    ap.add_argument("--parity-queries", type=int, default=256,
                    help="how many random queries to oracle-check")
    ap.add_argument("--hbm-budget-gb", type=float, default=0.0,
                    help="override the detected HBM budget (0 = auto)")
    ap.add_argument("--profile", default="",
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the pre-timing parity self-check")
    ap.add_argument("--no-pair", action="store_true",
                    help="disable the 2-step (pair-rank) search tier")
    ap.add_argument("--drop-tiers", default="",
                    help="comma-separated tiers to force-drop from the "
                         "plan (A/B residency experiments)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="repeat the throughput timing N times and "
                         "report each (run-to-run spread)")
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
    if args.config == "auto":
        args.config = pick_auto_config()
        print(f"# auto config -> {args.config}", file=sys.stderr)
    packed, spec = get_packed(args.config, args.scale)
    k = spec.kmer_len
    corpus = None  # simulated lazily — the query pool is cached on disk

    def get_corpus():
        nonlocal corpus
        if corpus is None:
            t = time.time()
            corpus = simulate.simulate_config(args.config, scale=args.scale)
            print(f"# corpus re-simulated in {time.time()-t:.0f}s",
                  file=sys.stderr)
        return corpus

    def mark(msg):
        print(f"# [{time.time()-T0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    T0 = time.time()
    # HBM tier budgeting: at chr20-30x scale the full tier set (~20 GB)
    # exceeds one v5e's 16 GB; the planner drops luxury tiers (answers are
    # invariant — only gather counts change).  Same logic as serve/engine.
    from readserver_tpu.index.budget import device_budget_bytes, plan_tiers

    budget = (
        int(args.hbm_budget_gb * 2**30)
        if args.hbm_budget_gb > 0
        else device_budget_bytes()
    )
    forced = {t.strip() for t in args.drop_tiers.split(",") if t.strip()}
    # exclude-before-planning: the freed budget reallocates to later
    # tiers (--drop-tiers rank2 at chr20 yields the dsa-resident
    # resolve-optimized profile, not just a rank2-less one)
    plan = plan_tiers(packed, budget, exclude=forced)
    index = DeviceIndex.from_packed(packed, tiers=plan.keep)
    jax.block_until_ready(index.rank_rows)
    mark(
        f"index on device ({plan.total_bytes/2**30:.2f} GiB; "
        f"tiers kept={sorted(plan.keep)} dropped={list(plan.dropped)})"
    )

    # start the axon relay claim NOW: the first device→host transfer in a
    # process blocks 2–5 min on the relay handshake (environment
    # pathology — VERDICT r4 weak #6: 989 s of the chr20 bench's 1030 s
    # wall was pre-warmup).  A tiny transfer on a side thread overlaps
    # that wait with LUT/query/batch staging below instead of serializing
    # it into the first measured-path transfer.
    import threading

    def _claim():
        try:
            t = time.time()
            np.asarray(index.C)
            mark(f"relay claim done (background, {time.time()-t:.0f}s)")
        except Exception as e:  # claim is opportunistic, never fatal
            print(f"# relay claim thread: {e}", file=sys.stderr)

    claim_thread = threading.Thread(target=_claim, daemon=True)
    claim_thread.start()

    p = default_lut_order(packed.n) if args.lut_order < 0 else args.lut_order
    p = min(p, k)
    cache_dir = bench_cache(args.config, args.scale)
    lut = None
    if p:
        # the LUT is a pure function of (BWT, p): persist the first build
        # next to the artifact (134 MB at p=12, ~1.5 s to re-stage vs
        # ~18 s + device ranks to rebuild — VERDICT r4 #8)
        lut_f = cache_dir / f"lut_p{p}.npy"
        t0 = time.time()
        if lut_f.exists():
            lut = jax.device_put(np.load(lut_f, mmap_mode="r"))
            jax.block_until_ready(lut)
            print(f"# prefix LUT p={p} staged from cache in "
                  f"{time.time()-t0:.1f}s", file=sys.stderr)
        else:
            lut = build_prefix_lut(index, p)
            jax.block_until_ready(lut)
            print(f"# prefix LUT p={p} built in {time.time()-t0:.1f}s",
                  file=sys.stderr)
            if cache_dir.is_dir():
                tmp = cache_dir / (lut_f.name + ".tmp.npy")
                np.save(tmp, np.asarray(lut))
                tmp.rename(lut_f)
    B, R = args.batch, args.iters
    need = B * (R + args.warmup)
    # query pool cache: sampling needs the corpus, and re-simulating chr20
    # costs minutes per bench run; the pool derives deterministically from
    # the corpus seed, so cache it beside the artifact (uint8, ~160 MB)
    qcache = cache_dir / "bench_queries_s1.npy"
    kmers = None
    if qcache.exists():
        pool = np.load(qcache, mmap_mode="r")
        if pool.shape[1] == k and len(pool) >= need:
            kmers = np.asarray(pool[:need]).astype(np.int32)
            mark(f"{need} queries staged from pool cache")
    if kmers is None:
        kmers = simulate.sample_query_kmers_fast(
            get_corpus(), need, k, seed=1, miss_frac=0.1
        )
        if cache_dir.is_dir():  # (re)write: an undersized pool never hits
            tmp = cache_dir / (qcache.name + ".tmp.npy")
            np.save(tmp, kmers.astype(np.uint8))
            tmp.rename(qcache)
        kmers = kmers.astype(np.int32)
    # parity cache (written at build time): splice the cached oracle
    # queries into batch 0's head so the count check needs no in-situ
    # window-multiset sort (minutes at ecoli scale, ~45min at chr20)
    parity_counts = None
    pcf = bench_cache(args.config, args.scale) / PARITY_CACHE
    if not args.no_parity and pcf.exists():
        z = np.load(pcf)
        nq = min(args.parity_queries, len(z["queries"]), B)
        if nq:
            kmers[:nq] = z["queries"][:nq].astype(np.int32)
            parity_counts = z["counts"][:nq].astype(np.int64)
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
    mat = None
    parity_queries = 0
    if not args.no_parity:
        # parity self-check before timing (SURVEY.md §4: oracle-diff idiom):
        # LUT path == plain path on one batch, plus naive counts on a few
        l1, u1 = count_fn(index, batches[0], lengths_d)
        l2, u2 = jax.jit(backward_search)(index, batches[0], lengths_d)
        l1, u1 = np.asarray(l1), np.asarray(u1)
        l2, u2 = np.asarray(l2), np.asarray(u2)
        # bit-identical including empties (canonical (0,0) on every path)
        if not (np.array_equal(l1, l2) and np.array_equal(u1, u2)):
            print(json.dumps({"error": "fast/plain path mismatch"}))
            return 1
        # oracle diff (SURVEY.md §4 idiom, widened): exact counts for a
        # query sample.  Preferred source: the build-time parity cache
        # (counts precomputed once, spliced into batch 0's head above);
        # fallback: in-situ 2-bit window multiset — one linear pass + sort
        # over ALL read windows, then binary search per query.
        if parity_counts is not None:
            nq = len(parity_counts)
            got = (u1 - l1)[:nq].astype(np.int64)
            if not np.array_equal(got, parity_counts):
                bad = int(np.flatnonzero(got != parity_counts)[0])
                print(json.dumps({
                    "error": f"count parity fail (cached) q{bad}: "
                             f"{int(got[bad])} != {int(parity_counts[bad])}"
                }))
                return 1
            parity_queries = int(nq)
        elif min(args.parity_queries, B) and k <= 31 and packed.n <= 5e8:
            # in-situ oracle only at sub-chr20 scale: the window-multiset
            # sort costs ~45 min at n=1.9e9, which blows the driver's bench
            # window if the build-time parity cache is missing (e.g. a
            # build interrupted between artifact save and cache write) —
            # the fast/plain cross-check above still guards the run
            nq = min(args.parity_queries, B)
            from readserver_tpu.oracle.naive import window_multiset_counts

            mat = np.stack(get_corpus().reads)
            rng = np.random.default_rng(7)
            sel = np.sort(rng.choice(B, size=nq, replace=False))
            want = window_multiset_counts(mat, kmers[sel].astype(np.uint8))
            del mat
            got = (np.asarray(u1) - np.asarray(l1))[sel].astype(np.int64)
            if not np.array_equal(got, want):
                bad = int(np.flatnonzero(got != want)[0])
                print(json.dumps({
                    "error": f"count parity fail q{int(sel[bad])}: "
                             f"{int(got[bad])} != {int(want[bad])}"
                }))
                return 1
            parity_queries = int(nq)
        else:
            parity_queries = 0
        parity_checked = True
        mark(
            f"parity self-check passed ({parity_queries} oracle queries"
            f"{', cached' if parity_counts is not None else ''})"
        )

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else None
    )
    if profile_cm is not None:
        profile_cm.__enter__()
    # throughput: dispatch all, block once; --repeats N reports the
    # run-to-run spread (VERDICT r3 #4: pin variance vs real regressions)
    rates = []
    for _rep in range(max(args.repeats, 1)):
        t0 = time.perf_counter()
        outs = [
            count_fn(index, batches[args.warmup + i], lengths_d)
            for i in range(R)
        ]
        jax.block_until_ready(outs)
        rates.append(B * R / (time.perf_counter() - t0))
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
        mark(f"profiler trace written to {args.profile}")
    searches_per_s = float(np.median(rates))

    # p50 latency: per-batch blocking
    lat = []
    for i in range(min(R, 16)):
        t1 = time.perf_counter()
        jax.block_until_ready(count_fn(index, batches[args.warmup + i], lengths_d))
        lat.append(time.perf_counter() - t1)
    p50_ms = float(np.median(lat) * 1e3)

    extras = {}
    if not args.no_resolve:
        # full query step (search + resolve + attribution) — the SERVED
        # path: fast k-step search, serving default max_hits=64
        Br, H = min(16384, B), 64
        from readserver_tpu.ops import sample_histogram

        def _res_inner(idx, lut_, km, ln):
            if use_pair:
                l, u = backward_search_pair(
                    idx, km, lut_, p if lut_ is not None else 0
                )
            elif lut_ is not None:
                l, u = backward_search_lut(idx, lut_, p, km, ln)
            else:
                l, u = backward_search(idx, km, ln)
            # row-budget compaction as served (ServeConfig default 0.6):
            # invalid lanes otherwise still issue masked walk gathers
            rid, off, valid = resolve_intervals(
                idx, l, u, max_hits=H, row_budget=int(0.6 * Br * H)
            )
            return u - l, rid, off, valid, sample_histogram(idx, rid, valid)

        _res_jit = jax.jit(_res_inner)
        res_fn = lambda idx, km, ln: _res_jit(idx, lut, km, ln)
        rb = [b[:Br] for b in batches]
        rlen = lengths_d[:Br]
        mark("resolve path compiling")
        first = res_fn(index, rb[0], rlen)
        np.asarray(first[0])
        if parity_checked:
            # hit-level parity: every resolved (read_id, offset) must spell
            # the query k-mer in the raw reads (via the O(read_len) cold
            # store — no 2 GB read matrix needed at chr20 scale), and
            # fully-enumerated queries (count <= max_hits) must yield
            # exactly `count` distinct hits
            cnt, rid, off, val = (np.asarray(x) for x in first[:4])
            rng = np.random.default_rng(11)
            for qi in rng.choice(Br, size=min(64, Br), replace=False):
                v = val[qi]
                if int(cnt[qi]) <= H and int(v.sum()) != int(cnt[qi]):
                    print(json.dumps({"error": f"resolve hit count q{qi}"}))
                    return 1
                r, o = rid[qi][v], off[qi][v]
                if len(r) and (
                    (r < 0).any()
                    or len(set(zip(r.tolist(), o.tolist()))) != len(r)
                    or not all(
                        np.array_equal(
                            packed.extract_read(ri)[oi : oi + k],
                            kmers[qi].astype(np.uint8),
                        )
                        for ri, oi in zip(r.tolist(), o.tolist())
                    )
                ):
                    print(json.dumps({"error": f"resolve parity fail q{qi}"}))
                    return 1
            mark("resolve hit parity passed (64 queries)")
        mark("resolve path timing")
        t2 = time.perf_counter()
        NR = 8
        outs = [res_fn(index, rb[i % len(rb)], rlen) for i in range(NR)]
        jax.block_until_ready(outs)
        extras["resolve_queries_per_s"] = round(Br * NR / (time.perf_counter() - t2))
        extras["resolve_walk"] = (
            "dsa" if index.dsa is not None
            else "lf" if index.lf is not None
            else "fused" if index.fused_rows is not None
            else "marks" if index.mark_rank is not None
            else "slow"
        )
        extras["resolve_max_hits"] = H

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
        "parity_queries": parity_queries,
        "parity_source": (
            "cached" if parity_counts is not None
            else ("multiset" if parity_queries else "path-crosscheck-only")
        ) if parity_checked else None,
        "tiers_kept": sorted(plan.keep),
        "tiers_dropped": list(plan.dropped),
        "device": dev_kind,
        **(
            {"repeat_values": [round(r) for r in rates]}
            if len(rates) > 1
            else {}
        ),
        **extras,
    }
    # fold in the other recorded ladder rungs (each written by its own
    # script — scripts/bench_*.py — with parity built in) so the driver's
    # single captured line carries the whole measurement ladder
    recorded = {}
    for fname, key, label in (
        ("BENCH_scaling.json", "value", "multihost_scaling_efficiency"),
        ("BENCH_wg.json", "value", "wg_sharded_queries_per_s"),
        ("BENCH_cohort.json", "value", "cohort_attribution_queries_per_s"),
        ("BENCH_cohort_big.json", "value",
         "cohort_big_attribution_queries_per_s"),
        ("BENCH_wire.json", "count_qps", "served_wire_qps"),
        ("BENCH_wire_chr20.json", "count_qps", "served_wire_chr20_qps"),
    ):
        f = REPO / fname
        if f.exists():
            try:
                recorded[label] = json.loads(f.read_text())[key]
            except (ValueError, KeyError, TypeError, OSError):
                pass  # malformed/non-dict/unreadable side JSON: skip, don't
                # crash a completed measurement run (ADVICE r3)
    try:
        # the scaling JSON's headline is the conservative same-shape bound;
        # carry the deployment-layout ratio too (dp-only cross-host axis —
        # how make_global_mesh actually deploys; see its "note" field)
        sc = json.loads((REPO / "BENCH_scaling.json").read_text())
        dp_only = sc["eff_dp_only_deployment_layout"]
        recorded["multihost_scaling_deployment_layout"] = min(
            dp_only.values()
        )
    except (ValueError, KeyError, TypeError, OSError, AttributeError):
        pass
    if recorded:
        result["recorded"] = recorded
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
