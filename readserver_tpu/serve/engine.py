"""QueryEngine: artifact → device arrays → jitted query functions.

Startup mirrors the reference's backend boot (load BWT + marks + payload DB,
then serve; SURVEY.md §3.1) but collapses to: deserialize artifact →
device_put (single chip or sharded mesh) → warm up the jitted steps.
"""

from __future__ import annotations

import bisect
import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from readserver_tpu import alphabet
from readserver_tpu.config import ServeConfig
from readserver_tpu.index.builder import PackedIndex
from readserver_tpu.ops import (
    DeviceIndex,
    backward_search,
    encode_query_batch,
    resolve_intervals,
    sample_histogram,
)


@dataclass
class QueryResult:
    kmer: str
    count: int
    interval: tuple[int, int] | None = None
    hits: list[dict] = field(default_factory=list)      # read_id/sample_id/offset
    sample_hist: dict[str, int] | None = None
    hits_truncated: bool = False
    # exact-attribution contract: the histogram covers the FULL interval
    # (False only when the engine's max_sweep_rows safety cap cut it off,
    # or when running with exact_attribution disabled and count > max_hits)
    sample_hist_complete: bool = True


def rc_string(kmer: str) -> str:
    """Reverse complement of an ACGT query string."""
    return alphabet.decode(alphabet.revcomp(alphabet.encode(kmer)))


def fold_strand_results(
    kmer: str, fwd: QueryResult, rev: QueryResult | None
) -> QueryResult:
    """Combine forward + reverse-complement answers into one both-strands
    result (``rev is None`` for palindromic queries — one strand is the
    other, so folding twice would double count).

    Reads are stored single-stranded (as in the reference's read pool), so
    "present on either strand" = search the k-mer and its reverse
    complement; hits carry a ``strand`` tag, and a ``-`` hit's ``offset``
    is where the reverse complement sits on the stored strand.
    """
    fwd_hits = [{**h, "strand": "+"} for h in fwd.hits]
    if rev is None:
        return QueryResult(
            kmer=kmer,
            count=fwd.count,
            interval=fwd.interval,
            hits=fwd_hits,
            sample_hist=fwd.sample_hist,
            hits_truncated=fwd.hits_truncated,
        )
    hist = None
    if fwd.sample_hist is not None or rev.sample_hist is not None:
        hist = dict(fwd.sample_hist or {})
        for k, v in (rev.sample_hist or {}).items():
            hist[k] = hist.get(k, 0) + v
    return QueryResult(
        kmer=kmer,
        count=fwd.count + rev.count,
        interval=fwd.interval,
        hits=fwd_hits + [{**h, "strand": "-"} for h in rev.hits],
        sample_hist=hist,
        hits_truncated=fwd.hits_truncated or rev.hits_truncated,
    )


class QueryEngine:
    """Batched query API over a built index.

    Three deployment shapes (SURVEY.md §1 L5, §2.3):
    * single device — ``QueryEngine(packed)``
    * interval-sharded — ``QueryEngine(packed, cfg(num_shards=S), mesh)``
    * document-sharded — ``QueryEngine([packed_1..packed_S], cfg, mesh)``
      (a list of per-partition indexes; the reference's split-by-sample
      deployment — counts sum, hit sets union, ids map by offsets)
    """

    def __init__(
        self,
        packed: PackedIndex | list[PackedIndex],
        serve_config: ServeConfig | None = None,
        mesh=None,
    ):
        self.cfg = serve_config or ServeConfig()
        self._doc = isinstance(packed, (list, tuple))
        if self._doc:
            self.partitions = list(packed)
            packed = self.partitions[0]
            self._read_base = []
            base = 0
            for p_ in self.partitions:
                self._read_base.append(base)
                base += p_.num_reads
        self.packed = packed
        self.K = packed.config.max_query_len
        self.B = self.cfg.batch_size
        self.H = self.cfg.max_hits
        if self._doc:
            ns = max(p_.num_samples for p_ in self.partitions)
            self.sample_names = [f"sample_{i}" for i in range(ns)]
            names = {}
            for p_ in self.partitions:
                for i, nm in enumerate(p_.sample_names):
                    names[i] = nm
            for i, nm in names.items():
                if i < ns:
                    self.sample_names[i] = nm
        else:
            self.sample_names = packed.sample_names or ["sample_0"]
        self._sharded = not self._doc and mesh is not None and (
            self.cfg.num_shards > 1 or self.cfg.data_parallel > 1
        )
        if self._doc:
            if mesh is None:
                raise ValueError("document sharding requires a mesh")
            from readserver_tpu.ops import default_lut_order
            from readserver_tpu.parallel import (
                build_doc_sharded,
                make_doc_query_fn,
                place_doc_sharded,
            )

            self.mesh = mesh
            self.lut_p = (
                self.cfg.prefix_lut_order
                if self.cfg.prefix_lut_order is not None
                else default_lut_order(max(p_.n for p_ in self.partitions))
            )
            self.lut = None
            self.didx = place_doc_sharded(
                build_doc_sharded(self.partitions, lut_p=self.lut_p), mesh
            )
            frac = self.cfg.resolve_budget_frac
            budget = int(frac * self.B * self.H) if frac else None
            ex = dict(
                exact_hist=self.cfg.exact_attribution,
                exact_max_rows=self.cfg.max_sweep_rows,
            )
            self._doc_fn = make_doc_query_fn(
                self.didx, mesh, max_hits=self.H, row_budget=budget, **ex
            )
            # plain variant (same arrays, LUT disabled) for short queries
            self.didx_plain = dataclasses.replace(
                self.didx, lut=None, lut_p=0
            )
            self._doc_fn_plain = make_doc_query_fn(
                self.didx_plain, mesh, max_hits=self.H, row_budget=budget,
                **ex,
            )
            return
        if self._sharded:
            from readserver_tpu.ops import default_lut_order
            from readserver_tpu.parallel import (
                build_prefix_lut_sharded,
                build_sharded,
                make_sharded_query_fn,
                place_sharded,
            )

            self.mesh = mesh
            # multi-host process group (SURVEY.md §2.4): the mesh spans
            # every process's devices; batches are broadcast from process
            # 0 each tick and all processes execute the SPMD step together
            # (followers loop in .follow()).  Single-process when 1.
            self._mh = jax.process_count() > 1
            # tiered widths must divide the dp mesh axis (each dp rank —
            # and each host under multi-host — takes an equal batch slice)
            self._width_quantum = int(mesh.shape["dp"]) if mesh else 1
            self.sidx = place_sharded(
                build_sharded(packed, self.cfg.num_shards), mesh
            )
            self.lut_p = (
                self.cfg.prefix_lut_order
                if self.cfg.prefix_lut_order is not None
                else default_lut_order(packed.n)
            )
            self.lut = (
                build_prefix_lut_sharded(self.sidx, mesh, self.lut_p)
                if self.lut_p
                else None
            )
            # k-step variants serve uniform full-width batches (the common
            # shape after _pad_encode's slicing); 1-step variants serve
            # mixed-length batches, whose per-query masks the k-step
            # schedule cannot express
            # resolve collective budget: per-device hit lanes compacted to
            # frac·(B/dp)·H before the walk (psum width ∝ real hits), and
            # the walk while_loop exits when the global batch drains
            frac = self.cfg.resolve_budget_frac
            dp = max(self.cfg.data_parallel, 1)
            budget = (
                max(int(frac * (self.B // dp) * self.H), 1) if frac else None
            )
            ex = dict(
                exact_hist=self.cfg.exact_attribution,
                exact_max_rows=self.cfg.max_sweep_rows,
                resolve_budget=budget,
                walk_early_exit=True,
                owner_route=True,  # no-op at num_shards == 1
                route_capacity=self.cfg.owner_route_capacity,
            )
            self._query_fn = make_sharded_query_fn(
                self.sidx, mesh, max_hits=self.H, lut_p=0, **ex
            )
            self._query_fn_1 = make_sharded_query_fn(
                self.sidx, mesh, max_hits=self.H, lut_p=0, kstep=1, **ex
            )
            self._query_fn_lut = (
                make_sharded_query_fn(
                    self.sidx, mesh, max_hits=self.H, lut_p=self.lut_p, **ex
                )
                if self.lut is not None
                else None
            )
            self._query_fn_lut_1 = (
                make_sharded_query_fn(
                    self.sidx, mesh, max_hits=self.H, lut_p=self.lut_p,
                    kstep=1, **ex,
                )
                if self.lut is not None
                else None
            )
        else:
            from readserver_tpu.index.budget import (
                device_budget_bytes,
                plan_tiers,
            )

            budget = (
                int(self.cfg.hbm_budget_gb * 2**30)
                if self.cfg.hbm_budget_gb is not None
                else device_budget_bytes()
            )
            self.tier_plan = plan_tiers(packed, budget)
            if self.tier_plan.dropped:
                import logging

                logging.getLogger("readserver_tpu.engine").warning(
                    "HBM budget %.2f GiB: shipping %s (%.2f GiB), "
                    "dropping tiers %s",
                    (budget or 0) / 2**30,
                    sorted(self.tier_plan.keep) or ["base only"],
                    self.tier_plan.total_bytes / 2**30,
                    list(self.tier_plan.dropped),
                )
            self.index = DeviceIndex.from_packed(
                packed, tiers=self.tier_plan.keep
            )
            from readserver_tpu.ops import (
                backward_search_lut,
                backward_search_pair,
                build_prefix_lut,
                default_lut_order,
            )

            self.lut_p = (
                self.cfg.prefix_lut_order
                if self.cfg.prefix_lut_order is not None
                else default_lut_order(packed.n)
            )
            self.lut = (
                build_prefix_lut(self.index, self.lut_p) if self.lut_p else None
            )
            self.has_pair = self.index.rank2_rows is not None

            ee = self.cfg.early_exit

            def _search(idx, lut, codes, lengths, use_lut: bool,
                        use_pair: bool = False):
                if use_pair:
                    # uniform full-length batch: 2-step path (half the
                    # dependent rank gathers)
                    return backward_search_pair(
                        idx, codes,
                        lut if use_lut else None,
                        self.lut_p if use_lut else 0,
                        early_exit=ee,
                    )
                if use_lut:
                    return backward_search_lut(
                        idx, lut, self.lut_p, codes, lengths
                    )
                return backward_search(idx, codes, lengths, early_exit=ee)

            frac = self.cfg.resolve_budget_frac
            budget = int(frac * self.B * self.H) if frac else None

            def _full(idx, lut, codes, lengths, use_lut, use_pair):
                l, u = _search(idx, lut, codes, lengths, use_lut, use_pair)
                rid, off, valid = resolve_intervals(
                    idx, l, u, self.H, row_budget=budget
                )
                if self.cfg.exact_attribution:
                    from readserver_tpu.ops import exact_sample_histogram

                    hist, complete = exact_sample_histogram(
                        idx, l, u,
                        window=codes.shape[0] * self.H,
                        max_rows=self.cfg.max_sweep_rows,
                    )
                else:
                    hist = sample_histogram(idx, rid, valid)
                    # complete only when every interval row was actually
                    # resolved: count fits the hit cap AND no lane was
                    # dropped by resolve_intervals' row budget
                    resolved = valid.sum(axis=1).astype(jnp.int64)
                    complete = ((u - l) <= self.H) & (resolved == (u - l))
                return dict(
                    l=l, u=u, count=u - l, read_id=rid, offset=off,
                    valid=valid, sample_hist=hist, hist_complete=complete,
                )

            def _count(idx, lut, codes, lengths, use_lut, use_pair):
                l, u = _search(idx, lut, codes, lengths, use_lut, use_pair)
                return dict(l=l, u=u, count=u - l)

            self._full_jit = jax.jit(
                _full, static_argnames=("use_lut", "use_pair")
            )
            self._count_jit = jax.jit(
                _count, static_argnames=("use_lut", "use_pair")
            )

    # ------------------------------------------------------------- helpers

    def _pad_encode(self, kmers: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
        nq = len(kmers)
        if nq > self.B:
            raise ValueError(f"batch of {nq} exceeds configured {self.B}")
        # tiered widths: pad to the smallest compiled width that fits so a
        # lone query doesn't pay the full-batch program (p50 under light
        # load); jit specializes per width on first use.  Multi-host ticks
        # broadcast the chosen width in a fixed-shape header first, so
        # light batches run tiered there too; widths must stay divisible
        # by the dp mesh axis (per-host ingest slices, parallel/multihost)
        width = self.B
        quantum = getattr(self, "_width_quantum", 1)
        for w in sorted(self.cfg.small_batch_sizes):
            if nq <= w <= self.B and w % quantum == 0:
                width = w
                break
        self.last_width = width
        # dummies match the longest real query, so a uniform-length batch
        # stays uniform after padding (keeps the k-step tiers usable) and
        # padding never disables the LUT path
        lmax = max((len(k) for k in kmers), default=self.K)
        padded = list(kmers) + ["A" * lmax] * (width - nq)
        codes, lengths = encode_query_batch(padded, self.K)
        # uniform-length batches slice to exactly L columns: the k-step
        # paths require every column to be a real character (they ignore
        # per-query lengths), and fewer columns = fewer scan steps anyway
        # (multi-host broadcasts fixed [B, K] payloads; the identical
        # slicing decision is re-derived per process after the broadcast)
        if (
            not getattr(self, "_mh", False)
            and nq
            and int(lengths.min()) == lmax
            and lmax < self.K
        ):
            codes = np.ascontiguousarray(codes[:, self.K - lmax:])
        return codes, lengths, nq

    def _run(self, kmers: list[str], counts_only: bool) -> dict[str, np.ndarray]:
        codes, lengths, nq = self._pad_encode(kmers)
        if self._doc:
            use_lut = bool(
                self.lut_p and nq and int(lengths[:nq].min()) >= self.lut_p
            )
            if use_lut:
                out = self._doc_fn(self.didx, codes, lengths)
            else:
                out = self._doc_fn_plain(self.didx_plain, codes, lengths)
            out = {k: np.asarray(v) for k, v in out.items()}
            S = len(self.partitions)
            # merge stacked per-shard hit tensors: [S, B, H] → [B, S*H]
            merged = {
                "count": out["count"][:nq],
                "sample_hist": out["sample_hist"][:nq],
                "hist_complete": out["hist_complete"][:nq],
            }
            for key in ["read_id", "offset", "valid"]:
                merged[key] = (
                    out[key].transpose(1, 0, 2).reshape(-1, S * self.H)[:nq]
                )
            return merged
        if self._sharded:
            if self._mh:
                from jax.experimental import multihost_utils

                # two-phase tick: a fixed-shape header carries the chosen
                # tier width so followers can allocate the matching
                # payload buffers — light batches then compile/run the
                # small-width program on every host (not the full-B one)
                multihost_utils.broadcast_one_to_all(
                    (np.int32(codes.shape[0]), np.int32(nq), np.int32(0))
                )
                codes, lengths = multihost_utils.broadcast_one_to_all(
                    (codes, lengths)
                )
                out = self._mh_execute(
                    np.asarray(codes), np.asarray(lengths), nq
                )
                return {k: v[:nq] for k, v in out.items()}
            use_lut = bool(
                self.lut is not None
                and nq
                and int(lengths[:nq].min()) >= self.lut_p
            )
            uniform = bool(nq and int(lengths.min()) == codes.shape[1])
            if use_lut:
                fn = self._query_fn_lut if uniform else self._query_fn_lut_1
                out = fn(self.sidx, self.lut, codes, lengths)
            else:
                fn = self._query_fn if uniform else self._query_fn_1
                out = fn(self.sidx, None, codes, lengths)
        else:
            use_lut = bool(
                self.lut is not None and int(lengths[:nq].min()) >= self.lut_p
            ) if nq else False
            # k-step path requires a uniform batch spanning every column
            # (guaranteed by _pad_encode's slicing for uniform lengths);
            # results are bit-identical to the 1-step path
            use_pair = bool(
                self.has_pair and nq and int(lengths.min()) == codes.shape[1]
            )
            fn = self._count_jit if counts_only else self._full_jit
            out = fn(self.index, self.lut, codes, lengths, use_lut, use_pair)
        return {k: np.asarray(v)[:nq] for k, v in out.items()}

    def _mh_execute(
        self, codes: np.ndarray, lengths: np.ndarray, nq: int
    ) -> dict[str, np.ndarray]:
        """One multi-host tick: every process runs this with the SAME
        (broadcast) batch.  Per-process dp ingest slice → SPMD step →
        allgather egress (process 0 answers clients; followers discard).
        All routing decisions derive from the broadcast payload, so every
        process picks the same compiled variant."""
        import jax

        from readserver_tpu.parallel.multihost import (
            gather_results,
            host_local_queries,
        )

        nq = int(nq)
        K = codes.shape[1]
        lmax = int(lengths.max()) if len(lengths) else K
        if int(lengths.min()) == lmax and lmax < K:
            codes = np.ascontiguousarray(codes[:, K - lmax:])
        use_lut = bool(
            self.lut is not None
            and nq
            and int(lengths[:nq].min()) >= self.lut_p
        )
        uniform = bool(int(lengths.min()) == codes.shape[1])
        B = codes.shape[0]
        nproc = jax.process_count()
        if B % nproc:
            raise ValueError(f"batch_size {B} must divide by {nproc} hosts")
        share = B // nproc
        pid = jax.process_index()
        lc, ll = host_local_queries(
            self.mesh,
            codes[pid * share : (pid + 1) * share],
            lengths[pid * share : (pid + 1) * share],
        )
        if use_lut:
            fn = self._query_fn_lut if uniform else self._query_fn_lut_1
            out = fn(self.sidx, self.lut, lc, ll)
        else:
            fn = self._query_fn if uniform else self._query_fn_1
            out = fn(self.sidx, None, lc, ll)
        return gather_results(out)

    def follow(self) -> None:
        """Follower loop for processes != 0: execute broadcast ticks until
        process 0 sends the stop flag (or this process is killed).  Each
        tick is two broadcasts: a fixed-shape header (width, nq, stop)
        then the width-shaped query payload."""
        from jax.experimental import multihost_utils

        while True:
            width, nq, stop = multihost_utils.broadcast_one_to_all(
                (np.int32(0), np.int32(0), np.int32(0))
            )
            if int(stop):
                return
            codes, lengths = multihost_utils.broadcast_one_to_all(
                (
                    np.zeros((int(width), self.K), dtype=np.int32),
                    np.ones(int(width), dtype=np.int32),
                )
            )
            self._mh_execute(np.asarray(codes), np.asarray(lengths), int(nq))

    def stop_followers(self) -> None:
        """Release .follow() loops on the other processes."""
        if not getattr(self, "_mh", False):
            return
        from jax.experimental import multihost_utils

        multihost_utils.broadcast_one_to_all(
            (np.int32(0), np.int32(0), np.int32(1))
        )

    # ------------------------------------------------------------ public

    def warmup(self) -> None:
        """Compile all path variants and pay the first-transfer handshake."""
        self._run(["A"], counts_only=True)                # plain path
        self._run(["A"], counts_only=False)
        self._run(["A" * self.K], counts_only=True)       # LUT path (if any)
        self._run(["A" * self.K], counts_only=False)

    def _locate(self, rid: int) -> tuple[int, int]:
        """Global read id → (partition, local id)."""
        s = bisect.bisect_right(self._read_base, rid) - 1
        return s, rid - self._read_base[s]

    def _sample_of(self, rid: int) -> int:
        if self._doc:
            s, local = self._locate(rid)
            return int(self.partitions[s].read_to_sample[local])
        return int(self.packed.read_to_sample[rid])

    def _expand_rc(self, kmers: list[str]) -> tuple[list[str], dict[int, int]]:
        """→ (kmers + non-palindromic RCs appended, original→rc index map).

        Both-strands batches therefore hold up to 2× the queries; callers
        must stay within ``batch_size`` after expansion.
        """
        rcs = [rc_string(k) for k in kmers]
        exp = list(kmers)
        back: dict[int, int] = {}
        for i, (km, rc) in enumerate(zip(kmers, rcs)):
            if rc != km:
                back[i] = len(exp)
                exp.append(rc)
        return exp, back

    def count_batch(
        self, kmers: list[str], both_strands: bool = False
    ) -> list[QueryResult]:
        if both_strands:
            exp, back = self._expand_rc(kmers)
            res = self.count_batch(exp)
            return [
                fold_strand_results(
                    km, res[i], res[back[i]] if i in back else None
                )
                for i, km in enumerate(kmers)
            ]
        out = self._run(kmers, counts_only=True)
        return [
            QueryResult(
                kmer=km,
                count=int(out["count"][i]),
                interval=(
                    (int(out["l"][i]), int(out["u"][i]))
                    if "l" in out
                    else None
                ),
            )
            for i, km in enumerate(kmers)
        ]

    def query_batch(
        self, kmers: list[str], both_strands: bool = False
    ) -> list[QueryResult]:
        """Full answers: counts + hit sets + per-sample attribution."""
        if both_strands:
            exp, back = self._expand_rc(kmers)
            res = self.query_batch(exp)
            return [
                fold_strand_results(
                    km, res[i], res[back[i]] if i in back else None
                )
                for i, km in enumerate(kmers)
            ]
        out = self._run(kmers, counts_only=False)
        # vectorized hit assembly: one NumPy gather maps every hit's read
        # id to its sample id (the old path called _sample_of per hit —
        # ~260k Python dict lookups per full batch on the serving path)
        rid_m = np.asarray(out["read_id"])
        off_m = np.asarray(out["offset"])
        val_m = np.asarray(out["valid"]).astype(bool)
        rid_safe = np.clip(rid_m, 0, None)
        if self._doc:
            base = np.asarray(self._read_base, dtype=np.int64)
            part = np.searchsorted(base, rid_safe, side="right") - 1
            sample_m = np.zeros(rid_m.shape, dtype=np.int64)
            for s, p_ in enumerate(self.partitions):
                msk = val_m & (part == s)
                if msk.any():
                    sample_m[msk] = np.asarray(p_.read_to_sample)[
                        rid_safe[msk] - base[s]
                    ]
        else:
            sample_m = np.asarray(self.packed.read_to_sample)[rid_safe]
        hist_m = np.asarray(out["sample_hist"])
        results = []
        for i, km in enumerate(kmers):
            count = int(out["count"][i])
            v = val_m[i]
            hits = [
                dict(read_id=r, sample_id=s, offset=o)
                for r, s, o in zip(
                    rid_m[i][v].tolist(),
                    sample_m[i][v].tolist(),
                    off_m[i][v].tolist(),
                )
            ]
            nz = np.nonzero(hist_m[i])[0]
            sample_hist = {
                self.sample_names[int(s)]: int(hist_m[i][s]) for s in nz
            }
            results.append(
                QueryResult(
                    kmer=km,
                    count=count,
                    interval=(
                        (int(out["l"][i]), int(out["u"][i]))
                        if "l" in out
                        else None
                    ),
                    hits=hits,
                    sample_hist=sample_hist,
                    # truncated by the per-query cap OR the global row budget
                    hits_truncated=count > len(hits),
                    sample_hist_complete=bool(
                        out["hist_complete"][i]
                    ) if "hist_complete" in out else True,
                )
            )
        return results

    def read_sequence(self, read_id: int) -> str:
        """Read text from the host-side cold store (RocksDB replacement)."""
        if self._doc:
            s, local = self._locate(read_id)
            return alphabet.decode(self.partitions[s].extract_read(local))
        return alphabet.decode(self.packed.extract_read(read_id))

    def read_name(self, read_id: int) -> str:
        """Stored ingest name (FASTA/FASTQ header); synthesized when the
        artifact was built without names."""
        if self._doc:
            s, local = self._locate(read_id)
            nm = self.partitions[s].read_name(local)
        else:
            nm = self.packed.read_name(read_id)
        return nm if nm is not None else f"read_{read_id}"

    def read_meta(self, read_id: int) -> bytes | None:
        """Opaque per-read metadata bytes (None when absent)."""
        if self._doc:
            s, local = self._locate(read_id)
            return self.partitions[s].read_meta(local)
        return self.packed.read_meta(read_id)


class MultiEngine:
    """Sequential front end over per-partition engines (fewer devices than
    cohort shards — e.g. one chip serving a many-shard cohort artifact).

    The reference's front-end/backend split as a time-multiplexed loop:
    each partition answers the full batch on the same device(s); counts
    sum, hit sets union with global read-id offsets, histograms merge —
    identical answers to the device-parallel doc-sharded path, trading
    latency for HBM footprint.  Duck-types ``QueryEngine`` for the
    dispatcher and REST front.
    """

    def __init__(self, partitions, serve_config: ServeConfig | None = None):
        if not partitions:
            raise ValueError("no partitions")
        self.cfg = serve_config or ServeConfig()
        self.partitions = list(partitions)
        self._doc = True
        self.packed = self.partitions[0]
        self.engines = [QueryEngine(p, self.cfg) for p in self.partitions]
        self._read_base = []
        base = 0
        for p in self.partitions:
            self._read_base.append(base)
            base += p.num_reads
        self.K = self.engines[0].K
        self.B = self.cfg.batch_size
        self.H = self.cfg.max_hits
        ns = max(p.num_samples for p in self.partitions)
        self.sample_names = [f"sample_{i}" for i in range(ns)]
        for p in self.partitions:
            for i, nm in enumerate(p.sample_names):
                if i < ns:
                    self.sample_names[i] = nm

    def warmup(self) -> None:
        for e in self.engines:
            e.warmup()

    def _locate(self, rid: int) -> tuple[int, int]:
        s = bisect.bisect_right(self._read_base, rid) - 1
        return s, rid - self._read_base[s]

    def count_batch(
        self, kmers: list[str], both_strands: bool = False
    ) -> list[QueryResult]:
        """Summed counts across partitions.  ``interval`` is None by
        contract: each partition is its own BWT, so no single global
        (l, u) exists — the same convention the device-parallel
        doc-sharded engine uses (its merged ``_run`` dict carries no
        'l'/'u' either); only the un-partitioned engine reports BWT
        coordinates."""
        per = [e.count_batch(kmers, both_strands=both_strands)
               for e in self.engines]
        return [
            QueryResult(
                kmer=km, count=sum(res[i].count for res in per)
            )
            for i, km in enumerate(kmers)
        ]

    def query_batch(
        self, kmers: list[str], both_strands: bool = False
    ) -> list[QueryResult]:
        per = [e.query_batch(kmers, both_strands=both_strands)
               for e in self.engines]
        out = []
        for i, km in enumerate(kmers):
            hits: list[dict] = []
            hist: dict[str, int] = {}
            truncated = False
            complete = True
            count = 0
            for s, res in enumerate(per):
                r = res[i]
                count += r.count
                truncated |= r.hits_truncated
                complete &= r.sample_hist_complete
                for h in r.hits:
                    hits.append(
                        {**h, "read_id": h["read_id"] + self._read_base[s]}
                    )
                for k, v in (r.sample_hist or {}).items():
                    hist[k] = hist.get(k, 0) + v
            out.append(
                QueryResult(
                    kmer=km,
                    count=count,
                    hits=hits,
                    sample_hist=hist,
                    hits_truncated=truncated,
                    sample_hist_complete=complete,
                )
            )
        return out

    def read_sequence(self, read_id: int) -> str:
        s, local = self._locate(read_id)
        return alphabet.decode(self.partitions[s].extract_read(local))

    def read_name(self, read_id: int) -> str:
        s, local = self._locate(read_id)
        nm = self.partitions[s].read_name(local)
        return nm if nm is not None else f"read_{read_id}"

    def read_meta(self, read_id: int) -> bytes | None:
        s, local = self._locate(read_id)
        return self.partitions[s].read_meta(local)
