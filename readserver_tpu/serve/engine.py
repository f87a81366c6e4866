"""QueryEngine: artifact → device arrays → jitted query functions.

Startup mirrors the reference's backend boot (load BWT + marks + payload DB,
then serve; SURVEY.md §3.1) but collapses to: deserialize artifact →
device_put (single chip or sharded mesh) → warm up the jitted steps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
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


class QueryEngine:
    """Batched query API over a built index (single device or sharded)."""

    def __init__(
        self,
        packed: PackedIndex,
        serve_config: ServeConfig | None = None,
        mesh=None,
    ):
        self.packed = packed
        self.cfg = serve_config or ServeConfig()
        self.K = packed.config.max_query_len
        self.B = self.cfg.batch_size
        self.H = self.cfg.max_hits
        self.sample_names = packed.sample_names or ["sample_0"]
        self._sharded = mesh is not None and self.cfg.num_shards > 1
        if self._sharded:
            from readserver_tpu.ops import default_lut_order
            from readserver_tpu.parallel import (
                build_prefix_lut_sharded,
                build_sharded,
                make_sharded_query_fn,
                place_sharded,
            )

            self.mesh = mesh
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
            self._query_fn = make_sharded_query_fn(
                self.sidx, mesh, max_hits=self.H, lut_p=0
            )
            self._query_fn_lut = (
                make_sharded_query_fn(
                    self.sidx, mesh, max_hits=self.H, lut_p=self.lut_p
                )
                if self.lut is not None
                else None
            )
        else:
            self.index = DeviceIndex.from_packed(packed)
            from readserver_tpu.ops import (
                backward_search_lut,
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

            def _search(idx, lut, codes, lengths, use_lut: bool):
                if use_lut:
                    return backward_search_lut(
                        idx, lut, self.lut_p, codes, lengths
                    )
                return backward_search(idx, codes, lengths)

            frac = self.cfg.resolve_budget_frac
            budget = int(frac * self.B * self.H) if frac else None

            def _full(idx, lut, codes, lengths, use_lut):
                l, u = _search(idx, lut, codes, lengths, use_lut)
                rid, off, valid = resolve_intervals(
                    idx, l, u, self.H, row_budget=budget
                )
                hist = sample_histogram(idx, rid, valid)
                return dict(
                    l=l, u=u, count=u - l, read_id=rid, offset=off,
                    valid=valid, sample_hist=hist,
                )

            def _count(idx, lut, codes, lengths, use_lut):
                l, u = _search(idx, lut, codes, lengths, use_lut)
                return dict(l=l, u=u, count=u - l)

            self._full_jit = jax.jit(_full, static_argnames=("use_lut",))
            self._count_jit = jax.jit(_count, static_argnames=("use_lut",))

    # ------------------------------------------------------------- helpers

    def _pad_encode(self, kmers: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
        nq = len(kmers)
        if nq > self.B:
            raise ValueError(f"batch of {nq} exceeds configured {self.B}")
        # pad with full-length dummies so padding never disables the LUT path
        padded = list(kmers) + ["A" * self.K] * (self.B - nq)
        codes, lengths = encode_query_batch(padded, self.K)
        return codes, lengths, nq

    def _run(self, kmers: list[str], counts_only: bool) -> dict[str, np.ndarray]:
        codes, lengths, nq = self._pad_encode(kmers)
        if self._sharded:
            use_lut = bool(
                self.lut is not None
                and nq
                and int(lengths[:nq].min()) >= self.lut_p
            )
            if use_lut:
                out = self._query_fn_lut(self.sidx, self.lut, codes, lengths)
            else:
                out = self._query_fn(self.sidx, None, codes, lengths)
        else:
            use_lut = bool(
                self.lut is not None and int(lengths[:nq].min()) >= self.lut_p
            ) if nq else False
            fn = self._count_jit if counts_only else self._full_jit
            out = fn(self.index, self.lut, codes, lengths, use_lut)
        return {k: np.asarray(v)[:nq] for k, v in out.items()}

    # ------------------------------------------------------------ public

    def warmup(self) -> None:
        """Compile all path variants and pay the first-transfer handshake."""
        self._run(["A"], counts_only=True)       # plain path
        self._run(["A"], counts_only=False)
        if self.lut is not None:
            self._run(["A" * self.K], counts_only=True)   # LUT path
            self._run(["A" * self.K], counts_only=False)

    def count_batch(self, kmers: list[str]) -> list[QueryResult]:
        out = self._run(kmers, counts_only=True)
        return [
            QueryResult(
                kmer=km,
                count=int(out["count"][i]),
                interval=(int(out["l"][i]), int(out["u"][i])),
            )
            for i, km in enumerate(kmers)
        ]

    def query_batch(self, kmers: list[str]) -> list[QueryResult]:
        """Full answers: counts + hit sets + per-sample attribution."""
        out = self._run(kmers, counts_only=False)
        results = []
        for i, km in enumerate(kmers):
            count = int(out["count"][i])
            hits = []
            for r, o, v in zip(
                out["read_id"][i], out["offset"][i], out["valid"][i]
            ):
                if v:
                    rid = int(r)
                    hits.append(
                        dict(
                            read_id=rid,
                            sample_id=int(self.packed.read_to_sample[rid]),
                            offset=int(o),
                        )
                    )
            hist = out["sample_hist"][i]
            sample_hist = {
                self.sample_names[s]: int(c)
                for s, c in enumerate(hist)
                if c > 0
            }
            results.append(
                QueryResult(
                    kmer=km,
                    count=count,
                    interval=(int(out["l"][i]), int(out["u"][i])),
                    hits=hits,
                    sample_hist=sample_hist,
                    # truncated by the per-query cap OR the global row budget
                    hits_truncated=count > len(hits),
                )
            )
        return results

    def read_sequence(self, read_id: int) -> str:
        """Read text from the host-side cold store (RocksDB replacement)."""
        return alphabet.decode(self.packed.extract_read(read_id))
