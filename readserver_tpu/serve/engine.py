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
            from readserver_tpu.parallel import (
                build_sharded,
                make_sharded_query_fn,
                place_sharded,
            )

            self.mesh = mesh
            self.sidx = place_sharded(
                build_sharded(packed, self.cfg.num_shards), mesh
            )
            self._query_fn = make_sharded_query_fn(
                self.sidx, mesh, max_hits=self.H
            )
            self._count_fn = None
        else:
            self.index = DeviceIndex.from_packed(packed)

            def _full(idx, codes, lengths):
                l, u = backward_search(idx, codes, lengths)
                rid, off, valid = resolve_intervals(idx, l, u, self.H)
                hist = sample_histogram(idx, rid, valid)
                return dict(
                    l=l, u=u, count=u - l, read_id=rid, offset=off,
                    valid=valid, sample_hist=hist,
                )

            def _count(idx, codes, lengths):
                l, u = backward_search(idx, codes, lengths)
                return dict(l=l, u=u, count=u - l)

            self._full_jit = jax.jit(_full)
            self._count_jit = jax.jit(_count)

    # ------------------------------------------------------------- helpers

    def _pad_encode(self, kmers: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
        nq = len(kmers)
        if nq > self.B:
            raise ValueError(f"batch of {nq} exceeds configured {self.B}")
        padded = list(kmers) + ["A"] * (self.B - nq)
        codes, lengths = encode_query_batch(padded, self.K)
        return codes, lengths, nq

    def _run(self, kmers: list[str], counts_only: bool) -> dict[str, np.ndarray]:
        codes, lengths, nq = self._pad_encode(kmers)
        if self._sharded:
            out = self._query_fn(self.sidx, codes, lengths)
        elif counts_only:
            out = self._count_jit(self.index, codes, lengths)
        else:
            out = self._full_jit(self.index, codes, lengths)
        return {k: np.asarray(v)[:nq] for k, v in out.items()}

    # ------------------------------------------------------------ public

    def warmup(self) -> None:
        """Compile both paths and pay the first-transfer handshake."""
        self._run(["A"], counts_only=True)
        self._run(["A"], counts_only=False)

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
                    hits_truncated=count > self.H,
                )
            )
        return results

    def read_sequence(self, read_id: int) -> str:
        """Read text from the host-side cold store (RocksDB replacement)."""
        return alphabet.decode(self.packed.extract_read(read_id))
