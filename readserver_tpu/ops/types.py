"""DeviceIndex: the on-device (HBM) form of a packed index, as a pytree."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from readserver_tpu.config import IndexConfig
from readserver_tpu.index.builder import PackedIndex


@dataclass(frozen=True)
class DeviceIndex:
    """HBM-resident index arrays + static layout metadata.

    ``rank_rows`` is the fused rank-block table flattened to
    ``[NUM_SYMBOLS * (NB+1), row_words]`` so that a single row gather with
    flat index ``c * (NB+1) + block`` fetches checkpoint + bitplane words.
    Registered as a jax dataclass-pytree: array fields are leaves, layout
    ints are static metadata (they parameterize trace-time shifts/masks).
    """

    # array leaves
    rank_rows: jax.Array      # uint32 [5*(NB+1), row_words]
    sym4: jax.Array           # uint32 [ceil(n/8)]
    C: jax.Array              # int32  [6]
    dollar_map: jax.Array     # int32  [num_reads]
    read_to_sample: jax.Array # int32  [num_reads]
    read_lengths: jax.Array   # int32  [num_reads]
    # fast-resolve tier (None when the artifact was built without it)
    lf: jax.Array | None = None           # int32 [n]; sign bit = sampled row
    mark_rank: jax.Array | None = None    # uint32 [NB+1, row_words]
    sample_pairs: jax.Array | None = None # int32 [n_marked, 2]
    # direct-resolve tier: (read_id << dsa_bits | offset) per SA row —
    # resolution is one gather (no walk); see index/packing.pack_dsa
    dsa: jax.Array | None = None          # uint32 [n]
    # fused resolve rows: 1 gather/step bounded walk when dsa doesn't fit
    fused_rows: jax.Array | None = None   # uint32 [NB, fused_row_words]
    # k-step search tiers (None when built without them): pair/triple
    # plane rank tables + k-mer bucket starts — one gather advances k chars
    rank2_rows: jax.Array | None = None   # uint32 [16*(NB+1), row_words]
    C2: jax.Array | None = None           # int32 [16]
    rank3_rows: jax.Array | None = None   # uint32 [64*(NB+1), row_words]
    C3: jax.Array | None = None           # int32 [64]
    # static metadata
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_reads: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_samples: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_blocks: int = dataclasses.field(metadata=dict(static=True), default=0)
    block_size: int = dataclasses.field(metadata=dict(static=True), default=256)
    words_per_block: int = dataclasses.field(metadata=dict(static=True), default=8)
    max_read_len: int = dataclasses.field(metadata=dict(static=True), default=256)
    sample_rate: int = dataclasses.field(metadata=dict(static=True), default=0)
    dsa_bits: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def log2_block(self) -> int:
        return self.block_size.bit_length() - 1

    @property
    def rows_per_symbol(self) -> int:
        return self.num_blocks + 1

    @classmethod
    def from_packed(
        cls,
        packed: PackedIndex,
        device: jax.Device | None = None,
        tiers: frozenset[str] | set[str] | None = None,
    ) -> "DeviceIndex":
        """``tiers`` (from ``index/budget.plan_tiers``) selects which
        OPTIONAL tiers ship to HBM: 'marks', 'rank2', 'rank3', 'lf'.
        ``None`` ships everything the artifact carries.  Dropping a tier
        only changes gather counts, never answers."""
        cfg: IndexConfig = packed.config
        nb1 = packed.rank_blocks.shape[1]
        rank_rows = np.ascontiguousarray(
            packed.rank_blocks.reshape(-1, cfg.row_words)
        )
        if packed.n >= (1 << 31):
            raise ValueError("single-device index must fit int32 positions")
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put

        def want(t: str) -> bool:
            return tiers is None or t in tiers

        has_marks = (
            packed.mark_rank is not None
            and packed.sample_rate > 0
            and want("marks")
        )
        has_fused = (
            packed.fused_rows is not None
            and packed.sample_rate > 0
            and want("fused")
        )
        # both walk tiers resolve terminals through the sampled-pair table
        has_pairs = (has_marks or has_fused) and packed.sample_pairs is not None
        # the lf fast walk needs the mark-rank table for its terminal slot
        has_lf = packed.lf is not None and has_marks and want("lf")
        has_dsa = packed.dsa is not None and want("dsa")
        has_r2 = packed.rank2_blocks is not None and want("rank2")
        has_r3 = packed.rank3_blocks is not None and want("rank3")
        return cls(
            rank_rows=put(rank_rows),
            sym4=put(np.asarray(packed.sym4, dtype=np.uint32)),
            C=put(np.asarray(packed.C, dtype=np.int32)),
            dollar_map=put(np.asarray(packed.dollar_map, dtype=np.int32)),
            read_to_sample=put(np.asarray(packed.read_to_sample, dtype=np.int32)),
            read_lengths=put(np.asarray(packed.read_lengths, dtype=np.int32)),
            lf=put(np.asarray(packed.lf, dtype=np.int32)) if has_lf else None,
            mark_rank=(
                put(np.ascontiguousarray(packed.mark_rank))
                if has_marks
                else None
            ),
            sample_pairs=(
                put(np.asarray(packed.sample_pairs, dtype=np.int32))
                if has_pairs
                else None
            ),
            dsa=(
                put(np.asarray(packed.dsa, dtype=np.uint32))
                if has_dsa
                else None
            ),
            fused_rows=(
                put(np.ascontiguousarray(packed.fused_rows))
                if has_fused
                else None
            ),
            rank2_rows=(
                put(
                    np.ascontiguousarray(
                        packed.rank2_blocks.reshape(-1, cfg.row_words)
                    )
                )
                if has_r2
                else None
            ),
            C2=put(np.asarray(packed.C2, dtype=np.int32)) if has_r2 else None,
            rank3_rows=(
                put(
                    np.ascontiguousarray(
                        packed.rank3_blocks.reshape(-1, cfg.row_words)
                    )
                )
                if has_r3
                else None
            ),
            C3=put(np.asarray(packed.C3, dtype=np.int32)) if has_r3 else None,
            n=int(packed.n),
            num_reads=int(packed.num_reads),
            num_samples=int(packed.num_samples),
            num_blocks=int(nb1 - 1),
            block_size=cfg.block_size,
            words_per_block=cfg.words_per_block,
            max_read_len=int(packed.read_lengths.max()) if packed.num_reads else 1,
            sample_rate=(
                int(packed.sample_rate) if (has_marks or has_fused) else 0
            ),
            dsa_bits=int(packed.dsa_bits) if has_dsa else 0,
        )

    def device_bytes(self) -> int:
        return sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(self)
            if hasattr(leaf, "nbytes")
        )


jax.tree_util.register_dataclass(
    DeviceIndex,
    data_fields=[
        "rank_rows",
        "sym4",
        "C",
        "dollar_map",
        "read_to_sample",
        "read_lengths",
        "lf",
        "mark_rank",
        "sample_pairs",
        "dsa",
        "fused_rows",
        "rank2_rows",
        "C2",
        "rank3_rows",
        "C3",
    ],
    meta_fields=[
        "n",
        "num_reads",
        "num_samples",
        "num_blocks",
        "block_size",
        "words_per_block",
        "max_read_len",
        "sample_rate",
        "dsa_bits",
    ],
)


def _as_i32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.int32)
