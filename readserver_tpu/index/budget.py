"""HBM budget planner: which optional index tiers fit on the chip.

The packed artifact stores every tier it was built with; the *engine*
decides at load time what to ship to HBM.  At chr20-30x scale
(n ≈ 1.95e9 symbols) the full tier set is ~20 GB against a v5e's 16 GB,
so the planner greedily keeps tiers in value order until the budget is
spent (the reference never faces this — its RLE-BWT lives in host RAM;
SURVEY.md §7 "HBM budget" names it as a build-vs-serve constraint of the
TPU design):

  base   (mandatory)  fused rank rows + sym4 + payload arrays
  marks  0.75 B/sym   sampled (read_id, offset) pairs + mark-rank bits —
                      enables the bounded mark-walk resolve (3 gathers/step,
                      ≤ sample_rate steps) even without ``lf``
  rank2  4 B/sym      pair planes: one gather advances the search 2 chars
  rank3  16 B/sym     triple planes: 3 chars per gather
  lf     4 B/sym      precomputed LF array: fast resolve at 1 gather/step

Dropping a tier never changes any answer — only the gather count of the
step that would have used it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from readserver_tpu.index.builder import PackedIndex

# greedy keep order: resolve bound first (cheap), then search tiers
# (the headline metric), then the LF fast-walk luxury
TIER_ORDER = ("marks", "rank2", "rank3", "lf")

_TIER_ARRAYS = {
    "marks": ("mark_rank", "sample_pairs"),
    "rank2": ("rank2_blocks", "C2"),
    "rank3": ("rank3_blocks", "C3"),
    "lf": ("lf",),
}
_BASE_ARRAYS = (
    "rank_blocks",
    "sym4",
    "C",
    "dollar_map",
    "read_to_sample",
    "read_lengths",
)


@dataclass(frozen=True)
class TierPlan:
    keep: frozenset[str]
    base_bytes: int
    tier_bytes: dict[str, int] = field(default_factory=dict)
    budget_bytes: int | None = None

    @property
    def dropped(self) -> tuple[str, ...]:
        return tuple(
            t for t in TIER_ORDER if self.tier_bytes.get(t, 0) and t not in self.keep
        )

    @property
    def total_bytes(self) -> int:
        return self.base_bytes + sum(
            self.tier_bytes.get(t, 0) for t in self.keep
        )


def tier_bytes(packed: PackedIndex) -> tuple[int, dict[str, int]]:
    """(base_bytes, {tier: bytes}); absent tiers report 0."""
    base = sum(
        getattr(packed, a).nbytes
        for a in _BASE_ARRAYS
        if getattr(packed, a) is not None
    )
    tiers = {}
    for t, arrays in _TIER_ARRAYS.items():
        vals = [getattr(packed, a) for a in arrays]
        tiers[t] = sum(v.nbytes for v in vals) if all(
            v is not None for v in vals
        ) else 0
    # the resolve tiers only exist when the artifact carries a sample rate
    if packed.sample_rate <= 0:
        tiers["marks"] = 0
        tiers["lf"] = 0
    return base, tiers


def plan_tiers(
    packed: PackedIndex, budget_bytes: int | None
) -> TierPlan:
    """Greedy keep-while-it-fits over TIER_ORDER (skipping over tiers that
    don't fit — a too-big rank3 must not shadow a fitting lf)."""
    base, tiers = tier_bytes(packed)
    if budget_bytes is None:
        keep = frozenset(t for t in TIER_ORDER if tiers[t] > 0)
        return TierPlan(keep, base, tiers, None)
    if base > budget_bytes:
        raise ValueError(
            f"base index tier ({base/2**30:.2f} GiB) exceeds the HBM budget "
            f"({budget_bytes/2**30:.2f} GiB); shard the index "
            "(parallel/sharded.py) or use a cohort artifact"
        )
    used = base
    keep: set[str] = set()
    for t in TIER_ORDER:
        b = tiers[t]
        if b and used + b <= budget_bytes:
            # lf without marks has no consumer (resolve_rows_fast needs the
            # sampled-pair table) — only keep lf if marks made it
            if t == "lf" and tiers["marks"] and "marks" not in keep:
                continue
            keep.add(t)
            used += b
    return TierPlan(frozenset(keep), base, tiers, budget_bytes)


# nameplate HBM per chip when the PJRT plugin exposes no memory_stats
# (the axon tunnel doesn't) — substring-matched against device_kind
_HBM_BY_KIND = (
    ("v5 lite", 16 << 30),
    ("v5e", 16 << 30),
    ("v5p", 95 << 30),
    ("v4", 32 << 30),
    ("v6", 32 << 30),
)


def device_budget_bytes(headroom: float = 0.92) -> int | None:
    """Detect the local accelerator's HBM limit (None when unknown — e.g.
    the CPU-simulated test mesh, where the budget is host RAM).

    Overcommitting HBM on the tunneled chip doesn't OOM loudly — it pages
    and turns every transfer glacial (measured: the 18.7 GiB chr20 full
    tier set made one 1 MiB device→host fetch take 20+ minutes) — so when
    ``memory_stats`` is unavailable the nameplate table stands in.
    """
    try:
        import jax

        dev = jax.local_devices()[0]
        if dev.platform == "cpu":
            return None
        stats = None
        try:
            stats = dev.memory_stats()
        except Exception:
            pass
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"] * headroom)
        kind = getattr(dev, "device_kind", "").lower()
        for sub, cap in _HBM_BY_KIND:
            if sub in kind:
                return int(cap * headroom)
    except Exception:
        pass
    return None
