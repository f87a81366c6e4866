"""Pallas TPU kernels for the rank hot op, plus the measurement that
decides which implementation serves (SURVEY.md §7.5: "benchmark against the
jnp version; keep both").

Verdict on v5e (see pallas_rank.py docstring): XLA's native row-gather is
the fast path for batched rank; the Pallas per-row-DMA formulation is kept
as the measured alternative and as the substrate for future fused-scan
experiments.
"""

from readserver_tpu.kernels.pallas_rank import occ_pallas, compare_rank_impls

__all__ = ["occ_pallas", "compare_rank_impls"]
