"""Async micro-batcher: single-flight device batches with a fill deadline.

The reference handles each query on a thread from a pool (SURVEY.md §3.1);
the TPU engine wants full batches instead, so queries queue briefly
(≤ ``batch_deadline_ms``) and fly together.  One event loop, one in-flight
device call (device execution happens in a worker thread so the loop stays
responsive); no locks needed — the queue is only touched on the loop.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from concurrent.futures import ThreadPoolExecutor

log = logging.getLogger("readserver_tpu.dispatcher")

from readserver_tpu.serve.engine import (
    QueryEngine,
    QueryResult,
    fold_strand_results,
    rc_string,
)
from readserver_tpu.serve.metrics import Metrics


class _Block:
    """A client batch in the queue: one future for N queries.

    Per-query futures cost ~10µs each of event-loop bookkeeping — at
    wire-level batch sizes (thousands of k-mers per POST /batch) that
    Python churn dominated the serve path (measured: 65k queries spent
    more time in future plumbing than on the device).  A block keeps ONE
    future per client request; batches may take slices of a block, and
    the future resolves when every slice has returned."""

    __slots__ = ("kmers", "mode", "fut", "results", "taken", "done")

    def __init__(self, kmers, mode, fut):
        self.kmers = kmers
        self.mode = mode    # "count" | "hist" | "full"
        self.fut = fut
        self.results: list = [None] * len(kmers)
        self.taken = 0      # queries handed to batches so far
        self.done = 0       # queries completed so far


# answer tiers, weakest first: a device batch runs the strongest tier any
# of its blocks needs ("hist" ships counts + exact histograms but no hit
# tensor — the /samples wire shape; transferred bytes are the latency on
# the tunneled chip)
_MODE_RANK = {"count": 0, "hist": 1, "full": 2}


class Dispatcher:
    def __init__(self, engine: QueryEngine, metrics: Metrics | None = None):
        self.engine = engine
        self.metrics = metrics or Metrics()
        self._queue: list[_Block] = []
        self._pending = 0   # queries queued and not yet handed to a batch
        self._wake: asyncio.Event = asyncio.Event()
        self._full: asyncio.Event = asyncio.Event()  # fires on B-th arrival
        self._task: asyncio.Task | None = None
        self._closed = False
        # dedicated single thread for device calls: one device, one batch in
        # flight — and never starved by the shared default executor
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="device-batch"
        )

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        self._closed = True
        self._wake.set()
        self._full.set()
        if self._task is not None:
            await self._task
            self._task = None
        self._executor.shutdown(wait=False)

    async def submit(
        self,
        kmer: str,
        counts_only: bool = False,
        both_strands: bool = False,
        mode: str | None = None,
    ) -> QueryResult:
        """Enqueue one query; resolves when its batch returns.

        Both-strands queries enqueue the forward and reverse-complement
        k-mers as independent batch entries (they may fly in different
        batches) and fold the pair on completion.
        """
        mode = mode or ("count" if counts_only else "full")
        if both_strands:
            rc = rc_string(kmer)
            if rc == kmer:
                fwd = await self.submit(kmer, mode=mode)
                return fold_strand_results(kmer, fwd, None)
            fwd, rev = await asyncio.gather(
                self.submit(kmer, mode=mode), self.submit(rc, mode=mode)
            )
            return fold_strand_results(kmer, fwd, rev)
        (res,) = await self.submit_many([kmer], mode=mode)
        return res

    async def submit_many(
        self,
        kmers: list[str],
        counts_only: bool = False,
        both_strands: bool = False,
        mode: str | None = None,
    ) -> list[QueryResult]:
        """Enqueue a whole client batch at once (the POST /batch wire
        path): ONE block, ONE future — queries fly together and the
        per-query event-loop churn vanishes."""
        mode = mode or ("count" if counts_only else "full")
        if mode not in _MODE_RANK:
            raise ValueError(f"unknown mode {mode!r}")
        if both_strands:
            # two blocks (forward + reverse-complement, palindromes only
            # forward), enqueued together so they share the batch window
            rcs = [rc_string(k) for k in kmers]
            rc_needed = [r for k, r in zip(kmers, rcs) if r != k]
            fwd, rev_res = await asyncio.gather(
                self.submit_many(kmers, mode=mode),
                self.submit_many(rc_needed, mode=mode),
            )
            it = iter(rev_res)
            return [
                fold_strand_results(k, f, next(it) if r != k else None)
                for k, r, f in zip(kmers, rcs, fwd)
            ]
        if not kmers:
            return []
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._queue.append(_Block(list(kmers), mode, fut))
        self._pending += len(kmers)
        self._wake.set()
        if self._pending >= self.engine.B:
            self._full.set()  # wake the fill loop early — batch is full
        return await fut

    def _take_batch(self, B: int):
        """Slice up to B queries off the front blocks.

        Returns ``(kmers, mode, [(block, block_offset, n), ...])``.
        A large block spans several device batches; its future resolves
        when the last slice lands.  The batch runs the strongest answer
        tier any of its blocks needs — an accepted simplicity trade-off
        (ADVICE r4): under mixed load a /count stream co-batched with
        /reads traffic pays full-resolution cost for those windows.  If
        count-path latency ever regresses under mixed load, drain
        same-tier blocks into a batch first instead of promoting; answers
        are unaffected either way (stronger tiers are supersets)."""
        kmers: list[str] = []
        slices: list[tuple[_Block, int, int]] = []
        mode = "count"
        while self._queue and len(kmers) < B:
            blk = self._queue[0]
            take = min(B - len(kmers), len(blk.kmers) - blk.taken)
            kmers.extend(blk.kmers[blk.taken : blk.taken + take])
            slices.append((blk, blk.taken, take))
            if _MODE_RANK[blk.mode] > _MODE_RANK[mode]:
                mode = blk.mode
            blk.taken += take
            self._pending -= take
            if blk.taken == len(blk.kmers):
                self._queue.pop(0)
        return kmers, mode, slices

    async def _run(self) -> None:
        deadline_s = self.engine.cfg.batch_deadline_ms / 1e3
        B = self.engine.B
        while not self._closed:
            await self._wake.wait()
            self._wake.clear()
            if self._closed:
                break
            if not self._queue:
                continue
            # fill window: sleep until the B-th arrival fires _full or the
            # deadline lapses — no polling (the old sleep(deadline/8) loop
            # added up to deadline/8 of avoidable jitter per batch)
            t_first = time.perf_counter()
            while self._pending < B:
                remaining = deadline_s - (time.perf_counter() - t_first)
                if remaining <= 0 or self._closed:
                    break
                self._full.clear()
                try:
                    await asyncio.wait_for(
                        self._full.wait(), timeout=remaining
                    )
                except asyncio.TimeoutError:
                    break
            batch = self._take_batch(B)
            if self._queue:
                self._wake.set()  # more waiting — go again immediately
            await self._fly(*batch)
        # drain on close
        for blk in self._queue:
            if not blk.fut.done():
                blk.fut.cancel()

    async def _fly(self, kmers, mode, slices) -> None:
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        try:
            if mode == "count":
                fn = lambda: self.engine.count_batch(kmers)
            elif mode == "hist":
                fn = lambda: self.engine.query_batch(
                    kmers, include_hits=False
                )
            else:
                fn = lambda: self.engine.query_batch(kmers)
            results = await loop.run_in_executor(self._executor, fn)
        except Exception as e:  # propagate to every waiter
            self.metrics.record_error()
            for blk, _, _ in slices:
                if not blk.fut.done():
                    blk.fut.set_exception(e)
            return
        dt = time.perf_counter() - t0
        self.metrics.record_batch(len(kmers), dt)
        if log.isEnabledFor(logging.INFO):
            # structured JSON per batch (SURVEY.md §5 observability)
            log.info(json.dumps({
                "event": "batch",
                "queries": len(kmers),
                "mode": mode,
                "latency_ms": round(dt * 1e3, 3),
            }))
        pos = 0
        for blk, off, n in slices:
            blk.results[off : off + n] = results[pos : pos + n]
            pos += n
            blk.done += n
            if blk.done == len(blk.kmers) and not blk.fut.done():
                blk.fut.set_result(blk.results)
