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


class Dispatcher:
    def __init__(self, engine: QueryEngine, metrics: Metrics | None = None):
        self.engine = engine
        self.metrics = metrics or Metrics()
        self._queue: list[tuple[str, bool, asyncio.Future]] = []
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
    ) -> QueryResult:
        """Enqueue one query; resolves when its batch returns.

        Both-strands queries enqueue the forward and reverse-complement
        k-mers as independent batch entries (they may fly in different
        batches) and fold the pair on completion.
        """
        if both_strands:
            rc = rc_string(kmer)
            if rc == kmer:
                fwd = await self.submit(kmer, counts_only)
                return fold_strand_results(kmer, fwd, None)
            fwd, rev = await asyncio.gather(
                self.submit(kmer, counts_only), self.submit(rc, counts_only)
            )
            return fold_strand_results(kmer, fwd, rev)
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._queue.append((kmer, counts_only, fut))
        self._wake.set()
        if len(self._queue) >= self.engine.B:
            self._full.set()  # wake the fill loop early — batch is full
        return await fut

    async def submit_many(
        self,
        kmers: list[str],
        counts_only: bool = False,
        both_strands: bool = False,
    ) -> list[QueryResult]:
        """Enqueue a whole client batch at once (the POST /batch wire
        path): one wake, queries fly together instead of trickling in."""
        if both_strands:
            return list(
                await asyncio.gather(*[
                    self.submit(k, counts_only, both_strands=True)
                    for k in kmers
                ])
            )
        loop = asyncio.get_running_loop()
        futs = [loop.create_future() for _ in kmers]
        self._queue.extend(
            (k, counts_only, f) for k, f in zip(kmers, futs)
        )
        self._wake.set()
        if len(self._queue) >= self.engine.B:
            self._full.set()
        return list(await asyncio.gather(*futs))

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
            while len(self._queue) < B:
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
            batch, self._queue = self._queue[:B], self._queue[B:]
            if self._queue:
                self._wake.set()  # more waiting — go again immediately
            await self._fly(batch)
        # drain on close
        for _, _, fut in self._queue:
            if not fut.done():
                fut.cancel()

    async def _fly(self, batch) -> None:
        kmers = [k for k, _, _ in batch]
        counts_only = all(c for _, c, _ in batch)
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        try:
            fn = (
                self.engine.count_batch
                if counts_only
                else self.engine.query_batch
            )
            results = await loop.run_in_executor(self._executor, fn, kmers)
        except Exception as e:  # propagate to every waiter
            self.metrics.record_error()
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            return
        dt = time.perf_counter() - t0
        self.metrics.record_batch(len(batch), dt)
        if log.isEnabledFor(logging.INFO):
            # structured JSON per batch (SURVEY.md §5 observability)
            log.info(json.dumps({
                "event": "batch",
                "queries": len(batch),
                "counts_only": counts_only,
                "latency_ms": round(dt * 1e3, 3),
            }))
        for (_, _, fut), res in zip(batch, results):
            if not fut.done():
                fut.set_result(res)
