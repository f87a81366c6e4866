"""Minimal asyncio REST endpoint (stdlib-only) over the dispatcher.

API surface mirrors the reference server's query endpoints
(SURVEY.md §1 L4: k-mer → present?/count/reads/samples):

    GET /count?kmer=ACGT...      → {"kmer": ..., "count": N}
    GET /reads?kmer=...          → hits with read_id/sample/offset[/sequence]
    GET /samples?kmer=...        → per-sample hit counts
    (&both_strands=1 on any of the above also searches the reverse
     complement; hits gain a "strand" tag)
    GET /health                  → liveness (canary query through the device)
    GET /stats                   → dispatcher metrics

JSON in/out; GET with query strings, as the reference's REST front end.
"""

from __future__ import annotations

import asyncio
import json
from urllib.parse import parse_qs, urlparse

from readserver_tpu.serve.dispatcher import Dispatcher


def _resp(status: str, body: dict) -> bytes:
    payload = json.dumps(body).encode()
    return (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"Connection: close\r\n\r\n"
    ).encode() + payload


class RestServer:
    def __init__(self, dispatcher: Dispatcher, host: str, port: int):
        self.dispatcher = dispatcher
        self.host = host
        self.port = port
        self._server: asyncio.AbstractServer | None = None

    async def start(self) -> None:
        await self.dispatcher.start()
        self._server = await asyncio.start_server(
            self._handle, self.host, self.port
        )

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        await self.dispatcher.stop()

    async def _handle(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        try:
            request_line = await asyncio.wait_for(reader.readline(), timeout=10)
            # drain headers
            while True:
                line = await asyncio.wait_for(reader.readline(), timeout=10)
                if line in (b"\r\n", b"\n", b""):
                    break
            parts = request_line.decode("latin1").split()
            if len(parts) < 2 or parts[0] != "GET":
                writer.write(_resp("405 Method Not Allowed",
                                   {"error": "GET only"}))
                return
            url = urlparse(parts[1])
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            writer.write(await self._route(url.path, q))
        except Exception as e:
            try:
                writer.write(_resp("500 Internal Server Error",
                                   {"error": str(e)}))
            except Exception:
                pass
        finally:
            try:
                await writer.drain()
                writer.close()
            except Exception:
                pass

    async def _route(self, path: str, q: dict[str, str]) -> bytes:
        if path == "/health":
            try:
                await self.dispatcher.submit("A", counts_only=True)
                return _resp("200 OK", {"status": "ok"})
            except Exception as e:
                return _resp("503 Service Unavailable", {"status": str(e)})
        if path == "/stats":
            return _resp("200 OK", self.dispatcher.metrics.snapshot())
        if path == "/info":
            eng = self.dispatcher.engine
            packed = eng.packed
            return _resp(
                "200 OK",
                {
                    "n_symbols": int(packed.n),
                    "num_reads": int(packed.num_reads)
                    if not eng._doc
                    else sum(p.num_reads for p in eng.partitions),
                    "num_samples": len(eng.sample_names),
                    "max_query_len": eng.K,
                    "max_hits": eng.H,
                    "batch_size": eng.B,
                    "sharding": (
                        "document"
                        if eng._doc
                        else ("interval" if eng._sharded else "single")
                    ),
                },
            )
        if path in ("/count", "/reads", "/samples"):
            kmer = q.get("kmer", "")
            if not kmer:
                return _resp("400 Bad Request", {"error": "missing kmer"})
            both = q.get("both_strands") == "1"
            try:
                if path == "/count":
                    r = await self.dispatcher.submit(
                        kmer, counts_only=True, both_strands=both
                    )
                    return _resp("200 OK", {"kmer": r.kmer, "count": r.count})
                r = await self.dispatcher.submit(
                    kmer, counts_only=False, both_strands=both
                )
                if path == "/samples":
                    return _resp(
                        "200 OK",
                        {
                            "kmer": r.kmer,
                            "count": r.count,
                            "samples": r.sample_hist,
                            "hits_truncated": r.hits_truncated,
                        },
                    )
                hits = [
                    {**h, "name": f"read_{h['read_id']}"} for h in r.hits
                ]
                if q.get("sequences") == "1":
                    hits = [
                        {**h,
                         "sequence": self.dispatcher.engine.read_sequence(
                             h["read_id"])}
                        for h in hits
                    ]
                return _resp(
                    "200 OK",
                    {
                        "kmer": r.kmer,
                        "count": r.count,
                        "hits": hits,
                        "hits_truncated": r.hits_truncated,
                    },
                )
            except ValueError as e:
                return _resp("400 Bad Request", {"error": str(e)})
        return _resp("404 Not Found", {"error": f"no route {path}"})


async def serve_forever(engine, host: str, port: int) -> None:
    from readserver_tpu.serve.dispatcher import Dispatcher

    server = RestServer(Dispatcher(engine), host, port)
    await server.start()
    print(f"readserver_tpu serving on http://{host}:{port}", flush=True)
    try:
        await asyncio.Event().wait()
    finally:
        await server.stop()
