"""Serving tier: thin host-side dispatcher over the device engine.

The reference's L4 is a C++ backend server per shard plus a front-end
aggregator over TCP (SURVEY.md §1).  Here the hot path lives on-chip, so
the server shrinks to: an asyncio micro-batcher (pad-to-batch with a
deadline), a jitted query step, and a stdlib REST endpoint — the
"thin host-side dispatcher" of BASELINE.json.  The batcher is single-event-
loop by design, making data races structurally impossible (SURVEY.md §5
"Race detection").
"""

from readserver_tpu.serve.engine import MultiEngine, QueryEngine, QueryResult
from readserver_tpu.serve.dispatcher import Dispatcher
from readserver_tpu.serve.metrics import Metrics

__all__ = ["QueryEngine", "MultiEngine", "QueryResult", "Dispatcher", "Metrics"]
