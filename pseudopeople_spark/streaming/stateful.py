"""Custom stateful streaming operators (applyInPandasWithState).

The stateless noise chain needs no state (stream_noise.py); these are
the operators that DO — the streaming halves of the batch dedup suite:

* :func:`dedup_stream_first_seen` — exact dedup across micro-batches:
  emit the first record per key ever seen on the stream, drop every
  later duplicate. The batch equivalent is the ``dedup_exact``
  hash-groupBy; on a stream the "group" never closes, so it must be
  keyed state. State per key is a single small tuple and carries a
  processing-time TTL so the state store stays bounded on an unbounded
  stream — at 100 TB/day the working set is the TTL window, not the
  stream's history (late re-occurrences past the TTL re-emit, the
  standard at-least-once dedup trade-off; a downstream batch compactor
  owns exactness, same division of labor as guardian duplication in
  stream_noise.py).

Design notes for the Spark execution model:
* applyInPandasWithState shuffles by the dedup key once — the same
  exchange the batch groupBy pays; no extra shuffles.
* The state value stores only (first_seen_ms,) — never the record —
  so state bytes scale with distinct keys in the TTL window, not with
  record width.
* The chosen representative is the minimum of ``order_col`` WITHIN the
  first micro-batch a key appears in (micro-batch row order is not
  deterministic; an explicit order column is). Across batches the
  first batch wins by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream_first_seen(
    stream: DataFrame,
    keys: "list[str]",
    order_col: str,
    ttl_minutes: int = 0,
) -> DataFrame:
    """Keep the first record per ``keys`` across the whole stream.

    ``order_col`` breaks ties deterministically inside the first
    micro-batch a key appears in. ``ttl_minutes`` > 0 bounds the state
    store: a key silent for that long is evicted (and would re-emit on
    re-occurrence); 0 keeps state forever (only safe for bounded key
    domains).
    """
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.LongType())])
    ttl_ms = int(ttl_minutes * 60 * 1000)

    def _first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # already emitted in an earlier micro-batch: drop everything,
            # refresh the TTL so a hot key stays deduped
            for _ in pdfs:
                pass
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        best = None  # 1-row DataFrame slice — keeps the input dtypes
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        if best is None:
            return
        state.update((1,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield best

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*keys).applyInPandasWithState(
        _first_seen, out_schema, state_schema, "append", timeout
    )
