"""Custom stateful streaming operator via applyInPandasWithState.

The built-in streaming windows (tumbling/session) cover time-bucketed
aggregation; this operator maintains ARBITRARY per-key state across
micro-batches — the Spark-native answer to "custom stateful operator"
for semantics the declarative API can't express. Here the state is a
per-conversation progress tracker: turns seen, max turn index, total
text characters, last event time. Conversations idle past
``idle_timeout`` are finalized and emitted with ``closed=true``
(event-time timeout driven by the watermark).

Vectorized: each micro-batch group arrives as pandas DataFrame chunks;
state updates are whole-column pandas ops — no per-row Python.

Reference analog: the reference keeps per-author crawl progress in
directory state and resumes incrementally (reference:
bear/crawler.py:195-206, 228-236); this generalizes that to
watermark-driven keyed state inside the stream.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of the progress operator
PROGRESS_SCHEMA = (
    "conv_id string, turns long, max_turn_idx int, total_chars long, "
    "last_ts timestamp, closed boolean"
)
_STATE_SCHEMA = "turns long, max_turn_idx int, total_chars long, last_ts long"


def _make_tracker(idle_ms: int):
    """Closure factory so the idle gap ships to executors with the
    function (module-level functions pickle by reference; attributes
    set on them driver-side would not survive the trip)."""

    def track(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turns, max_turn, chars, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "turns": turns,
                        "max_turn_idx": max_turn,
                        "total_chars": chars,
                        "last_ts": pd.Timestamp(last_us, unit="us"),
                        "closed": True,
                    }
                ]
            )
            return

        turns, max_turn, chars, last_us = state.get if state.exists else (0, -1, 0, 0)
        for pdf in pdfs:
            turns += len(pdf)
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            chars += int(pdf["text"].str.len().fillna(0).sum())
            ts = pdf["ts"]
            if getattr(ts.dtype, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            last_us = max(last_us, int(ts.max().value // 1_000))
        state.update((turns, max_turn, chars, last_us))
        # event-time timeout: close the conversation once the watermark
        # passes last event + idle gap
        state.setTimeoutTimestamp(last_us // 1_000 + idle_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "turns": turns,
                    "max_turn_idx": max_turn,
                    "total_chars": chars,
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                    "closed": False,
                }
            ]
        )

    return track


def conversation_progress(
    stream: DataFrame,
    watermark: str = "1 hour",
    idle_timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Running per-conversation progress with idle finalization.

    ``stream`` is a streaming DataFrame of change events (must contain
    conv_id, turn_idx, text, ts). Emits one update row per conversation
    per micro-batch, plus a final ``closed=true`` row when the
    watermark passes the conversation's last event + idle gap.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_tracker(int(idle_timeout_ms)),
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
