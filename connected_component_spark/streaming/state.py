"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``queries/relational.py:q_sessionization`` (lag +
conditional cumulative sum); this is the true streaming formulation —
per-user session state carried across micro-batches, sessions
emitted when an event-time gap closes them.  The registered query
(queries/streamq.py) replays the bounded fixture in event-time order
and must produce EXACTLY the batch result, which is the oracle
contract for the stateful operator.

Numeric parity detail: the batch oracle sums ``value`` exactly as
DECIMAL(18,4) (queries/parity.py:dsum).  The state fold replicates
that by quantizing each double to 4dp half-up with ``decimal`` and
accumulating integer ten-thousandths — associative, order-safe, and
bit-identical to the SQL decimal sum.

Scale notes: state is one small tuple per user key, dropped
implicitly when a key goes quiet (production would configure
event-time timeouts to emit dangling sessions; the bounded replay
uses a sentinel flush event instead so the final open session of
every user closes deterministically).
"""

from __future__ import annotations

import time as _time
from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "SESSION_OUTPUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
    "sessionize_stream",
    "FLUSH_EVENT_ID",
]

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "session_start string, duration_s long, session_value double"
)
SESSION_STATE_SCHEMA = (
    "seq long, start_us long, last_us long, n long, cents long"
)

#: sentinel event_id used by the bounded-replay flush file
FLUSH_EVENT_ID = -1

_Q4 = Decimal("0.0001")


def _cents4(value: float) -> int:
    """DECIMAL(18,4) quantization of a double, as integer 1e-4 units
    (half-up, exactly like the SQL CAST in parity.dsum)."""
    return int(Decimal(value).quantize(_Q4, rounding=ROUND_HALF_UP) * 10_000)


def _fmt_utc(epoch_us: int) -> str:
    return _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime(epoch_us // 1_000_000))


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """(user_id, session rows) stream: sessions close when the
    event-time gap to the next event exceeds ``gap_s``.

    Requires per-user event-time-ordered delivery across micro-batches
    (the replay harness stages day-ordered files; a production job
    would sort within watermark windows).  Events with
    ``event_id == FLUSH_EVENT_ID`` close the current session but are
    never counted — the bounded-replay flush mechanism.
    """

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")

        if state.exists:
            seq, start_us, last_us, n, cents = state.get
        else:
            seq, start_us, last_us, n, cents = 0, None, None, 0, 0

        out_rows = []

        def close_session() -> None:
            if n > 0:
                out_rows.append(
                    (
                        user_id,
                        seq,
                        n,
                        _fmt_utc(start_us),
                        last_us // 1_000_000 - start_us // 1_000_000,
                        float(
                            (Decimal(cents) / 10_000).quantize(
                                Decimal("0.01"), rounding=ROUND_HALF_UP
                            )
                        ),
                    )
                )

        for ts, event_id, value in zip(
            batch["ts"], batch["event_id"], batch["value"]
        ):
            ts_us = int(pd.Timestamp(ts).value) // 1_000
            is_break = (
                last_us is None
                or ts_us // 1_000_000 - last_us // 1_000_000 > gap_s
            )
            if is_break:
                close_session()
                seq += 1
                start_us, n, cents = ts_us, 0, 0
            last_us = ts_us
            if event_id != FLUSH_EVENT_ID:
                n += 1
                cents += _cents4(float(value))

        state.update((seq, start_us, last_us, n, cents))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "user_id", "session_seq", "n_events",
                    "session_start", "duration_s", "session_value",
                ],
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
