"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``queries/relational.py:q_sessionization`` (lag +
conditional cumulative sum); this is the true streaming formulation —
per-user session state carried across micro-batches, sessions
emitted once no future event can reopen them.  The registered query
(queries/streamq.py) replays the bounded fixture and must produce
EXACTLY the batch result, which is the oracle contract for the
stateful operator.

Ordering contract: the fold does NOT require ordered delivery.
Incoming events are buffered in state; a session is finalized only
when it is provably closed:

- the event-time watermark (when the input stream sets one) has
  passed the session's end by more than the gap — no admissible
  future event can extend or split it.  State per user is bounded by
  the watermark lag + gap window: the production shape.
- the bounded-replay flush sentinel (``event_id == FLUSH_EVENT_ID``,
  staged after all data files) closes every remaining session — the
  exact-parity path for replays, correct under ARBITRARY data-file
  delivery order.

Numeric parity detail: the batch oracle sums ``value`` exactly as
DECIMAL(18,4) (queries/parity.py:dsum).  The state fold replicates
that by quantizing each double to 4dp half-up with ``decimal`` and
accumulating integer ten-thousandths — associative, order-safe, and
bit-identical to the SQL decimal sum.
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
#: emitted-session counter + the not-yet-finalized event buffer
#: (epoch-microsecond timestamps and DECIMAL(18,4) values as integer
#: ten-thousandths).  Buffer size is bounded by the watermark lag +
#: gap when the stream is watermarked.
SESSION_STATE_SCHEMA = "seq long, buf_ts array<long>, buf_cents array<long>"

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

    Delivery-order-free: events buffer in per-user state and sessions
    are emitted only once provably closed — by watermark passage
    (``events.withWatermark(...)`` upstream, the production path) or
    by the ``FLUSH_EVENT_ID`` sentinel (bounded replays).  Gap
    comparisons use floor-second semantics, matching the batch
    formulation's ``ts.cast("long")``.
    """

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            seq, buf_ts, buf_cents = state.get
            buf_ts, buf_cents = list(buf_ts), list(buf_cents)
        else:
            seq, buf_ts, buf_cents = 0, [], []

        flush = False
        for pdf in pdfs:
            for ts, event_id, value in zip(
                pdf["ts"], pdf["event_id"], pdf["value"]
            ):
                if int(event_id) == FLUSH_EVENT_ID:
                    flush = True
                    continue
                buf_ts.append(int(pd.Timestamp(ts).value) // 1_000)
                buf_cents.append(_cents4(float(value)))

        try:
            wm_ms = state.getCurrentWatermarkMs()
        except Exception:  # stream has no watermark column
            wm_ms = 0

        out_rows = []
        if buf_ts and (flush or wm_ms > 0):
            order = sorted(range(len(buf_ts)), key=buf_ts.__getitem__)
            # split the buffered timeline into gap-delimited sessions
            sessions: list[list[int]] = [[order[0]]]
            for i in order[1:]:
                prev = sessions[-1][-1]
                if buf_ts[i] // 1_000_000 - buf_ts[prev] // 1_000_000 > gap_s:
                    sessions.append([i])
                else:
                    sessions[-1].append(i)
            # emit the provably-closed prefix (sessions are time-
            # ordered, so the first open one ends the scan): any
            # admissible future event has ts >= watermark, and
            # wm_s - end_s > gap means it must start a later session
            emitted = 0
            for sess in sessions:
                end_s = buf_ts[sess[-1]] // 1_000_000
                if not (flush or wm_ms // 1_000 - end_s > gap_s):
                    break
                seq += 1
                start_us = buf_ts[sess[0]]
                cents = sum(buf_cents[i] for i in sess)
                out_rows.append(
                    (
                        user_id,
                        seq,
                        len(sess),
                        _fmt_utc(start_us),
                        end_s - start_us // 1_000_000,
                        float(
                            (Decimal(cents) / 10_000).quantize(
                                Decimal("0.01"), rounding=ROUND_HALF_UP
                            )
                        ),
                    )
                )
                emitted += 1
            if emitted:
                keep = [i for sess in sessions[emitted:] for i in sess]
                buf_ts = [buf_ts[i] for i in keep]
                buf_cents = [buf_cents[i] for i in keep]

        if flush and not buf_ts:
            if state.exists:
                state.remove()
        else:
            state.update((seq, buf_ts, buf_cents))
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
