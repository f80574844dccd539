"""Funnel analysis: how far each user progresses through an ORDERED
sequence of event types (view -> click -> purchase ...).

The sort-free decomposition: stage ``i``'s entry time per user is the
MIN timestamp of stage-``i`` events that are STRICTLY LATER than the
user's stage-``i-1`` entry - so the whole funnel is a chain of

    filter(type_i) -> join(prev stage times, on user) ->
    filter(ts > t_prev) -> groupby(user).min(ts)

slim exchanges (one row per user per stage), never a per-user ordered
scan and never a global sort.  The final level is a union of
(user, stage) rows folded by ``groupby(user).max`` - the same
seed-row-free shape as the rollup.

Timestamps are compared as int64 µs; ties are NOT funnel progress
(strict >), matching the SQL semantics the oracle uses.

Reference context: no analog in remstef/topicrawler; standard
product-analytics operator over the events table (extends the
sessionization / window family in stages/timeseries.py).
"""

from __future__ import annotations

import pyarrow as pa


def _stage_times(ev, etype: str, prev_times, num_partitions: int):
    """min ts_us per user of `etype` events strictly after the user's
    prev_times entry (prev_times None = funnel start)."""
    from ray.data.aggregate import Min

    stage = ev.filter(expr="event_type == '%s'" % etype)
    if prev_times is not None:
        # repartition concatenates away the filter's 0-row/0-column
        # blocks, which break acero key resolution in the join
        # (ray-2.49 quirk, see dedup.py)
        stage = stage.repartition(num_partitions)
        joined = stage.join(
            prev_times.repartition(num_partitions),
            join_type="inner",
            num_partitions=num_partitions,
            on=("user_id",),
        )
        stage = joined.filter(expr="ts_us > t_prev").select_columns(
            ["user_id", "ts_us"]
        )
    out = stage.groupby("user_id").aggregate(Min("ts_us", alias_name="t_prev"))
    return out.repartition(num_partitions)


def funnel_levels(ev, stages: list[str], num_partitions: int | None = None):
    """``ev`` needs (user_id, event_type, ts_us).  Returns a Dataset
    ``(user_id, funnel_level)`` - the highest 1-based stage index the
    user reached in order; users who never reach stage 1 are absent."""
    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)
    levels = []
    prev = None
    for i, etype in enumerate(stages):
        prev = _stage_times(ev, etype, prev, num_partitions)
        lvl = i + 1

        def tag(batch: pa.Table, lvl=lvl) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "funnel_level": pa.array(
                        [lvl] * batch.num_rows, pa.int64()
                    ),
                }
            )

        levels.append(prev.map_batches(tag, batch_format="pyarrow"))

    from ray.data.aggregate import Max

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return (
        out.groupby("user_id")
        .aggregate(Max("funnel_level", alias_name="funnel_level"))
    )
