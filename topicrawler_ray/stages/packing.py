"""Sequence packing: group documents into fixed-capacity training
sequences (the standard LLM-corpus step: concatenate docs into
``max_tokens``-sized samples; docs are never split; a doc that would
overflow the current sequence starts the next one).

Exactness at scale: greedy packing is a sequential scan, so the
distributed shape is a TWO-PASS PREFIX SCAN over doc-id ranges:

1. docs are binned by ``range_id = doc_id // range_size`` (a pure
   function of the doc id - block boundaries never leak into the
   output); one ``groupby(range_id)`` packs each range's docs in
   doc_id order FROM A FRESH SEQUENCE and reports how many sequences
   it used (a one-row summary per range);
2. the driver folds the tiny summary table in range order into each
   range's starting sequence id (a cumulative sum), broadcasts the
   map, and a second ``groupby(range_id)`` emits the final assignment.

SPEC: sequences never cross range boundaries (each range starts a
fresh sequence).  That wastes at most one partial sequence per
``range_size`` docs - the same tradeoff as parquet row groups - and
buys a globally deterministic result for ANY partitioning with an
O(#ranges) driver fold.  The oracle is the sequential pass with the
same range rule.

Token counting is whitespace by default; pass ``count_fn`` for a real
tokenizer (runs inside the group task, once per doc).
"""

from __future__ import annotations

import pyarrow as pa


def _ws_count(text: str) -> int:
    return len(text.split(" ")) if text else 0


def _pack_run(items, max_tokens, start_seq=0):
    """Greedy-pack (doc_id, n_tokens) pairs from a fresh sequence;
    returns ([(doc_id, n_tokens, seq_id, seq_offset)], seqs_used).
    Oversized docs (> max_tokens) occupy a sequence alone."""
    out = []
    seq, fill = start_seq, 0
    for doc_id, n in items:
        if fill > 0 and fill + n > max_tokens:
            seq += 1
            fill = 0
        out.append((doc_id, n, seq, fill))
        fill += n
        if fill >= max_tokens:
            seq += 1
            fill = 0
    seqs_used = (seq - start_seq) + (1 if fill > 0 else 0)
    return out, seqs_used


def pack_sequences(ds, max_tokens: int, id_column: str = "doc_id",
                   column: str = "text", range_size: int = 1024,
                   count_fn=None):
    """-> (doc_id, n_tokens, seq_id, seq_offset); globally deterministic
    (module docstring: greedy in doc_id order, fresh sequence per
    ``range_size``-doc range)."""
    import pandas as pd

    count = count_fn or _ws_count

    def with_range(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        toks = [count(t) for t in batch.column(column).to_pylist()]
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "range_id": pa.array(
                    [i // range_size for i in ids], pa.int64()
                ),
            }
        )

    binned = ds.select_columns([id_column, column]).map_batches(
        with_range, batch_format="pyarrow"
    ).materialize()  # consumed by both passes; token rows are tiny

    def summarize(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(id_column, kind="mergesort")
        _, seqs_used = _pack_run(zip(g[id_column], g["n_tokens"]), max_tokens)
        return pd.DataFrame(
            {
                "range_id": [int(g["range_id"].iloc[0])],
                "seqs_used": [int(seqs_used)],
            }
        )

    summaries = (
        binned.groupby("range_id")
        .map_groups(summarize, batch_format="pandas")
        .to_pandas()
        .sort_values("range_id")
    )
    starts: dict[int, int] = {}
    acc = 0
    for r in summaries.itertuples():
        starts[int(r.range_id)] = acc
        acc += int(r.seqs_used)

    def finalize(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.sort_values(id_column, kind="mergesort")
        rid = int(g["range_id"].iloc[0])
        rows, _ = _pack_run(
            zip(g[id_column], g["n_tokens"]), max_tokens, starts[rid]
        )
        return pd.DataFrame(
            rows, columns=[id_column, "n_tokens", "seq_id", "seq_offset"]
        )

    return (
        binned.groupby("range_id")
        .map_groups(finalize, batch_format="pandas")
        .select_columns([id_column, "n_tokens", "seq_id", "seq_offset"])
    )
