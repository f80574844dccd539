"""Context-length document chunking at sentence boundaries.

Training-prep step between raw docs and sequence packing
(stages/packing.py packs WHOLE short texts into fixed-capacity
samples; this operator SPLITS long documents first): each document is
cut into chunks of at most ``max_tokens`` whitespace tokens, never
splitting inside a sentence - the standard context-window preparation
(long sentences that alone exceed the budget become their own
oversized chunk rather than being cut mid-sentence).

Stateless per document, so it is one ``flat_map``-shaped Arrow
``map_batches`` pass - embarrassingly parallel, no shuffle, order
deterministic by (doc_id, chunk_idx).  The sentence splitter is the
engine's rule-based S7 splitter (functions/sentences.py, the
reference's provider port) - shared scalar kernel, same convention as
the sentences oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sentences import split_sentences


def chunk_text(text: str, max_tokens: int) -> list[tuple[int, str]]:
    """-> [(n_tokens, chunk_text)] greedy sentence-boundary chunks."""
    out: list[tuple[int, str]] = []
    cur: list[str] = []
    cur_tokens = 0
    for sent in split_sentences(text or ""):
        n = len(sent.split(" "))
        if cur and cur_tokens + n > max_tokens:
            out.append((cur_tokens, " ".join(cur)))
            cur, cur_tokens = [], 0
        cur.append(sent)
        cur_tokens += n
        if cur_tokens > max_tokens:  # single oversized sentence
            out.append((cur_tokens, " ".join(cur)))
            cur, cur_tokens = [], 0
    if cur:
        out.append((cur_tokens, " ".join(cur)))
    return out


def chunk_documents(ds, max_tokens: int = 64, column: str = "text",
                    id_column: str = "doc_id"):
    """-> (doc_id, chunk_idx, n_tokens, chunk) rows."""

    def explode(batch: pa.Table) -> pa.Table:
        o_id, o_idx, o_n, o_c = [], [], [], []
        for did, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(column).to_pylist(),
        ):
            for i, (n, c) in enumerate(chunk_text(t, max_tokens)):
                o_id.append(did)
                o_idx.append(i)
                o_n.append(n)
                o_c.append(c)
        return pa.table(
            {
                id_column: pa.array(o_id, pa.int64()),
                "chunk_idx": pa.array(o_idx, pa.int64()),
                "n_tokens": pa.array(o_n, pa.int64()),
                "chunk": pa.array(o_c, pa.string()),
            }
        )

    return ds.select_columns([id_column, column]).map_batches(
        explode, batch_format="pyarrow"
    )
