"""Feature-hashing text vectorizer (the "hashing trick", Weinberger et
al., ICML 2009): map each document's n-grams into a fixed-dim signed
integer count vector with NO vocabulary pass - the index is a pure
function of the n-gram bytes, so the operator is stateless, row-local,
and identical on any cluster layout (nothing to train, broadcast, or
shuffle).  The classic bridge from raw text to the vector operators
(``int8_topk``, ``semantic_dedup``, ``embedding_near_dup_pairs``) when
no learned embedding column exists.

Spec (shared with the sequential oracle):

* tokens: ``text.lower().split()`` (whitespace, the corpus-stats
  convention of ``token_counts``),
* features: word n-grams joined by a space for each n in
  ``ngram_range``,
* ``h = murmur3_x64_128(feature)[0]`` (the library's reference-ported
  64-bit murmur3),
* index ``(h >> 1) % dim``; sign ``+1`` if the low bit of ``h`` is 0
  else ``-1`` (signed hashing keeps the expected inner product
  unbiased).

Output is the SPARSE form - one ``(id, idx, value)`` row per nonzero
coordinate - which shuffles/compares cheaply and converts to dense
row-locally when a downstream stage wants ``list<float>``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import murmur3_x64_128


def _doc_vector(text: str, dim: int, ngram_range: tuple) -> dict[int, int]:
    toks = text.lower().split()
    acc: dict[int, int] = {}
    for n in ngram_range:
        for i in range(len(toks) - n + 1):
            feat = " ".join(toks[i : i + n])
            h = murmur3_x64_128(feat.encode("utf-8"))[0]
            idx = (h >> 1) % dim
            acc[idx] = acc.get(idx, 0) + (1 if (h & 1) == 0 else -1)
    return {k: v for k, v in acc.items() if v != 0}


def hashed_ngram_vectors(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    dim: int = 64,
    ngram_range: tuple = (1, 2),
):
    """-> Dataset of ``(id_column, idx, value)`` sparse triplets,
    ``idx`` in ``[0, dim)``, ``value`` a signed int64 count.  One
    stateless ``map_batches``; no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(text_column).to_pylist()
        o_id, o_idx, o_val = [], [], []
        for i, t in zip(ids, texts):
            for idx, v in sorted(_doc_vector(t or "", dim, ngram_range).items()):
                o_id.append(i)
                o_idx.append(idx)
                o_val.append(v)
        return pa.table(
            {
                id_column: pa.array(o_id, pa.int64()),
                "idx": pa.array(o_idx, pa.int64()),
                "value": pa.array(o_val, pa.int64()),
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        fn, batch_format="pyarrow"
    )


def densify(ds, id_column: str = "doc_id", dim: int = 64):
    """Sparse triplets -> one ``(id, vector list<float>)`` row per id
    (a groupby(id) exchange; the vector becomes an ``embedding``-shaped
    column for the similarity/dedup operators)."""
    import pandas as pd

    def to_dense(g: pd.DataFrame) -> pd.DataFrame:
        v = np.zeros(dim, dtype=np.float32)
        v[g["idx"].to_numpy(np.int64)] = g["value"].to_numpy(np.int64)
        return pd.DataFrame(
            {id_column: [g[id_column].iloc[0]], "embedding": [v.tolist()]}
        )

    return ds.groupby(id_column).map_groups(to_dense, batch_format="pandas")
