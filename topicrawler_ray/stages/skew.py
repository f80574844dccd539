"""Explicit skew handling: salted two-phase aggregation.

A ``groupby(key)`` hash shuffle sends EVERY row of a key to one
reducer.  At web scale the key distribution is always Zipf - one host
/ language / shingle can carry 10-30 % of the corpus - so the hottest
reducer becomes the pipeline's wall clock while the rest idle.

``salted_groupby_sum`` splits each key across ``num_salts`` reducers:

  phase 1: append ``salt = block_row_index % num_salts`` (cheap,
           deterministic, no hashing of the value needed - any
           round-robin assignment balances), then
           ``groupby((key, salt)).sum`` - the hot key's rows now land
           on ``num_salts`` different reducers;
  phase 2: ``groupby(key).sum`` over the salted aggregate, which has
           at most ``num_salts`` rows per key - trivially balanced.

Associative/commutative aggregates only (sum/count/min/max) - exactly
the aggregates whose two-phase decomposition is lossless.  For
non-decomposable per-group logic (rank, median) see the seq-range
salting discussion in stages/politeness.py.

Note Ray's groupby already applies per-block partial aggregation for
its built-in aggregates, which de-skews PURE sums on its own; the
operator still matters when the groupby carries many distinct keys per
block (partial aggregation stops compressing) and as the explicit,
testable statement of the pattern for composite pipelines.

Reference context: the reference's single-process engine never
shuffles, so skew is a non-event there; at the north-star scale
(10^10-URL frontier) it is the first thing that breaks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_groupby_sum(
    ds,
    key: str,
    value: str,
    num_salts: int = 16,
    count_alias: str = "n_rows",
):
    """Exact ``SELECT key, sum(value), count(*) GROUP BY key`` with the
    hot-key exchange split ``num_salts`` ways.  ``value`` must be an
    integer column (quantize floats upstream).  Returns
    ``(key, value, n_rows)``."""
    from ray.data.aggregate import Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % num_salts
        one = np.ones(batch.num_rows, dtype=np.int64)
        return pa.table(
            {
                key: batch.column(key),
                value: batch.column(value),
                count_alias: pa.array(one, pa.int64()),
                "__salt__": pa.array(salt, pa.int64()),
            }
        )

    salted = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "__salt__"])
        .aggregate(
            Sum(value, alias_name=value),
            Sum(count_alias, alias_name=count_alias),
        )
    )
    return (
        salted.groupby(key)
        .aggregate(
            Sum(value, alias_name=value),
            Sum(count_alias, alias_name=count_alias),
        )
    )
