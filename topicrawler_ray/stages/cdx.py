"""CDX-style SURT URL index: canonicalize every page URL to its SURT
form (Sort-friendly URI Reordering Transform - the key order of the
Common-Crawl / OpenWayback CDX(J) capture indexes) and rank captures
within each host.

SURT reverses the host labels so that every URL of a registrable
domain sorts contiguously (``com,example)/path`` style), which is what
makes a petabyte CDX index range-scannable by domain prefix.  The
transform used here (documented, and mirrored verbatim by the SQL
oracle):

* ``hostport`` = authority component, lowercased
* a literal ``:80`` default-port suffix is dropped
* ``host_key``  = host labels reversed and comma-joined
* ``surt``      = ``host_key + ')' + path`` where ``path`` is
  everything from the first ``/``/``?``/``#`` on, lowercased,
  ``'/'`` when empty

Scale design: canonicalization is a stateless ``map_batches`` pass -
regex extraction vectorized via ``pyarrow.compute.extract_regex``, the
label-reversal computed once per UNIQUE host in the batch (hosts
repeat heavily in any crawl) and gathered back by numpy indexing.  The
per-host capture rank is ONE ``groupby(host_key)`` shuffle - the same
partitioning key the politeness stages already use, and per-host
groups are politeness-bounded (a crawl fetches a budgeted number of
pages per host), so no group outgrows a block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]+)(?P<rest>.*)$"


def surt(url: str) -> tuple[str, str]:
    """(host_key, surt) of one URL - the scalar reference semantics the
    vectorized batch pass and the SQL oracle both follow."""
    import re

    m = re.match(_AUTHORITY_RE, url or "")
    if not m:
        return "", ")/"
    hostport = m.group("host").lower()
    if hostport.endswith(":80"):
        hostport = hostport[:-3]
    host_key = ",".join(reversed(hostport.split(".")))
    rest = m.group("rest").lower() or "/"
    return host_key, host_key + ")" + rest


def _host_keys(hosts: np.ndarray) -> np.ndarray:
    """Reverse-join labels once per UNIQUE host, gather per row."""
    uniq, inv = np.unique(hosts, return_inverse=True)
    keys = np.array(
        [",".join(reversed(h.split("."))) for h in uniq], dtype=object
    )
    return keys[inv]


def add_surt(batch: pa.Table, url_column: str = "url") -> pa.Table:
    urls = pc.cast(batch.column(url_column), pa.string())
    parts = pc.extract_regex(urls, _AUTHORITY_RE)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.utf8_lower(pc.struct_field(parts, "rest"))
    # non-matching urls -> null struct; mirror the scalar fallback
    host = pc.fill_null(host, "")
    rest = pc.fill_null(rest, "")
    host = pc.replace_substring_regex(host, pattern=":80$", replacement="")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/", pa.string()), rest)
    hk = _host_keys(host.to_numpy(zero_copy_only=False))
    host_key = pa.array(hk, pa.string())
    surt_col = pc.binary_join_element_wise(
        host_key, pc.cast(rest, pa.string()), ")"
    )
    return pa.table(
        {
            "url": urls,
            "host_key": host_key,
            "surt": surt_col,
        }
    )


_INDEX_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host_key", pa.string()),
        ("surt", pa.string()),
        ("pos", pa.int64()),
    ]
)


def _rank_group(df) -> pa.Table:
    if len(df) == 0:
        # empty hash partitions must emit the REAL schema, or the
        # executor logs block-schema divergence (from_pandas on an
        # empty object-dtype frame infers null columns)
        return _INDEX_SCHEMA.empty_table()
    df = df.sort_values(["surt", "url"]).reset_index(drop=True)
    df["pos"] = np.arange(len(df), dtype=np.int64)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def surt_index(pages_ds, url_column: str = "url"):
    """Full operator: canonicalize, then rank captures per host by SURT
    order (``pos`` = 0-based capture position within the host)."""
    from .dedup import _default_partitions

    canon = pages_ds.map_batches(
        lambda b: add_surt(b, url_column), batch_format="pyarrow"
    )
    # cluster-sized partitions: the groupby's sort would otherwise use
    # one range partition per input block, and partitions holding no
    # host group emit schema-less empty bundles (executor warning)
    canon = canon.repartition(_default_partitions(None))
    return canon.groupby("host_key").map_groups(_rank_group, batch_format="pandas")
