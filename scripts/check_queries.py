"""Driver-style correctness check: run every queries() entry at sf0.01,
compare against oracle_sql() via DuckDB (row count + sorted-column value
frame equality). Mirrors what the round driver records in
CORRECTNESS_r{N}.json."""

import sys
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import pandas as pd
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as e


def to_df(x):
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    return pd.DataFrame(x)


con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')" % (t, SF, t)
    )

Q = e.queries()
O = e.oracle_sql()

if SF.rstrip("/") != "/root/testdata/sf0.01":
    # oracle_sql() embeds sf0.01 fixture paths (the driver's scale).
    # For another sf dir, materialize the sequential-oracle fixtures
    # there and rewrite every embedded path so the WHOLE registry can
    # be verified at a second scale (scale-independence check).
    from topicrawler_ray.oracles import materialize_all, oracle_root
    from topicrawler_ray.sources.pages import pages_path

    materialize_all(SF)  # build every fixture at the target scale
    root_base = str(oracle_root("/root/testdata/sf0.01"))
    root_target = str(oracle_root(SF))
    pages_base = pages_path("/root/testdata/sf0.01")
    pages_target = pages_path(SF)
    O = {
        name: sql.replace(root_base, root_target).replace(pages_base, pages_target)
        for name, sql in O.items()
    }
only = sys.argv[2:] or list(Q)
fails = 0
for name in only:
    t0 = time.time()
    try:
        res = to_df(Q[name](SF))
    except Exception as ex:
        print("%-22s ERROR %s" % (name, ex))
        fails += 1
        continue
    dt = time.time() - t0
    if name not in O:
        print("%-22s rows=%-7d %.1fs (rows-only)" % (name, len(res), dt))
        continue
    exp = con.execute(O[name]).df()
    cols = sorted(res.columns)
    if sorted(exp.columns) != cols:
        print("%-22s SCHEMA MISMATCH %s vs %s" % (name, cols, sorted(exp.columns)))
        fails += 1
        continue
    a = res[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    ok = len(a) == len(b)
    if ok:
        for c in cols:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                afl, bfl = av.astype(float), bv.astype(float)
                # NaN == NaN must compare equal (the driver hashes
                # canonicalized values; NaN-NaN is NaN and would fail <)
                # exact equality first (covers +-inf where inf-inf=NaN)
                close = (afl == bfl) | ((afl - bfl).abs() < 1e-9)
                ok = ok and (close | (afl.isna() & bfl.isna())).all()
            else:
                ok = ok and (av.astype(str) == bv.astype(str)).all()
    print(
        "%-22s rows=%-7d %.1fs %s"
        % (name, len(res), dt, "MATCH" if ok else "VALUE MISMATCH (oracle rows=%d)" % len(b))
    )
    if not ok:
        fails += 1
        for c in cols:
            av = a[c].astype(str).reset_index(drop=True)
            bv = b[c].astype(str).reset_index(drop=True)
            if len(av) == len(bv):
                neq = av != bv
                if neq.any():
                    i = neq.idxmax()
                    print("   first diff col=%s row=%d: %r vs %r" % (c, i, av[i], bv[i]))
                    break

ray.shutdown()
sys.exit(1 if fails else 0)
