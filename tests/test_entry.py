"""Driver-contract smoke: entry() runs under an already-initialized
Ray session (the driver calls ray.init itself) and returns a
stable-schema result with rows."""

import sys
from pathlib import Path


class TestEntry:
    def test_entry_returns_scored_pages(self, ray_session):
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        ds = e.entry()
        df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        assert len(df) > 0
        assert {"url", "perp", "perp_str"} <= set(df.columns)

    def test_every_query_has_callable_and_known_oracle_kind(self, ray_session):
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        q = e.queries()
        o = e.oracle_sql()
        assert len(q) >= 100
        assert all(callable(f) for f in q.values())
        # every oracle key corresponds to a real query
        assert set(o) <= set(q)
