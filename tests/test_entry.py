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


class TestColumnPruning:
    def test_no_unpruned_read_parquet_in_entry(self):
        """Every ray.data.read_parquet reachable from queries() must
        pass columns=[...] so only needed columns leave storage
        (VERDICT r3 item 4)."""
        import re
        from pathlib import Path

        src = Path(__file__).resolve().parent.parent.joinpath(
            "__ray_entry__.py"
        ).read_text()
        bad = []
        for m in re.finditer(r"read_parquet\(", src):
            start = m.end()
            if src[start:].startswith("'%s')"):
                continue  # duckdb SQL oracle string, not a Ray read
            depth = 0
            end = start
            for i, ch in enumerate(src[start:start + 800]):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        end = start + i
                        break
                    depth -= 1
            call = src[start:end]
            if call == "*args, **kwargs":
                continue  # the _read_parquet metadata-strip wrapper's
                # pass-through, not a read site (its CALLERS are checked)
            if "columns" not in call:
                bad.append(
                    "line %d: %s"
                    % (src[: m.start()].count("\n") + 1, call[:80])
                )
        assert not bad, "unpruned read_parquet calls:\n" + "\n".join(bad)

    def test_docs_embs_require_columns(self):
        """_docs/_embs make pruning mandatory at the signature level."""
        import inspect

        import __ray_entry__ as e

        for fn in (e._docs, e._embs):
            params = inspect.signature(fn).parameters
            assert "columns" in params
            assert params["columns"].default is inspect.Parameter.empty
