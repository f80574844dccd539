"""Broadcast dimension join and grouping-sets rollup."""

import pyarrow as pa
import pytest
import ray.data


def _dims():
    return ray.data.from_items(
        [
            {"k": 1, "name": "one", "grp": "odd"},
            {"k": 2, "name": "two", "grp": "even"},
            {"k": 3, "name": "three", "grp": "odd"},
        ]
    )


def _facts():
    return ray.data.from_items(
        [{"fk": v, "x": i} for i, v in enumerate([1, 2, 2, 3, 9])]
    ).repartition(3)


class TestBroadcastLookupJoin:
    def test_inner_drops_misses(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        out = broadcast_lookup_join(
            _facts(), _dims(), "fk", "k", ["name", "grp"]
        ).take_all()
        assert len(out) == 4  # fk=9 dropped
        byx = {r["x"]: r["name"] for r in out}
        assert byx == {0: "one", 1: "two", 2: "two", 3: "three"}

    def test_left_keeps_misses_with_nulls(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        out = broadcast_lookup_join(
            _facts(), _dims(), "fk", "k", ["name"], how="left"
        ).take_all()
        assert len(out) == 5
        miss = [r for r in out if r["fk"] == 9][0]
        assert miss["name"] is None

    def test_duplicate_dim_key_raises(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        dup = ray.data.from_items([{"k": 1, "name": "a"}, {"k": 1, "name": "b"}])
        with pytest.raises(ValueError, match="not unique"):
            broadcast_lookup_join(_facts(), dup, "fk", "k", ["name"])


class TestRollup:
    def test_levels_and_totals(self, ray_session):
        from topicrawler_ray.stages.relational import rollup_aggregate

        ds = ray.data.from_items(
            [
                {"a": "x", "b": "p", "v": 1},
                {"a": "x", "b": "q", "v": 2},
                {"a": "y", "b": "p", "v": 4},
            ]
        ).repartition(2)
        rows = {
            (r["a"], r["b"]): (r["v"], r["n_rows"])
            for r in rollup_aggregate(ds, ["a", "b"], "v").take_all()
        }
        assert rows[("x", "p")] == (1, 1)
        assert rows[("x", "q")] == (2, 1)
        assert rows[("y", "p")] == (4, 1)
        assert rows[("x", "__all__")] == (3, 2)
        assert rows[("y", "__all__")] == (4, 1)
        assert rows[("__all__", "__all__")] == (7, 3)
        assert len(rows) == 6


class TestPricingSummary:
    def _rows(self):
        import random

        rng = random.Random(7)
        rows = []
        for i in range(200):
            rows.append(
                {
                    "l_returnflag": rng.choice(["A", "N", "R"]),
                    "l_linestatus": rng.choice(["O", "F"]),
                    "l_quantity": float(rng.randint(1, 50)),
                    "l_extendedprice": round(rng.uniform(900.0, 105000.0), 2),
                    "l_discount": rng.randint(0, 10) / 100.0,
                    "l_tax": rng.randint(0, 8) / 100.0,
                }
            )
        return rows

    def test_matches_sequential_integer_algebra(self, ray_session):
        import math

        import ray.data

        from topicrawler_ray.stages.relational import pricing_summary

        rows = self._rows()
        exp = {}
        for r in rows:
            key = (r["l_returnflag"], r["l_linestatus"])
            base = math.floor(r["l_extendedprice"] * 100.0)
            qty = math.floor(r["l_quantity"] * 100.0)
            disc = math.floor(r["l_discount"] * 100.0)
            tax = math.floor(r["l_tax"] * 100.0)
            e = exp.setdefault(key, [0, 0, 0, 0, 0])
            e[0] += 1
            e[1] += qty
            e[2] += base
            e[3] += base * (100 - disc)
            e[4] += base * (100 - disc) * (100 + tax)
        out = pricing_summary(ray.data.from_items(rows).repartition(5)).take_all()
        assert len(out) == len(exp)
        for row in out:
            e = exp[(row["l_returnflag"], row["l_linestatus"])]
            got = [
                row["n_rows"],
                row["sum_qty_e2"],
                row["sum_base_e2"],
                row["sum_disc_e4"],
                row["sum_charge_e6"],
            ]
            assert got == e, (row, e)

    def test_overflow_guard_trips(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.relational import pricing_summary

        rows = [
            {
                "l_returnflag": "A",
                "l_linestatus": "O",
                "l_quantity": 1.0,
                # base_e2 ~ 9.2e17 so one row's charge_e6 overflows the
                # asserted 2^62 bound after the (100-disc)*(100+tax) factor
                "l_extendedprice": 9.2e15,
                "l_discount": 0.0,
                "l_tax": 0.0,
            }
        ]
        with pytest.raises(Exception):
            pricing_summary(ray.data.from_items(rows)).take_all()


class TestShippingPriority:
    def test_matches_duckdb_oracle(self, ray_session, sf_dir):
        """The TPC-H-Q3-shaped query and its SQL oracle agree end-to-end
        (semijoin + lookup join + exact-integer revenue + top-10)."""
        import sys
        from pathlib import Path

        import duckdb

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        got = e.queries()["shipping_priority"](sf_dir).to_pandas()
        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem"):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t)
            )
        exp = con.execute(e.oracle_sql()["shipping_priority"]).df()
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        for c in cols:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c


class TestCustdistOrderPriority:
    def _entry(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        return e

    def _oracle_df(self, e, name, sf_dir):
        import duckdb

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem"):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t)
            )
        return con.execute(e.oracle_sql()[name]).df()

    def _assert_match(self, got, exp):
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        for c in cols:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c

    def test_custdist_matches_duckdb_oracle(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["custdist"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "custdist", sf_dir))

    def test_order_priority_matches_duckdb_oracle(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["order_priority"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "order_priority", sf_dir))

    def test_custdist_zero_bucket(self, ray_session):
        """Customers with no orders land in the c_count=0 bucket; the
        bucket is absent when every customer ordered."""
        import ray.data

        from topicrawler_ray.stages.relational import (
            customer_order_distribution,
        )

        orders = ray.data.from_items(
            [{"o_custkey": 1}, {"o_custkey": 1}, {"o_custkey": 2}]
        )
        cust = ray.data.from_items([{"c_custkey": k} for k in (1, 2, 3, 4)])
        out = customer_order_distribution(orders, cust).to_pydict()
        assert out == {"c_count": [0, 1, 2], "custdist": [2, 1, 1]}

        cust2 = ray.data.from_items([{"c_custkey": k} for k in (1, 2)])
        out2 = customer_order_distribution(orders, cust2).to_pydict()
        assert out2 == {"c_count": [1, 2], "custdist": [1, 1]}


class TestQ6Q10Q14:
    """TPC-H-Q6/Q10/Q14-shaped operators vs their DuckDB oracles, plus
    unit edge cases on the kernels."""

    def _entry(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        return e

    def _oracle_df(self, e, name, sf_dir):
        import duckdb

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "part", "nation"):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t)
            )
        return con.execute(e.oracle_sql()[name]).df()

    def _assert_match(self, got, exp):
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        for c in cols:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c

    def test_revenue_filter_matches_duckdb_oracle(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["revenue_filter"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "revenue_filter", sf_dir))

    def test_returned_items_matches_duckdb_oracle(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["returned_items"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "returned_items", sf_dir))

    def test_promo_revenue_matches_duckdb_oracle(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["promo_revenue"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "promo_revenue", sf_dir))

    def test_revenue_filter_empty_window(self, ray_session):
        """A window matching no rows yields the (0, 0) scalar row, not
        an empty table (the oracle's count(*)/coalesce contract)."""
        import ray.data

        from topicrawler_ray.stages.relational import filtered_revenue

        li = ray.data.from_items(
            [
                {
                    "l_shipdate": __import__("datetime").datetime(1995, 1, 1),
                    "l_discount": 0.05,
                    "l_quantity": 1.0,
                    "l_extendedprice": 100.0,
                }
            ]
        )
        out = filtered_revenue(
            li, lo_us=10**18, hi_us=2 * 10**18,
            disc_lo_e2=5, disc_hi_e2=7, qty_lt=24,
        ).take_all()
        assert out == [{"n_rows": 0, "revenue_e4": 0}]

    def test_promo_ratio_zero_total(self, ray_session):
        """total=0 (empty window) keeps the ratio defined as 0 on both
        sides of the oracle contract."""
        import datetime

        import ray.data

        from topicrawler_ray.stages.relational import promo_revenue_ratio

        li = ray.data.from_items(
            [
                {
                    "l_partkey": 1,
                    "l_shipdate": datetime.datetime(1995, 1, 1),
                    "l_extendedprice": 100.0,
                    "l_discount": 0.0,
                }
            ]
        )
        part = ray.data.from_items([{"p_partkey": 1, "p_type": "ECONOMY"}])
        out = promo_revenue_ratio(
            li, part, lo_us=10**18, hi_us=2 * 10**18, promo_type="ECONOMY"
        ).take_all()
        assert out == [
            {"promo_rev_e4": 0, "total_rev_e4": 0, "promo_pct_e9": 0}
        ]


class TestQ7Q8Q17Q18:
    def _entry(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        return e

    def _oracle_df(self, e, name, sf_dir):
        import duckdb

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem", "part", "nation",
                  "region", "supplier"):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t)
            )
        return con.execute(e.oracle_sql()[name]).df()

    def _assert_match(self, got, exp):
        cols = sorted(got.columns)
        assert sorted(exp.columns) == cols
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        for c in cols:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c

    def test_nation_trade(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["nation_trade"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "nation_trade", sf_dir))
        # cross-nation only
        assert (got["supp_nation"] != got["cust_nation"]).all()

    def test_market_share(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["market_share"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "market_share", sf_dir))
        assert (got["share_rev_e4"] <= got["total_rev_e4"]).all()

    def test_small_quantity_revenue(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["small_quantity_revenue"](sf_dir).to_pandas()
        self._assert_match(
            got, self._oracle_df(e, "small_quantity_revenue", sf_dir)
        )

    def test_large_orders(self, ray_session, sf_dir):
        e = self._entry()
        got = e.queries()["large_orders"](sf_dir).to_pandas()
        self._assert_match(got, self._oracle_df(e, "large_orders", sf_dir))
        assert (got["sum_qty_e2"] >= 25000).all()
