"""Error-bound tests for the *_approx scale-path variants (VERDICT r03
next-step #7). These queries are registered rows-only (oracle=None): a
sketch's output is accuracy-bounded, not bit-reproducible, so the
correctness statement lives here — each approx operator is pinned against
its exact counterpart with explicit bounds."""

from __future__ import annotations

from ai_metadata_lineage_pyspark_spark.registry import all_queries


def _rows_by_key(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_table_profile_approx_error_bounds(spark, sf_dir):
    qs = all_queries()
    exact = _rows_by_key(qs["table_profile"].fn(spark, sf_dir), "l_returnflag")
    approx = _rows_by_key(qs["table_profile_approx"].fn(spark, sf_dir), "l_returnflag")
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        # exact-by-construction columns agree exactly
        assert a["n_rows"] == e["n_rows"]
        assert a["min_qty"] == e["min_qty"]
        assert a["max_qty"] == e["max_qty"]
        assert abs(a["mean_price"] - e["mean_price"]) < 1e-9
        # approx_percentile returns a REAL value from the column at an
        # accuracy-bounded rank; with accuracy=10000 on fixture-scale
        # groups, 2% relative error is generous
        for col in ("med_qty", "p90_qty", "med_price"):
            assert abs(a[col] - e[col]) <= 0.02 * max(abs(e[col]), 1.0), (
                f"{flag}.{col}: approx {a[col]} vs exact {e[col]}"
            )
        assert a["min_qty"] <= a["med_qty"] <= a["p90_qty"] <= a["max_qty"]
        # HLL distinct-count: standard error ~1.6% at default precision
        assert abs(a["n_parts"] - e["n_parts"]) <= max(0.05 * e["n_parts"], 2)


def test_customer_value_deciles_approx_bounds(spark, sf_dir):
    qs = all_queries()
    exact = _rows_by_key(qs["customer_value_deciles"].fn(spark, sf_dir), "decile")
    approx = _rows_by_key(
        qs["customer_value_deciles_approx"].fn(spark, sf_dir), "decile"
    )
    n_total = sum(r["n_customers"] for r in exact.values())
    # every customer lands in exactly one tier, tiers span 1..10
    assert sum(r["n_customers"] for r in approx.values()) == n_total
    assert set(approx) <= set(range(1, 11))
    # population balance: boundary-rank error plus ties can shift members
    # between adjacent tiers, but no tier collapses or doubles
    for d, r in approx.items():
        assert r["n_customers"] <= 2.0 * (n_total / 10) + 2, (d, r["n_customers"])
    # tier monotonicity: decile 1 holds the top balances; a lower-numbered
    # tier's floor is >= the next tier's ceiling (boundary ties allowed)
    ds = sorted(approx)
    for hi, lo in zip(ds, ds[1:]):
        assert approx[hi]["min_acctbal"] >= approx[lo]["max_acctbal"] - 1e-9, (
            hi,
            lo,
            approx[hi]["min_acctbal"],
            approx[lo]["max_acctbal"],
        )
