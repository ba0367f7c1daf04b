"""Plan + semantics regressions for the TPC-H-shaped multi-join queries."""

from __future__ import annotations

import pytest

from ai_metadata_lineage_pyspark_spark.plans import inspect as I
from ai_metadata_lineage_pyspark_spark.registry import all_queries


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    qs = all_queries()

    def build(name):
        return qs[name].fn(spark, sf_dir)

    return build


def test_q3_plan(q):
    df = q("order_shipping_priority")
    # segment-filtered customer broadcasts; orders⋈lineitem is the only
    # shuffle join; date predicates reach both fact scans
    assert I.broadcast_join_count(df) >= 1
    assert I.cartesian_product_count(df) == 0
    pushed = I.pushed_filters(df)
    assert any("o_orderdate" in f for f in pushed)
    assert any("l_shipdate" in f for f in pushed)
    assert I.partial_aggregate_count(df) >= 1


def test_q5_plan(q):
    df = q("local_supplier_volume")
    # supplier, customer, nation⋈region all broadcast; no cartesian
    assert I.broadcast_join_count(df) >= 3
    assert I.cartesian_product_count(df) == 0
    # lineitem scan pruned to the consumed columns only
    li_scans = [c for c in I.scan_columns(df) if "l_orderkey" in c]
    assert li_scans and all(len(c) <= 4 for c in li_scans)


def test_q15_single_fact_scan(q):
    df = q("top_supplier_revenue")
    # the per-supplier aggregate is persisted, so BOTH its consumers (the
    # row side and the global max) read the cache instead of re-scanning
    # lineitem: two InMemoryTableScans over one cached aggregate. (The plan
    # string still prints the cached subtree's FileScan inline, so counting
    # FileScans overstates actual scans.)
    assert I.physical_plan(df).count("InMemoryTableScan") == 2
    assert I.broadcast_join_count(df) == 2


def test_q3_returns_top10_sorted(q):
    rows = q("order_shipping_priority").collect()
    assert len(rows) == 10
    revs = [r.revenue_cpct for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q15_is_global_max(q, spark, sf_dir):
    rows = q("top_supplier_revenue").collect()
    assert len(rows) >= 1
    assert len({r.revenue_cpct for r in rows}) == 1
