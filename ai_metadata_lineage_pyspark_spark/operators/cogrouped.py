"""Cogrouped applyInPandas: the grouped two-sided Pandas escape hatch.

Completes the Pandas-API operator classes alongside mapInPandas
(multimodal.py), grouped-map applyInPandas (streaming batch_user_stats),
and applyInPandasWithState (streaming/sessions.py): `cogroup(...)
.applyInPandas` shuffles BOTH inputs on the group key once and hands each
key's two Arrow-batched frames to one Python function — the tool for
per-key matching logic too custom for SQL (multi-touch attribution rules,
per-entity model scoring against a feature frame, custom sequence
alignment).

Honest scale note: for a plain interval match like this query, the pure
DataFrame equi-join + range filter (streaming/joins.py
batch_click_attribution) is strictly better — one sort-merge join, no
Python. The cogrouped twin exists to pin the API's semantics against the
SAME oracle, so when the per-key logic outgrows SQL the verified plumbing
is already here: two shuffles (one per side, both keyed on user_id), Arrow
transfer, per-key pandas, output schema declared up front.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.io import load_events
from ..registry import register
from ..streaming.joins import _CLICK_PURCHASE_ORACLE, _ATTR_WINDOW_MIN

_OUT_SCHEMA = "click_id long, purchase_id long, user_id long, delay_us long"


def _match_intervals(clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """Per-user interval match: every (click, purchase) pair with the
    purchase in [click, click + window]. Vectorized within the key group."""
    if clicks.empty or purchases.empty:
        return pd.DataFrame(
            {"click_id": [], "purchase_id": [], "user_id": [], "delay_us": []}
        ).astype("int64")
    pairs = clicks.merge(purchases, on="user_id", how="inner")
    delay = pairs["p_us"] - pairs["c_us"]
    window_us = _ATTR_WINDOW_MIN * 60 * 1_000_000
    hit = pairs[(delay >= 0) & (delay <= window_us)]
    return pd.DataFrame(
        {
            "click_id": hit["click_id"],
            "purchase_id": hit["purchase_id"],
            "user_id": hit["user_id"],
            "delay_us": (hit["p_us"] - hit["c_us"]),
        }
    )


@register("cogroup_click_attribution", oracle=_CLICK_PURCHASE_ORACLE)
def cogroup_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution via cogrouped applyInPandas, hash-checked
    against the same oracle as the equi-join form."""
    events = load_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us").alias("c_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("p_us"),
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(_match_intervals, schema=_OUT_SCHEMA)
    )
