"""Magnitude-sanity sweep (VERDICT r4 #8): the DuckDB oracle proves
spark==duckdb, NOT spark==truth — when the same scaled-integer
expression is pasted into both engines, a shared constant slip (the
q6 100x bug, commit 758e14e) passes every hash check. These tests
bound each money/measure family against INDEPENDENTLY computed raw
aggregates — plain double sums over the raw parquet, no cents()
scaling, no shared expression shape — so a wrong divisor or scale
factor in the query can't hide in a matching oracle.

Bounds are deliberately loose (float error and filter selectivity
are absorbed by inequality slack); what they catch is order-of-
magnitude drift, which is exactly the shared-constant failure mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_script_spark.plans.catalog import CATALOG


@pytest.fixture(scope="module")
def raw(spark, sf_dir):
    """Independent raw-table aggregates: computed once, plain doubles."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = li.agg(
        F.sum("l_extendedprice").alias("sum_ext"),
        F.count(F.lit(1)).alias("n_li"),
    ).collect()[0]
    e = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum("value").alias("vsum"),
    ).collect()[0]
    return {
        "sum_ext": float(r["sum_ext"]),
        "n_li": int(r["n_li"]),
        "ev_min": float(e["vmin"]),
        "ev_max": float(e["vmax"]),
        "ev_sum": float(e["vsum"]),
    }


# every pure-revenue query: output column -> must sit in [0, sum_ext].
# A 100x divisor slip puts it at 100·sum_ext or sum_ext/100 — far
# outside even for 1%-selectivity filters ONLY on the high side, so
# the low side is guarded by the family-specific floors below.
_REVENUE_QUERIES = {
    "q3_shipping_priority": "revenue",
    "q5_local_supplier_volume": "revenue",
    "q7_volume_shipping": "revenue",
    "q10_returned_items": "revenue",
    "q15_top_supplier": "total_revenue",
}


@pytest.mark.parametrize("name", sorted(_REVENUE_QUERIES))
def test_revenue_within_corpus_bound(spark, sf_dir, raw, name):
    col = _REVENUE_QUERIES[name]
    rows = CATALOG[name].spark(spark, sf_dir).collect()
    for r in rows:
        v = r[col]
        assert v is None or 0.0 <= v <= raw["sum_ext"] * 1.01, (name, v)


def test_q1_base_price_reconciles_with_raw_sum(spark, sf_dir, raw):
    """q1's shipdate cutoff keeps a large fraction of the fixture:
    the sum of sum_base_price across groups must land in the same
    order of magnitude as the raw double sum of l_extendedprice
    (a 100x scale slip lands at 10%/10000% of it), and the
    discounted price must sit just below the base price."""
    rows = CATALOG["q1_pricing_summary"].spark(spark, sf_dir).collect()
    total = sum(r["sum_base_price"] for r in rows)
    assert 0.05 * raw["sum_ext"] <= total <= 1.01 * raw["sum_ext"]
    # discount is 0..10% in the fixture: disc_price within (0.8, 1.0]
    # of base for the SAME filtered rows
    disc = sum(r["sum_disc_price"] for r in rows)
    assert 0.8 * total <= disc <= total


def test_q6_revenue_scale(spark, sf_dir, raw):
    """q6's revenue is price·discount with discount in [0.05, 0.07]:
    a correct result is under 7% of the filtered price mass — the
    q6 bug this guards against reported 100x that."""
    v = CATALOG["q6_forecast_revenue"].spark(spark, sf_dir).collect()[0][
        "revenue"
    ]
    assert 0.0 <= v <= 0.07 * raw["sum_ext"]
    # and a 1/100 slip would put it under 0.07% of the June-window
    # mass; demand at least SOME revenue so downscaling can't hide
    assert v > 0.0


def test_q9_profit_magnitude(spark, sf_dir, raw):
    """Profit per row is bounded by ext + 0.1·retail·qty; retail <
    2000, qty <= 50 in the fixture -> |row| < ext + 10000."""
    rows = CATALOG["q9_product_profit"].spark(spark, sf_dir).collect()
    bound = raw["sum_ext"] + raw["n_li"] * 10_000.0
    total = sum(abs(r["sum_profit"]) for r in rows)
    assert total <= bound


def test_q14_promo_share_is_a_fraction(spark, sf_dir):
    """q14's promo_revenue is 100·promo/total — a share in [0, 100];
    a scale slip lands at 1e4 or 1e-2."""
    rows = CATALOG["q14_promo_revenue"].spark(spark, sf_dir).collect()
    for r in rows:
        v = r["promo_revenue_pct"]
        assert v is None or 0.0 <= v <= 100.0


def test_q8_market_share_is_a_fraction(spark, sf_dir):
    for r in CATALOG["q8_market_share"].spark(spark, sf_dir).collect():
        assert r["mkt_share"] is None or 0.0 <= r["mkt_share"] <= 1.0


def test_q17_yearly_average_bound(spark, sf_dir, raw):
    v = CATALOG["q17_small_qty_revenue"].spark(spark, sf_dir).collect()[0][
        "avg_yearly"
    ]
    assert v is None or 0.0 <= v <= raw["sum_ext"] / 7.0


def test_q11_values_exceed_their_own_threshold(spark, sf_dir):
    """Every reported part value must exceed 1/1000 of the reported
    total — recomputed here from the OUTPUT (sum of emitted values is
    a lower bound on the total used in-query, so each value must beat
    value_sum/1000 · (1/1.01 slack is unnecessary: emitted values are
    a subset, the threshold can only be HIGHER than this floor)."""
    rows = CATALOG["q11_important_stock"].spark(spark, sf_dir).collect()
    if rows:
        floor = sum(r["value"] for r in rows) / 1000.0
        assert all(r["value"] * 1000 > floor for r in rows)


def test_ev_time_weighted_avg_within_value_range(spark, sf_dir, raw):
    """A time-weighted AVERAGE of observed values must sit inside
    [min value, max value] — any weight-normalization slip (seconds
    vs millis, missing divisor) throws it outside instantly."""
    rows = CATALOG["ev_time_weighted_avg"].spark(spark, sf_dir).collect()
    lo, hi = raw["ev_min"] - 1e-9, raw["ev_max"] + 1e-9
    for r in rows:
        assert r["twap"] is None or lo <= r["twap"] <= hi, r


def test_ev_cube_grand_total_matches_raw(spark, sf_dir, raw):
    """The CUBE's (NULL, NULL) grand-total row must reconcile with
    the independent raw SUM(value) — shared rollup-scale slips in
    both engines break here."""
    rows = CATALOG["ev_value_cube"].spark(spark, sf_dir).collect()
    grand = [
        r
        for r in rows
        if r["event_type"] == "<all>" and r["yr"] == "<all>"
    ]
    assert len(grand) == 1
    assert abs(grand[0]["total_value"] - raw["ev_sum"]) <= max(
        1e-6 * abs(raw["ev_sum"]), 1e-4
    )


def test_sk_heavy_hitter_shares_are_fractions(spark, sf_dir):
    for r in CATALOG["sk_heavy_hitters"].spark(spark, sf_dir).collect():
        assert 0.0 <= r["share"] <= 1.0
        assert r["cnt"] >= 0


def test_sk_approx_distinct_within_bound_flags_true(spark, sf_dir):
    """The query self-reports within_bound by comparing HLL to exact;
    sanity: the flag must actually be TRUE everywhere (a silently
    broken sketch would emit FALSE rows that an unchecked catalog
    sweep never looks at)."""
    rows = CATALOG["sk_approx_distinct"].spark(spark, sf_dir).collect()
    assert rows and all(r["within_bound"] for r in rows)


def test_cdc_final_price_reconciles_with_orders(spark, sf_dir):
    """cdc_apply_changes: surviving price_cents must reconcile with an
    INDEPENDENT raw computation — for a non-deleted key the final
    price is o_totalprice cents, +10% (floored) iff key % 3 != 0. A
    scale slip shared by the query and its oracle cannot hide here."""
    out = CATALOG["cdc_apply_changes"].spark(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    raw_sum = float(o.agg(F.sum("o_totalprice")).collect()[0][0])
    got = out.agg(
        F.sum("price_cents").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    # survivors sum in cents sits within [0.8x, 1.1*1.1x] of the raw
    # order total in cents (deletes remove ~20%, updates add <= 10%)
    assert 0.5 * raw_sum * 100 < float(got["s"]) < 1.21 * raw_sum * 100
    n_orders = o.count()
    assert got["n"] == n_orders - n_orders // 5  # %5==0 keys deleted


def test_attribution_totals_reconcile_with_purchases(spark, sf_dir):
    """ev_attribution_last_touch: channel totals must partition the
    INDEPENDENT purchase census — every purchase lands in exactly one
    channel and revenue sums to the raw purchase-value sum (decimal
    rounding slack only)."""
    out = CATALOG["ev_attribution_last_touch"].spark(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase")
    n_raw = purchases.count()
    sum_raw = float(purchases.agg(F.sum("value")).collect()[0][0])
    got = out.agg(
        F.sum("n_conversions").alias("n"), F.sum("revenue").alias("s")
    ).collect()[0]
    assert int(got["n"]) == n_raw
    assert abs(float(got["s"]) - sum_raw) < 1e-3


def test_ewma_stays_within_signal_envelope(spark, sf_dir):
    """ts_ewma_fir: a convex combination of the last 8 values can
    never leave the [min, max] envelope of the raw signal — a weight
    slip (weights not summing to 1) escapes the envelope on the first
    extreme run."""
    out = CATALOG["ts_ewma_fir"].spark(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    bad = out.filter(
        F.col("ewma").isNotNull()
        & ((F.col("ewma") < r["lo"] - 1e-9) | (F.col("ewma") > r["hi"] + 1e-9))
    ).count()
    assert bad == 0


def test_tfidf_cosine_is_a_valid_similarity(spark, sf_dir):
    """sim_tfidf_cosine_pairs: every emitted ppb-quantized cosine lies
    in (0, 1e9 + 1] — integer-weight dot products are nonnegative, and
    a norm/scale slip shows up as values above 1e9."""
    out = CATALOG["sim_tfidf_cosine_pairs"].spark(spark, sf_dir)
    bad = out.filter(
        (F.col("cosine_ppb") <= 0) | (F.col("cosine_ppb") > 1_000_000_001)
    ).count()
    assert bad == 0
