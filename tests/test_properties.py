"""Property-based tests (hypothesis) for the scalar cleaning library:
for ANY value in the supported domain, formatting → cleaning must
round-trip. One Spark job per property (values batched into a single
DataFrame) keeps runtime sane."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_script_spark.functions import dates, numerics

AMOUNTS = st.integers(min_value=-(10**12), max_value=10**12)  # cents
DATES = st.dates(min_value=dt.date(1950, 1, 2), max_value=dt.date(2099, 12, 31))


def _run(spark, pairs, expr):
    """pairs: [(dirty_string, expected)] → list of (got, expected)."""
    df = spark.createDataFrame(pairs, ["dirty", "expected"])
    return [(r["got"], r["expected"]) for r in df.select(
        expr(F.col("dirty")).alias("got"), "expected"
    ).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(AMOUNTS, min_size=30, max_size=30, unique=True))
def test_numeric_basic_roundtrip(spark, cents_list):
    """'1,234.56' grouping of any cent value parses back exactly."""
    pairs = []
    for c in cents_list:
        v = c / 100
        pairs.append((f"{v:,.2f}", v))
    for got, exp in _run(spark, pairs, numerics.clean_numeric_basic):
        assert got == exp


@settings(max_examples=1, deadline=None)
@given(st.lists(AMOUNTS.filter(lambda c: c >= 0), min_size=30, max_size=30, unique=True))
def test_numeric_accounting_parens(spark, cents_list):
    """'(1,234.56)' always parses to the negative of the bare value."""
    pairs = [(f"({c / 100:,.2f})", -(c / 100)) for c in cents_list]
    for got, exp in _run(spark, pairs, numerics.clean_numeric_accounting):
        assert got == exp


@settings(max_examples=1, deadline=None)
@given(st.lists(AMOUNTS.filter(lambda c: abs(c) >= 10**5), min_size=30, max_size=30, unique=True))
def test_numeric_locale_european(spark, cents_list):
    """European '1.234.567,89' form of any value parses back exactly."""
    pairs = []
    for c in cents_list:
        v = c / 100
        eu = f"{abs(v):,.2f}".replace(",", "_").replace(".", ",").replace("_", ".")
        if v < 0:
            eu = "-" + eu
        pairs.append((eu, v))
    for got, exp in _run(spark, pairs, numerics.clean_numeric_locale):
        assert got == exp


@settings(max_examples=1, deadline=None)
@given(st.lists(DATES, min_size=30, max_size=30, unique=True))
def test_date_cascade_all_formats(spark, date_list):
    """Every supported format of every date parses to that date."""
    fmts = ["%d/%m/%Y", "%Y-%m-%d", "%d-%m-%Y", "%d.%m.%Y"]
    pairs = []
    for i, d in enumerate(date_list):
        pairs.append((d.strftime(fmts[i % len(fmts)]), d))
    df = spark.createDataFrame(pairs, ["dirty", "expected"])
    got = df.select(
        dates.parse_date_cascade(F.col("dirty")).alias("got"), "expected"
    ).collect()
    for r in got:
        assert r["got"] == r["expected"]


@settings(max_examples=1, deadline=None)
@given(st.lists(DATES, min_size=30, max_size=30, unique=True))
def test_excel_serial_roundtrip(spark, date_list):
    """date → Excel serial → date round-trips (origin 1899-12-30)."""
    origin = dt.date(1899, 12, 30)
    pairs = [((d - origin).days, d) for d in date_list if 0 < (d - origin).days <= 60000]
    df = spark.createDataFrame(pairs, ["serial", "expected"])
    got = df.select(
        dates.excel_serial_to_date(F.col("serial")).alias("got"), "expected"
    ).collect()
    for r in got:
        assert r["got"] == r["expected"]
