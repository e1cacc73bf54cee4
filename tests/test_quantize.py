"""Cross-engine cents quantization (the shipping_priority root cause).

Four driver rounds of hash-red on one query were pinned (r4 probe
experiment) to the cents quantization `round(x * 100)` in the revenue
column. The divergence is NOT reproducible in this container: local
DuckDB 1.0.0 rounds DOUBLE half-away-from-zero, agreeing with Spark's
HALF_UP on a 16k-value adversarial sweep (run during r5). Newer DuckDB
releases changed `round(DOUBLE)` to round-half-even, which disagrees
with Spark at exact .5 ties (e.g. l_discount = 0.005 -> *100 = 0.5:
Spark 1, half-even 0) — a version-dependent trap the driver's DuckDB
evidently hits.

The r5 fix removes round() entirely: floor(x*100 + 0.5) uses only
IEEE-exact operations (multiply, add, floor) and implements HALF_UP by
construction, identically on every engine and every engine VERSION.
This file pins that property against Spark, the container's DuckDB,
and pure Python.
"""
from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

# Adversarial doubles: exact .5 ties after *100 (the half-even vs
# HALF_UP divergence point), near-tie neighbors from both sides,
# non-2dp values with long decimal reprs, and clean money values.
ADVERSARIAL = [
    0.005, 0.015, 0.025, 0.045,            # *100 == exact x.5 ties
    90140.5 / 100, 2.675, 901.405,
    math.nextafter(0.005, 0.0), math.nextafter(0.005, 1.0),
    901.4049999999999, 1234.56500000000005,
    7.0049999999999999, 999999.995, 0.014999999999999999,
    55.554999999999996, 1e13 + 0.005,
    100.0, 0.0, 0.01, 42.42,
]


def _spark_cents(spark, xs, expr):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    return [r[0] for r in df.select(F.expr(expr).alias("c")).collect()]


def _duck_cents(xs, expr):
    con = duckdb.connect()
    out = [con.execute(f"SELECT {expr} FROM (SELECT ?::DOUBLE AS x)",
                       [float(x)]).fetchone()[0] for x in xs]
    con.close()
    return out


def test_half_even_round_would_diverge_at_ties():
    """The driver-side mechanism: a half-even round (newer DuckDB's
    DOUBLE round) disagrees with HALF_UP exactly at .5 ties — so any
    round()-based quantization is DuckDB-version-dependent."""
    ties = [x for x in ADVERSARIAL if (x * 100) % 1 == 0.5]
    assert ties, "adversarial set must contain exact .5 ties"
    half_up = [math.floor(x * 100 + 0.5) for x in ties]
    half_even = [round(x * 100) for x in ties]  # Python round is half-even
    assert half_up != half_even


def test_floor_quantization_bit_identical(spark):
    """floor(x*100 + 0.5): Spark == DuckDB == math.floor for every
    adversarial input (IEEE-exact ops only, no version dependence)."""
    expr = "CAST(floor(x * 100 + 0.5) AS BIGINT)"
    s = _spark_cents(spark, ADVERSARIAL, expr)
    d = _duck_cents(ADVERSARIAL, expr)
    py = [int(math.floor(x * 100 + 0.5)) for x in ADVERSARIAL]
    assert s == d == py


def test_floor_quantization_exact_on_clean_data(spark):
    """On exactly-representable money the floor form equals the intended
    cents value (no off-by-one at clean inputs), and at .5 ties it is
    HALF_UP on both engines."""
    xs = [0.0, 0.01, 1.0, 42.42, 100.0, 12345.67, 0.005]
    want = [0, 1, 100, 4242, 10000, 1234567, 1]
    expr = "CAST(floor(x * 100 + 0.5) AS BIGINT)"
    assert _spark_cents(spark, xs, expr) == want
    assert _duck_cents(xs, expr) == want
