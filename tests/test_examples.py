"""E2E goldens modeled on the reference's bundled example programs
(`examples/src/main/java/org/conceptoriented/bistro/examples/`):

- retail (Products / OrderItems CSVs, examples/data/ds1): calc
  amount = quantity * price via a link path, link items→products, accu
  revenue per product — Example1-style batch program.
- ticks (Kraken BTC trades-style stream): rolling average over a time
  window (roll distance frame), range-table binning, and the
  timer+retention streaming scenario (age-based FIFO eviction).

Fixtures are tiny deterministic CSVs written here (the reference's data
files are not copied), loaded through the csv_dir provider the reference's
ExUtils loaders correspond to.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bistro_spark.schema import Schema
from bistro_spark.sources.io import load_table

PRODUCTS = """id,name,price
1,apples,2.0
2,oranges,3.5
3,bread,1.5
"""

ORDER_ITEMS = """id,order_id,product_id,quantity
10,100,1,4
11,100,2,2
12,101,1,1
13,101,3,6
14,102,2,3
"""


@pytest.fixture(scope="module")
def retail_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds1"))
    with open(os.path.join(root, "products.csv"), "w") as f:
        f.write(PRODUCTS)
    with open(os.path.join(root, "order_items.csv"), "w") as f:
        f.write(ORDER_ITEMS)
    return root


def test_example_retail_calc_link_accu(spark, retail_dir):
    """Example1 (retail): load CSVs, link items→products, calc
    amount = [quantity] * [product.price] (bracket formula = the
    reference's exp4j surface), accu revenue per product."""
    products = load_table(
        spark, "products", retail_dir, provider="csv_dir",
        schema="id int, name string, price double",
    )
    items = load_table(
        spark, "order_items", retail_dir, provider="csv_dir",
        schema="id int, order_id int, product_id int, quantity int",
    )
    s = Schema(spark, "retail")
    prod = s.table("products", products, key=["id"])
    oi = s.table("order_items", items)
    oi.link("product", prod, on={"product_id": "id"}).bring("product", "price")
    oi.calc("amount", "[quantity] * [product.price]")
    prod.accu("revenue", oi, "product", "sum(amount)", default=0.0)
    prod.accu("n_sold", oi, "product", "sum(quantity)", default=0)

    got = {r["name"]: (r["revenue"], r["n_sold"]) for r in prod.df().collect()}
    # hand-computed goldens: apples 4*2+1*2=10, oranges 2*3.5+3*3.5=17.5,
    # bread 6*1.5=9
    assert got == {
        "apples": (10.0, 5),
        "oranges": (17.5, 5),
        "bread": (9.0, 6),
    }

    items_out = {r["id"]: r["amount"] for r in oi.df().collect()}
    assert items_out == {10: 8.0, 11: 7.0, 12: 2.0, 13: 9.0, 14: 10.5}


TICKS = [  # (t_sec, price, amount) — Kraken-trade-tick shape
    (0, 100.0, 1.0),
    (10, 101.0, 2.0),
    (25, 103.0, 1.0),
    (40, 99.0, 3.0),
    (70, 98.0, 1.0),
    (95, 104.0, 2.0),
    (130, 105.0, 1.0),
]


def test_example_ticks_rolling_and_binning(spark):
    """Streaming-examples batch twin: per-tick rolling mean price over the
    preceding 30 s (roll distance frame) and 60 s range-table bins with
    per-bin volume."""
    df = spark.createDataFrame(TICKS, "t long, price double, amount double")
    s = Schema(spark, "ticks")
    t = s.table("ticks", df)
    t.roll(
        "avg30", "avg(price)", order_by="t", size_past=30, mode="range"
    )
    t.calc("bin", "cast(floor(t / 60) * 60 as long)")
    bins = s.table("BINS")
    bins._base_thunk = lambda: t.df().select("bin").dropDuplicates()
    bins.set_key("bin")
    bins.accu("volume", t, "bin", "sum(amount)", default=0.0)
    bins.accu("n_ticks", t, "bin", "count(*)", default=0)

    rolls = {r["t"]: r["avg30"] for r in t.df().collect()}
    assert rolls[0] == 100.0
    assert rolls[25] == (100.0 + 101.0 + 103.0) / 3  # 0,10,25 within 30s
    assert rolls[40] == (101.0 + 103.0 + 99.0) / 3  # 10,25,40
    assert rolls[70] == (99.0 + 98.0) / 2  # 40,70
    assert rolls[130] == 105.0

    got = {r["bin"]: (r["volume"], r["n_ticks"]) for r in bins.df().collect()}
    assert got == {0: (7.0, 4), 60: (3.0, 2), 120: (1.0, 1)}


def test_example_ticks_timer_retention_stream(spark):
    """The timer+retention streaming scenario: ticks replayed in scripted
    micro-batches with 60 s age retention; after each evaluation the
    rolling state equals recompute over the retained (≤60 s old) ticks —
    the reference's ConnectorTimer + ActionRemove loop."""
    from bistro_spark.streaming.incremental import AggSpec, IncrementalRunner

    rows = [(float(t), p, a) for t, p, a in TICKS]
    df = spark.createDataFrame(rows, "t double, price double, amount double")
    full = df.withColumn(
        "event_time", F.expr("timestamp '2026-01-01 00:00:00' + make_dt_interval(0,0,0,t)")
    ).withColumn("batch_ofs", F.col("t").cast("long")).withColumn(
        "grp", F.lit("btc")
    )
    runner = IncrementalRunner(
        spark,
        lambda b: b,
        ["grp"],
        [
            AggSpec("vwap_num", "sum(price * amount)", "sum", 0.0, invertible=True),
            AggSpec("volume", "sum(amount)", "sum", 0.0, invertible=True),
            AggSpec("n", "count(*)", "sum", 0, invertible=True),
        ],
        retention_age="60 seconds",
        time_col="event_time",
    )
    splits = [(0, 30), (30, 80), (80, 140)]
    for lo, hi in splits:
        runner.add_batch(
            full.filter((F.col("t") >= lo) & (F.col("t") < hi))
        )
        res = runner.result().collect()[0]
        tmax = max(t for t, _, _ in TICKS if t < hi)
        live = [(t, p, a) for t, p, a in TICKS if lo is not None
                and t < hi and t > tmax - 60]
        assert res["n"] == len(live)
        assert abs(res["volume"] - sum(a for _, _, a in live)) < 1e-9
        assert abs(res["vwap_num"] - sum(p * a for _, p, a in live)) < 1e-9
