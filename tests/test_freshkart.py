"""FreshKart replay: dirty-data paths and sink round-trips.

The full Spark↔DuckDB differential equivalence of the three output
tables runs in test_catalog_oracle.py (the freshkart_* queries carry
full-pipeline oracles). Here: the cleaning paths hit the fixture's
planted dirt, and the sinks write the reference's dialect.
"""

from __future__ import annotations

import csv
import glob
import sqlite3

import pytest

from esther_apache_spark_spark.freshkart import (
    ensure_fixture,
    run_freshkart_pipeline,
    write_freshkart_outputs,
)


@pytest.fixture(scope="module")
def fk(spark):
    return run_freshkart_pipeline(spark, ensure_fixture())


def test_rejects_quarantine_nonempty(fk):
    # planted ~2.5% negative unit prices must land in the side channel
    assert fk["rejects"].count() > 0
    assert fk["rejects"].filter("item_unit_price >= 0").count() == 0


def test_dedup_one_row_per_order(fk):
    # reference semantics: ONE item row per order_id after dedup
    oc = fk["orders_clean"]
    assert oc.count() == oc.select("order_id").distinct().count()


def test_net_revenue_sign_convention(fk):
    # refunds negative => net = gross + refunds <= gross, strictly less
    # somewhere (the fixture plants refunds)
    rows = fk["daily_city_sales"].selectExpr(
        "sum(case when net_revenue_eur > gross_revenue_eur then 1 else 0 end) as bad",
        "sum(case when net_revenue_eur < gross_revenue_eur then 1 else 0 end) as refunded",
    ).first()
    assert rows["bad"] == 0
    assert rows["refunded"] > 0


def test_csv_dialect_and_partitioned_layout(fk, tmp_path):
    db = str(tmp_path / "sales.db")
    write_freshkart_outputs(fk, str(tmp_path), db)

    # K2: per-date partition dirs
    parts = sorted(glob.glob(str(tmp_path / "daily_city_sales_csv" / "date=*")))
    assert len(parts) == 31, parts[:3]

    # K1: `;` separator and %.2f floats inside a partition file
    part_csv = glob.glob(parts[0] + "/*.csv")[0]
    with open(part_csv) as f:
        rows = list(csv.reader(f, delimiter=";"))
    header, first = rows[0], rows[1]
    assert "gross_revenue_eur" in header
    val = first[header.index("gross_revenue_eur")]
    assert "." in val and len(val.split(".")[1]) == 2, val

    # K3: sqlite overwrite-mode tables
    with sqlite3.connect(db) as conn:
        n = conn.execute("SELECT count(*) FROM daily_city_sales").fetchone()[0]
    assert n == fk["daily_city_sales"].count()

    # K4: rejects side channel written as a single file
    rej = glob.glob(str(tmp_path / "rejects_items_csv" / "*.csv"))
    assert len(rej) == 1
