"""FreshKart pandas differential twin (SURVEY.md §5 items 2-3).

The reference ships a pandas AND a PySpark implementation of the same
pipeline plus an EMPTY ``test/test_pipeline_equivalence.py`` — the test
it clearly intended was "both engines produce the same tables". This
module fulfils that promise: a literal pandas port of
``/root/reference/src/pandas/pipeline_pandas.py:26-203`` runs over the
seeded fixture and its ``orders_clean`` / ``daily_city_sales`` /
per-day CSV outputs are compared column-for-column against
``run_freshkart_pipeline``.

Two knowing alignments, both places where the reference's OWN two
implementations disagree with each other (so a byte-literal port could
never match either way):

1. Empty ``is_active``: pandas ``read_csv`` turns it into float NaN and
   the reference's ``controle_bool`` hits ``isinstance(v, float) →
   bool(nan) → True``; the reference's PySpark variant reads the same
   field as NULL → ``controle_bool(None) → False``. The twin treats
   NaN as missing (False), matching the NULL semantics both Spark
   pipelines use (``pipeline_pyspark.py:42-43``).
2. Dedup ties: ``sort_values(["order_id","created_at"])`` +
   ``drop_duplicates(keep="first")`` is nondeterministic on exact
   created_at ties (quicksort; the fixture deliberately plants such
   ties). The twin uses the engine's documented deterministic item-tuple
   tiebreak (SURVEY.md §2.6, ``freshkart/pipeline.py:96-103``).

Everything else — truthy variants, uncastable refund amounts, duplicate
order_ids, negative prices, unknown customers, the join-then-filter and
the negative-refund ADDITION — is the reference's pandas logic verbatim.
"""

from __future__ import annotations

import csv
import glob
import json
import math
from datetime import datetime
from pathlib import Path

import pandas as pd
import pytest

from esther_apache_spark_spark.freshkart import (
    ensure_fixture,
    run_freshkart_pipeline,
    write_freshkart_outputs,
)


def _controle_bool(v) -> bool:
    """Reference ``controle_bool`` (pipeline_pandas.py:79-84) with the
    NaN→missing alignment (module docstring, alignment 1)."""
    if isinstance(v, float) and math.isnan(v):
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return bool(v)
    if v is None:
        return False
    return str(v).strip().lower() in ("1", "true", "yes", "y", "t")


def _to_date(s) -> str:
    """Reference ``to_date`` (pipeline_pandas.py:152-158): strict
    two-format parse, raises on anything else."""
    s = str(s)
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt).date().isoformat()
        except ValueError:
            continue
    raise ValueError(f"unrecognized date format: {s}")


def run_pandas_twin(input_dir: str) -> dict[str, pd.DataFrame]:
    """Pandas port of pipeline_pandas.py:26-203 (stages in source order)."""
    # -- loads (:26-72) ----------------------------------------------------
    customers = pd.read_csv(f"{input_dir}/customers.csv")
    refunds = pd.read_csv(f"{input_dir}/refunds.csv")
    frames = []
    for path in sorted(glob.glob(f"{input_dir}/orders_*.json")):
        with open(path) as f:
            frames.append(pd.DataFrame(json.load(f)))
    orders = pd.concat(frames)

    # -- cleaning (:79-96) ---------------------------------------------------
    customers["is_active"] = customers["is_active"].apply(_controle_bool)
    customers = customers.astype({"customer_id": "string", "city": "string"})
    refunds["amount"] = pd.to_numeric(refunds["amount"], errors="coerce").fillna(0.0)

    # -- paid filter (:105-107), explode (:115-121) --------------------------
    orders = orders[orders["payment_status"] == "paid"].copy()
    orders2 = orders.explode("items", ignore_index=True)
    items = pd.json_normalize(orders2["items"]).add_prefix("item_")
    orders2 = pd.concat([orders2.drop(columns=["items"]), items], axis=1)

    # -- negative-price quarantine (:125-134) --------------------------------
    neg_mask = orders2["item_unit_price"] < 0
    rejects = orders2.loc[neg_mask].copy()
    orders2 = orders2.loc[~neg_mask].copy()

    # -- keep-first dedup (:137-139) with the deterministic tiebreak
    #    (module docstring, alignment 2) -------------------------------------
    orders3 = orders2.sort_values(
        ["order_id", "created_at", "item_sku", "item_qty", "item_unit_price"],
        kind="mergesort",
    ).drop_duplicates(subset=["order_id"], keep="first")

    # -- per-order aggregate (:142-148) ---------------------------------------
    orders3 = orders3.copy()
    orders3["line_gross"] = orders3["item_qty"] * orders3["item_unit_price"]
    per_order = orders3.groupby(
        ["order_id", "customer_id", "channel", "created_at"], as_index=False
    ).agg(items_sold=("item_qty", "sum"), gross_revenue_eur=("line_gross", "sum"))

    # -- join-then-filter actives (:150-154) ----------------------------------
    per_order = per_order.merge(
        customers[["customer_id", "city", "is_active"]], on="customer_id", how="left"
    )
    per_order = per_order[per_order["is_active"] == True].copy()  # noqa: E712

    # -- order_date (:160-161), refunds join (:163-165) ------------------------
    per_order["order_date"] = per_order["created_at"].apply(_to_date)
    refunds_sum = (
        refunds.groupby("order_id", as_index=False)["amount"]
        .sum()
        .rename(columns={"amount": "refunds_eur"})
    )
    per_order = per_order.merge(refunds_sum, on="order_id", how="left").fillna(
        {"refunds_eur": 0.0}
    )

    orders_clean = per_order[
        ["order_id", "customer_id", "city", "channel", "order_date",
         "items_sold", "gross_revenue_eur"]
    ].copy()

    # -- daily aggregate + net-by-ADDITION (:175-184) ---------------------------
    agg = per_order.groupby(["order_date", "city", "channel"], as_index=False).agg(
        orders_count=("order_id", "nunique"),
        unique_customers=("customer_id", "nunique"),
        items_sold=("items_sold", "sum"),
        gross_revenue_eur=("gross_revenue_eur", "sum"),
        refunds_eur=("refunds_eur", "sum"),
    )
    agg["net_revenue_eur"] = agg["gross_revenue_eur"] + agg["refunds_eur"]
    agg = (
        agg.rename(columns={"order_date": "date"})
        .sort_values(["date", "city", "channel"])
        .reset_index(drop=True)
    )
    return {"rejects": rejects, "orders_clean": orders_clean, "daily_city_sales": agg}


@pytest.fixture(scope="module")
def twin():
    return run_pandas_twin(ensure_fixture())


@pytest.fixture(scope="module")
def fk(spark):
    return run_freshkart_pipeline(spark, ensure_fixture())


def _spark_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _pandas_rows(df, cols):
    return sorted(map(tuple, df[list(cols)].itertuples(index=False, name=None)))


def test_orders_clean_equivalence(fk, twin):
    """orders_clean matches column-for-column: keys, enrichment, the
    per-order sums, and the strict date parse. Floats are exact by
    fixture construction (multiples of 0.25)."""
    cols = ["order_id", "customer_id", "city", "channel", "order_date",
            "items_sold", "gross_revenue_eur"]
    s = _spark_rows(fk["orders_clean"], cols)
    p = _pandas_rows(twin["orders_clean"], cols)
    assert len(s) == len(p) and len(s) > 0
    assert s == p


def test_daily_city_sales_equivalence(fk, twin):
    """daily_city_sales matches column-for-column including the exact
    count-distincts and the net = gross + refunds ADDITION."""
    cols = ["date", "city", "channel", "orders_count", "unique_customers",
            "items_sold", "gross_revenue_eur", "refunds_eur", "net_revenue_eur"]
    s = _spark_rows(fk["daily_city_sales"], cols)
    p = _pandas_rows(twin["daily_city_sales"], cols)
    assert len(s) == len(p) and len(s) > 0
    assert s == p


def test_rejects_equivalence(fk, twin):
    """The quarantined negative-price item rows are the same set."""
    cols = ["order_id", "item_sku", "item_qty", "item_unit_price"]
    s = _spark_rows(fk["rejects"], cols)
    p = _pandas_rows(twin["rejects"], cols)
    assert len(s) == len(p) and len(s) > 0
    assert s == p


def test_per_day_csv_equivalence(fk, twin, tmp_path):
    """The per-day CSV exports carry the same parsed rows: the Spark
    side writes date-partitioned directories (K2), the reference writes
    daily_summary_YYYYMMDD.csv files (pipeline_pandas.py:195-200); the
    date column is re-attached from the partition path and every value
    compared after parsing (floats exact by fixture construction)."""
    db = str(tmp_path / "sales.db")
    write_freshkart_outputs(fk, str(tmp_path / "spark"), db)

    # reference-style per-day export of the twin (:195-200)
    pdir = tmp_path / "pandas"
    pdir.mkdir()
    cols = ["date", "city", "channel", "orders_count", "unique_customers",
            "items_sold", "gross_revenue_eur", "refunds_eur", "net_revenue_eur"]
    for d, sub in twin["daily_city_sales"].groupby("date"):
        sub[cols].to_csv(
            pdir / f"daily_summary_{d.replace('-', '')}.csv",
            index=False, sep=";", float_format="%.2f",
        )

    def parse(path, date_from_path=None):
        with open(path) as f:
            rows = list(csv.reader(f, delimiter=";"))
        header, out = rows[0], []
        for r in rows[1:]:
            rec = dict(zip(header, r))
            if date_from_path is not None:
                rec["date"] = date_from_path
            out.append((
                rec["date"], rec["city"], rec["channel"],
                int(float(rec["orders_count"])), int(float(rec["unique_customers"])),
                int(float(rec["items_sold"])), float(rec["gross_revenue_eur"]),
                float(rec["refunds_eur"]), float(rec["net_revenue_eur"]),
            ))
        return out

    spark_rows, pandas_rows = [], []
    parts = sorted(glob.glob(str(tmp_path / "spark" / "daily_city_sales_csv" / "date=*")))
    assert len(parts) == 31
    for part in parts:
        d = Path(part).name.split("=", 1)[1]
        for f in glob.glob(part + "/*.csv"):
            spark_rows.extend(parse(f, date_from_path=d))
    for f in sorted(glob.glob(str(pdir / "daily_summary_*.csv"))):
        pandas_rows.extend(parse(f))
    assert sorted(spark_rows) == sorted(pandas_rows)
