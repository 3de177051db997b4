"""FreshKart equivalence on the reference's LITERAL dimension data
(VERDICT r06 #5).

The reference's authoritative 800 customers + 972 refunds live as
INSERT-VALUES seed rows in its public ``freshkartmindump.sql``;
``freshkart/dump.py`` parses them verbatim (raw numeric/timestamp
tokens, no float round-trip) and synthesizes the gitignored orders
deterministically from the refunds' own foreign keys. Here the Spark
pipeline and the pandas differential twin both run on that fixture and
must agree — the same differential contract as
``test_freshkart_equivalence.py``, now anchored to the reference's
canonical rows instead of a synthetic stand-in.
"""

from __future__ import annotations

import pytest

from esther_apache_spark_spark.freshkart import run_freshkart_pipeline
from esther_apache_spark_spark.freshkart.dump import (
    REFERENCE_DUMP,
    ensure_dump_fixture,
    parse_dump,
)
from tests.test_freshkart_equivalence import run_pandas_twin


@pytest.fixture(scope="module")
def dump_rows():
    return parse_dump(REFERENCE_DUMP)


@pytest.fixture(scope="module")
def dump_dir(tmp_path_factory):
    return ensure_dump_fixture(str(tmp_path_factory.mktemp("dumpfix")))


def test_dump_parse_counts_and_literal_rows(dump_rows):
    """The dump's documented row counts, plus byte-literal spot checks
    of the first/last seed row of each table (freshkartmindump.sql:35,
    :845, :1816)."""
    customers, refunds = dump_rows
    assert len(customers) == 800
    assert len(refunds) == 972
    assert customers[0] == {
        "customer_id": "C0001",
        "first_name": "User1",
        "last_name": "Test1",
        "email": "user1@example.com",
        "city": "Nice",
        "is_active": "true",
    }
    assert refunds[0]["amount"] == "-11.38"  # raw token, no float trip
    assert refunds[-1] == {
        "refund_id": "R000972",
        "order_id": "O202503310010",
        "amount": "-19.41",
        "reason": "delay",
        "created_at": "2025-03-31 10:41:53",
    }
    # every refund amount is negative and two-decimal — the dump's
    # NUMERIC(12,2) domain, which the pipeline's ADDITION convention
    # (net = gross + refund) depends on
    assert all(r["amount"].startswith("-") and "." in r["amount"] for r in refunds)


def test_spark_matches_pandas_twin_on_dump_data(spark, dump_dir):
    """Differential equivalence on the canonical rows: orders_clean and
    daily_city_sales agree column-for-column between the Spark pipeline
    and the literal pandas port."""
    from tests.test_freshkart_equivalence import _pandas_rows, _spark_rows

    fk = run_freshkart_pipeline(spark, dump_dir)
    twin = run_pandas_twin(dump_dir)

    cols = ["date", "city", "channel", "orders_count", "unique_customers",
            "items_sold", "gross_revenue_eur", "refunds_eur", "net_revenue_eur"]

    def _snap(rows):
        # money floats compared at the pipeline's OWN output contract
        # (the K1 CSV sink formats %.2f): the dump's denser refunds per
        # group expose engine-order float-sum tails the synthetic
        # fixture never hit — both engines agree at the cent
        return [
            t[:6] + tuple(round(x, 2) for x in t[6:]) for t in rows
        ]

    s = _snap(_spark_rows(fk["daily_city_sales"], cols))
    p = _snap(_pandas_rows(twin["daily_city_sales"], cols))
    assert len(s) == len(p) and len(s) > 0
    assert s == p

    # refund-mass conservation: every dump refund whose (synthesized)
    # order belongs to an ACTIVE dump customer must land in the daily
    # totals — the join-then-filter drops inactive customers' orders,
    # and the dump has real is_active=false rows, so the expected mass
    # is computed per the fixture's deterministic customer assignment
    customers, refunds = parse_dump()
    active = {
        c["customer_id"]
        for c in customers
        if str(c["is_active"]).strip().lower() in ("1", "true", "yes", "y", "t")
    }
    n_cust = len(customers)

    def order_customer(order_id: str) -> str:
        seq = int(order_id[-4:])
        return f"C{(seq * 37) % n_cust + 1:04d}"

    expected = round(
        sum(
            float(r["amount"])
            for r in refunds
            if order_customer(r["order_id"]) in active
        ),
        2,
    )
    landed = round(
        sum(r["refunds_eur"] for r in fk["daily_city_sales"].collect()), 2
    )
    assert abs(landed - expected) < 1e-6
    # and the inactive-customer path is genuinely exercised by the dump
    assert expected != round(sum(float(r["amount"]) for r in refunds), 2)
