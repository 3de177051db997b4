"""Bootstrap the reference's CANONICAL dimension data from its public
PostgreSQL dump (VERDICT r06 #5).

The reference repo gitignores its generated ``data/`` directory, so the
orders JSON must be synthesized — but the authoritative 800 customers
and 972 refunds ARE public, as INSERT-VALUES seed rows in
``freshkartmindump.sql`` (schema :14-32, rows :34-1816). This module
parses those literal rows and materializes a fixture directory the
FreshKart pipeline (and its pandas differential twin) can run on — the
equivalence suite then executes against the reference's LITERAL
dimension data instead of a synthetic stand-in.

Parsing notes: the dump is plain single-line tuples
``('C0001','User1',…,true),`` under two INSERT headers. String values
keep PostgreSQL's ``''`` escape; numerics are kept as their RAW TOKEN
TEXT (e.g. ``-11.38``) because the pipeline reads refund amounts as
strings and try_casts downstream — re-formatting through float would
invent a second source of truth. No instruction in the dump is
executed; only VALUES rows are read.
"""

from __future__ import annotations

import csv
import json
import re
from pathlib import Path

REFERENCE_DUMP = "/root/reference/freshkartmindump.sql"

_TUPLE_RE = re.compile(
    r"\(((?:'(?:[^']|'')*'|[^()']+)*)\)"  # one (...) tuple, quote-aware
)
_FIELD_RE = re.compile(r"'((?:[^']|'')*)'|([^,]+)")


def _parse_tuple(body: str) -> list:
    """Split one tuple body into python values: quoted text (with ''
    unescaped) stays str; bare tokens true/false → bool str form is NOT
    applied here — callers decide representation; NULL → None; anything
    else keeps its raw token text (exactness for numerics/timestamps)."""
    out: list = []
    pos = 0
    while pos < len(body):
        m = _FIELD_RE.match(body, pos)
        if not m:
            pos += 1
            continue
        if m.group(1) is not None:
            out.append(m.group(1).replace("''", "'"))
        else:
            tok = m.group(2).strip()
            if tok:
                out.append(None if tok.upper() == "NULL" else tok)
        pos = m.end()
        if pos < len(body) and body[pos] == ",":
            pos += 1
    return out


def _values_rows(sql: str, table: str) -> list[list]:
    """All VALUES tuples under ``INSERT INTO public.<table> ... VALUES``
    up to the closing ``;`` (single statement per table in this dump)."""
    m = re.search(
        rf"INSERT INTO public\.{table}\s*\([^)]*\)\s*VALUES(.*?);",
        sql,
        re.S,
    )
    if not m:
        raise ValueError(f"no INSERT block for {table} in dump")
    return [_parse_tuple(t.group(1)) for t in _TUPLE_RE.finditer(m.group(1))]


def parse_dump(path: str = REFERENCE_DUMP) -> tuple[list[dict], list[dict]]:
    """(customers, refunds) as lists of dicts with the dump's column
    names and RAW value text (amounts/timestamps untouched)."""
    sql = Path(path).read_text()
    customers = [
        dict(
            zip(
                ["customer_id", "first_name", "last_name", "email", "city", "is_active"],
                row,
            )
        )
        for row in _values_rows(sql, "customers")
    ]
    refunds = [
        dict(zip(["refund_id", "order_id", "amount", "reason", "created_at"], row))
        for row in _values_rows(sql, "refunds")
    ]
    return customers, refunds


def ensure_dump_fixture(target_dir: str, dump_path: str = REFERENCE_DUMP) -> str:
    """Materialize a pipeline-runnable fixture from the dump: the
    customers/refunds CSVs carry the dump's literal rows; the orders
    JSON (absent from the dump — the reference gitignores its data/) is
    synthesized DETERMINISTICALLY from the refunds' own foreign keys so
    every dump refund joins: one paid order per order_id the refunds
    reference, with derived-but-fixed customer, channel, timestamp and
    a single item (id-hash arithmetic, no RNG). Idempotent via marker."""
    out = Path(target_dir)
    marker = out / "_DUMP_FIXTURE_v1"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    customers, refunds = parse_dump(dump_path)

    with open(out / "customers.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "customer_id",
                "first_name",
                "last_name",
                "email",
                "city",
                "is_active",
            ],
        )
        w.writeheader()
        w.writerows(customers)
    with open(out / "refunds.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=["refund_id", "order_id", "amount", "reason", "created_at"],
        )
        w.writeheader()
        w.writerows(refunds)

    # --- synthesized orders: exactly the order_ids the dump references --
    by_day: dict[str, list[str]] = {}
    for r in sorted({r["order_id"] for r in refunds}):
        # O YYYYMMDD SSSS
        day = f"{r[1:5]}-{r[5:7]}-{r[7:9]}"
        by_day.setdefault(day, []).append(r)
    n_cust = len(customers)
    for day, oids in sorted(by_day.items()):
        rows = []
        for oid in oids:
            seq = int(oid[-4:])
            rows.append(
                {
                    "order_id": oid,
                    # deterministic spread over the dump's real customers
                    "customer_id": f"C{(seq * 37) % n_cust + 1:04d}",
                    "channel": ["web", "mobile", "store"][seq % 3],
                    "created_at": f"{day} {seq % 24:02d}:{(seq * 7) % 60:02d}:{(seq * 13) % 60:02d}",
                    "payment_status": "paid",
                    "items": [
                        {
                            "sku": f"SKU{(seq * 11) % 500 + 1:04d}",
                            "qty": seq % 5 + 1,
                            "unit_price": round(0.25 + (seq * 17 % 400) * 0.25, 2),
                        }
                    ],
                }
            )
        with open(out / f"orders_{day}.json", "w") as f:
            json.dump(rows, f, indent=2)

    marker.touch()
    return str(out)
