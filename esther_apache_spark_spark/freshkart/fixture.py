"""Deterministic FreshKart fixture generator (FIXTURES.md §1).

The reference's ``data/`` directory is gitignored (``.gitignore:14``), so
its inputs must be synthesized. This generator reproduces the documented
shape — 31 daily pretty-printed ``orders_YYYY-MM-DD.json`` files
(~103 orders/day, ``pipeline_pandas.py:64,72``), ``customers.csv`` (800
rows, dirty ``is_active``), ``refunds.csv`` (all-negative amounts plus a
few uncastable strings) — including every dirty-data case the pipeline's
cleaning paths exercise (FIXTURES.md §1.1 list).

Numeric exactness by construction: every price/amount is a multiple of
0.25, which is exactly representable in binary floating point, so sums
are bit-identical across engines and reduction orders — the fixture can
be hash-compared between Spark and DuckDB without rounding tolerance.
"""

from __future__ import annotations

import csv
import json
import random
from datetime import date, timedelta
from pathlib import Path

_VERSION = "v1"
_SEED = 7
_DAYS = 31
_ORDERS_PER_DAY = 103
_N_CUSTOMERS = 800

# Fixture lives inside the repo (gitignored) so the DuckDB oracle can
# read the same files by absolute path.
FIXTURE_DIR = str(Path(__file__).resolve().parents[2] / ".fixtures" / "freshkart")

_CITIES = [
    "Nice", "Marseille", "Paris", "Lille", "Lyon", "Toulouse", "Bordeaux", "Nantes",
]
_CHANNELS = ["web", "store", "app"]
_REASONS = ["delay", "item_issue", "gesture", "coupon"]
# Dirty is_active variants → (raw CSV value, cleaned boolean).
_IS_ACTIVE_VARIANTS = [
    ("1", True), ("true", True), ("yes", True), ("y", True), ("t", True),
    ("TRUE", True), (" True ", True), ("0", False), ("false", False),
    ("no", False), ("", False), ("n", False), ("False", False),
]

_WORDCOUNT_TEXT = """\
Spark counts words; Spark counts words fast.
The quick brown fox jumps over the lazy dog -- the DOG barks!
Data, data, data: everywhere data, and not a byte to waste.
"""


def _quarter(rng: random.Random, lo: float, hi: float) -> float:
    """A price that is an exact multiple of 0.25 within [lo, hi]."""
    return rng.randrange(int(lo * 4), int(hi * 4) + 1) / 4.0


def ensure_fixture(target_dir: str = FIXTURE_DIR) -> str:
    """Generate the fixture if absent (idempotent, seeded). Returns the dir."""
    out = Path(target_dir)
    marker = out / f"_FIXTURE_{_VERSION}_seed{_SEED}"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    rng = random.Random(_SEED)

    # --- customers.csv ----------------------------------------------------
    customers = []
    for i in range(1, _N_CUSTOMERS + 1):
        raw, active = rng.choice(_IS_ACTIVE_VARIANTS) if rng.random() < 0.45 else (
            ("true", True) if rng.random() < 0.8 else ("false", False)
        )
        customers.append(
            {
                "customer_id": f"C{i:04d}",
                "first_name": f"User{i}",
                "last_name": f"Test{i}",
                "email": f"user{i}@example.com",
                "city": rng.choice(_CITIES),
                "is_active": raw,
                "_active": active,
            }
        )
    with open(out / "customers.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=["customer_id", "first_name", "last_name", "email", "city", "is_active"],
            extrasaction="ignore",
        )
        w.writeheader()
        w.writerows(customers)

    # --- orders_YYYY-MM-DD.json ------------------------------------------
    start = date(2025, 3, 1)
    paid_order_ids: list[str] = []
    first_day_rows = None
    for d in range(_DAYS):
        day = start + timedelta(days=d)
        rows = []
        for seq in range(1, _ORDERS_PER_DAY + 1):
            order_id = f"O{day.strftime('%Y%m%d')}{seq:04d}"
            # ~2% unknown customer ids (dropped by the join-then-filter)
            cust = (
                f"C{rng.randint(900, 999):04d}XX"
                if rng.random() < 0.02
                else f"C{rng.randint(1, _N_CUSTOMERS):04d}"
            )
            ts = f"{day.isoformat()} {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
            created_at = day.isoformat() if rng.random() < 0.10 else ts
            status = "paid" if rng.random() < 0.85 else rng.choice(
                ["pending", "failed", "refused"]
            )
            items = [
                {
                    "sku": f"SKU{rng.randint(1, 500):04d}",
                    "qty": rng.randint(1, 5),
                    # ~2.5% negative unit prices → quarantine path
                    "unit_price": (
                        -_quarter(rng, 0.25, 60.0)
                        if rng.random() < 0.025
                        else _quarter(rng, 0.25, 120.0)
                    ),
                }
                for _ in range(rng.randint(1, 4))
            ]
            row = {
                "order_id": order_id,
                "customer_id": cust,
                "channel": rng.choice(_CHANNELS),
                "created_at": created_at,
                "payment_status": status,
                "items": items,
            }
            rows.append(row)
            if status == "paid":
                paid_order_ids.append(order_id)
            # ~5% duplicated order rows → keep-first-by-created_at dedup.
            if rng.random() < 0.05:
                dup = dict(row)
                if rng.random() < 0.3:
                    # exact created_at tie — pins the deterministic
                    # tiebreaker divergence (SURVEY.md §2.6 note)
                    dup["items"] = [
                        {"sku": "SKU0001", "qty": 9, "unit_price": 0.25}
                    ]
                else:
                    dup["created_at"] = f"{day.isoformat()} 23:59:59"
                    dup["items"] = items[:1]
                rows.append(dup)
        if first_day_rows is None:
            first_day_rows = rows
        with open(out / f"orders_{day.isoformat()}.json", "w") as f:
            json.dump(rows, f, indent=2)  # pretty-printed → multiLine read

    # --- refunds.csv ------------------------------------------------------
    refunds = []
    seq = 1
    for oid in paid_order_ids:
        if rng.random() < 0.30:
            for _ in range(1 if rng.random() < 0.8 else 2):
                amount = (
                    rng.choice(["N/A", "err", "??"])  # uncastable → 0.0 fill
                    if rng.random() < 0.02
                    else f"{-_quarter(rng, 0.25, 80.0):.2f}"
                )
                refunds.append(
                    {
                        "refund_id": f"R{seq:06d}",
                        "order_id": oid,
                        "amount": amount,
                        "reason": rng.choice(_REASONS),
                        "created_at": f"2025-04-{rng.randint(1, 28):02d} "
                        f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}",
                    }
                )
                seq += 1
    with open(out / "refunds.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["refund_id", "order_id", "amount", "reason", "created_at"]
        )
        w.writeheader()
        w.writerows(refunds)

    # --- data.txt (word-count fixture, FIXTURES.md §1.5) ------------------
    (out / "data.txt").write_text(_WORDCOUNT_TEXT)

    marker.touch()
    return str(out)
