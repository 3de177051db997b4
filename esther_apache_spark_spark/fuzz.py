"""Differential SQL fuzzer: seeded random queries, Spark vs DuckDB.

The fixed catalog (`plans/`) pins ~160 hand-written queries to DuckDB
oracles. This module adds the complementary axis: *generated* queries.
Each seed deterministically expands to one SQL string drawn from a
grammar restricted to the dialect subset where Spark SQL and DuckDB
must agree bit-for-bit:

- aggregates over money columns go through ``CAST(x AS DECIMAL(18,2))``
  and come back as ``CAST(ROUND(.., 2) AS DOUBLE)`` so floating-point
  summation order (which Spark's partial aggregation deliberately does
  not fix) cannot produce spurious diffs — the same discipline every
  hand-written catalog oracle follows;
- integer aggregates are cast to BIGINT on both sides (DuckDB's
  ``SUM(BIGINT)`` widens to HUGEINT, which its pandas bridge would
  otherwise render as float64);
- window frames are fully ordered by the table's unique key so running
  sums and row_numbers are deterministic;
- ``ORDER BY .. LIMIT`` always appends the unique key as the final sort
  tiebreak, making the *selected row set* deterministic even though the
  comparison itself is order-insensitive;
- LEFT-join predicates stay on the preserved side so null-extension
  semantics are actually exercised rather than silently collapsed to an
  inner join.

Literals are sampled from the actual data (via DuckDB, deterministic
ORDER BY everywhere) so predicates are selective rather than vacuous.

Scale posture: the fuzzer is a correctness harness, not a benchmark —
it runs at sf0.001 in CI. But every generated shape is one the engine
claims to support at 100 TB (scans with pushable predicates, FK-chain
equi-joins, partial-aggregable GROUP BYs, single-shuffle windows), so a
divergence here is a real engine bug, not a test artifact.
"""

from __future__ import annotations

import datetime
import math
import random
from dataclasses import dataclass, field

import pandas as pd

__all__ = ["build_stats", "generate_query", "canonicalize", "run_differential"]


# ---------------------------------------------------------------------------
# Table metadata: the grammar's universe.
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TableMeta:
    name: str
    unique: tuple[str, ...]  # row-identity columns used in projections
    ints: tuple[str, ...] = ()
    doubles: tuple[str, ...] = ()
    cats: tuple[str, ...] = ()  # low-cardinality filter/group columns
    strings: tuple[str, ...] = ()  # free-text-ish strings
    ts: tuple[str, ...] = ()
    # Columns whose combination totally orders the table (up to rows that
    # are identical in ALL of them, which are interchangeable and so give
    # deterministic window/top-k output anyway). Defaults to `unique`;
    # lineitem overrides with every column because the synthetic data has
    # no short unique key ((l_orderkey, l_linenumber) carries duplicates).
    tiebreak_cols: tuple[str, ...] = ()

    @property
    def all_cols(self) -> tuple[str, ...]:
        seen: dict[str, None] = {}
        for group in (self.unique, self.ints, self.doubles, self.cats, self.strings, self.ts):
            for c in group:
                seen.setdefault(c, None)
        return tuple(seen)

    @property
    def tiebreak(self) -> tuple[str, ...]:
        return self.tiebreak_cols or self.unique


TABLES: dict[str, TableMeta] = {
    "lineitem": TableMeta(
        "lineitem",
        unique=("l_orderkey", "l_linenumber"),
        ints=("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        doubles=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        cats=("l_returnflag", "l_linestatus"),
        ts=("l_shipdate",),
        tiebreak_cols=(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
    ),
    "orders": TableMeta(
        "orders",
        unique=("o_orderkey",),
        ints=("o_orderkey", "o_custkey"),
        doubles=("o_totalprice",),
        cats=("o_orderstatus", "o_orderpriority"),
        ts=("o_orderdate",),
    ),
    "customer": TableMeta(
        "customer",
        unique=("c_custkey",),
        ints=("c_custkey", "c_nationkey"),
        doubles=("c_acctbal",),
        cats=("c_mktsegment",),
        strings=("c_name",),
    ),
    "part": TableMeta(
        "part",
        unique=("p_partkey",),
        ints=("p_partkey", "p_size"),
        doubles=("p_retailprice",),
        cats=("p_brand", "p_type"),
        strings=("p_name",),
    ),
    "supplier": TableMeta(
        "supplier",
        unique=("s_suppkey",),
        ints=("s_suppkey", "s_nationkey"),
        doubles=("s_acctbal",),
        strings=("s_name",),
    ),
    "nation": TableMeta(
        "nation",
        unique=("n_nationkey",),
        ints=("n_nationkey", "n_regionkey"),
        cats=("n_name",),
    ),
    "events": TableMeta(
        "events",
        unique=("event_id",),
        ints=("event_id", "user_id"),
        doubles=("value",),
        cats=("event_type",),
        ts=("ts",),
    ),
    "documents": TableMeta(
        "documents",
        unique=("doc_id",),
        ints=("doc_id", "n_chars"),
        cats=("lang", "source"),
        strings=("text",),
    ),
}

# The synthetic TPC-H-ish testdata is nearly NULL-free, so NULL
# semantics — where engines genuinely differ — would go unexercised.
# `nullish` is a deterministic fixture generated by ensure_nullish():
# a nullable int key with hash-planted NULLs (≈1/7 of rows), a double
# that is NULL for one whole group (all-NULL aggregates), strings mixing
# NULL and '' (distinct values that sloppy code conflates), a nullable
# timestamp, and a NULL-free category. Its queries exercise grouping by
# NULL keys, COUNT(col) vs COUNT(*), SUM over all-NULL groups, IS [NOT]
# NULL pushdown, and NULL-key join behavior.
NULLISH = TableMeta(
    "nullish",
    unique=("id",),
    ints=("id", "k"),
    doubles=("v",),
    cats=("cat",),
    strings=("s",),
    ts=("t",),
)

NULLISH_ROWS = 4000


def ensure_nullish(path: str) -> str:
    """Write the deterministic NULL-rich parquet fixture (idempotent);
    returns the parquet file path. Pure-arithmetic construction — no
    RNG — so both engines and every run see identical bytes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    fp = os.path.join(path, "nullish.parquet")
    if os.path.exists(fp):
        return fp
    os.makedirs(path, exist_ok=True)
    ids = list(range(NULLISH_ROWS))
    k = [None if i % 7 == 3 else (i * 13) % 50 for i in ids]
    # group cat='g3' (i%5==3) carries only NULL doubles → all-NULL SUM
    v = [
        None if (i % 5 == 3 or i % 11 == 7) else round((i * 37 % 1000) / 4.0, 2)
        for i in ids
    ]
    s = [
        None if i % 6 == 1 else ("" if i % 6 == 4 else f"w{(i * 7) % 23:02d}")
        for i in ids
    ]
    t = [
        None
        if i % 9 == 5
        else datetime.datetime(2024, 1 + (i % 12), 1 + (i % 28), i % 24, i % 60, 0)
        for i in ids
    ]
    cat = [f"g{i % 5}" for i in ids]
    table = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "k": pa.array(k, pa.int32()),
            "v": pa.array(v, pa.float64()),
            "s": pa.array(s, pa.string()),
            "t": pa.array(t, pa.timestamp("us")),
            "cat": pa.array(cat, pa.string()),
        }
    )
    pq.write_table(table, fp)
    return fp


# FK edges (left_table, right_table, left_key, right_key). LEFT joins
# preserve the first table; chains extend right along these edges.
JOIN_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
)


# ---------------------------------------------------------------------------
# Literal pools, sampled once per sf_dir from the real data.
# ---------------------------------------------------------------------------
@dataclass
class ColumnStats:
    numeric_points: dict[str, list[float]] = field(default_factory=dict)
    int_points: dict[str, list[int]] = field(default_factory=dict)
    cat_values: dict[str, list[str]] = field(default_factory=dict)
    str_prefixes: dict[str, list[str]] = field(default_factory=dict)
    ts_points: dict[str, list[str]] = field(default_factory=dict)


def build_stats(sf_dir: str) -> ColumnStats:
    """Sample literal pools from the parquet tables (deterministic:
    every sampling query is fully ORDER BY'd)."""
    import duckdb

    con = duckdb.connect()
    stats = ColumnStats()
    try:
        for t in TABLES.values():
            view = f"read_parquet('{sf_dir}/{t.name}.parquet')"
            for c in t.doubles:
                lo, hi = con.execute(
                    f"SELECT min({c}), max({c}) FROM {view}"
                ).fetchone()
                lo, hi = float(lo), float(hi)
                pts = [round(lo + (hi - lo) * f, 2) for f in (0.2, 0.4, 0.6, 0.8)]
                stats.numeric_points[f"{t.name}.{c}"] = pts
            for c in t.ints:
                lo, hi = con.execute(
                    f"SELECT min({c}), max({c}) FROM {view}"
                ).fetchone()
                lo, hi = int(lo), int(hi)
                pts = sorted({lo + (hi - lo) * k // 5 for k in (1, 2, 3, 4)})
                stats.int_points[f"{t.name}.{c}"] = [int(p) for p in pts]
            for c in t.cats:
                vals = [
                    r[0]
                    for r in con.execute(
                        f"SELECT DISTINCT {c} FROM {view} WHERE {c} IS NOT NULL ORDER BY {c} LIMIT 8"
                    ).fetchall()
                ]
                stats.cat_values[f"{t.name}.{c}"] = vals
            for c in t.strings:
                rows = con.execute(
                    f"SELECT {c} FROM {view} WHERE {c} IS NOT NULL AND length({c}) >= 2 "
                    f"ORDER BY {', '.join(t.unique)} LIMIT 5"
                ).fetchall()
                stats.str_prefixes[f"{t.name}.{c}"] = sorted(
                    {str(r[0])[:2] for r in rows if r[0]}
                )
            for c in t.ts:
                lo, hi = con.execute(
                    f"SELECT min({c}), max({c}) FROM {view}"
                ).fetchone()
                span = (hi - lo).total_seconds()
                pts = [
                    (lo + datetime.timedelta(seconds=span * f)).strftime(
                        "%Y-%m-%d %H:%M:%S"
                    )
                    for f in (0.25, 0.5, 0.75)
                ]
                stats.ts_points[f"{t.name}.{c}"] = pts
    finally:
        con.close()
    return stats


# ---------------------------------------------------------------------------
# Expression generators. Every helper takes the seeded Random.
# ---------------------------------------------------------------------------
def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _num_lit(r: random.Random, stats: ColumnStats, table: str, col: str) -> str:
    pts = stats.numeric_points.get(f"{table}.{col}")
    if pts:
        return repr(r.choice(pts))
    return repr(round(r.uniform(0, 100), 2))


def _int_lit(r: random.Random, stats: ColumnStats, table: str, col: str) -> str:
    pts = stats.int_points.get(f"{table}.{col}")
    if pts:
        return str(r.choice(pts))
    return str(r.randint(0, 1000))


def _predicate(r: random.Random, stats: ColumnStats, t: TableMeta, n_max: int = 3) -> str:
    """1..n_max conjuncts/disjuncts over one table's columns."""
    conjuncts: list[str] = []
    for _ in range(r.randint(1, n_max)):
        kind_pool: list[str] = []
        if t.doubles:
            kind_pool.append("double")
        if t.ints:
            kind_pool.append("int")
        if t.cats and any(stats.cat_values.get(f"{t.name}.{c}") for c in t.cats):
            kind_pool.append("cat")
        if t.strings and any(stats.str_prefixes.get(f"{t.name}.{c}") for c in t.strings):
            kind_pool.append("str")
        if t.ts:
            kind_pool.append("ts")
        kind = r.choice(kind_pool)
        if kind == "double":
            c = r.choice(t.doubles)
            op = r.choice(["<", "<=", ">", ">="])
            conjuncts.append(f"{c} {op} {_num_lit(r, stats, t.name, c)}")
        elif kind == "int":
            c = r.choice(t.ints)
            if r.random() < 0.3:
                a = _int_lit(r, stats, t.name, c)
                b = _int_lit(r, stats, t.name, c)
                lo, hi = sorted((int(a), int(b)))
                conjuncts.append(f"{c} BETWEEN {lo} AND {hi}")
            else:
                op = r.choice(["<", "<=", ">", ">=", "<>"])
                conjuncts.append(f"{c} {op} {_int_lit(r, stats, t.name, c)}")
        elif kind == "cat":
            cands = [c for c in t.cats if stats.cat_values.get(f"{t.name}.{c}")]
            c = r.choice(cands)
            vals = stats.cat_values[f"{t.name}.{c}"]
            if len(vals) >= 2 and r.random() < 0.5:
                chosen = r.sample(vals, k=min(len(vals), r.randint(2, 4)))
                conjuncts.append(f"{c} IN ({', '.join(_sql_str(v) for v in sorted(chosen))})")
            else:
                op = r.choice(["=", "<>"])
                conjuncts.append(f"{c} {op} {_sql_str(r.choice(vals))}")
        elif kind == "str":
            cands = [c for c in t.strings if stats.str_prefixes.get(f"{t.name}.{c}")]
            c = r.choice(cands)
            if r.random() < 0.6:
                pfx = r.choice(stats.str_prefixes[f"{t.name}.{c}"])
                conjuncts.append(f"{c} LIKE {_sql_str(pfx + '%')}")
            else:
                conjuncts.append(f"LENGTH({c}) > {r.randint(2, 20)}")
        else:  # ts
            c = r.choice(t.ts)
            pts = stats.ts_points[f"{t.name}.{c}"]
            if len(pts) >= 2 and r.random() < 0.4:
                lo, hi = sorted(r.sample(pts, k=2))
                conjuncts.append(
                    f"{c} BETWEEN TIMESTAMP '{lo}' AND TIMESTAMP '{hi}'"
                )
            else:
                op = r.choice([">=", "<"])
                conjuncts.append(f"{c} {op} TIMESTAMP '{r.choice(pts)}'")
    if len(conjuncts) == 1:
        return conjuncts[0]
    glue = " AND " if r.random() < 0.7 else " OR "
    return "(" + glue.join(conjuncts) + ")"


def _computed_item(r: random.Random, stats: ColumnStats, t: TableMeta, idx: int) -> str:
    """One derived select item with a stable alias."""
    choices: list[str] = []
    if t.doubles:
        choices += ["arith", "case"]
    if t.strings:
        choices += ["upper", "substr", "length"]
    if t.ts:
        choices.append("year")
    if t.ints:
        choices.append("case_int")
    kind = r.choice(choices or ["count_star_placeholder"])
    alias = f"c{idx}"
    if kind == "arith":
        a, b = r.choice(t.doubles), r.choice(t.doubles)
        op = r.choice(["+", "-", "*"])
        return (
            f"CAST(ROUND(CAST({a} AS DECIMAL(18,2)) {op} CAST({b} AS DECIMAL(18,2)), 2)"
            f" AS DOUBLE) AS {alias}"
        )
    if kind == "case":
        c = r.choice(t.doubles)
        lit = _num_lit(r, stats, t.name, c)
        return f"CASE WHEN {c} > {lit} THEN 'hi' ELSE 'lo' END AS {alias}"
    if kind == "case_int":
        c = r.choice(t.ints)
        lit = _int_lit(r, stats, t.name, c)
        return f"CASE WHEN {c} > {lit} THEN {c} ELSE 0 END AS {alias}"
    if kind == "upper":
        return f"UPPER({r.choice(t.strings)}) AS {alias}"
    if kind == "substr":
        return f"SUBSTR({r.choice(t.strings)}, 1, {r.randint(1, 6)}) AS {alias}"
    if kind == "length":
        return f"LENGTH({r.choice(t.strings)}) AS {alias}"
    if kind == "year":
        return f"CAST(EXTRACT(YEAR FROM {r.choice(t.ts)}) AS INT) AS {alias}"
    return f"1 AS {alias}"


def _agg_items(r: random.Random, t: TableMeta, prefix: str = "") -> list[str]:
    items = [f"CAST(COUNT(*) AS BIGINT) AS {prefix}cnt"]
    n_extra = r.randint(1, 3)
    pool: list[str] = []
    for c in t.doubles:
        pool.append(
            f"CAST(ROUND(SUM(CAST({c} AS DECIMAL(18,2))), 2) AS DOUBLE) AS {prefix}sum_{c}"
        )
        pool.append(f"MIN({c}) AS {prefix}min_{c}")
        pool.append(f"MAX({c}) AS {prefix}max_{c}")
    for c in t.ints:
        pool.append(f"CAST(SUM({c}) AS BIGINT) AS {prefix}isum_{c}")
        pool.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {prefix}nd_{c}")
    for c in t.cats:
        pool.append(f"MIN({c}) AS {prefix}min_{c}")
    r.shuffle(pool)
    items.extend(pool[:n_extra])
    return items


# ---------------------------------------------------------------------------
# Query templates.
# ---------------------------------------------------------------------------
def _q_filter_project(r: random.Random, stats: ColumnStats) -> str:
    t = TABLES[r.choice(["lineitem", "orders", "customer", "part", "supplier", "events", "documents"])]
    cols = list(t.unique)
    extra = [c for c in t.all_cols if c not in cols]
    r.shuffle(extra)
    cols += extra[: r.randint(1, 3)]
    items = list(cols)
    for i in range(r.randint(0, 2)):
        items.append(_computed_item(r, stats, t, i))
    pred = _predicate(r, stats, t)
    distinct = "DISTINCT " if r.random() < 0.15 else ""
    return f"SELECT {distinct}{', '.join(items)} FROM {t.name} WHERE {pred}"


def _q_groupby(r: random.Random, stats: ColumnStats) -> str:
    t = TABLES[r.choice(["lineitem", "orders", "customer", "part", "events", "documents"])]
    keys: list[str] = []
    if t.cats:
        keys.append(r.choice(t.cats))
    if t.ts and r.random() < 0.4:
        c = r.choice(t.ts)
        keys.append(f"CAST(EXTRACT(MONTH FROM {c}) AS INT)")
    if not keys:
        keys.append(r.choice(t.ints))
    key_aliases = [f"k{i}" for i in range(len(keys))]
    key_items = [f"{k} AS {a}" for k, a in zip(keys, key_aliases)]
    items = key_items + _agg_items(r, t)
    pred = _predicate(r, stats, t)
    having = ""
    if r.random() < 0.4:
        having = f" HAVING COUNT(*) > {r.randint(1, 20)}"
    return (
        f"SELECT {', '.join(items)} FROM {t.name} WHERE {pred} "
        f"GROUP BY {', '.join(keys)}{having}"
    )


def _q_join(r: random.Random, stats: ColumnStats) -> str:
    edge = r.choice(JOIN_EDGES)
    lt, rt = TABLES[edge[0]], TABLES[edge[1]]
    join_kind = r.choice(["JOIN", "JOIN", "LEFT JOIN"])
    on = f"{edge[0]}.{edge[2]} = {edge[1]}.{edge[3]}"
    # Optionally extend the chain one more hop from the right table.
    more = [e for e in JOIN_EDGES if e[0] == rt.name]
    third = r.choice(more) if more and r.random() < 0.4 else None
    tables_sql = f"{lt.name} {join_kind} {rt.name} ON {on}"
    if third is not None:
        tables_sql += (
            f" {join_kind} {third[1]} ON {third[0]}.{third[2]} = {third[1]}.{third[3]}"
        )
    preds = [_predicate(r, stats, lt, n_max=2)]
    if join_kind == "JOIN" and r.random() < 0.6:
        preds.append(_predicate(r, stats, rt, n_max=2))
    where = " AND ".join(preds)
    if r.random() < 0.5 and rt.cats:
        # group the join by a right-side categorical
        key = r.choice(rt.cats)
        items = [f"{key} AS k0"] + _agg_items(r, lt)
        return (
            f"SELECT {', '.join(items)} FROM {tables_sql} WHERE {where} GROUP BY {key}"
        )
    cols = [f"{lt.name}.{c}" for c in lt.unique]
    rcols = [c for c in rt.all_cols if c not in rt.unique] or list(rt.unique)
    r.shuffle(rcols)
    cols += [f"{rt.name}.{c}" for c in rcols[:2]]
    return f"SELECT {', '.join(cols)} FROM {tables_sql} WHERE {where}"


def _q_window(r: random.Random, stats: ColumnStats) -> str:
    # ORDER BY the full tiebreak column set with explicit NULLS LAST:
    # Spark defaults ASC to NULLS FIRST while DuckDB defaults to NULLS
    # LAST, and rows tied on a partial ordering would make ROWS frames
    # engine-dependent. Ties are then only possible between rows equal
    # in every tiebreak column, which produce identical output rows.
    t = TABLES[r.choice(["lineitem", "orders", "events"])]
    part = r.choice(t.cats) if t.cats else t.ints[0]
    order = ", ".join(f"{c} NULLS LAST" for c in t.tiebreak)
    v = r.choice(t.doubles)
    pred = _predicate(r, stats, t, n_max=2)
    frame = r.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {r.randint(1, 5)} PRECEDING AND CURRENT ROW",
        ]
    )
    return (
        f"SELECT {', '.join(t.unique)}, "
        f"CAST(ROUND(SUM(CAST({v} AS DECIMAL(18,2))) OVER "
        f"(PARTITION BY {part} ORDER BY {order} {frame}), 2) AS DOUBLE) AS running, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order}) AS BIGINT) AS rn "
        f"FROM {t.name} WHERE {pred}"
    )


def _q_setop(r: random.Random, stats: ColumnStats) -> str:
    t = TABLES[r.choice(["orders", "customer", "part", "events", "documents"])]
    cols = list(t.unique) + list(t.cats[:1])
    op = r.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
    p1 = _predicate(r, stats, t, n_max=2)
    p2 = _predicate(r, stats, t, n_max=2)
    sel = f"SELECT {', '.join(cols)} FROM {t.name}"
    return f"{sel} WHERE {p1} {op} {sel} WHERE {p2}"


def _q_exists(r: random.Random, stats: ColumnStats) -> str:
    neg = "NOT " if r.random() < 0.4 else ""
    outer, inner, ok, ik = r.choice(
        [
            ("orders", "lineitem", "o_orderkey", "l_orderkey"),
            ("customer", "orders", "c_custkey", "o_custkey"),
            ("part", "lineitem", "p_partkey", "l_partkey"),
            ("supplier", "lineitem", "s_suppkey", "l_suppkey"),
        ]
    )
    ot, it = TABLES[outer], TABLES[inner]
    opred = _predicate(r, stats, ot, n_max=2)
    ipred = _predicate(r, stats, it, n_max=2)
    cols = list(ot.unique) + [c for c in ot.all_cols if c not in ot.unique][:2]
    return (
        f"SELECT {', '.join(cols)} FROM {outer} WHERE {opred} AND {neg}EXISTS "
        f"(SELECT 1 FROM {inner} WHERE {inner}.{ik} = {outer}.{ok} AND {ipred})"
    )


def _q_topk(r: random.Random, stats: ColumnStats) -> str:
    # The LIMIT'd row set is deterministic only under a total order:
    # sort key first, then the full tiebreak column set, all with
    # explicit NULLS LAST (Spark and DuckDB default differently).
    t = TABLES[r.choice(["lineitem", "orders", "customer", "part", "events"])]
    sort_col = r.choice(t.doubles or t.ints)
    direction = r.choice(["ASC", "DESC"])
    pred = _predicate(r, stats, t, n_max=2)
    cols = list(t.unique) + [sort_col] if sort_col not in t.unique else list(t.unique)
    tiebreak = ", ".join(f"{c} NULLS LAST" for c in t.tiebreak)
    return (
        f"SELECT {', '.join(dict.fromkeys(cols))} FROM {t.name} WHERE {pred} "
        f"ORDER BY {sort_col} {direction} NULLS LAST, {tiebreak} "
        f"LIMIT {r.choice([5, 20, 100])}"
    )


def _q_rollup(r: random.Random, stats: ColumnStats) -> str:
    # Hierarchical grouping: ROLLUP/CUBE emit NULL placeholders for the
    # aggregated-out keys in both engines, which the canonicalizer
    # renders identically.
    t = TABLES[r.choice(["lineitem", "orders", "events", "documents"])]
    keys = list(t.cats[:2])
    if len(keys) < 2 and t.ints:
        keys.append(t.ints[-1])
    op = r.choice(["ROLLUP", "CUBE"])
    items = [f"{k} AS k{i}" for i, k in enumerate(keys)] + _agg_items(r, t)
    pred = _predicate(r, stats, t, n_max=2)
    # HAVING COUNT(*) > 0 is a no-op on every real group but masks a
    # known dialect divergence the fuzzer itself found: on an EMPTY
    # input, the standard (and DuckDB) emit the ()-grouping-set grand
    # total row with count 0, while Spark propagates the empty relation
    # and returns no rows. Pinned explicitly in
    # tests/test_differential_fuzz.py::test_known_divergence_cube_on_empty_input.
    return (
        f"SELECT {', '.join(items)} FROM {t.name} WHERE {pred} "
        f"GROUP BY {op}({', '.join(keys)}) HAVING COUNT(*) > 0"
    )


def _q_conditional_agg(r: random.Random, stats: ColumnStats) -> str:
    # Pivot-style conditional aggregation, optionally gated by an exact
    # scalar subquery (MIN/MAX only — AVG over doubles is summation-
    # order-dependent and would flip boundary rows between engines).
    t = TABLES[r.choice(["lineitem", "orders", "customer", "events"])]
    key = r.choice(t.cats) if t.cats else t.ints[-1]
    branches = []
    for i in range(r.randint(1, 3)):
        p = _predicate(r, stats, t, n_max=1)
        branches.append(
            f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS b{i}"
        )
    where = _predicate(r, stats, t, n_max=2)
    if t.doubles and r.random() < 0.5:
        c = r.choice(t.doubles)
        fn = r.choice(["MIN", "MAX"])
        where = f"{where} AND {c} <= (SELECT {fn}({c}) FROM {t.name})"
    items = [f"{key} AS k0", "CAST(COUNT(*) AS BIGINT) AS cnt"] + branches
    return f"SELECT {', '.join(items)} FROM {t.name} WHERE {where} GROUP BY {key}"


def _q_antijoin_nullcheck(r: random.Random, stats: ColumnStats) -> str:
    # The LEFT JOIN ... IS NULL anti-join idiom (distinct from EXISTS):
    # exercises null-extension plus post-join filtering.
    outer, inner, ok, ik = r.choice(
        [
            ("orders", "lineitem", "o_orderkey", "l_orderkey"),
            ("customer", "orders", "c_custkey", "o_custkey"),
            ("part", "lineitem", "p_partkey", "l_partkey"),
        ]
    )
    ot, it = TABLES[outer], TABLES[inner]
    opred = _predicate(r, stats, ot, n_max=2)
    ipred = _predicate(r, stats, it, n_max=1)
    cols = [f"{outer}.{c}" for c in ot.unique]
    return (
        f"SELECT {', '.join(cols)} FROM {outer} LEFT JOIN "
        f"(SELECT {ik} FROM {inner} WHERE {ipred}) hits "
        f"ON {outer}.{ok} = hits.{ik} "
        f"WHERE {opred} AND hits.{ik} IS NULL"
    )


def _null_pred(r: random.Random, n_max: int = 3, prefix: str = "") -> str:
    """Predicates over the nullish fixture: three-valued logic, IS
    [NOT] NULL, the ''-vs-NULL distinction. ``prefix`` qualifies the
    columns (e.g. ``"a."``) for self-joins."""
    p = prefix
    pool = [
        f"{p}k IS NULL",
        f"{p}k IS NOT NULL",
        f"{p}k < {r.randint(5, 45)}",
        f"{p}v IS NULL",
        f"{p}v >= {round(r.uniform(10.0, 200.0), 2)}",
        f"{p}s IS NULL",
        f"{p}s = ''",
        f"{p}s <> ''",
        f"{p}s LIKE 'w1%'",
        f"{p}t IS NULL",
        f"{p}t >= TIMESTAMP '2024-06-01 00:00:00'",
        f"{p}cat IN ({', '.join(sorted(_sql_str('g' + str(g)) for g in r.sample(range(5), 2)))})",
    ]
    conjuncts = [r.choice(pool) for _ in range(r.randint(1, n_max))]
    if len(conjuncts) == 1:
        return conjuncts[0]
    glue = " AND " if r.random() < 0.6 else " OR "
    return "(" + glue.join(conjuncts) + ")"


def _q_range_window(r: random.Random, stats: ColumnStats) -> str:
    # Value-based RANGE frame over an integer ORDER BY: rows tied on the
    # order value are peers sharing one frame, so the result is
    # deterministic WITHOUT a total order — the property ROWS frames
    # lack. Both engines evaluate numeric RANGE offsets identically.
    t = TABLES[r.choice(["lineitem", "orders", "events", "customer"])]
    order_col = r.choice(t.ints)
    v = r.choice(t.doubles)
    part = r.choice(t.cats) if t.cats and r.random() < 0.7 else None
    width = r.choice([1, 5, 50, 1000])
    over = (
        f"PARTITION BY {part} ORDER BY {order_col} " if part else f"ORDER BY {order_col} "
    )
    pred = _predicate(r, stats, t, n_max=2)
    proj = list(dict.fromkeys(list(t.unique) + [order_col]))
    return (
        f"SELECT {', '.join(proj)}, "
        f"CAST(ROUND(SUM(CAST({v} AS DECIMAL(18,2))) OVER "
        f"({over}RANGE BETWEEN {width} PRECEDING AND CURRENT ROW), 2) AS DOUBLE)"
        f" AS range_sum "
        f"FROM {t.name} WHERE {pred}"
    )


def _q_multi_distinct(r: random.Random, stats: ColumnStats) -> str:
    """Several DISTINCT aggregates over DIFFERENT columns in one query —
    the shape Spark plans with an Expand ×(n_distinct+1) rewrite while
    DuckDB aggregates natively, so any slip in the rewrite (double
    counting, NULL handling, FILTER interaction) diverges immediately.
    Mixes COUNT(DISTINCT)/SUM(DISTINCT) with plain aggregates, optional
    FILTER clauses on the non-distinct ones, and a nullish variant where
    whole groups have only-NULL distinct inputs."""
    if r.random() < 0.3:
        key = r.choice(["cat", "k"])
        return (
            f"SELECT {key} AS k0, "
            f"CAST(COUNT(DISTINCT k) AS BIGINT) AS nd_k, "
            f"CAST(COUNT(DISTINCT s) AS BIGINT) AS nd_s, "
            f"CAST(SUM(DISTINCT k) AS BIGINT) AS sd_k, "
            f"CAST(COUNT(*) FILTER (WHERE v IS NOT NULL) AS BIGINT) AS cnt_v "
            f"FROM nullish WHERE {_null_pred(r)} GROUP BY {key}"
        )
    t = TABLES[r.choice(["lineitem", "orders", "events", "customer", "documents"])]
    dcols: list[str] = []
    pool = list(t.ints) + list(t.cats)
    r.shuffle(pool)
    dcols = pool[: r.randint(2, min(3, len(pool)))]
    items = ["CAST(COUNT(*) AS BIGINT) AS cnt"]
    for i, c in enumerate(dcols):
        items.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd{i}")
    if t.ints and r.random() < 0.6:
        items.append(f"CAST(SUM(DISTINCT {r.choice(t.ints)}) AS BIGINT) AS sdist")
    if t.doubles and r.random() < 0.5:
        v = r.choice(t.doubles)
        fpred = _predicate(r, stats, t, n_max=1)
        items.append(
            f"CAST(ROUND(SUM(CAST({v} AS DECIMAL(18,2))) "
            f"FILTER (WHERE {fpred}), 2) AS DOUBLE) AS fsum"
        )
    pred = _predicate(r, stats, t, n_max=2)
    if t.cats and r.random() < 0.6:
        key = r.choice(t.cats)
        return (
            f"SELECT {key} AS k0, {', '.join(items)} FROM {t.name} "
            f"WHERE {pred} GROUP BY {key}"
        )
    return f"SELECT {', '.join(items)} FROM {t.name} WHERE {pred}"


def _q_nullish(r: random.Random, stats: ColumnStats) -> str:
    """One of several NULL-semantics shapes over the nullish fixture."""
    shape = r.choice(["groupby", "filter", "selfjoin", "distinct", "setop"])
    if shape == "groupby":
        key = r.choice(["k", "cat", "s"])
        return (
            f"SELECT {key} AS k0, CAST(COUNT(*) AS BIGINT) AS cnt, "
            f"CAST(COUNT(v) AS BIGINT) AS cnt_v, "  # COUNT(col) skips NULLs
            f"CAST(ROUND(SUM(CAST(v AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_v, "
            f"MIN(s) AS min_s, "
            f"CAST(COUNT(DISTINCT s) AS BIGINT) AS nd_s "
            f"FROM nullish WHERE {_null_pred(r)} GROUP BY {key}"
        )
    if shape == "filter":
        return (
            f"SELECT id, k, COALESCE(s, '<null>') AS s2, "
            f"NULLIF(cat, 'g{r.randint(0, 4)}') AS c2, "
            f"CASE WHEN v IS NULL THEN -1.0 ELSE v END AS v2 "
            f"FROM nullish WHERE {_null_pred(r)}"
        )
    if shape == "selfjoin":
        # NULL keys never match in an inner equi-join — both engines
        # must drop the i%7==3 rows from both sides
        return (
            f"SELECT a.k AS k0, CAST(COUNT(*) AS BIGINT) AS pairs "
            f"FROM nullish a JOIN nullish b ON a.k = b.k AND a.id < b.id "
            f"WHERE {_null_pred(r, 2, prefix='a.')} "
            f"GROUP BY a.k"
        )
    if shape == "distinct":
        cols = r.choice(["s", "k, s", "cat, k"])
        return f"SELECT DISTINCT {cols} FROM nullish WHERE {_null_pred(r)}"
    # setop: NULLs are "not distinct" in set semantics in both engines
    op = r.choice(["INTERSECT", "EXCEPT", "UNION"])
    return (
        f"SELECT s, k FROM nullish WHERE {_null_pred(r, 2)} "
        f"{op} SELECT s, k FROM nullish WHERE {_null_pred(r, 2)}"
    )


def _q_string_funcs(r: random.Random, stats: ColumnStats) -> str:
    """String-function projection shapes over the Spark∩DuckDB agreement
    subset: upper/lower/length/trim/substr/replace/lpad/`||` all have
    identical semantics (char-based length, truncating lpad, NULL-in →
    NULL-out), plus a LIKE predicate so pushdown of string filters is
    exercised."""
    t = TABLES[r.choice(["customer", "part", "supplier", "documents"])]
    s = r.choice(t.strings or t.cats)
    ch = chr(ord("a") + r.randrange(26))
    items = [*t.unique]
    pool = [
        f"upper({s}) AS s_up",
        f"lower({s}) AS s_lo",
        f"CAST(length({s}) AS BIGINT) AS s_len",
        f"substr({s}, 1, {r.randint(1, 8)}) AS s_pre",
        f"replace({s}, '{ch}', '_') AS s_rep",
        f"lpad({s}, {r.randint(2, 12)}, '#') AS s_pad",
        f"trim({s}) AS s_trim",
    ]
    r.shuffle(pool)
    items += pool[: r.randint(2, 4)]
    if t.cats and r.random() < 0.5:
        items.append(f"({s} || '-' || {r.choice(t.cats)}) AS s_cat")
    pred = f"{s} LIKE '%{ch}%'"
    if r.random() < 0.5:
        pred += f" AND {_predicate(r, stats, t, n_max=2)}"
    return f"SELECT {', '.join(items)} FROM {t.name} WHERE {pred}"


def _q_derived_table(r: random.Random, stats: ColumnStats) -> str:
    """Two-level aggregation through a derived table (aggregate of an
    aggregate) — the count-of-counts / per-group-max-of-subgroup shape.
    Inner aggregates are exact integers, so the outer MAX/SUM/COUNT
    stay exact; SUMs are cast back to BIGINT against DuckDB's HUGEINT
    widening."""
    t = TABLES[r.choice(["lineitem", "orders", "events"])]
    g1 = r.choice(t.cats)
    g2 = r.choice([c for c in t.ints if c not in t.unique] or list(t.ints))
    pred = _predicate(r, stats, t, n_max=2)
    inner = (
        f"SELECT {g1} AS g1, {g2} AS g2, CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM {t.name} WHERE {pred} GROUP BY {g1}, {g2}"
    )
    return (
        f"SELECT g1, CAST(COUNT(*) AS BIGINT) AS n_groups, "
        f"CAST(MAX(c) AS BIGINT) AS max_c, CAST(MIN(c) AS BIGINT) AS min_c, "
        f"CAST(SUM(c) AS BIGINT) AS sum_c "
        f"FROM ({inner}) d GROUP BY g1"
    )


def _q_scalar_subquery(r: random.Random, stats: ColumnStats) -> str:
    """Uncorrelated scalar subquery in the WHERE clause (threshold =
    MIN/MAX of a filtered scan — exact, no floating aggregate). An
    empty subquery yields NULL, and `x > NULL` drops every row in both
    engines, so the vacuous case is itself a semantics check."""
    t = TABLES[r.choice(["orders", "lineitem", "events", "part"])]
    v = r.choice(t.ints)
    fn = r.choice(["MIN", "MAX"])
    op = r.choice([">", ">=", "<", "<="])
    sub_pred = _predicate(r, stats, t, n_max=2)
    pred = _predicate(r, stats, t, n_max=2)
    cols = list(t.unique) + [c for c in (t.cats or t.ints) if c not in t.unique][:1]
    return (
        f"SELECT {', '.join(cols)} FROM {t.name} "
        f"WHERE {pred} AND {v} {op} "
        f"(SELECT {fn}({v}) FROM {t.name} WHERE {sub_pred})"
    )


def _q_correlated_select(r: random.Random, stats: ColumnStats) -> str:
    """CORRELATED scalar subquery in the SELECT list — the decorrelation
    stress shape: Spark rewrites it into an outer-join aggregate while
    DuckDB executes its own plan, so count-bug regressions (missing
    groups turning 0 into NULL or vice versa) diverge immediately.
    COUNT(*) correlations are the classic case: a no-match outer row
    must read 0, not NULL; MIN/MAX must read NULL."""
    outer, inner, ok, ik = r.choice(
        [
            ("orders", "lineitem", "o_orderkey", "l_orderkey"),
            ("customer", "orders", "c_custkey", "o_custkey"),
            ("part", "lineitem", "p_partkey", "l_partkey"),
        ]
    )
    ot, it = TABLES[outer], TABLES[inner]
    ipred = _predicate(r, stats, it, n_max=1)
    opred = _predicate(r, stats, ot, n_max=2)
    if r.random() < 0.5:
        sub = (
            f"CAST((SELECT COUNT(*) FROM {inner} "
            f"WHERE {inner}.{ik} = {outer}.{ok} AND {ipred}) AS BIGINT) AS sub_cnt"
        )
    else:
        v = r.choice(it.ints)
        fn = r.choice(["MIN", "MAX"])
        sub = (
            f"CAST((SELECT {fn}({v}) FROM {inner} "
            f"WHERE {inner}.{ik} = {outer}.{ok} AND {ipred}) AS BIGINT) AS sub_agg"
        )
    cols = [f"{outer}.{c}" for c in ot.unique]
    return f"SELECT {', '.join(cols)}, {sub} FROM {outer} WHERE {opred}"


def _q_date_funcs(r: random.Random, stats: ColumnStats) -> str:
    """Date/time projection shapes over the agreement subset: EXTRACT
    units, epoch-aligned date_trunc (cast to DATE so both engines emit
    the same type), and literal INTERVAL arithmetic. datediff/strftime
    are deliberately absent — their names/argument orders differ between
    the engines, so they live in hand-written oracles, not the shared
    SQL."""
    t = TABLES[r.choice(["orders", "lineitem", "events"])]
    c = t.ts[0]
    unit = r.choice(["day", "month", "year"])
    n = r.randint(1, 30)
    items = [*t.unique]
    pool = [
        f"CAST(EXTRACT(YEAR FROM {c}) AS INT) AS t_y",
        f"CAST(EXTRACT(MONTH FROM {c}) AS INT) AS t_mo",
        f"CAST(EXTRACT(DAY FROM {c}) AS INT) AS t_d",
        f"CAST(EXTRACT(HOUR FROM {c}) AS INT) AS t_h",
        f"CAST(date_trunc('{unit}', {c}) AS DATE) AS t_bucket",
        f"CAST({c} + INTERVAL {n} DAY AS DATE) AS t_shift",
        f"CAST({c} AS DATE) AS t_date",
    ]
    r.shuffle(pool)
    items += pool[: r.randint(2, 4)]
    pred = _predicate(r, stats, t, n_max=2)
    return f"SELECT {', '.join(items)} FROM {t.name} WHERE {pred}"


def _q_rank_ties(r: random.Random, stats: ColumnStats) -> str:
    """Rank-family functions under DELIBERATE ties: ORDER BY a
    low-cardinality key only (category or small-domain int), so ties are
    dense. RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST are functions of
    the ORDER-KEY VALUES, not physical row order, so the result is
    deterministic WITHOUT a total order — the tie axis ``_q_window``
    cannot exercise (its ROWS frames force the full tiebreak order).
    PERCENT_RANK and CUME_DIST are single IEEE divisions of integers —
    bit-identical across engines, compared under repr() exactness."""
    t = r.choice(
        [TABLES["lineitem"], TABLES["orders"], TABLES["customer"],
         TABLES["events"], NULLISH]
    )
    part = r.choice(t.cats) if t.cats and r.random() < 0.6 else None
    okey_pool = [c for c in (t.cats + t.ints) if c != part] or list(t.ints)
    okey = r.choice(okey_pool)
    direction = r.choice(["ASC", "DESC"])
    over = (
        (f"PARTITION BY {part} " if part else "")
        + f"ORDER BY {okey} {direction} NULLS LAST"
    )
    # the nullish fixture has no stats-sampled literal pools — its
    # dedicated predicate generator covers the NULL shapes instead
    pred = _null_pred(r, n_max=2) if t.name == "nullish" else _predicate(r, stats, t, n_max=2)
    proj = list(dict.fromkeys(list(t.unique) + ([part] if part else []) + [okey]))
    return (
        f"SELECT {', '.join(proj)}, "
        f"CAST(RANK() OVER ({over}) AS BIGINT) AS rnk, "
        f"CAST(DENSE_RANK() OVER ({over}) AS BIGINT) AS drnk, "
        f"PERCENT_RANK() OVER ({over}) AS prnk, "
        f"CUME_DIST() OVER ({over}) AS cd "
        f"FROM {t.name} WHERE {pred}"
    )


def _q_outer_join(r: random.Random, stats: ColumnStats) -> str:
    """Outer-join NULL semantics: LEFT / RIGHT / FULL against a
    FILTERED inner side (so unmatched rows actually occur), COALESCE
    over null-extended columns, an IS NULL unmatched probe, and
    (sometimes) an extra non-equi predicate kept in the ON clause —
    where it preserves outer-ness, unlike a WHERE, which both engines
    must convert to an effective inner join identically."""
    edge = r.choice(JOIN_EDGES)
    lt, rt = TABLES[edge[0]], TABLES[edge[1]]
    kind = r.choice(["LEFT", "RIGHT", "FULL"])
    rpred = _predicate(r, stats, rt, n_max=2)
    on = f"{lt.name}.{edge[2]} = rsub.{edge[3]}"
    if lt.ints and r.random() < 0.5:
        c = r.choice(lt.ints)
        on += f" AND {lt.name}.{c} > {_int_lit(r, stats, lt.name, c)}"
    rval = rt.doubles[0] if rt.doubles else rt.ints[-1]
    proj = [f"{lt.name}.{c}" for c in lt.unique]
    if kind == "FULL":
        # preserved columns from BOTH sides + a coalesced key
        proj = [
            f"COALESCE({lt.name}.{edge[2]}, rsub.{edge[3]}) AS jk",
            f"{lt.name}.{lt.unique[0]} AS lu",
        ]
    proj += [
        f"rsub.{rt.unique[0]} AS ru",
        f"rsub.{rval} AS rv",
        # null-extension probes: a string COALESCE when the side has a
        # categorical, a numeric sentinel otherwise
        (
            f"COALESCE(rsub.{rt.cats[0]}, 'NONE') AS rc"
            if rt.cats
            else f"COALESCE(rsub.{rt.unique[0]}, -1) AS rc"
        ),
        f"rsub.{edge[3]} IS NULL AS unmatched",
    ]
    sql = (
        f"SELECT {', '.join(proj)} FROM {lt.name} {kind} JOIN "
        f"(SELECT * FROM {rt.name} WHERE {rpred}) rsub ON {on}"
    )
    if kind == "LEFT":
        # WHERE on the PRESERVED side keeps outer-ness; occasionally
        # probe the null side instead (anti-join shape) — identical
        # three-valued logic required of both engines
        if r.random() < 0.3:
            sql += f" WHERE rsub.{edge[3]} IS NULL"
        else:
            sql += f" WHERE {_predicate(r, stats, lt, n_max=2)}"
    return sql


def _q_lateral(r: random.Random, stats: ColumnStats) -> str:
    # Correlated LATERAL top-k per group (Spark >= 3.2 / SQL:1999):
    # Catalyst decorrelates to a join + WindowGroupLimit, DuckDB runs
    # the dependent join directly — same rows either way. Determinism:
    # the inner LIMIT is totally ordered (sort col + full tiebreak,
    # NULLS LAST); a NULL group key produces an empty lateral relation
    # and drops out identically in both engines (CROSS JOIN semantics).
    t = TABLES[r.choice(["lineitem", "orders", "events", "customer", "part"])]
    key = r.choice(t.cats)
    sort_col = r.choice(t.doubles or t.ints)
    direction = r.choice(["ASC", "DESC"])
    pred = _predicate(r, stats, t, n_max=2)
    cols = list(dict.fromkeys(list(t.unique) + [sort_col]))
    sel = ", ".join(f"l.{c}" for c in cols)
    tiebreak = ", ".join(f"x.{c} NULLS LAST" for c in t.tiebreak)
    return (
        f"SELECT g.gkey, {sel} "
        f"FROM (SELECT DISTINCT {key} AS gkey FROM {t.name}) g "
        f"CROSS JOIN LATERAL ("
        f"SELECT {', '.join(cols)} FROM {t.name} x "
        f"WHERE x.{key} = g.gkey AND {pred} "
        f"ORDER BY x.{sort_col} {direction} NULLS LAST, {tiebreak} "
        f"LIMIT {r.choice([2, 3, 5])}) l"
    )


_TEMPLATES = [
    (_q_filter_project, 3),
    (_q_groupby, 4),
    (_q_join, 4),
    (_q_window, 2),
    (_q_setop, 2),
    (_q_exists, 2),
    (_q_topk, 2),
    (_q_rollup, 2),
    (_q_conditional_agg, 2),
    (_q_antijoin_nullcheck, 2),
    (_q_nullish, 4),
    (_q_range_window, 2),
    (_q_string_funcs, 2),
    (_q_derived_table, 2),
    (_q_scalar_subquery, 2),
    (_q_date_funcs, 2),
    (_q_rank_ties, 2),
    (_q_outer_join, 3),
    (_q_multi_distinct, 2),
    (_q_correlated_select, 2),
    (_q_lateral, 2),
]


def generate_query(seed: int, stats: ColumnStats) -> str:
    """Deterministically expand one seed into one SQL string."""
    r = random.Random(seed)
    gens = [g for g, w in _TEMPLATES for _ in range(w)]
    return gens[r.randrange(len(gens))](r, stats)


# ---------------------------------------------------------------------------
# Canonical comparison (string-normalized, order-insensitive) — stricter
# than needed so dtype bridges (HUGEINT→float64, int-with-null→float64,
# datetime64[us] vs [ns]) cannot mask or fake a diff.
# ---------------------------------------------------------------------------
def _dt_iso(x) -> str:
    """ISO form with the DATE-vs-midnight-TIMESTAMP bridge normalized:
    a DATE crosses the pandas bridge as `datetime.date` from Spark but
    as a midnight datetime64 from DuckDB — same value, different
    rendering. Midnight timestamps therefore canonicalize to the bare
    date; timestamps with any time component keep the full form."""
    s = x.isoformat()
    return s[:-9] if s.endswith("T00:00:00") else s


def _norm_cell(x: object) -> str:
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NULL"
        if x == 0:
            return "0"
        if x == int(x) and abs(x) < 1e15:
            return str(int(x))
        return repr(x)
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, int):
        return str(x)
    if isinstance(x, pd.Timestamp):
        if pd.isna(x):
            return "NULL"
        return _dt_iso(x)
    if isinstance(x, (datetime.datetime, datetime.date)):
        return _dt_iso(x)
    try:
        if pd.isna(x):  # NaT and friends
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(x)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, every cell normalized to a string, rows
    sorted — the multiset-of-rows view both engines must agree on."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.apply(lambda col: col.map(lambda v: _norm_cell(_unwrap_numpy(v))))
    # astype(object): a 0-row column keeps its source dtype through map,
    # and two empty-but-equal results must not diff on float64 vs object
    out = out.astype(object)
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def _unwrap_numpy(v: object) -> object:
    # numpy scalars: unify to native python so _norm_cell sees one type
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        return v.item()
    return v


def run_differential(spark, duck, stats: ColumnStats, seeds: range) -> list[tuple[int, str, str]]:
    """Run each seed's query on both engines; return (seed, sql, error)
    rows for any divergence. Used by the CLI sweep; pytest asserts
    per-seed instead."""
    failures: list[tuple[int, str, str]] = []
    for seed in seeds:
        sql = generate_query(seed, stats)
        try:
            got = canonicalize(spark.sql(sql).toPandas())
            want = canonicalize(duck.execute(sql).df())
            if list(got.columns) != list(want.columns):
                raise AssertionError(
                    f"columns {list(got.columns)} vs {list(want.columns)}"
                )
            if not got.equals(want):
                raise AssertionError(
                    f"values differ: {len(got)} vs {len(want)} rows"
                )
        except Exception as e:  # noqa: BLE001 — collected, not swallowed
            failures.append((seed, sql, f"{type(e).__name__}: {e}"))
    return failures
