"""YAML settings loader — the reference's config-driven entry shape.

The reference resolves every pipeline path and CSV dialect option from
``settings.yaml`` (``pipeline_pyspark.py:60-72`` reads ``input_dir``,
``output_dir``, ``db_path``, ``csv_sep``, ``csv_encoding``,
``csv_float_format``; ``settings.yaml:1-9`` is the file shape). This
module reproduces that contract for the library: the same keys with the
same defaults, relative paths resolved against the settings file's
directory, plus ``run_freshkart_from_settings`` wiring the loaded config
straight into the engine's pipeline + sinks so a reference user can keep
their existing settings file.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, Any] = {
    "input_dir": "./data/march-input",
    "output_dir": "./data/out",
    "db_path": "./data/sales_db.db",
    "csv_sep": ";",
    "csv_encoding": "utf-8",
    "csv_float_format": "%.2f",
}


def load_settings(path: str) -> dict[str, Any]:
    """Parse the settings YAML; unknown keys pass through, missing keys
    take the reference's defaults, relative paths resolve against the
    file's own directory (so the file works from any CWD — same rule as
    the reference's ``resolve_path``)."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    if not isinstance(raw, dict):
        raise ValueError(f"settings file must be a mapping: {path}")
    cfg: dict[str, Any] = {**_DEFAULTS, **raw}
    base = os.path.dirname(os.path.abspath(path))
    for key in ("input_dir", "output_dir", "db_path"):
        p = str(cfg[key])
        cfg[key] = p if os.path.isabs(p) else os.path.normpath(os.path.join(base, p))
    return cfg


def _float_decimals(fmt: str) -> int:
    """``%.2f`` → 2. Only the reference's ``%.Nf`` shapes are accepted —
    anything else would silently change export bytes."""
    import re

    m = re.fullmatch(r"%\.(\d+)f", fmt)
    if not m:
        raise ValueError(f"unsupported csv_float_format: {fmt!r} (want '%.Nf')")
    return int(m.group(1))


def run_freshkart_from_settings(
    spark: SparkSession, settings_path: str
) -> dict[str, Any]:
    """The reference's ``main()`` contract on the engine: load settings,
    run the pipeline over ``input_dir``, export per-day dialect CSVs +
    sqlite to the configured ``output_dir``/``db_path``. Returns the
    loaded config plus the pipeline's DataFrames (still lazy for any
    further queries the caller wants)."""
    from esther_apache_spark_spark.freshkart.pipeline import (
        run_freshkart_pipeline,
        write_freshkart_outputs,
    )

    cfg = load_settings(settings_path)
    decimals = _float_decimals(str(cfg["csv_float_format"]))
    os.makedirs(cfg["output_dir"], exist_ok=True)
    os.makedirs(os.path.dirname(cfg["db_path"]) or ".", exist_ok=True)
    dfs = run_freshkart_pipeline(spark, cfg["input_dir"])
    write_freshkart_outputs(
        dfs,
        cfg["output_dir"],
        cfg["db_path"],
        sep=str(cfg["csv_sep"]),
        float_format_decimals=decimals,
        encoding=str(cfg["csv_encoding"]),
    )
    return {"config": cfg, **dfs}
