"""CLI smoke: the module entry point lists the catalog and runs a query."""

from __future__ import annotations

from esther_apache_spark_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_daily_segment_sales" in out
    assert "[o]" in out  # oracled marker present


def test_cli_run_unknown_query_errors():
    assert main(["run", "no_such_query"]) == 2
