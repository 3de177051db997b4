"""Observed metrics — telemetry piggybacked on the job you already run.

At 100 TB a `df.count()` "how many rows did we just process" check is a
second full scan. ``DataFrame.observe`` attaches aggregate expressions
to an existing plan: the metrics are computed inside the SAME pass that
materializes the result (zero extra jobs, exact values), delivered
through the ``Observation`` handle after the first action completes.
This is the mechanism a production pipeline uses for row-count /
reject-rate / money-total dashboards without doubling its I/O.

Caveats encoded here: one Observation binds to one action (re-use
raises), and metrics only exist after an action — ``get`` blocks until
then. Streaming queries use the same ``observe`` call but deliver
per-batch metrics through the StreamingQueryListener instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_metrics(
    df: DataFrame, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns (instrumented_df, observation); run any action on the
    returned frame, then read ``observation.get`` — a dict of the
    metric values computed during that action's single pass.

    Example::

        out, obs = with_metrics(clean, n=F.count(F.lit(1)),
                                total=F.sum("amount"))
        out.write.parquet(path)     # one job
        stats = obs.get             # {'n': …, 'total': …} — no 2nd scan
    """
    if not metrics:
        raise ValueError("pass at least one named metric expression")
    obs = Observation()
    names = sorted(metrics)
    return df.observe(obs, *[metrics[n].alias(n) for n in names]), obs
