"""Ground-truth checks for the round-6 statistics family: each operator
is verified against an independent numpy implementation on the same
parquet fixture (the DuckDB oracle proves cross-engine agreement; these
prove both engines implement the intended statistic)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from esther_apache_spark_spark.plans.catalog import QUERIES


@pytest.fixture(scope="module")
def events_pd(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    t["cents"] = (t["value"].round(2) * 100).round().astype("int64")
    return t


def test_anova_f_matches_numpy(spark, sf_dir, events_pd):
    row = QUERIES["anova_f_value_by_type"].fn(spark, sf_dir).collect()[0]
    groups = [g["cents"].to_numpy() for _, g in events_pd.groupby("event_type")]
    allv = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k_groups"] == k and row["n_rows"] == n
    assert abs(row["f_stat"] - f) < 1e-4 * max(f, 1.0), (row["f_stat"], f)


def test_gini_matches_numpy(spark, sf_dir):
    rows = QUERIES["gini_revenue_by_nation"].fn(spark, sf_dir).collect()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"].round(2) * 100).round().astype("int64")
    rev = j.groupby(["c_nationkey", "o_custkey"])["cents"].sum().reset_index()
    byn = {r["nationkey"]: r["gini"] for r in rows}
    for nk, g in rev.groupby("c_nationkey"):
        y = np.sort(g["cents"].to_numpy())
        n, s = len(y), y.sum()
        gini = 2 * (np.arange(1, n + 1) * y).sum() / (n * s) - (n + 1) / n
        assert abs(byn[nk] - gini) < 1e-5, (nk, byn[nk], gini)


def test_spearman_matches_numpy(spark, sf_dir, events_pd):
    rows = QUERIES["spearman_value_time_by_type"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r["spearman_rho"] for r in rows}
    for et, g in events_pd.groupby("event_type"):
        rx = g["cents"].rank(method="average").to_numpy()
        ry = g["ts"].rank(method="average").to_numpy()
        rho = np.corrcoef(rx, ry)[0, 1]
        assert abs(got[et] - rho) < 1e-5, (et, got[et], rho)


def test_mann_whitney_auc_matches_bruteforce(spark, sf_dir, events_pd):
    rows = QUERIES["mann_whitney_value_drift"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    split = np.datetime64("2024-01-16")
    for et, g in events_pd.groupby("event_type"):
        early = g.loc[g["ts"].to_numpy() < split, "cents"].to_numpy()
        late = g.loc[g["ts"].to_numpy() >= split, "cents"].to_numpy()
        # brute-force common-language effect size on the fixture
        wins = (early[:, None] > late[None, :]).sum()
        ties = (early[:, None] == late[None, :]).sum()
        auc = (wins + 0.5 * ties) / (len(early) * len(late))
        r = got[et]
        assert r["n_early"] == len(early) and r["n_late"] == len(late)
        assert abs(r["auc_effect"] - auc) < 1e-5, (et, r["auc_effect"], auc)


def test_cuped_theta_matches_numpy(spark, sf_dir, events_pd):
    row = QUERIES["cuped_variance_reduction"].fn(spark, sf_dir).collect()[0]
    split = np.datetime64("2024-01-16")
    pre = events_pd[events_pd["ts"].to_numpy() < split]
    post = events_pd[events_pd["ts"].to_numpy() >= split]
    x = pre.groupby("user_id")["cents"].sum()
    y = post.groupby("user_id")["cents"].sum()
    users = sorted(set(events_pd["user_id"]))
    xv = np.array([x.get(u, 0) for u in users], dtype="float64")
    yv = np.array([y.get(u, 0) for u in users], dtype="float64")
    theta = np.cov(xv, yv, bias=True)[0, 1] / np.var(xv)
    assert row["n_users"] == len(users)
    assert abs(row["theta"] - theta) < 1e-5, (row["theta"], theta)
    rho2 = np.corrcoef(xv, yv)[0, 1] ** 2
    assert abs(row["var_reduction_pct"] - 100 * rho2) < 1e-2


def test_ridge_matches_numpy(spark, sf_dir, events_pd):
    row = QUERIES["ridge_daily_revenue_trend"].fn(spark, sf_dir).collect()[0]
    d = events_pd.copy()
    d["day"] = d["ts"].dt.normalize()
    daily = d.groupby("day")["cents"].sum().reset_index()
    i = (daily["day"] - np.datetime64("2024-01-01")).dt.days.to_numpy()
    w = (daily["day"].dt.dayofweek >= 5).to_numpy().astype("int64")
    y = daily["cents"].to_numpy().astype("float64")
    X = np.stack([np.ones_like(i), i, w], axis=1).astype("float64")
    A = X.T @ X + 100 * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y) / 100.0  # cents → value units
    assert row["n_days"] == len(daily)
    for got, want in zip(
        (row["intercept"], row["slope_per_day"], row["weekend_effect"]), beta
    ):
        assert abs(got - want) < 1e-3 * max(abs(want), 1.0), (row, beta)


def test_logrank_null_behavior(spark, sf_dir):
    row = QUERIES["logrank_churn_by_cohort"].fn(spark, sf_dir).collect()[0]
    # cohorts are a hash split of the same population: chi2 should be
    # small (no real effect), and E within a factor of the observed
    assert row["chi2_logrank"] >= 0
    assert row["chi2_logrank"] < 15, row
    assert row["observed_g0"] > 0 and row["expected_g0"] > 0
