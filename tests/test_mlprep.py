"""Property tests for the round-6 statistical operators: isotonic
calibration (monotonicity, mass preservation, reference-PAVA match),
AMS F2 accuracy, bootstrap CI bracketing, and KM curve monotonicity."""

from __future__ import annotations

import pytest

from esther_apache_spark_spark.plans.catalog import QUERIES


def test_isotonic_fit_is_valid_pava(spark, sf_dir):
    rows = sorted(
        QUERIES["isotonic_calibration_pava"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows, "empty isotonic fit"
    fits = [r["fit"] for r in rows]
    # monotone non-decreasing — the defining isotonic property
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:])), fits
    # weighted mass preservation: sum n_i * fit_i == sum pos_i
    tot_fit = sum(r["n"] * r["fit"] for r in rows)
    tot_pos = sum(r["pos"] for r in rows)
    assert abs(tot_fit - tot_pos) < 1e-4 * max(tot_pos, 1), (tot_fit, tot_pos)

    # reference PAVA (sequential pool-adjacent-violators) on the same frame
    blocks = [[r["pos"], r["n"]] for r in rows]  # [sum_y, weight]
    stack: list[list[float]] = []
    for b in blocks:
        stack.append(list(b))
        while len(stack) >= 2 and (
            stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]
        ):  # prev mean > cur mean -> pool (exact rational compare)
            y2, w2 = stack.pop()
            stack[-1][0] += y2
            stack[-1][1] += w2
    ref: list[float] = []
    for y, w in stack:
        ref.extend([y / w] * 1)  # one value per block; expand below
    # expand block means back to per-row fits
    ref_fits = []
    i = 0
    for y, w in stack:
        # w is a sum of integer n's; walk rows until weights consumed
        acc = 0
        while acc < w:
            acc += rows[i]["n"]
            ref_fits.append(y / w)
            i += 1
    assert len(ref_fits) == len(fits)
    for got, want in zip(fits, ref_fits):
        assert abs(got - want) < 1e-9, (got, want)


def test_ams_f2_estimator_is_in_range(spark, sf_dir):
    row = QUERIES["ams_f2_selfjoin_estimate"].fn(spark, sf_dir).collect()[0]
    est = row["f2_est2"] / 2
    assert row["f2_exact"] > 0
    # median-of-16 concentrates within a small constant factor of F2
    assert 0.2 * row["f2_exact"] <= est <= 5 * row["f2_exact"], row


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    for r in QUERIES["bootstrap_ci_poisson"].fn(spark, sf_dir).collect():
        assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"], r
        assert r["ci_lo_cents"] < r["ci_hi_cents"]


def test_km_curve_is_monotone_decreasing(spark, sf_dir):
    rows = sorted(
        QUERIES["survival_km_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r["t_days"],
    )
    if not rows:
        pytest.skip("no churn events at this sf")
    last = 10**9
    for r in rows:
        assert 0 <= r["surv9"] <= last, rows
        last = r["surv9"]
        assert r["d_events"] >= 1 and r["n_risk"] >= r["d_events"]


def test_cms_join_estimate_is_sound_overestimate(spark, sf_dir):
    row = QUERIES["cms_join_size_estimate"].fn(spark, sf_dir).collect()[0]
    assert row["join_exact"] > 0
    # CMS inner product never underestimates (hash collisions only add)
    assert row["join_est"] >= row["join_exact"], row
    # and the 4x1024 sketch keeps the overshoot moderate at test scale
    assert row["join_est"] <= 3 * row["join_exact"], row


def test_pca_power_iter_matches_numpy_top_eig(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    row = QUERIES["embedding_pca_power_iter"].fn(spark, sf_dir).collect()[0]
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.floor(np.stack(emb["embedding"].to_numpy()).astype("float64")
                 * 10000.0 + 0.5)
    n = x.shape[0]
    scat = n * (x.T @ x) - np.outer(x.sum(0), x.sum(0))
    eig = np.linalg.eigvalsh(scat / (n * n * 1e8))
    lam_true, trace_true = eig[-1], eig.sum()
    assert row["n_vectors"] == n
    # Rayleigh quotient of any iterate never exceeds lambda_1
    assert row["lambda1_var"] <= lam_true * (1 + 1e-9)
    # 32 rounds against the corpus's deliberately tiny eigen-gap (~0.99):
    # the Rayleigh lower bound lands within a few percent
    assert row["lambda1_var"] >= lam_true * 0.95, (row, lam_true)
    assert abs(row["trace_var"] - trace_true) <= 1e-4 * trace_true


def test_conformal_coverage_near_nominal(spark, sf_dir):
    rows = QUERIES["conformal_interval_value_by_type"].fn(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        # finite-sample conformal guarantee: >=90% in expectation;
        # allow binomial noise on the per-type holdout
        assert r["coverage"] >= 0.82, rows
        assert r["qhat_value"] > 0


@pytest.mark.slow  # minutes-long single test; full tier only (VERDICT r10 #2)
def test_pca_top2_against_numpy_spectrum(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    row = QUERIES["embedding_pca_top2"].fn(spark, sf_dir).collect()[0]
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.floor(np.stack(emb["embedding"].to_numpy()).astype("float64")
                 * 10000.0 + 0.5)
    n = x.shape[0]
    scat = n * (x.T @ x) - np.outer(x.sum(0), x.sum(0))
    eig = np.linalg.eigvalsh(scat / (n * n * 1e8))
    lam1, lam2 = eig[-1], eig[-2]
    # both Rayleigh readouts are lower bounds on their targets; the
    # deflated iterate can't exceed lambda_1 either
    assert row["lambda1_var"] <= lam1 * (1 + 1e-9)
    assert row["lambda2_var"] <= lam1 * (1 + 1e-9)
    # with the corpus's tiny eigen-gap, 24 rounds still land in range
    assert row["lambda1_var"] >= lam1 * 0.93, (row, lam1)
    assert row["lambda2_var"] >= lam2 * 0.90, (row, lam2)
    assert 0 < row["cum_explained_ratio"] < 1
