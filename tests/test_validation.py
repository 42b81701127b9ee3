"""§2.10 constraint validation: each check class with passing and violating
rows (SURVEY §5.2 item 5)."""

from __future__ import annotations

import pytest

from pumle_spark.validation import (
    ValidationError,
    gt,
    in_range,
    isin,
    not_null,
    regex_check,
    validate,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            ("1", 35.0, 0.11, "pressure"),   # all good
            ("x7", 35.0, 0.11, "pressure"),  # regex fail
            ("3", -1.0, 0.11, "flux"),       # gt fail
            ("4", 35.0, 1.5, None),          # in_range + notnull + isin fail
        ],
        "sim_id string, pres double, srw double, bc string",
    )


def checks():
    # built lazily: Column exprs need an active SparkContext
    return [
        regex_check("sim_id", r"^\d+$"),
        gt("pres", 0),
        in_range("srw", 0, 1),
        not_null("bc"),
        isin("bc", ("pressure", "flux")),
    ]


def test_split_valid_vs_violations(df):
    valid, bad = validate(df, checks())
    assert [r.sim_id for r in valid.collect()] == ["1"]
    viol = {r.sim_id: set(r.violations) for r in bad.collect()}
    assert viol["x7"] == {"sim_id~regex"}
    assert viol["3"] == {"pres>0"}
    assert viol["4"] == {"srwin[0,1]", "bcnotnull", "bcisin"}


def test_fail_fast_raises_with_counts(df):
    with pytest.raises(ValidationError) as exc:
        validate(df, checks(), fail_fast=True)
    assert exc.value.n_bad == 3


def test_all_valid_passes_fail_fast(spark):
    ok = spark.createDataFrame([("1", 1.0, 0.5, "flux")], "sim_id string, pres double, srw double, bc string")
    valid, bad = validate(ok, checks(), fail_fast=True)
    assert valid.count() == 1 and bad.count() == 0


def test_observed_counts_rides_the_write_action(spark, tmp_path):
    """observe()-based telemetry: quality counters arrive from the SAME job
    that writes the batch — no second scan of the input."""
    from pumle_spark.validation import ge, not_null, observed_counts

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 7.0)], "id long, v double"
    )
    checks = [ge("v", 0.0), not_null("v")]
    out, obs = observed_counts(df, checks)
    out.write.mode("overwrite").parquet(str(tmp_path / "sink"))  # the one action
    got = obs.get
    assert got["n_rows"] == 4
    assert got["bad_v>=0.0"] == 1  # the -3.0 row (NULL comparison is not a failure here)
    assert got["bad_vnotnull"] == 1
