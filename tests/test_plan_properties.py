"""Plan-property regression net: the physical-plan characteristics the
100 TB design depends on (see BENCH/PLANS.md) asserted against the actual
executed plans, so a refactor that silently introduces a shuffle or breaks
column pruning fails CI."""

import pytest
from pyspark.sql import functions as F

import valor_spark as V
from valor_spark.operators.constraints import duplicate_keys, uniqueness_violations
from valor_spark.plans.engine import validate
from valor_spark.sources import synthetic as S

EA = V.EArray()


@pytest.fixture(scope="module")
def clips_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("planclips"))
    S.clips(spark, n=300, n_shards=4, max_samples=32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_row_rules_have_no_shuffle_and_no_python(clips_parquet):
    rules = {
        "sr": V.adapt(V.field("sr_hz"), V.fail_if(["Bad"], lambda c: c <= 0, EA)),
        "dur": V.adapt(V.field("dur_ms"), V.fail_if(["Bad"], lambda c: c <= 0, EA)),
    }
    res = validate(clips_parquet.drop("bytes"), rules, key_cols=["clip_id"])
    p = plan_of(res.annotated)
    assert "Exchange" not in p
    assert "Python" not in p and "Arrow" not in p
    # (WholeStageCodegen spans only appear in the AQE-finalized plan string;
    # the no-shuffle/no-Python assertions are the load-bearing properties)


def test_uniqueness_scan_prunes_to_key(clips_parquet):
    p = plan_of(duplicate_keys(clips_parquet, "clip_id"))
    assert "ReadSchema: struct<clip_id:string>" in p  # bytes never read
    assert "partial_count" in p  # map-side combine absorbs hot-key skew


def test_duplicate_tagging_broadcasts(clips_parquet):
    p = plan_of(uniqueness_violations(clips_parquet, "clip_id"))
    assert "BroadcastHashJoin" in p  # big side streams, never shuffles


def test_row_rule_scan_prunes_unused_columns(clips_parquet):
    # a rule reading only sr_hz must not drag bytes through the scan
    rules = {"sr": V.adapt(V.field("sr_hz"), V.fail_if(["Bad"], lambda c: c <= 0, EA))}
    res = validate(
        clips_parquet.select("clip_id", "sr_hz", "bytes"),
        rules,
        key_cols=["clip_id"],
    )
    vio = res.violations()
    p = plan_of(vio)
    assert "bytes" not in p.split("ReadSchema:")[1].splitlines()[0]
