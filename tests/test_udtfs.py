"""Python UDTF (SURVEY §2.10): flatMap-shaped EAV emission, pinned
against the built-in unpivot fast path and for null-skip semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark.functions.udtfs import eav_emit_lateral


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_udtf_matches_builtin_unpivot(spark):
    wide = spark.createDataFrame(
        [("r1", "a1", "b1"), ("r2", "a2", None)],
        "record_id string, fa string, fb string",
    )
    src = wide.select(
        "record_id",
        F.lit("ns").alias("namespace"),
        F.map_from_arrays(
            F.array(F.lit("fa"), F.lit("fb")), F.array("fa", "fb")
        ).alias("fields"),
    )
    got = eav_emit_lateral(src, view_name="__udtf_t1")
    want = (
        wide.unpivot("record_id", ["fa", "fb"], "field_name", "field_value")
        .where(F.col("field_value").isNotNull())
        .select("record_id", F.lit("ns").alias("namespace"), "field_name", "field_value")
    )
    assert _rows(got) == _rows(want)
    # r2.fb is null → skipped, so 3 rows not 4
    assert got.count() == 3


def test_udtf_skips_null_record_and_fields(spark):
    src = spark.createDataFrame(
        [(None, "ns", {"k": "v"}), ("r1", "ns", None), ("r2", "ns", {})],
        "record_id string, namespace string, fields map<string,string>",
    )
    assert eav_emit_lateral(src, view_name="__udtf_t2").count() == 0


def test_udtf_multi_row_emission(spark):
    src = spark.createDataFrame(
        [("r1", "ns", {"a": "1", "b": "2", "c": "3"})],
        "record_id string, namespace string, fields map<string,string>",
    )
    got = _rows(eav_emit_lateral(src, view_name="__udtf_t3"))
    assert got == {
        ("r1", "ns", "a", "1"),
        ("r1", "ns", "b", "2"),
        ("r1", "ns", "c", "3"),
    }
