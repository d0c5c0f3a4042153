"""Tests for the validation layer (V1/V3) and the transform-pipeline
framework (§2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redcap_omop_etl_spark import validation
from redcap_omop_etl_spark.plans import Pipeline, Transform, TransformOutput


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("a", 1, "2020-01-01"), ("b", -2, "2020-02-30"), ("c", 3, None)],
        "id string, n int, d string",
    )


class TestValidation:
    def test_expect_columns_strict(self, df):
        validation.expect_columns(df, ["id", "n", "d"])
        with pytest.raises(validation.SchemaValidationError, match="missing"):
            validation.expect_columns(df, ["id", "n", "d", "missing_col"])
        with pytest.raises(validation.SchemaValidationError, match="extra"):
            validation.expect_columns(df, ["id", "n"])
        validation.expect_columns(df, ["id", "n"], strict=False)

    def test_expect_schema(self, df):
        good = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("n", T.IntegerType()),
                T.StructField("d", T.StringType()),
            ]
        )
        validation.expect_schema(df, good)
        bad = T.StructType([T.StructField("id", T.LongType())])
        with pytest.raises(validation.SchemaValidationError):
            validation.expect_schema(df, bad)

    def test_check_single_pass_counts_and_split(self, df):
        res = validation.check(
            df,
            {
                "n_positive": F.col("n") > 0,
                "d_parses": F.try_to_timestamp("d").isNotNull(),
            },
        )
        assert res.counts == {"n_positive": 1, "d_parses": 2}
        assert {r.id for r in res.clean.collect()} == {"a"}
        errs = {r.id: sorted(r.violations) for r in res.errors.collect()}
        assert errs == {"b": ["d_parses", "n_positive"], "c": ["d_parses"]}

    def test_assert_unique_key(self, spark):
        ok = spark.createDataFrame([("a",), ("b",)], "k string")
        validation.assert_unique_key(ok, ["k"])
        dup = spark.createDataFrame([("a",), ("a",)], "k string")
        with pytest.raises(validation.SchemaValidationError, match="duplicate"):
            validation.assert_unique_key(dup, ["k"])


class TestPipelineFramework:
    def test_stages_compose_and_namespaces_tag(self, spark):
        records = spark.createDataFrame([("R1", "f1", "10"), ("R2", "f1", "20")], "record_id string, field_name string, value string")

        def double_stage(df):
            return TransformOutput(records=df.withColumn("value", (F.col("value").cast("int") * 2).cast("string")))

        def emit_stage(df):
            emitted = df.select("record_id", F.lit("derived").alias("field_name"), F.col("value").alias("field_value"))
            return TransformOutput(records=df, emitted=emitted, metadata={"ns2": ["derived"]})

        pipe = Pipeline(
            [Transform("double", "ns1", double_stage), Transform("emit", "ns2", emit_stage)]
        )
        res = pipe.run(records)
        assert {r.value for r in res.records.collect()} == {"20", "40"}
        emitted = res.transform_records.collect()
        assert {r.namespace for r in emitted} == {"ns2"}
        assert {r.field_value for r in emitted} == {"20", "40"}  # saw post-double stream
        assert res.transform_metadata == {"ns2": ["derived"]}

    def test_emitted_schema_enforced(self, spark):
        records = spark.createDataFrame([("R1",)], "record_id string")

        def bad_stage(df):
            return TransformOutput(records=df, emitted=df.select("record_id"))

        with pytest.raises(ValueError, match="missing"):
            Pipeline([Transform("bad", "ns", bad_stage)]).run(records)
