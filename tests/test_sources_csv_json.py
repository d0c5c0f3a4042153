"""S7/S8: CSV and JSON scans with explicit all-string schemas and column
pruning — the reference's pd.read_csv(usecols=..., dtype=object) and
json_normalize surfaces on Spark readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redcap_omop_etl_spark.operators.tpch_extra import agg_approx
from tests.conftest import SF_SMOKE


@pytest.fixture()
def csv_dir(spark, tmp_path):
    path = str(tmp_path / "field_map_csv")
    spark.createDataFrame(
        [("np_dob", "TransformDateYear", "demo", "extra1"), ("np_gender", "Include", "demo", "extra2")],
        "field_name string, status string, form_name string, notes string",
    ).coalesce(1).write.option("header", True).csv(path)
    return path


class TestCsvScan:
    def test_all_string_schema_no_inference(self, spark, csv_dir):
        # dtype=object analog: declare every column string, never infer
        schema = T.StructType([T.StructField(c, T.StringType()) for c in ["field_name", "status", "form_name", "notes"]])
        df = spark.read.schema(schema).option("header", True).csv(csv_dir)
        assert all(t == "string" for _, t in df.dtypes)
        assert df.count() == 2

    def test_usecols_column_pruning(self, spark, csv_dir):
        schema = T.StructType([T.StructField(c, T.StringType()) for c in ["field_name", "status", "form_name", "notes"]])
        df = spark.read.schema(schema).option("header", True).csv(csv_dir).select("field_name", "status")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # pruned read schema must not carry the dropped columns
        assert "notes" not in plan.split("ReadSchema")[-1][:200]


class TestJsonScan:
    def test_nested_json_normalize(self, spark, tmp_path):
        path = str(tmp_path / "nested_json")
        rows = [
            '{"record_id": "R1", "payload": {"field": "np_gender", "value": "1"}}',
            '{"record_id": "R2", "payload": {"field": "np_gender", "value": "2"}}',
        ]
        p = tmp_path / "data.json"
        p.write_text("\n".join(rows))
        schema = T.StructType(
            [
                T.StructField("record_id", T.StringType()),
                T.StructField(
                    "payload",
                    T.StructType(
                        [T.StructField("field", T.StringType()), T.StructField("value", T.StringType())]
                    ),
                ),
            ]
        )
        df = spark.read.schema(schema).json(str(p))
        flat = df.select("record_id", "payload.*")  # json_normalize analog
        assert flat.columns == ["record_id", "field", "value"]
        assert {r.value for r in flat.collect()} == {"1", "2"}


class TestApproxAgg:
    def test_approx_within_tolerance_of_exact(self, spark):
        rows = agg_approx(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            assert r.exact_orders > 0
            assert r.hll_within_tol and r.p50_within_tol and r.p95_within_tol


class TestVariantType:
    def test_variant_typed_extract_and_miss_semantics(self, spark):
        # Spark 4 VARIANT: parse once, typed path extraction; a missing
        # path or shape mismatch yields NULL (try_), never an exception
        df = spark.createDataFrame(
            [('{"k": 7, "tags": ["a", "b"]}',), ('{"other": 1}',), ("not json",)],
            "props string",
        ).select(
            F.try_variant_get(F.try_parse_json("props"), "$.k", "long").alias("k"),
            F.try_variant_get(F.try_parse_json("props"), "$.tags[1]", "string").alias("t1"),
        )
        rows = df.collect()
        assert [r.k for r in rows] == [7, None, None]
        assert [r.t1 for r in rows] == ["b", None, None]

    def test_schema_of_variant_reports_object_shape(self, spark):
        got = (
            spark.createDataFrame([('{"k": 1}',)], "props string")
            .select(F.schema_of_variant(F.parse_json("props")).alias("s"))
            .head()["s"]
        )
        assert "OBJECT" in got and "k" in got


class TestCorruptRecordChannel:
    def test_permissive_json_splits_clean_and_errors(self, spark, tmp_path):
        from redcap_omop_etl_spark.functions.errors import read_json_with_errors

        p = tmp_path / "in.jsonl"
        p.write_text(
            '{"id": 1, "v": "a"}\n'
            "this is not json\n"
            '{"id": 2, "v": "b"}\n'
            '{"id": "NaN-ish", "v": 3}\n'  # wrong types -> corrupt too
        )
        clean, errors = read_json_with_errors(spark, str(p), "id bigint, v string")
        assert {(r["id"], r["v"]) for r in clean.collect()} == {(1, "a"), (2, "b")}
        errs = errors.collect()
        assert len(errs) == 2
        assert all(r["error"] == "malformed_json" for r in errs)
        assert any("not json" in r["raw_line"] for r in errs)
        # conservation: every input line lands in exactly one channel
        assert clean.count() + errors.count() == 4


class TestColumnarFormats:
    def test_orc_roundtrip_with_pushdown(self, spark, tmp_path):
        # ORC ships in Spark core: same pushdown/pruning contract as parquet
        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE

        p = str(tmp_path / "orders_orc")
        o = Catalog(spark, SF_SMOKE)["orders"]
        o.write.orc(p)
        back = spark.read.orc(p).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "o_orderstatus" in plan
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "o_totalprice" not in read_schema  # pruned
        assert back.count() == o.filter(F.col("o_orderstatus") == "F").count()

    def test_zstd_parquet_roundtrip(self, spark, tmp_path):
        # zstd is the 100 TB-era codec default (better ratio than snappy
        # at comparable speed); pin that the session can write and read it
        p = str(tmp_path / "zstd")
        df = spark.range(0, 10_000).withColumn("v", F.col("id") * 3)
        df.write.option("compression", "zstd").parquet(p)
        import glob

        files = glob.glob(p + "/*.zstd.parquet")
        assert files, "expected zstd-suffixed parquet files"
        assert spark.read.parquet(p).agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
