"""XML source (Spark 4 built-in `xml` format, no external package): the
REDCap ecosystem also exports project/metadata dumps as XML (CDISC ODM);
this pins the scan surface the reference would need if fed those files —
rowTag extraction, attribute columns, explicit no-inference schemas,
column pruning, nested-element flattening, and the PERMISSIVE
corrupt-record quarantine channel shared with the JSON reader.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def odm_xml(tmp_path):
    p = tmp_path / "metadata.xml"
    p.write_text(
        """<ODM>
  <ItemDef OID="np_dob" Name="Date of birth">
    <Question><TranslatedText>DOB?</TranslatedText></Question>
    <CodeListRef CodeListOID="dates"/>
  </ItemDef>
  <ItemDef OID="np_gender" Name="Gender">
    <Question><TranslatedText>Gender?</TranslatedText></Question>
  </ItemDef>
  <ItemDef OID="np_weight" Name="Weight"/>
</ODM>"""
    )
    return str(tmp_path)


class TestXmlScan:
    def test_rowtag_and_attributes(self, spark, odm_xml):
        df = spark.read.format("xml").option("rowTag", "ItemDef").load(odm_xml)
        rows = {r._OID: r._Name for r in df.collect()}
        assert rows == {
            "np_dob": "Date of birth",
            "np_gender": "Gender",
            "np_weight": "Weight",
        }

    def test_explicit_schema_no_inference(self, spark, odm_xml):
        # dtype=object analog: declare attribute columns string, skip the
        # schema-inference pass (an extra full read at corpus scale).
        schema = T.StructType(
            [
                T.StructField("_OID", T.StringType()),
                T.StructField("_Name", T.StringType()),
            ]
        )
        df = (
            spark.read.format("xml")
            .option("rowTag", "ItemDef")
            .schema(schema)
            .load(odm_xml)
        )
        assert df.dtypes == [("_OID", "string"), ("_Name", "string")]
        assert df.count() == 3

    def test_nested_element_flatten(self, spark, odm_xml):
        df = spark.read.format("xml").option("rowTag", "ItemDef").load(odm_xml)
        got = {
            r._OID: r.q
            for r in df.select(
                "_OID", F.col("Question.TranslatedText").alias("q")
            ).collect()
        }
        assert got["np_dob"] == "DOB?"
        assert got["np_weight"] is None  # absent element -> null, not error

    def test_corrupt_record_quarantine(self, spark, tmp_path):
        p = tmp_path / "bad.xml"
        # the bad record is WELL-FORMED XML with a type violation ("two"
        # in a long column): unlike JSON-lines, a malformed tag would
        # desynchronize the token stream and swallow every later record,
        # so structural corruption is not row-isolatable in XML.
        p.write_text(
            "<root>\n"
            "  <rec><id>1</id><v>ok</v></rec>\n"
            "  <rec><id>two</id><v>broken</v></rec>\n"
            "  <rec><id>3</id><v>ok2</v></rec>\n"
            "</root>"
        )
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        df = (
            spark.read.format("xml")
            .option("rowTag", "rec")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .schema(schema)
            .load(str(tmp_path))
            .cache()  # SPARK-21657 discipline: corrupt-record col needs a materialized read
        )
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r.id for r in good.collect()) == [1, 3]
        assert bad.count() == 1
        df.unpersist()

    def test_write_roundtrip(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, "a"), (2, "b")], "record_id long, field string"
        )
        out = str(tmp_path / "out_xml")
        src.write.format("xml").option("rowTag", "row").option("rootTag", "rows").save(out)
        back = (
            spark.read.format("xml")
            .option("rowTag", "row")
            .schema("record_id long, field string")
            .load(out)
        )
        assert sorted((r.record_id, r.field) for r in back.collect()) == [(1, "a"), (2, "b")]
