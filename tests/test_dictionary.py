"""Dictionary curation (§3.2): column surgery + existing-curation
merge-update, mirrored against the reference's pandas semantics
(dictionary_extraction.py:9-105)."""

from __future__ import annotations

import glob

from redcap_omop_etl_spark.dictionary import COLUMN_ORDER, curate_dictionary, main


def _metadata(spark):
    rows = [
        ("np_dob", "demo", "text", "Date of birth", None, "date_ymd"),
        ("np_gender", "demo", "radio", "Gender", "1, M | 2, F", None),
        ("new_field", "visits", "text", "Brand new", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "field_name string, form_name string, field_type string, field_label string, "
        "select_choices_or_calculations string, text_validation_type_or_show_slider_number string",
    )


def _existing(spark):
    # previously curated: np_dob has a decision; new_field absent
    rows = [
        ("np_dob", "TransformDateYear", "ok?", "keep year only", None, "HP:0000001"),
        ("np_gender", "Include", None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "field_name string, status string, `status questions` string, notes string, "
        "restrict_to_event_list string, ontology_term string",
    )


class TestDictionaryCuration:
    def test_column_order_and_merge(self, spark):
        out = curate_dictionary(_metadata(spark), _existing(spark))
        assert out.columns == COLUMN_ORDER
        rows = {r["field_name"]: r for r in out.collect()}
        assert set(rows) == {"np_dob", "np_gender", "new_field"}
        # existing curation carried over
        assert rows["np_dob"]["status"] == "TransformDateYear"
        assert rows["np_dob"]["notes"] == "keep year only"
        assert rows["np_dob"]["ontology_term"] == "HP:0000001"
        assert rows["np_gender"]["status"] == "Include"
        # fresh metadata survives the trim
        assert rows["np_gender"]["select_choices_or_calculations"] == "1, M | 2, F"
        # new field gets empty curation columns
        assert rows["new_field"]["status"] is None

    def test_no_existing_sheet(self, spark):
        out = curate_dictionary(_metadata(spark))
        assert out.columns == COLUMN_ORDER
        assert out.filter(out["status"].isNotNull()).count() == 0

    def test_cli_roundtrip(self, spark, tmp_path):
        ex, new, out = str(tmp_path / "ex"), str(tmp_path / "new"), str(tmp_path / "out")
        _existing(spark).coalesce(1).write.option("header", True).csv(ex)
        _metadata(spark).coalesce(1).write.option("header", True).csv(new)
        main([ex, new, out], spark=spark)
        got = spark.read.option("header", True).csv(glob.glob(out + "/part-*")[0])
        assert got.columns == COLUMN_ORDER
        assert got.count() == 3
