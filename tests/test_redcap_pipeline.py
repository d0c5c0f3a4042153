"""Golden-output tests for the composed REDCap-shaped pipeline
(FIXTURES.md "Golden-output checks on group A").

Expected date strings are computed independently with python datetime —
mirroring the reference algorithm (dcc_transforms.py:44-49,75,82-97) —
not copied from engine output.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators import redcap
from redcap_omop_etl_spark.operators.phi_filter import phi_filter
from tests.redcap_fixtures import build_all

STANDARD = datetime(2030, 1, 1)


@pytest.fixture(scope="module")
def fx(spark):
    return build_all(spark)


@pytest.fixture(scope="module")
def result(fx):
    return redcap.redcap_pipeline(
        records=fx["records"],
        field_map=fx["field_map"],
        dag_records=fx["dag_records"],
        deid_data=fx["deid_data"],
        secondary_ids=fx["secondary_ids"],
        metadata=fx["metadata"],
        strategy="dob_shifting",
        standard_date="2030-01-01 00:00:00",
    )


def _kept_map(result):
    rows = result.kept.collect()
    return {(r.record_id, r.redcap_event_name, r.field_name): r.value for r in rows}


def _shift(dob: datetime) -> timedelta:
    return STANDARD - dob


class TestDobShiftGolden:
    def test_all_four_granularities(self, result):
        kept = _kept_map(result)
        shift1 = _shift(datetime(1980, 1, 15))
        # TransformDate → yyyy-MM-dd
        assert kept[("R1", "screening_arm_1", "visit_date")] == (
            (datetime(2020, 3, 10) + shift1).strftime("%Y-%m-%d")
        )
        # TransformDateTime → minute precision (reference slices [:-3])
        assert kept[("R1", "enrollment_arm_1", "admit_ts")] == (
            (datetime(2020, 3, 10, 14, 30, 45) + shift1).strftime("%Y-%m-%d %H:%M")
        )
        # TransformDateTimeSeconds → second precision
        assert kept[("R1", "enrollment_arm_1", "admit_ts2")] == (
            (datetime(2020, 3, 10, 14, 30, 45) + shift1).strftime("%Y-%m-%d %H:%M:%S")
        )
        # TransformDateYear on the dob itself: dob + (standard − dob) = standard
        assert kept[("R1", "screening_arm_1", "np_dob")] == "2030"

    def test_per_record_shifts_differ(self, result):
        kept = _kept_map(result)
        assert kept[("R4", "screening_arm_1", "np_dob")] == "2030"  # anchor maps onto standard
        # R1 and R4 have different dobs → their shifts differ; visit dates prove it
        # (only R1 has visit_date, so check via the errors/emitted instead)

    def test_error_channels(self, result):
        errs = {(r.record_id, r.field_name): r.error for r in result.errors.collect()}
        assert errs[("R2", "visit_date")] == "unparseable date"
        assert errs[("R3", "visit_date")] == "missing dob anchor"
        assert (None, "unknown_field") in errs  # missing-from-map channel
        assert len(errs) == 3

    def test_bad_rows_dropped_not_leaked(self, result):
        kept = _kept_map(result)
        assert ("R2", "screening_arm_1", "visit_date") not in kept
        assert ("R3", "screening_arm_1", "visit_date") not in kept


class TestPhiFilterPartition:
    def test_keep_set_exact(self, result):
        kept = _kept_map(result)
        expect_kept = {
            ("R1", "screening_arm_1", "np_dob"),
            ("R1", "screening_arm_1", "visit_date"),
            ("R1", "enrollment_arm_1", "admit_ts"),
            ("R1", "enrollment_arm_1", "admit_ts2"),
            ("R1", "screening_arm_1", "np_gender"),
            ("R1", "screening_arm_1", "consent_complete"),
            ("R1", "screening_arm_1", "reg_field"),  # event-restricted: screening only
            ("R2", "screening_arm_1", "np_dob"),
            ("R2", "screening_arm_1", "np_gender"),
            ("R3", "screening_arm_1", "np_gender"),
            ("R4", "screening_arm_1", "np_dob"),
            ("R4", "screening_arm_1", "np_gender"),
        } | {(r, "screening_arm_1", "redcap_data_access_group") for r in ("R1", "R2", "R3", "R4")}
        assert set(kept) == expect_kept

    def test_event_restriction(self, result):
        kept = _kept_map(result)
        assert ("R1", "screening_arm_1", "reg_field") in kept
        assert ("R1", "enrollment_arm_1", "reg_field") not in kept

    def test_excluded_and_unknown_dropped(self, result):
        kept = _kept_map(result)
        assert not any(k[2] in ("secret_field", "unknown_field") for k in kept)

    def test_dag_rows_kept_with_values(self, result):
        kept = _kept_map(result)
        assert kept[("R1", "screening_arm_1", "redcap_data_access_group")] == "site_a"
        assert kept[("R3", "screening_arm_1", "redcap_data_access_group")] == "site_b"


class TestTransformStreams:
    def test_calc_variables_inner_join(self, result):
        tr = [
            r
            for r in result.transform_records.collect()
            if r.namespace == "calc_variables"
        ]
        got = {(r.record_id, r.field_name): r.field_value for r in tr}
        assert got == {
            ("R1", "np_gender"): "1",
            ("R1", "exp_age_decade"): "40-49",
            ("R2", "np_gender"): "2",
            ("R2", "exp_age_decade"): "30-39",
        }

    def test_secondary_id_left_join(self, result):
        tr = {r.record_id: r.field_value for r in result.transform_records.collect() if r.namespace == "secondary_id"}
        assert tr == {"R1": "S-001", "R2": None, "R3": None, "R4": None}

    def test_metadata_semi_filter(self, result):
        fields = {r.field_name for r in result.metadata_filtered.collect()}
        assert fields == {"np_dob", "visit_date", "admit_ts", "admit_ts2", "np_gender", "reg_field"}


class TestOtherStrategies:
    def test_total_seconds_emits(self, fx):
        res = redcap.date_variable_transform(
            fx["records"], fx["field_map"], strategy="total_seconds", standard_date="2020-01-01 00:00:00"
        )
        got = {(r.record_id, r.field_name): r.field_value for r in res.emitted.collect()}
        expect = int((datetime(2020, 3, 10) - datetime(2020, 1, 1)).total_seconds())
        assert got[("R1", "visit_date")] == str(expect)
        errs = {(r.record_id, r.field_name) for r in res.errors.collect()}
        assert ("R2", "visit_date") in errs

    def test_date_shifting_constant(self, fx):
        res = redcap.date_variable_transform(
            fx["records"], fx["field_map"], strategy="date_shifting", shifting_seconds=86401
        )
        kept = {(r.record_id, r.field_name): r.value for r in res.records.collect()}
        assert kept[("R1", "visit_date")] == (
            (datetime(2020, 3, 10) + timedelta(seconds=86401)).strftime("%Y-%m-%d")
        )

    def test_unknown_strategy_raises(self, fx):
        with pytest.raises(ValueError, match="datetransform_type"):
            redcap.date_variable_transform(fx["records"], fx["field_map"], strategy="bogus")


class TestPhiFilterUnit:
    def test_no_date_cleaned_column_tolerated(self, spark, fx):
        # records without the flag: date-status fields are all dropped
        res = phi_filter(fx["records"], fx["field_map"])
        kept_fields = {r.field_name for r in res.kept.collect()}
        assert "visit_date" not in kept_fields
        assert "np_gender" in kept_fields
