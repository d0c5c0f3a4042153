"""FIXTURES.md group-A shaped synthetic data for the REDCap-surface tests.

Deterministic, hand-checkable: 4 records exercising every path — dob
anchor shift, all four granularities, unparseable dates, missing anchors,
event-restricted fields, missing-from-map error channel, `_complete`
keeps, DAG synthesis, inner-join deid drop, left-join secondary-id null.
"""

from __future__ import annotations

EAV_SCHEMA = (
    "record_id string, redcap_event_name string, redcap_repeat_instrument string, "
    "redcap_repeat_instance string, field_name string, value string"
)

SCREEN, ENROLL = "screening_arm_1", "enrollment_arm_1"


def eav_rows():
    r = []

    def add(rid, event, field, value):
        r.append((rid, event, "", "", field, value))

    # R1: complete happy path
    add("R1", SCREEN, "np_dob", "1980-01-15")
    add("R1", SCREEN, "visit_date", "2020-03-10")
    add("R1", ENROLL, "admit_ts", "2020-03-10T14:30:45")
    add("R1", ENROLL, "admit_ts2", "2020-03-10T14:30:45")
    add("R1", SCREEN, "np_gender", "1")
    add("R1", SCREEN, "secret_field", "SSN-123")       # status Exclude → drop
    add("R1", SCREEN, "unknown_field", "x")            # not in map → error
    add("R1", SCREEN, "consent_complete", "2")         # *_complete → keep
    add("R1", SCREEN, "reg_field", "a")                # restricted: kept (screening)
    add("R1", ENROLL, "reg_field", "b")                # restricted: dropped (enrollment)
    # R2: unparseable date
    add("R2", SCREEN, "np_dob", "1990-06-01")
    add("R2", SCREEN, "visit_date", "not-a-date")      # parse error → dropped + error
    add("R2", SCREEN, "np_gender", "2")
    # R3: no dob anchor
    add("R3", SCREEN, "visit_date", "2021-01-01")      # missing anchor → dropped + error
    add("R3", SCREEN, "np_gender", "1")
    # R4: minimal
    add("R4", SCREEN, "np_dob", "2000-12-31")
    add("R4", SCREEN, "np_gender", "2")
    return r


FIELD_MAP_SCHEMA = "field_name string, status string, restrict_to_event_list string, form_name string"


def field_map_rows():
    return [
        ("np_dob", "TransformDateYear", None, "demo"),
        ("visit_date", "TransformDate", None, "visits"),
        ("admit_ts", "TransformDateTime", None, "visits"),
        ("admit_ts2", "TransformDateTimeSeconds", None, "visits"),
        ("np_gender", "Include", None, "demo"),
        ("reg_field", "Include", "screening_arm_1", "reg"),
        ("secret_field", "Exclude", None, "demo"),
    ]


DAG_SCHEMA = "study_id string, redcap_event_name string, redcap_data_access_group string"


def dag_rows():
    return [
        ("R1", SCREEN, "site_a"),
        ("R2", SCREEN, "site_a"),
        ("R3", SCREEN, "site_b"),
        ("R4", SCREEN, "site_b"),
    ]


DEID_SCHEMA = "redcap_id string, np_gender string, exp_age_decade string"


def deid_rows():
    return [("R1", "1", "40-49"), ("R2", "2", "30-39")]  # R3/R4 absent → inner-join drop


SECONDARY_SCHEMA = "redcap_record_id string, secondary_id string"


def secondary_rows():
    return [("R1", "S-001")]  # others unmapped → null emitted


METADATA_SCHEMA = "field_name string, form_name string, field_type string, field_label string"


def metadata_rows():
    return [
        ("np_dob", "demo", "text", "Date of birth"),
        ("visit_date", "visits", "text", "Visit date"),
        ("admit_ts", "visits", "text", "Admission"),
        ("admit_ts2", "visits", "text", "Admission2"),
        ("np_gender", "demo", "radio", "Gender"),
        ("reg_field", "reg", "text", "Registration"),
        ("secret_field", "demo", "text", "SSN"),
        ("unknown_field", "misc", "text", "Unknown"),
    ]


def build_all(spark):
    return {
        "records": spark.createDataFrame(eav_rows(), EAV_SCHEMA),
        "field_map": spark.createDataFrame(field_map_rows(), FIELD_MAP_SCHEMA),
        "dag_records": spark.createDataFrame(dag_rows(), DAG_SCHEMA),
        "deid_data": spark.createDataFrame(deid_rows(), DEID_SCHEMA),
        "secondary_ids": spark.createDataFrame(secondary_rows(), SECONDARY_SCHEMA),
        "metadata": spark.createDataFrame(metadata_rows(), METADATA_SCHEMA),
    }
