"""Engine configuration — the reference's INI surface (S1), typed.

The reference is driven entirely by a configparser INI with
``ExtendedInterpolation`` (``redcap-etl.py:33-36``; ``example-config.ini``;
FIXTURES.md §A9). Here the same sections parse into a dataclass that
drives ``operators.redcap.redcap_pipeline`` — config is data, the plan is
code, and validation happens at parse time (the reference's token/project
assertions, V2, ``redcap-etl.py:53-59,202-205``).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field

VALID_STRATEGIES = ("dob_shifting", "total_seconds", "date_shifting")


class ConfigError(ValueError):
    pass


@dataclass
class EngineConfig:
    # [default]
    field_map_file: str = ""
    log_dir: str = ""
    # [dcc_transforms]
    datetransform_type: str = "dob_shifting"
    standard_date: str = "2030-01-01 00:00:00"
    shifting_seconds: int = 0
    dob_shift_inplace: bool = True
    deid_data_file: str = ""
    deid_data_dictionary_file: str = ""
    secondary_id_file: str = ""
    # [redcap]
    project_id: str = ""
    project_type: str = ""
    study_id_column: str = "study_id"
    include_metadata: bool = True
    # [datalake]
    api_endpoint: str = ""
    record_chunk_size: int = 50_000  # redcap-etl.py:225

    def validate(self) -> "EngineConfig":
        if self.datetransform_type not in VALID_STRATEGIES:
            raise ConfigError(
                f"datetransform_type must be one of {VALID_STRATEGIES}, got {self.datetransform_type!r}"
            )
        if self.datetransform_type == "date_shifting" and self.shifting_seconds == 0:
            raise ConfigError("date_shifting strategy requires nonzero shifting_seconds")
        return self


def load_config(path_or_text: str, from_text: bool = False) -> EngineConfig:
    """Parse the INI (ExtendedInterpolation, like the reference) into a
    validated EngineConfig."""
    parser = configparser.ConfigParser(interpolation=configparser.ExtendedInterpolation())
    if from_text:
        parser.read_string(path_or_text)
    else:
        if not parser.read(path_or_text):
            raise ConfigError(f"config file not found: {path_or_text}")

    def get(section: str, option: str, default):
        if not parser.has_option(section, option):
            return default
        raw = parser.get(section, option)
        if isinstance(default, bool):
            return raw.strip().lower() in ("1", "true", "yes", "on")
        if isinstance(default, int):
            return int(raw)
        return raw

    d = EngineConfig()
    cfg = EngineConfig(
        field_map_file=get("default", "field_map_file", d.field_map_file),
        log_dir=get("default", "log_dir", d.log_dir),
        datetransform_type=get("dcc_transforms", "datetransform_type", d.datetransform_type),
        standard_date=get("dcc_transforms", "standard_date", d.standard_date),
        shifting_seconds=get("dcc_transforms", "shifting_seconds", d.shifting_seconds),
        dob_shift_inplace=get("dcc_transforms", "dob_shift_inplace", d.dob_shift_inplace),
        deid_data_file=get("dcc_transforms", "deid_data_file", d.deid_data_file),
        deid_data_dictionary_file=get("dcc_transforms", "deid_data_dictionary_file", d.deid_data_dictionary_file),
        secondary_id_file=get("dcc_transforms", "secondary_id_file", d.secondary_id_file),
        project_id=get("redcap", "project_id", d.project_id),
        project_type=get("redcap", "project_type", d.project_type),
        study_id_column=get("redcap", "study_id_column", d.study_id_column),
        include_metadata=get("redcap", "include_metadata", d.include_metadata),
        api_endpoint=get("datalake", "api_endpoint", d.api_endpoint),
        record_chunk_size=get("datalake", "record_chunk_size", d.record_chunk_size),
    )
    return cfg.validate()
