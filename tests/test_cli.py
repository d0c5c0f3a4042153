"""CLI lifecycle parity (SURVEY §3.1): config -> extract -> transform ->
chunked transmit, with the -w dry-run sink (fail-if-exists) and -p debug
pivot."""

from __future__ import annotations

import glob
import json

import pytest

from redcap_omop_etl_spark import cli

INI = """
[default]
field_map_file =
log_dir =

[dcc_transforms]
datetransform_type = dob_shifting
standard_date = 2030-01-01 00:00:00

[redcap]
project_id = 4242
project_type = demo
include_metadata = true

[datalake]
api_endpoint = http://example.invalid
record_chunk_size = 50
"""


@pytest.fixture(scope="module")
def ini_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "config.ini"
    p.write_text(INI)
    return str(p)


class TestCliLifecycle:
    def test_fake_dry_run_writes_envelopes(self, spark, ini_path, tmp_path):
        out = str(tmp_path / "payloads")
        summary = cli.main(["-c", ini_path, "-f", "-w", out, "--run-datetime", "2026-01-01"], spark=spark)
        assert summary["kept_rows"] > 0
        assert summary["chunks"] >= 2  # 25 ids x kept fields / 50-row chunks

        lines = []
        for f in glob.glob(out + "/part-*"):
            with open(f) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
        assert len(lines) == summary["chunks"]
        payloads = [json.loads(ln) for ln in lines]
        assert {p["chunk_number"] for p in payloads} == set(range(1, summary["chunks"] + 1))
        assert all(p["redcap_project_id"] == "4242" for p in payloads)
        assert all(p["extraction_run_datetime"] == "2026-01-01" for p in payloads)
        total = sum(len(p["redcap_records"]) for p in payloads)
        assert total == summary["kept_rows"]
        # date de-identification applied: every visit_date is shifted into
        # the standard-date era, no raw 2020 dates survive
        vals = [
            r["value"]
            for p in payloads
            for r in p["redcap_records"]
            if r["field_name"] == "visit_date"
        ]
        assert vals and all(v.startswith("20") and v >= "2029" for v in vals)

    def test_dry_run_sink_fails_if_exists(self, spark, ini_path, tmp_path):
        out = str(tmp_path / "payloads2")
        cli.main(["-c", ini_path, "-f", "-w", out], spark=spark)
        with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
            cli.main(["-c", ini_path, "-f", "-w", out], spark=spark)

    def test_summary_without_sinks(self, spark, ini_path):
        summary = cli.main(["-c", ini_path, "-f"], spark=spark)
        assert summary["kept_rows"] > 0
        assert "payload_path" not in summary
