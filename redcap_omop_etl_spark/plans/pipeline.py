"""The transform-plugin framework, Spark-first.

The reference's extension point (``/root/reference/transform.py:4-39``) is a
class with ``process_records()`` mutating a Python list in place and
emitting a second EAV stream tagged with a ``data_namespace``
(``transform.py:9-24``), orchestrated eagerly by ``do_transforms``
(``redcap-etl.py:358-380``).

Here a Transform is a pure function ``DataFrame → TransformOutput``:

- ``records``: the (possibly augmented) main stream — transforms add real
  columns (e.g. ``date_cleaned``) instead of per-row dict keys, so
  downstream dependencies are visible to Catalyst as data flow.
- ``emitted``: optional namespace-tagged side stream in the reference's
  transform-record envelope ``{record_id, namespace, field_name,
  field_value}`` (``transform.py:16-24``).

``Pipeline.run`` threads the main stream through every stage lazily —
nothing executes until an action — and unions the emitted streams
(U5, ``redcap-etl.py:363,377``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSFORM_RECORD_COLUMNS = ["record_id", "namespace", "field_name", "field_value"]


@dataclass
class TransformOutput:
    records: DataFrame
    emitted: DataFrame | None = None  # transform-record envelope stream
    metadata: dict[str, list[str]] = field(default_factory=dict)  # namespace -> emitted field names


@dataclass
class Transform:
    """A named pipeline stage with namespace-tagged emission."""

    name: str
    namespace: str
    fn: Callable[[DataFrame], TransformOutput]

    def __call__(self, records: DataFrame) -> TransformOutput:
        out = self.fn(records)
        if out.emitted is not None:
            # namespace is stamped by the pipeline if absent
            required = [c for c in TRANSFORM_RECORD_COLUMNS if c != "namespace"]
            missing = [c for c in required if c not in out.emitted.columns]
            if missing:
                raise ValueError(f"transform {self.name!r} emitted stream missing {missing}")
        return out


def tag_namespace(emitted: DataFrame, namespace: str) -> DataFrame:
    """Stamp the provenance namespace (transform.py:9,14) as a column."""
    return emitted.withColumn("namespace", F.lit(namespace)).select(*TRANSFORM_RECORD_COLUMNS)


@dataclass
class PipelineResult:
    records: DataFrame
    transform_records: DataFrame | None
    transform_metadata: dict[str, list[str]]


class Pipeline:
    """Ordered, lazily-composed transform stages (do_transforms analog).

    Ordering is semantic, not incidental: e.g. the date transform must
    precede the PHI filter because the filter consumes the transform's
    ``date_cleaned`` column (redcap-etl.py:414-416) — the dependency is
    data flow, so no scheduler hints are needed.
    """

    def __init__(self, transforms: list[Transform]):
        self.transforms = list(transforms)

    def run(self, records: DataFrame) -> PipelineResult:
        emitted: list[DataFrame] = []
        metadata: dict[str, list[str]] = {}
        current = records
        for t in self.transforms:
            out = t(current)
            current = out.records
            if out.emitted is not None:
                emitted.append(tag_namespace(out.emitted, t.namespace) if "namespace" not in out.emitted.columns else out.emitted.select(*TRANSFORM_RECORD_COLUMNS))
                metadata.setdefault(t.namespace, [])
            for ns, fields in out.metadata.items():
                metadata.setdefault(ns, []).extend(f for f in fields if f not in metadata.get(ns, []))
        all_emitted = reduce(DataFrame.unionByName, emitted) if emitted else None
        return PipelineResult(records=current, transform_records=all_emitted, transform_metadata=metadata)
