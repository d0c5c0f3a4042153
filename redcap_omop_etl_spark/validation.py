"""Schema + constraint validation with error side-channels.

Re-expresses the reference's pandera usage (V1,
``dcc_transforms.py:240-245``: all-string columns, ``strict=True`` — exact
column set) and its never-abort error policy (V3,
``dcc_transforms.py:59-73``; ``redcap-etl.py:322-327``) for distributed
DataFrames:

- ``expect_columns`` / ``expect_schema``: driver-side structural asserts —
  free (no job runs).
- ``check``: declarative row-level constraints evaluated in ONE pass via
  conditional aggregation (no per-constraint actions); violations
  optionally split into an errors DataFrame, mirroring skip-and-log.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaValidationError(ValueError):
    pass


def expect_columns(df: DataFrame, columns: list[str], strict: bool = True) -> DataFrame:
    """Exact (strict) or subset column-set assertion, pandera-style."""
    have, want = list(df.columns), list(columns)
    missing = [c for c in want if c not in have]
    extra = [c for c in have if c not in want]
    if missing or (strict and extra):
        raise SchemaValidationError(f"column mismatch: missing={missing} extra={extra if strict else '-'}")
    return df


def expect_schema(df: DataFrame, schema: T.StructType, strict: bool = True) -> DataFrame:
    """Name+type assertion against a StructType (nullability ignored — it
    is advisory in file sources)."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in schema.fields}
    problems = [f"{n}: want {t}, have {have.get(n)}" for n, t in want.items() if have.get(n) != t]
    if strict:
        problems += [f"{n}: unexpected" for n in have if n not in want]
    if problems:
        raise SchemaValidationError("; ".join(problems))
    return df


@dataclass
class CheckResult:
    clean: DataFrame
    errors: DataFrame          # one row per violating input row, with `violations` array
    counts: dict[str, int]     # constraint name -> violation count (one job)


def check(df: DataFrame, constraints: dict[str, Column]) -> CheckResult:
    """Evaluate named row-level constraints (Column predicates that must be
    TRUE) in a single aggregation pass; split violators out.

    Counting uses one conditional-agg job over the scan; the clean/errors
    views are lazy. At 100 TB: one pass for the audit numbers, and the
    split predicates push down into the scan.
    """
    null_safe = {name: F.coalesce(pred, F.lit(False)) for name, pred in constraints.items()}
    agg = df.agg(
        *[F.sum(F.when(~pred, 1).otherwise(0)).cast("long").alias(name) for name, pred in null_safe.items()]
    )
    row = agg.head()
    counts = {name: int(row[name] or 0) for name in constraints}

    all_ok = None
    for pred in null_safe.values():
        all_ok = pred if all_ok is None else (all_ok & pred)
    if all_ok is None:
        all_ok = F.lit(True)

    violations = F.filter(
        F.array(*[F.when(~pred, F.lit(name)).otherwise(F.lit(None)) for name, pred in null_safe.items()]),
        lambda x: x.isNotNull(),
    )
    clean = df.filter(all_ok)
    errors = df.filter(~all_ok).withColumn("violations", violations)
    return CheckResult(clean=clean, errors=errors, counts=counts)


def assert_unique_key(df: DataFrame, keys: list[str]) -> None:
    """Key-uniqueness audit (the reference assumes one np_dob per record,
    dcc_transforms.py:44-49 — this makes the assumption checkable)."""
    dupes = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dupes:
        raise SchemaValidationError(f"duplicate key {keys}: {dupes[0]}")
