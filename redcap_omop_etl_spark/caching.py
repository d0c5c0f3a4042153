"""Cache-ownership discipline for operators that persist intermediates.

Several operators ``.cache()``/``.persist()`` an intermediate that feeds
multiple branches of their plan (shingle tables, daily series, Gram
partials …). The DataFrame they RETURN references that cached
intermediate lazily, so the operator itself can never safely unpersist —
only the caller knows when the last action over the result has run. In a
one-query-per-process run that's moot, but a long-lived session composing
many operators would accumulate storage blocks until eviction pressure
hurts (``spark.catalog.clearCache()`` works but nukes caller-owned caches
too).

Convention: every operator-internal cache goes through ``tracked_cache``
(or ``tracked_persist``); session owners call
``unpersist_operator_caches()`` at their operator-composition boundaries
(bench.py does so between queries). Caller-created caches are untouched —
the registry only ever holds what operators created internally.

The registry holds STRONG references deliberately: the Python DataFrame
handle is the only way to unpersist later, and the operator's local
reference dies with its frame while the JVM-side cache lives on (a
weakref registry was tried — every entry was already dead by release
time). The held object is just a plan handle; the storage it pins is
pinned by the cache itself, which is exactly what release reclaims, and
the registry drains on every ``unpersist_operator_caches()`` call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_TRACKED_CKPT_RDDS: list = []  # JVM RDDs backing tracked_checkpoint frames


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for ``unpersist_operator_caches``."""
    out = df.cache()
    _TRACKED.append(out)
    return out


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for ``unpersist_operator_caches``."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def tracked_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` + register for release.

    Same single-materialization purpose as ``tracked_persist``, plus a
    PLAN barrier: the returned frame's logical plan is a leaf (LogicalRDD),
    so every downstream action re-plans from the barrier instead of
    re-analyzing the full upstream lineage. Use at tick/transition
    boundaries of deeply composed maintenance queries, where profiling
    showed ~1 s Catalyst stalls per action over persisted-but-not-
    truncated plans (the persisted node still carries its whole subtree
    through analysis). Release: ``unpersist_operator_caches`` drops the
    registry reference and the checkpoint RDD blocks are freed by the
    ContextCleaner once the frame is garbage-collected — same lifecycle
    as the per-round loop checkpoints in connected_components/kcore."""
    out = df.localCheckpoint(eager=True)
    try:
        # The materialized blocks belong to the LogicalRDD's backing RDD,
        # which df.unpersist() does NOT reach (it only consults the SQL
        # CacheManager). Capture it so release is deterministic instead
        # of GC-timed — lingering checkpoint blocks from one query were
        # measured inflating later queries in a long bench run.
        _TRACKED_CKPT_RDDS.append(out._jdf.queryExecution().logical().rdd())
    except Exception:  # noqa: BLE001 - plan shape is an implementation detail
        pass
    _TRACKED.append(out)
    return out


_MEMO_REGISTRIES: list[dict] = []


def register_memo(registry: dict) -> dict:
    """Register a module-level session memo (localCheckpoint-backed
    materialized projections like the co-purchase edge list or a trained
    IVF index) for ``clear_session_memos``. Returns the registry so the
    call composes with the declaration site."""
    _MEMO_REGISTRIES.append(registry)
    return registry


def clear_session_memos() -> int:
    """Drop every registered session memo; returns how many entries were
    dropped. The checkpointed RDD blocks are released once the memoized
    DataFrames are garbage-collected (ContextCleaner); the next operator
    call simply re-materializes. Complements ``unpersist_operator_caches``
    for sessions that switch corpora or want a clean storage footprint."""
    n = 0
    for reg in _MEMO_REGISTRIES:
        n += len(reg)
        reg.clear()
    return n


def unpersist_operator_caches(blocking: bool = False) -> int:
    """Unpersist every operator-internal cache; returns how many.

    Idempotent. For ``tracked_cache``/``tracked_persist`` frames, safe
    while results are still lazily pending — Spark just recomputes on
    the next action. ``tracked_checkpoint`` frames are NOT recomputable
    after release (their lineage is the checkpoint); call only at
    operator-composition boundaries (between queries / pipeline stages,
    after outputs are collected or pinned), never mid-plan.
    """
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    _TRACKED.clear()
    for rdd in _TRACKED_CKPT_RDDS:
        try:
            rdd.unpersist(blocking)
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    _TRACKED_CKPT_RDDS.clear()
    return n
