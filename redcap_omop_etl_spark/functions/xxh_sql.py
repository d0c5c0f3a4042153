"""DuckDB SQL replay of Spark's ``xxhash64`` (seed 42) — closes the last
``no_oracle`` gap in the registry.

Spark's ``F.xxhash64(col)`` on a string hashes the UTF-8 bytes with the
standard XXH64 algorithm at seed 42 and returns the result as a SIGNED
64-bit long. DuckDB has no xxhash64 builtin, so the five ``_fast``
production-hash twins (MinHash clusters, soft-dedup weights, DSIR
weights, Poisson bootstrap, quality classifier) historically ran with
rows-only driver checks. This module generates a pure-SQL XXH64 — the
same unrolled-integer-SQL technique as the md5 band replay
(``dedup.py::minhash_banded_sql_cte``) and the Lloyd/PQ recurrences —
so every fast twin gets a full cross-engine value oracle.

Construction notes (each measured, see tests/test_xxh_sql.py):

- All arithmetic is HUGEINT mod 2**64. A 64x64-bit product can exceed
  INT128, so ``_mul64`` splits the left operand into 32-bit halves:
  ``(a*b) mod 2^64 = (a_lo*b + ((a_hi*b) mod 2^32)*2^32) mod 2^64`` —
  every intermediate stays below 2**97.
- Bytes come from ``hex(encode(s))``; little-endian words are built by
  reversing hex byte-pairs into one ``'0x…'::UBIGINT`` cast (DuckDB
  BLOBs have no direct byte indexing).
- XXH64's four stripe accumulators are INDEPENDENT sequential folds
  over their own lane's words, so each is a ``list_reduce`` (the
  accumulator seed rides as ``list_prepend``'s head — DuckDB's
  list_reduce uses the first element as init). No recursion needed.
- Every stage is ``AS MATERIALIZED``: DuckDB re-inlines chained CTEs,
  and the avalanche chain would otherwise re-expand exponentially (the
  documented BPE-oracle trap).
- Fold lambdas evaluate interpreted per element with cost proportional
  to expression-tree size, so anything not depending on the running
  accumulator (``w*PRIME2``, ``round0(w)``, ``byte*PRIME5``) is
  precomputed in a vectorized ``list_transform`` first — 4x wall on the
  16k-shingle sf0.01 corpus (5.3s -> 1.3s).

Callers should hash DISTINCT strings and join back when the input has
repeats (bigram/feature streams are Zipfian); see the fast-twin oracles.
"""

from __future__ import annotations

_M64 = 1 << 64
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SEED = 42

_V1_INIT = (_SEED + _P1 + _P2) % _M64
_V2_INIT = (_SEED + _P2) % _M64
_V3_INIT = _SEED % _M64
_V4_INIT = (_SEED - _P1) % _M64
_H_SMALL = (_SEED + _P5) % _M64  # running-hash init when L < 32


def _h(n: int) -> str:
    return f"{n}::HUGEINT"


_MOD = "18446744073709551616::HUGEINT"


def _mul64(a: str, b: str) -> str:
    return (
        f"(((({a}) % 4294967296) * ({b}) + "
        f"(((({a}) // 4294967296) * ({b})) % 4294967296) * 4294967296) % {_MOD})"
    )


def _add64(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {_MOD})"


def _rotl(x: str, r: int) -> str:
    # disjoint bit ranges, so + is |
    return f"(((({x}) * {1 << r}) % {_MOD}) + (({x}) // {1 << (64 - r)}))"


def _round0(w: str) -> str:
    # XXH64 round with acc=0: rotl31(w * P2) * P1
    return _mul64(_rotl(_mul64(w, _h(_P2)), 31), _h(_P1))


def xxh64_sql_cte(
    input_cte: str,
    col: str = "s",
    keys: tuple[str, ...] = (),
    prefix: str = "__x",
) -> str:
    """CTE chain computing ``h64 = xxhash64(col)`` (Spark-signed BIGINT)
    for every row of ``input_cte``.

    Emits ``{prefix}xh`` with columns ``*keys``, ``{prefix}s`` (the
    input string, for joining back), and ``h64``. ``prefix`` must be
    unique per instance when a query splices two chains (the quality
    classifier hashes both its feature stream and its weight table).
    Splice directly after ``WITH`` alongside other CTEs.
    """
    p = prefix
    s = f"{p}s"
    carry = "".join(f"{k}, " for k in keys)
    word = (
        "('0x' || "
        + " || ".join(f"substring(hx, (16*j + {2 * i + 1})::INT, 2)" for i in reversed(range(8)))
        + ")::UBIGINT::HUGEINT"
    )
    u32 = (
        "('0x' || "
        + " || ".join(
            f"substring(hx, (2*(L - (L % 8)) + {2 * i + 1})::INT, 2)" for i in reversed(range(4))
        )
        + ")::BIGINT::HUGEINT"
    )
    lane_folds = []
    for lane, init in enumerate((_V1_INIT, _V2_INIT, _V3_INIT, _V4_INIT)):
        lane_w2 = f"list_transform(range(0, L // 32), k -> ws2[4*k + {lane + 1}])"
        step = _mul64(_rotl(_add64("a", "w2"), 31), _h(_P1))
        lane_folds.append(
            f"CASE WHEN L >= 32 THEN list_reduce(list_prepend({_h(init)}, {lane_w2}), "
            f"(a, w2) -> {step}) ELSE 0::HUGEINT END AS v{lane + 1}"
        )
    h0 = _add64(
        _add64(_add64(_rotl("v1", 1), _rotl("v2", 7)), _rotl("v3", 12)), _rotl("v4", 18)
    )
    merged = (
        f"list_reduce(list_prepend({h0}, "
        f"list_transform([v1, v2, v3, v4], v -> {_round0('v')})), "
        f"(a, rv) -> {_add64(_mul64('xor(a, rv)', _h(_P1)), _h(_P4))})"
    )
    vcols = ",\n        ".join(lane_folds)
    return f"""{p}b AS MATERIALIZED (
      SELECT {carry}{col} AS {s},
             octet_length(encode({col}))::BIGINT AS L,
             hex(encode({col})) AS hx
      FROM {input_cte}
    ), {p}w AS MATERIALIZED (
      SELECT *, list_transform(range(0, L // 8), j -> {word}) AS ws
      FROM {p}b
    ), {p}w2 AS MATERIALIZED (
      SELECT *, list_transform(ws, w -> {_mul64('w', _h(_P2))}) AS ws2
      FROM {p}w
    ), {p}v AS MATERIALIZED (
      SELECT *,
        {vcols}
      FROM {p}w2
    ), {p}m AS MATERIALIZED (
      SELECT *, {_add64(f"CASE WHEN L >= 32 THEN {merged} ELSE {_h(_H_SMALL)} END", "L::HUGEINT")} AS h1
      FROM {p}v
    ), {p}t AS MATERIALIZED (
      SELECT *, list_reduce(list_prepend(h1,
          list_transform(range((L // 32) * 4, L // 8),
                         j -> {_mul64(_rotl('ws2[j + 1]', 31), _h(_P1))})),
        (a, k) -> {_add64(_mul64(_rotl('xor(a, k)', 27), _h(_P1)), _h(_P4))}) AS h2
      FROM {p}m
    ), {p}u AS MATERIALIZED (
      SELECT *, CASE WHEN L % 8 >= 4
        THEN {_add64(_mul64(_rotl(f"xor(h2, {_mul64(u32, _h(_P1))})", 23), _h(_P2)), _h(_P3))}
        ELSE h2 END AS h3
      FROM {p}t
    ), {p}y AS MATERIALIZED (
      SELECT *, list_reduce(list_prepend(h3,
          list_transform(range(L - (L % 8) + CASE WHEN L % 8 >= 4 THEN 4 ELSE 0 END, L),
                         i -> {_mul64("('0x' || substring(hx, (2*i + 1)::INT, 2))::BIGINT::HUGEINT", _h(_P5))})),
        (a, kb) -> {_mul64(_rotl('xor(a, kb)', 11), _h(_P1))}) AS h4
      FROM {p}u
    ), {p}a1 AS MATERIALIZED (
      SELECT {carry}{s}, xor(h4, h4 // 8589934592::HUGEINT) AS a1 FROM {p}y
    ), {p}a2 AS MATERIALIZED (
      SELECT {carry}{s}, {_mul64('a1', _h(_P2))} AS a2 FROM {p}a1
    ), {p}a3 AS MATERIALIZED (
      SELECT {carry}{s}, xor(a2, a2 // 536870912::HUGEINT) AS a3 FROM {p}a2
    ), {p}a4 AS MATERIALIZED (
      SELECT {carry}{s}, {_mul64('a3', _h(_P3))} AS a4 FROM {p}a3
    ), {p}a5 AS MATERIALIZED (
      SELECT {carry}{s}, xor(a4, a4 // 4294967296::HUGEINT) AS a5 FROM {p}a4
    ), {p}xh AS (
      SELECT {carry}{s},
        (CASE WHEN a5 >= 9223372036854775808::HUGEINT
              THEN a5 - {_MOD}
              ELSE a5 END)::BIGINT AS h64
      FROM {p}a5
    )"""


def xxh64_pmod(n: int, h: str = "h64") -> str:
    """Spark ``F.pmod(xxhash64(...), n)`` over the signed ``h64``."""
    return f"((({h}) % {n}) + {n}) % {n}"
