"""Similarity search over embedding columns (array<float>).

Net-new LLM-data-pipeline surface (BASELINE.json north star):

- **Brute-force cosine top-k** — the correctness baseline. Dot products via
  higher-order functions (``zip_with`` + ``aggregate``) in double
  precision, entirely JVM-side; ranking via a window. O(N·d) per query
  vector with no shuffle until the final top-k.
- **Random-hyperplane LSH ANN** — the scale path. Deterministic
  pseudo-random hyperplanes (no RNG: plane weights derive from
  ``xxhash64(plane, dim)``), sign pattern → bucket; search only collides
  within bucket ∪ multiprobe neighbors. Candidates ∝ N/2^bits.
- **Embedding near-dup pairs** — all pairs with cosine ≥ τ, the
  embedding-space analog of dedup; LSH-bucketed at scale.

Oracles: DuckDB computes the same double-precision formula via
``list_dot_product``/casts, with results rounded (4dp) on both sides
before the top-k ordering so the selected sets agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k against a constant query vector.

    The query vector is a literal array folded into the plan (broadcast by
    value); ranking is on (rounded cosine desc, id) so results are
    deterministic under ties.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim")
    )
    # sort+limit compiles to TakeOrderedAndProject (per-partition top-k
    # heaps merged on the driver) — no single-partition window shuffle, so
    # this survives N=billions; the rank column is added over the k
    # survivors only.
    topk = scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    w = W.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def hyperplane_bits(vec: Column, n_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane signature (long with n_planes bits).

    Plane p's weight for dimension d is a pseudo-random ±{1,3} drawn from
    ``xxhash64(p, d)`` — reproducible across runs/partitions with no RNG
    or broadcast state, and cheap to fold into codegen.
    """
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(_plane_weight(p, d)) for d in range(dim)]),
                lambda x, wgt: x.cast("double") * wgt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return sig


def _plane_weight(p: int, d: int) -> float:
    # xxhash64-free driver-side derivation (plans stay small): splitmix-ish
    z = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    z ^= z >> 31
    return [1.0, -1.0, 3.0, -3.0][z % 4]


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the brute-force scan to vectors whose
    hyperplane signature is within Hamming distance 1 of the query's
    (multiprobe), then rank exactly. At scale the bucket predicate prunes
    the scan to ~N·(n_planes+1)/2^n_planes vectors."""
    dim = len(query_vec)
    qsig = 0
    for p in range(n_planes):
        proj = sum(query_vec[d] * _plane_weight(p, d) for d in range(dim))
        if proj > 0:
            qsig |= 1 << p
    probe_sigs = [qsig] + [qsig ^ (1 << p) for p in range(n_planes)]

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sig = hyperplane_bits(F.col(vec_col), n_planes, dim)
    candidates = embeddings.withColumn("__sig", sig).filter(F.col("__sig").isin(probe_sigs))
    scored = candidates.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
    topk = scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    w = W.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding", block_col: str | None = None
) -> DataFrame:
    """All pairs with cosine ≥ threshold. With ``block_col`` the join is
    restricted to equal blocks (e.g. an LSH bucket or label) — the scale
    path; without it, a full cross self-join (small-N baseline)."""
    a = embeddings.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), *( [F.col(block_col).alias("blk")] if block_col else []))
    b = embeddings.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), *( [F.col(block_col).alias("blk2")] if block_col else []))
    cond = F.col("id1") < F.col("id2")
    if block_col:
        joined = a.join(b, (F.col("blk") == F.col("blk2")) & cond)
    else:
        joined = a.join(b, cond)
    return (
        joined.withColumn("cos_sim", F.round(cosine(F.col("v1"), F.col("v2")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "cos_sim")
    )


# --------------------------------------------------------------------------
# Registered workload queries
# --------------------------------------------------------------------------
_QUERY_VEC_SQL = """
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], qv)
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
      FROM embeddings, q
    )
    SELECT vec_id, cos_sim, rank FROM (
      SELECT vec_id, cos_sim, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 10
"""


@register(
    "similarity_cosine_topk",
    _QUERY_VEC_SQL,
    doc="Brute-force cosine top-10 vs the vec_id=0 query vector.",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir)["embeddings"]
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    return cosine_topk(emb, qv, k=10)


@register(
    "similarity_topk_per_label",
    """
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT vec_id, label,
             round(list_dot_product(embedding::DOUBLE[], qv)
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
      FROM embeddings, q
    )
    SELECT vec_id, label, cos_sim, rank FROM (
      SELECT vec_id, label, cos_sim,
             row_number() OVER (PARTITION BY label ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    WHERE rank <= 3
    """,
    doc="Grouped similarity search: top-3 per label partition.",
)
def similarity_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir)["embeddings"]
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = F.array(*[F.lit(float(x)) for x in qrow[0]])
    scored = emb.select("vec_id", "label", F.round(cosine(F.col("embedding"), q), 4).alias("cos_sim"))
    w = W.partitionBy("label").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


@register(
    "similarity_ann_lsh",
    None,  # approximate + engine-specific hashing; recall pinned by pytest
    doc="ANN top-10 via deterministic random-hyperplane LSH with multiprobe.",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir)["embeddings"]
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    return ann_lsh_topk(emb, qv, k=10, n_planes=8)


@register(
    "embedding_near_dup",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs, label-blocked (scale: LSH blocks); synthetic embeddings are near-orthogonal so τ=0.4.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir)["embeddings"]
    return embedding_near_dup_pairs(emb, threshold=0.4, block_col="label")
