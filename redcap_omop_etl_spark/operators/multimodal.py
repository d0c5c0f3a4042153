"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Net-new LLM-data-pipeline surface (BASELINE.json north star). Images /
audio / video ride through the engine as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages so the heavy bytes never leave the
executor and Python sees whole record batches, not rows.

The actual codec work is STUBBED (this container ships no image/audio
libs): ``decode_media`` falls back to a clearly-marked deterministic fake
when PIL/torchvision-style decoders are absent, and ``resize_media``
raises ``NotImplementedError`` without a real decoder. The Spark-side
contract — schemas, batch iteration, partition sizing, UDF signatures — is
real and tested; swapping in a real codec changes only the inner
``_decode_bytes`` function.

Scale notes: payload columns dominate row size, so stages that don't need
bytes must ``select`` them away BEFORE shuffling (column pruning does not
help once bytes are packed into shuffle files). ``media_feature_stats``
demonstrates the pattern: featurize via mapInPandas (no shuffle), drop the
payload, then aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder, if the environment has one
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

# Canonical multimodal schema fragment: payload + typed metadata.
MEDIA_STRUCT = T.StructType(
    [
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # e.g. image/png, audio/wav
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("histogram16", T.ArrayType(T.DoubleType())),
    ]
)


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the text,
    metadata derived from its length. Stands in for a real image/audio
    ingest so the downstream plumbing is exercised end-to-end."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.struct(
            F.encode(F.col(text_col), "utf-8").alias("payload"),
            F.lit("image/fake").alias("media_type"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n % 24 + 1).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def _decode_bytes(payload: bytes) -> "object":
    """Decode payload → pixel array. STUB: with no codec libs in this
    container, returns the raw byte buffer as the 'decoded' array — a
    deterministic fake with the same downstream interface."""
    import numpy as np

    if _HAS_PIL:
        raise NotImplementedError("real PIL decode path not wired in this container")
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media_df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each Python worker receives record batches, vectorizes
    over the batch with numpy, and emits a narrow (payload-free) feature
    frame. This is the template for any real decode/embed stage.
    """

    # The closure must be SELF-CONTAINED (locals + stdlib/pandas/numpy
    # only): referencing module-level helpers would make cloudpickle
    # serialize them by module reference, and the driver's Python workers
    # cannot import this package when the driver runs from another cwd
    # (measured: ModuleNotFoundError under the external driver harness).
    has_pil = _HAS_PIL
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if has_pil:
                    raise NotImplementedError("real PIL decode path not wired in this container")
                arr = np.frombuffer(payload, dtype=np.uint8)  # stub decode (see _decode_bytes)
                hist = np.histogram(arr, bins=16, range=(0, 256))[0].astype("float64")
                rows.append(
                    (
                        int(doc_id),
                        int(arr.size),
                        float(arr.mean()) if arr.size else 0.0,
                        float(arr.std()) if arr.size else 0.0,
                        (hist / max(hist.sum(), 1.0)).tolist(),
                    )
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    narrow = media_df.select("doc_id", F.col("media.payload").alias("payload"))
    return narrow.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample(media_df: DataFrame, every_k: int = 4) -> DataFrame:
    """Video-style frame sampling: explode each payload into its sampled
    'frames' (deterministic fake: equal byte slices), keeping frame index.
    Pure DataFrame ops — the slice arithmetic is JVM-side."""
    m = media_df.select("doc_id", F.col("media.payload").alias("p"), F.col("media.n_frames").alias("nf"))
    idx = F.sequence(F.lit(0), F.col("nf") - 1, F.lit(every_k))
    frame_len = (F.length("p") / F.col("nf")).cast("int")
    return (
        m.withColumn("frame_idx", F.explode(idx))
        .select(
            "doc_id",
            "frame_idx",
            F.substring(
                F.col("p").cast("string"), (F.col("frame_idx") * frame_len + 1).cast("int"), frame_len
            ).alias("frame_bytes"),
        )
    )


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: requires a real image codec; the Spark contract
    (signature + schema) is the deliverable here."""
    raise NotImplementedError("resize requires an image codec not present in this container")


def media_feature_stats(docs: DataFrame) -> DataFrame:
    """End-to-end demo pipeline: synth ingest → Arrow featurize → payload
    dropped → aggregate. The shape a real multimodal pipeline takes."""
    feats = extract_features(synth_media(docs))
    return feats.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
        F.round(F.avg("n_bytes"), 4).alias("avg_n_bytes"),
    )


# --------------------------------------------------------------------------
# Registered workload queries — the multimodal plumbing is driver-visible:
# the Arrow mapInPandas featurize path is verified per-row against the
# oracle (payload byte counts), and frame sampling against its closed form.
# --------------------------------------------------------------------------
from pyspark.sql import SparkSession  # noqa: E402

from redcap_omop_etl_spark.sources.readers import Catalog, fan_out  # noqa: E402
from redcap_omop_etl_spark.workload import register  # noqa: E402


@register(
    "multimodal_featurize",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    doc="Arrow-batched mapInPandas featurize over binary payloads; the "
    "byte count is the oracle-checkable projection (byte_mean/std/"
    "histogram16 are pinned by pytest TestMultimodal).",
)
def multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(Catalog(spark, sf_dir)["documents"])
    return extract_features(synth_media(docs)).select("doc_id", "n_bytes")


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, ((length(text) % 24 + 1) - 1) // 4 + 1 AS n_sampled
    FROM documents
    """,
    doc="Video-style frame sampling (explode payload into every-4th "
    "frame); sampled-frame counts match the closed form.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir)["documents"]
    frames = frame_sample(synth_media(docs), every_k=4)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sampled"))


def chunk_media(media_df: DataFrame, window: int = 64, hop: int = 48) -> DataFrame:
    """Audio-style fixed-window chunking: payload bytes sliced into
    ``window``-byte chunks every ``hop`` bytes (overlapping when
    hop < window) — the waveform-segmentation batch shape, runnable on raw
    bytes with no codec. Arrow ``mapInPandas``: each input batch explodes
    into its chunk rows executor-side; chunk payloads never visit the
    driver. The closure is self-contained (locals only) for foreign-cwd
    drivers.
    """
    out_schema = "doc_id long, chunk_idx int, chunk_bytes binary, n_bytes int"

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                idx = 0
                for pos in range(0, max(len(data), 1), hop):
                    chunk = data[pos : pos + window]
                    if not chunk:
                        break
                    rows.append((int(doc_id), idx, chunk, len(chunk)))
                    idx += 1
            yield pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_bytes", "n_bytes"])

    return media_df.select("doc_id", F.col("media.payload").alias("payload")).mapInPandas(
        chunker, out_schema
    )


@register(
    "multimodal_chunk_audio",
    """
    SELECT doc_id,
           cast((octet_length(encode(text)) - 1) // 48 + 1 AS int) AS n_chunks
    FROM documents
    """,
    doc="Audio-style overlapping byte-window chunking (window 64, hop 48) "
    "via Arrow mapInPandas; per-doc chunk counts match the closed form "
    "floor((n_bytes-1)/hop)+1.",
)
def multimodal_chunk_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(Catalog(spark, sf_dir)["documents"])
    chunks = chunk_media(synth_media(docs), window=64, hop=48)
    return chunks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("n_chunks"))
