"""Z-order layout: per-file min/max envelopes must tighten on BOTH
clustered columns vs an unclustered write, so row-group/file stats prune
predicates on either column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.layout import write_zordered, zorder_code


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((float(mn), float(mx)))
    return out


def _avg_span(ranges: list[tuple[float, float]]) -> float:
    return sum(mx - mn for mn, mx in ranges) / len(ranges)


class TestZorderLayout:
    def test_envelopes_tighten_on_both_columns(self, spark, tmp_path):
        # two independent uniform dims — the adversarial case for 1-D
        # sorting (sorting by x leaves y full-range in every file)
        n = 50_000
        df = (
            spark.range(n)
            .select(
                (F.xxhash64("id") % 1000).alias("x"),
                (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
            )
            .select(F.abs("x").alias("x"), F.abs("y").alias("y"))
        )
        base, zord = str(tmp_path / "base"), str(tmp_path / "zord")
        df.repartition(8).write.parquet(base)
        write_zordered(df, zord, ["x", "y"], n_files=8)

        for col in ["x", "y"]:
            full = _avg_span(_file_ranges(base, col))
            tight = _avg_span(_file_ranges(zord, col))
            # 8 files over a 2-D morton curve → each covers ~1/8 of the
            # area, so per-dim span shrinks to roughly 1/sqrt(8) ≈ 0.35;
            # assert a conservative 0.7
            assert tight < 0.7 * full, (col, tight, full)

        # data survives the rewrite byte-for-byte
        a = spark.read.parquet(base).agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
        b = spark.read.parquet(zord).agg(F.sum("x"), F.sum("y"), F.count("*")).collect()
        assert a == b

    def test_zorder_code_locality(self, spark):
        # nearby points share high morton bits; distant points differ:
        # the code must depend on both inputs
        df = spark.createDataFrame([(0, 0), (0, 999), (999, 0), (999, 999)], "x long, y long")
        codes = [r.z for r in df.select(zorder_code(df, ["x", "y"], bits=8).alias("z")).collect()]
        assert len(set(codes)) == 4
        assert codes[0] < codes[3]
