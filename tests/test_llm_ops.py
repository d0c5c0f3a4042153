"""Tests for LLM-pipeline operators without a DuckDB oracle:
MinHash-LSH / SimHash recall+precision vs the exact operator, ANN recall
vs brute force, multimodal plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators import dedup, multimodal, similarity
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return Catalog(spark, SF_SMOKE)["documents"]


@pytest.fixture(scope="module")
def emb(spark):
    return Catalog(spark, SF_SMOKE)["embeddings"]


def _pair_set(df):
    return {(r.d1, r.d2) for r in df.select("d1", "d2").collect()}


class TestMinhash:
    def test_recall_and_precision_vs_exact(self, docs):
        exact = _pair_set(dedup.ngram_jaccard_pairs(docs, threshold=0.6))
        approx = _pair_set(dedup.minhash_lsh_pairs(docs, threshold=0.6))
        assert exact, "fixture should contain near-dup pairs"
        # verification step makes precision exact (modulo 31-bit hash collisions)
        assert approx <= exact or len(approx - exact) <= 1
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.85, f"LSH recall too low: {recall}"

    def test_synthetic_duplicates_found(self, spark):
        base = "the quick brown fox jumps over the lazy dog " * 8
        variant = base.replace("lazy", "sleepy", 1)
        rows = [(1, base), (2, base), (3, variant), (4, "completely different words " * 12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = _pair_set(dedup.minhash_lsh_pairs(df, threshold=0.5))
        assert (1, 2) in pairs
        assert (1, 3) in pairs and (2, 3) in pairs
        assert not any(4 in p for p in pairs)


class TestPrefixJaccard:
    def test_exact_recall_vs_uncapped_quadratic(self, docs):
        # PPJoin prefix filtering is a lossless candidate pruning: the pair
        # set must EQUAL the uncapped all-pairs variant's (not just overlap,
        # like the df_cap'd or sketch-based operators).
        exact = _pair_set(dedup.ngram_jaccard_pairs(docs, threshold=0.6))
        prefix = _pair_set(dedup.prefix_jaccard_pairs(docs, threshold=0.6))
        assert prefix == exact

    def test_prefix_length_formula(self):
        # p = sz - ceil(t*sz) + 1 is a strict subset of the posting list
        # for any sz >= 2 at t >= 0.5, and never empty
        import math

        for sz in (2, 10, 57, 1000):
            p = sz - math.ceil(sz * 0.6) + 1
            assert 1 <= p < sz


class TestSimhash:
    def test_synthetic_duplicates_found(self, spark):
        # long, diverse token stream: a one-token edit moves few bit votes,
        # so the fingerprint stays within a small Hamming ball
        base = " ".join(f"tok{i}" for i in range(400))
        variant = base.replace("tok250 ", "changed ", 1)
        rows = [(1, base), (2, base), (3, variant), (4, "totally unrelated content here " * 40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r.d1, r.d2): r.hamming for r in dedup.simhash_near_pairs(df, max_hamming=8).collect()}
        assert out.get((1, 2)) == 0  # identical docs → identical fingerprints
        assert (1, 3) in out  # near-identical → within hamming budget
        assert not any(4 in p for p in out)

    def test_overlaps_high_jaccard_pairs(self, docs):
        # corpus docs are short (~60 tokens): use a wider hamming budget
        high_j = _pair_set(dedup.ngram_jaccard_pairs(docs, threshold=0.95))
        sim = _pair_set(dedup.simhash_near_pairs(docs, max_hamming=8))
        if high_j:
            recall = len(sim & high_j) / len(high_j)
            assert recall >= 0.7, f"simhash missed high-jaccard pairs: {recall}"


class TestBandedNearDup:
    def test_recall_vs_unblocked_and_pruning(self, emb):
        full = {
            (r.id1, r.id2)
            for r in similarity.embedding_near_dup_pairs(emb, threshold=0.4).collect()
        }
        banded = {
            (r.id1, r.id2)
            for r in similarity.lsh_banded_near_dup_pairs(emb, threshold=0.4).collect()
        }
        assert full, "fixture should contain near-dup pairs"
        # exact-cosine verify makes the banded result a subset of ground truth
        assert banded <= full
        recall = len(banded) / len(full)
        assert recall >= 0.6, f"banded recall too low: {recall}"

    def test_candidate_set_shrinks(self, spark, emb):
        n = emb.count()
        banded = (
            emb.select(
                "vec_id",
                similarity.hyperplane_bits(F.col("embedding"), 8, 64).alias("s"),
            )
            .select(
                "vec_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.shiftrightunsigned("s", b * 2)
                                .bitwiseAND(F.lit(3).cast("long"))
                                .alias("bucket"),
                            )
                            for b in range(4)
                        ]
                    )
                ).alias("bk"),
            )
            .select("vec_id", "bk.band", "bk.bucket")
        )
        cands = (
            banded.alias("x")
            .join(
                banded.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select("x.vec_id", "y.vec_id")
            .distinct()
            .count()
        )
        assert cands < n * (n - 1) // 2, "banding must prune the all-pairs space"


class TestFuzzyBlocking:
    def test_composite_block_shrinks_candidates(self, spark):
        part = Catalog(spark, SF_SMOKE)["part"].select(
            "p_partkey", "p_name", "p_size", F.substring_index("p_name", " ", 1).alias("p_tok0")
        )
        a, b = part.alias("a"), part.alias("b")
        size_only = a.join(
            b,
            (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        ).count()
        composite = a.join(
            b,
            (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_tok0") == F.col("b.p_tok0"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        ).count()
        # the composite key multiplies block cardinality, so the quadratic
        # candidate space collapses (9× even at the tiny smoke SF; the
        # factor grows with data since block count scales with vocabulary)
        assert composite < size_only / 5, (composite, size_only)


class TestAnnLsh:
    def test_recall_vs_brute_force(self, emb):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
        brute = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()]
        approx = [r.vec_id for r in similarity.ann_lsh_topk(emb, qv, k=10, n_planes=8).collect()]
        assert approx[0] == 0  # the query vector is its own nearest neighbor
        overlap = len(set(brute) & set(approx)) / 10
        assert overlap >= 0.3, f"ANN recall vs brute force too low: {overlap}"

    def test_exact_topk_self_hit(self, emb):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
        top = similarity.cosine_topk(emb, qv, k=3).collect()
        assert top[0].vec_id == 7
        assert top[0].cos_sim == pytest.approx(1.0, abs=1e-3)


class TestAnnIvf:
    def test_recall_vs_brute_force(self, emb):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
        brute = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()]
        assignments, centroids = similarity.ivf_build(emb, n_clusters=16, n_iters=2)
        approx = [
            r.vec_id
            for r in similarity.ivf_topk(emb, assignments, centroids, qv, k=10, n_probes=4).collect()
        ]
        assert approx[0] == 0  # query vector is its own nearest neighbor
        overlap = len(set(brute) & set(approx)) / 10
        # measured 0.9 on the synthetic embeddings (label-cluster structure)
        assert overlap >= 0.6, f"IVF recall vs brute force too low: {overlap}"

    def test_every_vector_assigned_to_one_cell(self, emb):
        assignments, centroids = similarity.ivf_build(emb, n_clusters=8, n_iters=1)
        assert assignments.count() == emb.count()
        assert assignments.select("vec_id").distinct().count() == emb.count()
        assert centroids.count() <= 8


class TestMultimodal:
    def test_synth_schema_and_featurize(self, docs):
        media = multimodal.synth_media(docs.limit(20))
        assert [f.name for f in media.schema["media"].dataType.fields] == [
            "payload", "media_type", "width", "height", "n_frames",
        ]
        feats = multimodal.extract_features(media)
        rows = feats.collect()
        assert len(rows) == 20
        r = rows[0]
        assert r.n_bytes > 0 and 0 < r.byte_mean < 256
        assert len(r.histogram16) == 16
        assert sum(r.histogram16) == pytest.approx(1.0, abs=1e-9)

    def test_feature_determinism(self, docs):
        media = multimodal.synth_media(docs.limit(5))
        a = sorted(multimodal.extract_features(media).collect())
        b = sorted(multimodal.extract_features(media).collect())
        assert a == b

    def test_frame_sample(self, docs):
        media = multimodal.synth_media(docs.limit(10))
        frames = multimodal.frame_sample(media, every_k=4)
        out = frames.groupBy("doc_id").count().collect()
        assert len(out) == 10
        nf = {r.doc_id: r["media.n_frames"] if "media.n_frames" in frames.columns else None for r in []}
        for r in frames.select("frame_idx").distinct().collect():
            assert r.frame_idx % 4 == 0

    def test_resize_rejects_non_bmp_payloads(self, docs):
        # resize is REAL for BMP since round 7 (TestMediaCodecs pins the
        # nearest-neighbor path); non-BMP payloads — synth_media's fake
        # utf-8 bytes here — must fail loudly at execution, not decode
        # garbage silently.
        import py4j.protocol

        media = multimodal.synth_media(docs.limit(1))
        with pytest.raises((py4j.protocol.Py4JJavaError, Exception)) as ei:
            multimodal.resize_media(media, 64, 64).collect()
        assert "not a BMP payload" in str(ei.value)

    def test_stats_pipeline(self, docs):
        row = multimodal.media_feature_stats(docs.limit(50)).head()
        assert row.n_docs == 50
        assert row.avg_n_bytes > 0


class TestWinnowFingerprint:
    def test_duplicate_docs_share_fingerprint_set(self, spark):
        from redcap_omop_etl_spark.operators.textstats import winnow_fingerprints

        text = "the quick brown fox jumps over the lazy dog again and again today"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "an entirely different document about spark engines at scale")],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(df).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[1] == by_doc[2]          # exact dup → identical set
        assert by_doc[1] != by_doc[3]

    def test_shared_run_shares_a_fingerprint(self, spark):
        from redcap_omop_etl_spark.operators.textstats import winnow_fingerprints

        # winnowing guarantee: a shared run of >= w+k-1 (= 6) tokens
        # yields at least one shared fingerprint
        common = "alpha beta gamma delta epsilon zeta"
        df = spark.createDataFrame(
            [(1, f"xx yy {common} zz"), (2, f"{common} qq rr ss tt")],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(df).collect()
        s1 = {r.fp for r in fps if r.doc_id == 1}
        s2 = {r.fp for r in fps if r.doc_id == 2}
        assert s1 & s2


class TestIvfIndex:
    def test_persisted_index_matches_in_memory_search(self, spark, tmp_path):
        from redcap_omop_etl_spark.operators.similarity import (
            ivf_build,
            ivf_topk,
            ivf_topk_from_index,
            ivf_write_index,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE

        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
        assignments, centroids = ivf_build(emb, n_clusters=8, n_iters=2)
        path = str(tmp_path / "ivf")
        ivf_write_index(emb, assignments, centroids, path)

        mem = ivf_topk(emb, assignments, centroids, qv, k=10, n_probes=3).collect()
        disk_df = ivf_topk_from_index(spark, path, qv, k=10, n_probes=3)
        # the probe predicate prunes at listing time: cluster is a
        # partition column, so it must appear in PartitionFilters
        plan = disk_df._jdf.queryExecution().executedPlan().toString()
        scan_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
        assert "cluster" in scan_line.split("PartitionFilters")[1].split("]")[0]
        disk = disk_df.collect()
        assert [(r["vec_id"], r["cos_sim"]) for r in disk] == [
            (r["vec_id"], r["cos_sim"]) for r in mem
        ]


class TestRedaction:
    def test_crafted_pii_is_scrubbed(self, spark):
        from redcap_omop_etl_spark.operators.textstats import redact_pii

        df = spark.createDataFrame(
            [
                (1, "contact bob.smith+x@lab.example.org or 555-867-5309 now"),
                (2, "ssn-free but dial 123.456.7890"),
                (3, "no pii here"),
            ],
            "id int, text string",
        )
        got = {r["id"]: r["out"] for r in df.select("id", redact_pii(F.col("text")).alias("out")).collect()}
        assert got[1] == "contact [EMAIL] or [PHONE] now"
        assert got[2] == "ssn-free but dial [PHONE]"
        assert got[3] == "no pii here"


class TestBpeLearn:
    """The distributed merge loop must reproduce classic BPE exactly:
    greedy left-to-right merge application, argmax by (frequency, pair)."""

    @staticmethod
    def _python_bpe(word_counts, n_merges):
        seqs = {w: list(w) for w in word_counts}
        merges = []
        for rank in range(1, n_merges + 1):
            counts = {}
            for w, cnt in word_counts.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + cnt
            if not counts:
                break
            (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
            merges.append((rank, a, b, a + b, n))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if out and out[-1] == a and s[i] == b:
                        out[-1] = a + b
                    else:
                        out.append(s[i])
                    i += 1
                seqs[w] = out
        return merges

    def test_matches_python_reference(self, spark, docs):
        from redcap_omop_etl_spark.operators.textstats import bpe_learn, ws_tokens

        got = [tuple(r) for r in bpe_learn(docs, n_merges=5).collect()]
        wc = {
            r["w"]: r["cnt"]
            for r in docs.select(F.explode(ws_tokens(F.col("text"))).alias("w"))
            .filter(F.length("w") >= 2)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        want = self._python_bpe(wc, 5)
        assert got == want

    def test_batched_equals_sequential(self, spark, docs):
        """batch_m>1 (the 30k-merge scale path: one bounded collect per
        batch instead of per merge) must reproduce the sequential-greedy
        merge table on the fixture corpus — same pairs, ranks, AND
        frequencies (symbol-disjoint batch members can't perturb each
        other's counts)."""
        from redcap_omop_etl_spark.operators.textstats import bpe_learn

        sequential = [tuple(r) for r in bpe_learn(docs, n_merges=6, batch_m=1).collect()]
        batched = [tuple(r) for r in bpe_learn(docs, n_merges=6, batch_m=4).collect()]
        assert batched == sequential


class TestPrefixJaccardCapped:
    """Recall-completeness contract of the dup-density cap (the SCALE_r05
    cliff fix): in-cap pairs + pairs-touching-overflow == uncapped pairs,
    on a dup-DENSE corpus where the cap actually fires."""

    @pytest.fixture(scope="class")
    def dense(self, spark):
        # 3 near-dup families x 12 members: each member mutates one word of
        # the family base text, so every pair within a family has high
        # Jaccard AND the family's shared shingles are globally rare —
        # exactly the regime where a family-shared shingle lands in every
        # member's rarest-first prefix and candidates go ~m^2/2.
        rows = []
        did = 0
        for fam in range(3):
            base = [f"w{fam}x{i}" for i in range(14)]
            for m in range(12):
                words = list(base)
                words[m % 14] = f"mut{fam}x{m}"
                rows.append((did, " ".join(words)))
                did += 1
        for s in range(20):  # singleton background docs
            rows.append((did, " ".join(f"solo{s}x{i}" for i in range(14))))
            did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_recall_complete_and_exact_below_cap(self, spark, dense):
        thr = 0.5
        uncapped = _pair_set(dedup.prefix_jaccard_pairs(dense, thr))
        pairs, overflow = dedup.prefix_jaccard_pairs_capped(
            dense, thr, bucket_cap=4
        )
        capped = _pair_set(pairs)
        odocs = {r.doc for r in overflow.collect()}
        assert odocs, "cap must fire on a dup-dense corpus"
        assert capped <= uncapped, "capped pairs must be a subset (no false pairs)"
        # every missed pair has >=1 endpoint routed to overflow
        missed = uncapped - capped
        assert all(a in odocs or b in odocs for a, b in missed)
        # exact recall below the cap: capped == uncapped restricted to clean docs
        assert capped == {
            (a, b) for a, b in uncapped if a not in odocs and b not in odocs
        }
        # the caller recipe closes the recall gap: re-running a pair finder
        # on JUST the overflow subset recovers every missed pair whose both
        # endpoints overflowed (family cores). With the exact operator the
        # identity is deterministic; MinHash-LSH (the at-scale choice) is
        # probabilistic per band — assert it at least fires here, not that
        # it is exhaustive at threshold-grazing similarity.
        over_docs = dense.join(
            overflow.withColumnRenamed("doc", "doc_id"), "doc_id", "left_semi"
        )
        both_over = {(a, b) for a, b in missed if a in odocs and b in odocs}
        recovered_exact = _pair_set(dedup.ngram_jaccard_pairs(over_docs, thr))
        assert both_over <= recovered_exact
        recovered_lsh = _pair_set(dedup.minhash_lsh_pairs(over_docs, threshold=thr))
        assert recovered_lsh & both_over

    def test_uncapped_wrapper_unchanged(self, spark, dense):
        # prefix_jaccard_pairs (public, uncapped) still returns bare pairs
        # equal to the exact all-pairs ground truth on this corpus
        thr = 0.5
        exact = _pair_set(dedup.ngram_jaccard_pairs(dense, thr))
        assert _pair_set(dedup.prefix_jaccard_pairs(dense, thr)) == exact


class TestContainmentCapped:
    """Recall-completeness contract of the containment cap (the SCALE_r06
    16.1x-slope fix, porting the PPJoin overflow pattern): in-cap pairs +
    pairs-touching-overflow == uncapped(df_cap) pairs, and surviving
    pairs keep their EXACT containment values, on a dup-dense corpus
    where the cap actually fires."""

    @pytest.fixture(scope="class")
    def dense(self, spark):
        # Same regime as TestPrefixJaccardCapped's corpus: 3 near-dup
        # families x 12 members (one mutated word each) whose shared
        # shingles have df ~ 12 — in-metric under df_cap=100 but above
        # bucket_cap=4 — plus singleton background docs, plus one
        # quote-containment pair (short doc embedded in a long one) built
        # from family-free vocabulary so it stays in the clean channel.
        rows = []
        did = 0
        for fam in range(3):
            base = [f"w{fam}x{i}" for i in range(14)]
            for m in range(12):
                words = list(base)
                words[m % 14] = f"mut{fam}x{m}"
                rows.append((did, " ".join(words)))
                did += 1
        for s in range(20):
            rows.append((did, " ".join(f"solo{s}x{i}" for i in range(14))))
            did += 1
        quote = [f"q0x{i}" for i in range(8)]
        rows.append((did, " ".join(quote))); did += 1
        rows.append((did, " ".join([f"art0x{i}" for i in range(10)] + quote))); did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_recall_complete_and_exact_below_cap(self, spark, dense):
        thr = 0.5
        uncapped_df = dedup.containment_pairs(dense, thr, df_cap=100)
        uncapped = _pair_set(uncapped_df)
        pairs, overflow = dedup.containment_pairs_capped(
            dense, thr, df_cap=100, bucket_cap=4
        )
        capped = _pair_set(pairs)
        odocs = {r.doc for r in overflow.collect()}
        assert odocs, "cap must fire on a dup-dense corpus"
        assert capped <= uncapped, "capped pairs must be a subset (no false pairs)"
        missed = uncapped - capped
        assert all(a in odocs or b in odocs for a, b in missed)
        # exact recall below the cap: capped == uncapped restricted to clean
        assert capped == {
            (a, b) for a, b in uncapped if a not in odocs and b not in odocs
        }
        # surviving pairs keep their EXACT containment values (clean docs
        # carry no warm shingles, so sizes/intersections are untouched)
        ref = {
            (r.d1, r.d2): (r.cont_1in2, r.cont_2in1)
            for r in uncapped_df.collect()
            if r.d1 not in odocs and r.d2 not in odocs
        }
        got = {(r.d1, r.d2): (r.cont_1in2, r.cont_2in1) for r in pairs.collect()}
        assert got == ref
        # the quote-containment pair must be in the clean channel (its
        # vocabulary is family-free, so the cap cannot have routed it)
        quote_pair = (dense.count() - 2 + 0, dense.count() - 1)
        assert (quote_pair[0], quote_pair[1]) in capped
        # caller recipe closes the gap: both-overflow pairs are recovered
        # by re-running a finder on just the overflow subset
        over_docs = dense.join(
            overflow.withColumnRenamed("doc", "doc_id"), "doc_id", "left_semi"
        )
        both_over = {(a, b) for a, b in missed if a in odocs and b in odocs}
        recovered = _pair_set(dedup.containment_pairs(over_docs, thr, df_cap=100))
        assert both_over <= recovered

    def test_family_above_cap_routes_whole_family(self, spark, dense):
        # every family member carries family-shared shingles with df~12 > 4,
        # so all 36 family docs must be in overflow
        _, overflow = dedup.containment_pairs_capped(
            dense, 0.5, df_cap=100, bucket_cap=4
        )
        odocs = {r.doc for r in overflow.collect()}
        assert set(range(36)) <= odocs


class TestBpeLearnSampled:
    """The driver-local sample-based learner (DEPLOY.md production
    alternative) must reproduce the distributed loop exactly when the
    sample covers the vocabulary — word counts are BPE's sufficient
    statistic — and must bound its collect via TakeOrdered when not."""

    def test_local_matches_distributed(self, spark, docs):
        from redcap_omop_etl_spark.operators.textstats import (
            bpe_learn,
            bpe_learn_sampled,
        )

        want = [tuple(r) for r in bpe_learn(docs, n_merges=6, batch_m=1).collect()]
        got = [tuple(r) for r in bpe_learn_sampled(docs, n_merges=6).collect()]
        assert got == want
        got_k = [
            tuple(r)
            for r in bpe_learn_sampled(docs, n_merges=6, vocab_top_k=10_000).collect()
        ]
        assert got_k == want  # K >= vocab: identical by construction

    def test_top_k_restricts_vocabulary(self, spark):
        from redcap_omop_etl_spark.operators.textstats import bpe_learn_sampled

        # 'zz' is the most frequent word; K=1 must learn only from it
        df = spark.createDataFrame(
            [(1, "zz zz zz ab ab cd")], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_learn_sampled(df, n_merges=3, vocab_top_k=1).collect()]
        assert got == [(1, "z", "z", "zz", 3)]

    def test_incremental_stats_stay_consistent(self, spark):
        # a merge chain that repeatedly touches the same words exercises
        # the decrement/delete/re-add bookkeeping of the inverted index
        from redcap_omop_etl_spark.operators.textstats import bpe_learn_sampled

        df = spark.createDataFrame(
            [(1, "aaaa aaaa aaa ab"), (2, "aaaa ab ab")], "doc_id long, text string"
        )
        got = [tuple(r) for r in bpe_learn_sampled(df, n_merges=4).collect()]
        # rank 1: ('a','a') count = 3*3(aaaa) + 2(aaa) + 0(ab) = 11
        assert got[0] == (1, "a", "a", "aa", 11)
        # after merge: aaaa->[aa,aa], aaa->[aa,a], ab untouched
        # pairs: (aa,aa): 3, (aa,a): 1, (a,b): 3 -> tie-break picks 'a b'? counts: (aa,aa)=3,(a,b)=3 -> 'a b' < 'aa aa'
        assert got[1] == (2, "a", "b", "ab", 3)
        assert got[2] == (3, "aa", "aa", "aaaa", 3)


class TestContainmentCappedDegenerate:
    def test_cap_at_df_cap_is_identity(self, spark, docs):
        # bucket_cap == df_cap: the warm tier is empty, overflow must be
        # empty, and pairs must equal the uncapped operator exactly.
        uncapped = {
            (r.d1, r.d2, r.cont_1in2, r.cont_2in1)
            for r in dedup.containment_pairs(docs, 0.5, df_cap=100).collect()
        }
        pairs, overflow = dedup.containment_pairs_capped(
            docs, 0.5, df_cap=100, bucket_cap=100
        )
        got = {(r.d1, r.d2, r.cont_1in2, r.cont_2in1) for r in pairs.collect()}
        assert overflow.count() == 0
        assert got == uncapped


class TestIvfPqIndex:
    def test_persisted_adc_matches_in_memory_and_reads_codes_only(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from redcap_omop_etl_spark.operators.similarity import (
            _adc_dtable,
            _adc_topk,
            _nearest_cells,
            ivf_build,
            ivfpq_adc_from_index,
            ivfpq_write_index,
            pq_assign,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE

        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
        assignments, centroids = ivf_build(emb, n_clusters=8, n_iters=2)
        path = str(tmp_path / "ivfpq")
        ivfpq_write_index(emb, assignments, centroids, path)

        # in-memory reference over the same trained cells/codes
        codes, cs = pq_assign(emb)
        probes = _nearest_cells(centroids.collect(), qv, 3)
        members = assignments.filter(F.col("cluster").isin(probes)).select("vec_id")
        mem = _adc_topk(
            codes.join(members, "vec_id"), _adc_dtable(cs, qv), 10
        ).collect()

        disk_df = ivfpq_adc_from_index(spark, path, qv, k=10, n_probes=3)
        plan = disk_df._jdf.queryExecution().executedPlan().toString()
        # the probe predicate prunes the CODE table at listing time
        scan_line = next(
            line for line in plan.splitlines() if "PartitionFilters" in line
        )
        assert "cluster" in scan_line.split("PartitionFilters")[1].split("]")[0]
        # the search plan never scans the raw-vector directories
        assert "/vectors" not in plan
        disk = disk_df.collect()
        assert [(r["vec_id"], r["adc_d2q"]) for r in disk] == [
            (r["vec_id"], r["adc_d2q"]) for r in mem
        ]
