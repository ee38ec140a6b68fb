"""Recall ground-truth tests for the banded near-dup operators.

The driver's oracle mirrors each operator's bucketing contract, so a
green CORRECTNESS row proves Spark == DuckDB but NOT that the
bucketing finds every true pair. These tests close that gap by
comparing banded output against brute-force ground truth computed
from the same signatures.

dedup_simhash's two-level banding claims EXACT recall at radius ≤ 2
(pigeonhole: 4 bands, ≤ 2 differing bits ⇒ ≥ 2 clean bands, and a
pair surfacing only through a hot bucket still shares a second band
for the composite key) — so the assertion is set equality, not a
recall floor. Measured band occupancies: sf0.01 tops out at 27
(below SIMHASH_HOT_CAP=32 — cold path only), sf0.1 reaches 216, so
the sf0.1 case is the one that actually exercises the hot-bucket
composite-key join; both run here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_etl_pipeline_spark.operators.dedup import (
    SIMHASH_BAND_BITS,
    SIMHASH_BAND_MASK,
    SIMHASH_BANDS,
    SIMHASH_HOT_CAP,
    SIMHASH_RADIUS,
    TOKENS_SPARK,
    _simhash_bit_sums,
    _simhash_value,
    dedup_simhash,
    hash60_spark,
)
from football_etl_pipeline_spark.operators.registry import release_persists
from football_etl_pipeline_spark.sources.testdata import load_table


def _simhash_values(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hashed = tf.select("doc_id", "cnt", F.expr(hash60_spark("tok")).alias("th"))
    bitsums = hashed.groupBy("doc_id").agg(
        *[F.expr(e).alias(f"s{b}") for b, e in enumerate(_simhash_bit_sums("spark"))]
    )
    return bitsums.select("doc_id", F.expr(_simhash_value()).alias("simhash"))


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_simhash_two_level_banding_has_exact_recall(spark, sf_dir):
    """Banded output == brute-force radius-2 pairs (no misses, no
    extras) — the two-level hot-bucket rung must be lossless."""
    out = {
        (r.a_id, r.b_id)
        for r in dedup_simhash(spark, sf_dir).select("a_id", "b_id").collect()
    }
    sh = _simhash_values(spark, sf_dir).persist()
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    truth = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= SIMHASH_RADIUS)
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .collect()
    }
    sh.unpersist()
    release_persists()
    assert out == truth
    assert truth, "ground truth empty — planted near-dups missing?"


def test_embedding_ivf_dedup_recall_and_candidate_bound(spark):
    """The IVF-blocked semantic dedup must keep ≥ 0.75 of the exact
    anchor's pairs at sf0.1 (measured 0.81 at cells=32/nprobe=4 —
    this corpus's pairs are all borderline ~60° apart, the worst
    blocking regime) while generating at most half of the n²/2
    candidate space, so the recall can't come from degenerating into
    the cross join. Zero false pairs by construction (exact cosine
    verify), asserted anyway."""
    from pyspark.sql import Window

    from football_etl_pipeline_spark.operators.dedup import (
        EMB_DUP_CELLS,
        EMB_DUP_NPROBE,
        dedup_embedding_cosine,
        dedup_embedding_ivf,
    )
    from football_etl_pipeline_spark.operators.similarity import (
        _dot_spark,
        _normed,
    )

    sf = "/root/testdata/sf0.1"
    exact = {
        (r.a_id, r.b_id)
        for r in dedup_embedding_cosine(spark, sf).select("a_id", "b_id").collect()
    }
    release_persists()
    got = {
        (r.a_id, r.b_id)
        for r in dedup_embedding_ivf(spark, sf).select("a_id", "b_id").collect()
    }
    release_persists()
    assert got <= exact  # exact verify ⇒ no false pairs
    assert len(got & exact) / len(exact) >= 0.75, (len(got), len(exact))

    e = _normed(spark, sf).persist()
    n = e.count()
    cent = e.filter(F.col("vec_id") < EMB_DUP_CELLS).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    ccos = F.expr(_dot_spark("v", "cv")) / (F.col("nrm") * F.col("cnrm"))
    wcell = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("c_id").asc()
    )
    memb = (
        e.join(F.broadcast(cent))
        .withColumn("ccos", ccos)
        .withColumn("crank", F.row_number().over(wcell))
        .filter(F.col("crank") <= EMB_DUP_NPROBE)
        .select("vec_id", F.col("c_id").alias("cell"))
    )
    n_cand = (
        memb.alias("a")
        .join(
            memb.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    e.unpersist()
    assert n_cand <= 0.5 * n * (n - 1) / 2, (n_cand, n)


def test_simhash_hot_bucket_survives_adversarial_skew(spark):
    """Worst-case band skew — 10% of the corpus shares ONE band value
    (the near-identical-boilerplate shape: think a crawl where every
    page embeds the same footer) while the docs are NOT near-dups
    (other bands far apart). The two-level rung must (a) keep the
    candidate count far below the flat-banding count, which goes
    quadratic in the hot bucket, and (b) still find every true
    radius-2 pair, including pairs whose ONLY shared band is the hot
    one.

    Signatures are synthesized directly (the natural corpus can't be
    coaxed into this distribution) and driven through the exact query
    body via ``simhash_banded_pairs``."""
    import random

    from football_etl_pipeline_spark.operators.dedup import simhash_banded_pairs

    rng = random.Random(0xBAD5EED)
    n, hot_frac = 1000, 0.10
    hot_bkey = 0x1234  # the shared band-0 value (low 15 bits)
    rows = []
    for i in range(n):
        if i < n * hot_frac:
            # hot-bucket member: band 0 fixed, bands 1-3 random — the
            # docs share boilerplate but are mutually distant
            high = rng.getrandbits(45)
            rows.append((i, (high << 15) | hot_bkey))
        else:
            rows.append((i, rng.getrandbits(60)))
    # plant true pairs whose ONLY clean shared band is the HOT one:
    # flip one bit in band 1 and one in band 2 of a hot member — bands
    # 1 and 2 both differ, band 3 differs randomly w.h.p., band 0 is
    # the hot bucket. A lossy hot-cap would drop exactly these.
    planted = []
    for k in range(5):
        base_id = k
        twin_id = n + k
        twin = rows[base_id][1] ^ (1 << 20) ^ (1 << 40)  # bands 1 and 2
        rows.append((twin_id, twin))
        planted.append((base_id, twin_id))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")

    out = {
        (r.a_id, r.b_id)
        for r in simhash_banded_pairs(sh).select("a_id", "b_id").collect()
    }
    release_persists()

    # exact recall: banded == brute force, and the planted hot-only
    # pairs are all present
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    truth = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= SIMHASH_RADIUS)
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .collect()
    }
    assert out == truth
    assert set(planted) <= out

    # candidate bound: recompute both schemes' candidate counts from
    # the same band frame. Flat banding pairs every co-bucketed duo —
    # the hot bucket alone contributes ~(0.1n)²/2; the two-level rung
    # must stay below a quarter of that.
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * i)
                        .bitwiseAND(F.lit(SIMHASH_BAND_MASK))
                        .alias("bkey"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "bd.band_id", "bd.bkey")
    occ = bands.groupBy("band_id", "bkey").agg(F.count(F.lit(1)).alias("occ"))
    flat = (
        occ.select(F.sum(F.col("occ") * (F.col("occ") - 1) / 2))
        .collect()[0][0]
    )
    bmem = bands.join(occ, ["band_id", "bkey"])
    cold = bmem.filter(F.col("occ") <= SIMHASH_HOT_CAP)
    n_cold = (
        cold.alias("a")
        .join(
            cold.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    hotm = bmem.filter(F.col("occ") > SIMHASH_HOT_CAP).select(
        "doc_id", "band_id", "bkey"
    )
    hotx = hotm.alias("h").join(
        bands.alias("b2"),
        (F.col("b2.doc_id") == F.col("h.doc_id"))
        & (F.col("b2.band_id") != F.col("h.band_id")),
    ).select(
        F.col("h.doc_id").alias("doc_id"),
        F.col("h.band_id").alias("band_id"),
        F.col("h.bkey").alias("bkey"),
        F.col("b2.band_id").alias("j"),
        F.col("b2.bkey").alias("jkey"),
    )
    n_hot = (
        hotx.alias("a")
        .join(
            hotx.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.j") == F.col("b.j"))
            & (F.col("a.jkey") == F.col("b.jkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    hot_bucket_quadratic = (n * hot_frac) ** 2 / 2
    assert flat >= hot_bucket_quadratic  # the adversarial shape is real
    assert n_cold + n_hot <= 0.25 * flat, (n_cold, n_hot, flat)


def test_simhash_hot_path_is_exercised(spark):
    """At sf0.1 some buckets must exceed the cap, or the composite-key
    join is dead code and the recall test above proves nothing about
    it."""
    sh = _simhash_values(spark, "/root/testdata/sf0.1")
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * i)
                        .bitwiseAND(F.lit(SIMHASH_BAND_MASK))
                        .alias("bkey"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("bd.band_id", "bd.bkey")
    max_occ = (
        bands.groupBy("band_id", "bkey")
        .agg(F.count(F.lit(1)).alias("occ"))
        .agg(F.max("occ"))
        .collect()[0][0]
    )
    assert max_occ > SIMHASH_HOT_CAP


def test_containment_catches_quote_expansion_jaccard_misses(spark):
    """A short doc fully quoted inside a 4x larger one has high
    containment but low Jaccard — the containment rung must flag
    exactly these (and must NOT re-report symmetric near-dups the
    Jaccard rung already owns)."""
    from football_etl_pipeline_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        JACCARD_THRESHOLD,
        containment_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} tok{i} item{i}" for i in range(12))
    rows = [
        (0, "src0", short),
        # quote-expansion: the WHOLE short doc embedded in a much
        # larger one -> containment 1.0, Jaccard well under 0.5
        (1, "src0", filler + " " + short + " closing remarks follow here now"),
        # symmetric near-dup pair: Jaccard-rung territory, must NOT
        # appear in the containment output
        (2, "src1", short + " iota kappa"),
        (3, "src1", short + " iota lambda"),
        # unrelated
        (4, "src2", "completely different content about spark plans and shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.a_id, r.b_id): r.containment
        for r in containment_pairs(docs).collect()
    }
    release_persists()
    assert (0, 1) in got and got[(0, 1)] >= CONTAINMENT_THRESHOLD
    # the symmetric pair is excluded (it belongs to the Jaccard rung)
    assert (2, 3) not in got
    # and nothing unrelated is flagged
    assert all(a in (0, 2) and b in (1, 3) for (a, b) in got)


def test_bpe_merge_fold_matches_reference_greedy(spark):
    """The HOF merge fold must implement the reference Sennrich
    greedy left-to-right merge — including runs of identical symbols
    (a a a -> aa a), the case a naive separator-consuming replace()
    gets wrong (it skips alternate occurrences)."""
    from pyspark.sql import functions as F

    from football_etl_pipeline_spark.operators.textops import (
        _BPE_FOLD_SPARK,
    )

    def ref_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " ".join(out)

    cases = [
        (["a", "a", "a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a"], "a", "a"),
        (["b", "a", "a", "b", "a", "a"], "a", "a"),
        (["h", "e", "l", "l", "o"], "l", "l"),
        (["x"], "x", "x"),
        (["er", "r", "er", "r"], "er", "r"),
    ]
    rows = [(" ".join(s), a, b) for s, a, b in cases]
    df = spark.createDataFrame(rows, ["w", "ma", "mb"])
    got = [r["m"] for r in df.select(F.expr(_BPE_FOLD_SPARK).alias("m")).collect()]
    want = [ref_merge(s, a, b) for s, a, b in cases]
    assert got == want, list(zip(got, want))


def test_semdedup_clusters_recall_and_no_false_prunes(spark):
    """dedup_semantic_clusters vs the brute-force
    similarity_cosine_pairs ground truth at sf0.1:

    - recall floor: ≥ 0.70 of true cosine-τ pairs must have their
      higher id pruned (measured 0.79 with SEMDEDUP_NPROBE=2 on this
      corpus's worst-case ~60° borderline pairs; single-assignment
      was 0.39 — the multi-probe membership is what this pins);
    - exactness: ZERO false prunes — every pruned vec_id must have a
      lower-id true-pair partner (the intra-cell verify is exact
      cosine, so a pruned id without one is a bug, not noise);
    - the decision frame covers every vector exactly once.
    """
    from football_etl_pipeline_spark.operators.similarity import (
        dedup_semantic_clusters,
        similarity_cosine_pairs,
    )

    sf = "/root/testdata/sf0.1"
    true_pairs = {
        (r.a_id, r.b_id)
        for r in similarity_cosine_pairs(spark, sf).select("a_id", "b_id").collect()
    }
    release_persists()
    dec = dedup_semantic_clusters(spark, sf).collect()
    release_persists()

    n_vecs = load_table(spark, sf, "embeddings").count()
    assert len(dec) == n_vecs
    assert len({r.vec_id for r in dec}) == n_vecs

    pruned = {r.vec_id for r in dec if not r.keep}
    # ground-truth higher ids (a vector prunable by SOME lower partner)
    prunable = {max(a, b) for (a, b) in true_pairs}
    false_prunes = pruned - prunable
    assert not false_prunes, f"pruned ids with no true pair: {false_prunes}"

    hit = sum(1 for (a, b) in true_pairs if max(a, b) in pruned)
    recall = hit / len(true_pairs)
    assert recall >= 0.70, f"semantic dedup recall {recall:.3f} < 0.70"


def test_semdedup_incremental_recall_and_no_false_drops(spark):
    """dedup_semantic_incremental vs the brute-force ground truth at
    sf0.1: a dropped batch vector must have a TRUE standing partner
    (zero false drops — the intra-cell verify is exact cosine), the
    screen must catch ≥ 0.65 of cross (batch↔standing) true pairs
    (measured 0.73 with nprobe=2 on this corpus's borderline pairs),
    and the decision frame covers exactly the batch."""
    from football_etl_pipeline_spark.operators.similarity import (
        SEMDEDUP_INCR_MOD,
        dedup_semantic_incremental,
        similarity_cosine_pairs,
    )

    sf = "/root/testdata/sf0.1"
    pairs = {
        (r.a_id, r.b_id)
        for r in similarity_cosine_pairs(spark, sf).select("a_id", "b_id").collect()
    }
    release_persists()
    dec = dedup_semantic_incremental(spark, sf).collect()
    release_persists()

    n_batch = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") % SEMDEDUP_INCR_MOD == 0)
        .count()
    )
    assert len(dec) == n_batch
    assert all(r.vec_id % SEMDEDUP_INCR_MOD == 0 for r in dec)

    dropped = {r.vec_id for r in dec if not r.keep}
    cross = {
        (a, b)
        for (a, b) in pairs
        if (a % SEMDEDUP_INCR_MOD == 0) != (b % SEMDEDUP_INCR_MOD == 0)
    }
    droppable = {
        a if a % SEMDEDUP_INCR_MOD == 0 else b for (a, b) in cross
    }
    false_drops = dropped - droppable
    assert not false_drops, f"dropped with no true standing pair: {false_drops}"
    recall = len(dropped & droppable) / max(1, len(droppable))
    assert recall >= 0.65, f"incremental screen recall {recall:.3f} < 0.65"
