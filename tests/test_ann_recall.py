"""ANN quality measurement: recall of the LSH and IVF approximate
searches against the brute-force exact top-k — 'measure, don't guess'
applied to the approximate operators themselves.

The floors asserted here are deliberately loose (ANN recall on a
64-dim gaussian corpus with 16 buckets / 8 cells is structurally
noisy); what the test pins is that the approximate paths (a) return
full result sets, (b) never hallucinate neighbors that score better
than the exact list says they should, and (c) keep a sane fraction of
the true neighborhood."""

from __future__ import annotations

import pytest

from football_etl_pipeline_spark.operators.similarity import (
    ANN_TOPK,
    similarity_ann_ivf,
    similarity_ann_lsh,
    similarity_topk_bruteforce,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_neighbors(spark):
    rows = similarity_topk_bruteforce(spark, SF_DIR).collect()
    exact: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rnk)):
        exact.setdefault(r.query_id, []).append(r.neighbor_id)
    return exact


@pytest.mark.parametrize(
    "ann_fn,min_mean_recall",
    [(similarity_ann_lsh, 0.8), (similarity_ann_ivf, 0.6)],
    ids=["lsh", "ivf"],
)
def test_ann_recall_floor(spark, exact_neighbors, ann_fn, min_mean_recall):
    rows = ann_fn(spark, SF_DIR).collect()
    approx: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rnk)):
        approx.setdefault(r.query_id, []).append(r.neighbor_id)

    # every query answered with a full (or bucket-limited) result set
    assert set(approx) == set(exact_neighbors)
    recalls = []
    for q, exact_ids in exact_neighbors.items():
        got = set(approx[q][:ANN_TOPK])
        want = set(exact_ids[:ANN_TOPK])
        recalls.append(len(got & want) / len(want))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= min_mean_recall, (
        f"mean recall@{ANN_TOPK} {mean_recall:.2f} under floor "
        f"{min_mean_recall} ({recalls})"
    )


def test_ann_scores_never_beat_exact(spark, exact_neighbors):
    """An approximate result's cosine can never exceed the exact #1 —
    scores come from the same formula, so any violation means the
    bucketing corrupted the scoring path."""
    exact_best = {
        r.query_id: float(r.cosine)
        for r in similarity_topk_bruteforce(spark, SF_DIR).collect()
        if r.rnk == 1
    }
    for fn in (similarity_ann_lsh, similarity_ann_ivf):
        for r in fn(spark, SF_DIR).collect():
            assert float(r.cosine) <= exact_best[r.query_id] + 1e-12
