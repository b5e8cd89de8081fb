"""Session-15 additions: mergeable histogram quantiles, per-source
quality-percentile calibration, and soft (reweighting) dedup.

The quantile sketch is replicated in plain python from the parquet; the
per-source cut is cross-checked against the repo's own
doc_quality_classifier scores (same hashed-linear score expression, so
any drift in the bucket/threshold algebra mismatches); soft-dedup
weights are asserted exactly on a planted duplicate corpus."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# doclen_quantile_sketch
# ---------------------------------------------------------------------------


def test_doclen_quantile_python_replica(spark):
    """Exact rank statistic, histogram estimate, and merged-histogram
    estimate recomputed in plain python from the parquet — every cell
    of every percentile row must match."""
    from ocr_wrapper_spark.sketch_queries import (
        QTILE_PS,
        QTILE_W,
        doclen_quantile_sketch,
    )

    lens = sorted(
        pd.read_parquet(f"{SF_SMOKE}/documents.parquet")["n_chars"].tolist()
    )
    n = len(lens)
    rows = {r.p: r for r in doclen_quantile_sketch(spark, SF_SMOKE).collect()}
    assert set(rows) == set(QTILE_PS)
    for p in QTILE_PS:
        k = (p * n + 99) // 100
        exact = lens[k - 1]  # k-th smallest, 1-based
        buckets = sorted(v // QTILE_W for v in lens)
        bstar = buckets[k - 1]  # bucket of the k-th smallest
        r = rows[p]
        assert r.n_total == n
        assert r.k_rank == k
        assert r.exact_value == exact
        assert r.est_value == bstar * QTILE_W + QTILE_W - 1
        assert r.err == r.est_value - exact


def test_doclen_quantile_guarantees(spark):
    """The three in-row guarantees: one-sided error, error < bucket
    width, and merged-histogram == direct-histogram (mergeability)."""
    from ocr_wrapper_spark.sketch_queries import QTILE_W, doclen_quantile_sketch

    for r in doclen_quantile_sketch(spark, SF_SMOKE).collect():
        assert r.est_value >= r.exact_value
        assert 0 <= r.err < QTILE_W
        assert r.est_merged_value == r.est_value


def test_doclen_quantile_windows_carry_partition_spec(spark):
    """Cumulative windows run over the bounded counts tables with a
    (constant) partition key — never an empty partition spec on the
    corpus — and the only nested-loop join is the whitelisted 1-row
    assembly."""
    from ocr_wrapper_spark.sketch_queries import doclen_quantile_sketch

    plan = _plan(doclen_quantile_sketch(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # windowspecdefinition with an empty partition list prints as
    # "windowspecdefinition(<order>, specifiedwindowframe" with no
    # partition exprs before the sort spec; the constant key (v % 1)
    # keeps a partition expression in every window here.
    for frag in plan.split("windowspecdefinition(")[1:]:
        head = frag.split("specifiedwindowframe")[0]
        assert "%" in head or "ASC" not in head.split(",")[0]


# ---------------------------------------------------------------------------
# source_quality_quantile_cut
# ---------------------------------------------------------------------------


def test_source_quality_cut_matches_classifier_scores(spark):
    """Rebuild the per-source cut in pandas from the repo's OWN
    doc_quality_classifier scores (the same hashed-linear integer
    expression): bucket, cumulate, stop at the last bucket inside the
    drop budget — every published column must match."""
    from ocr_wrapper_spark.curation_queries import (
        QCUT_DROP_DEN,
        QCUT_DROP_NUM,
        QCUT_SHIFT,
        QCUT_STEP,
        source_quality_quantile_cut,
    )
    from ocr_wrapper_spark.text_queries import doc_quality_classifier

    scores = doc_quality_classifier(spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "source"]]
    merged = scores.merge(docs, on="doc_id")
    merged["qb"] = (merged["score_ppm"].astype(object) + QCUT_SHIFT) // QCUT_STEP

    got = {r.source: r for r in source_quality_quantile_cut(spark, SF_SMOKE).collect()}
    assert set(got) == set(merged["source"])
    for source, grp in merged.groupby("source"):
        n = len(grp)
        target = n * QCUT_DROP_NUM // QCUT_DROP_DEN
        counts = grp.groupby("qb").size().sort_index()
        cum = counts.cumsum()
        inside = cum[cum <= target]
        cutoff = int(inside.index[-1]) if len(inside) else -1
        dropped = int(inside.iloc[-1]) if len(inside) else 0
        r = got[source]
        assert r.n_docs == n
        assert r.drop_target == target
        assert r.cutoff_bucket == cutoff
        assert r.dropped == dropped
        assert r.kept == n - dropped
        assert r.dropped_ppm == dropped * 1_000_000 // n
        assert r.undershoot == target - dropped >= 0


def test_source_quality_cut_never_overshoots(spark):
    from ocr_wrapper_spark.curation_queries import source_quality_quantile_cut

    for r in source_quality_quantile_cut(spark, SF_SMOKE).collect():
        assert r.dropped <= r.drop_target
        assert r.dropped + r.kept == r.n_docs
        assert r.undershoot >= 0


def test_source_quality_cut_no_per_doc_ranking(spark):
    """The plan must reduce the corpus to the (source, bucket) table
    BEFORE any window — no row_number over documents, no empty
    partition specs, no nested-loop joins."""
    from ocr_wrapper_spark.curation_queries import source_quality_quantile_cut

    plan = _plan(source_quality_quantile_cut(spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# dedup_soft_weights
# ---------------------------------------------------------------------------


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_soft_weights_planted_clusters(spark, tmp_path):
    """Planted corpus: a 3-copy cluster, a 2-copy cluster (one copy
    differing only in whitespace — the normalized fingerprint must
    fold it in), a singleton, and an empty doc (excluded)."""
    from ocr_wrapper_spark.curation_queries import dedup_soft_weights

    sf = _write_docs(
        tmp_path,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "alpha beta gamma"),
            (4, "delta epsilon"),
            (5, "  delta\tepsilon "),
            (6, "zeta"),
            (7, ""),
        ],
    )
    rows = {r.doc_id: r for r in dedup_soft_weights(spark, sf).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for doc_id, csize, rep in [
        (1, 3, True),
        (2, 3, False),
        (3, 3, False),
        (4, 2, True),
        (5, 2, False),
        (6, 1, True),
    ]:
        r = rows[doc_id]
        assert r.cluster_size == csize
        assert r.weight_ppm == 1_000_000 // csize
        assert r.is_representative is rep


def test_soft_weights_cluster_mass_and_effective_size(spark):
    """Each cluster's total weight is <= 1.0 and within one floor-div
    ulp of it, so sum(weight) ~ number of distinct texts (the
    effective corpus size soft dedup preserves)."""
    from ocr_wrapper_spark.curation_queries import dedup_soft_weights

    pdf = dedup_soft_weights(spark, SF_SMOKE).toPandas()
    mass = pdf.groupby(pdf["weight_ppm"]).size()  # noqa: F841 — sanity below
    per_cluster = pdf.groupby("cluster_size")["weight_ppm"].first()
    for csize, w in per_cluster.items():
        assert w == 1_000_000 // csize
        assert csize * w <= 1_000_000 < csize * (w + 1)
    n_clusters = int(pdf["is_representative"].sum())
    assert n_clusters == pdf.drop_duplicates("doc_id")["is_representative"].sum()
    total_ppm = int(pdf["weight_ppm"].sum())
    assert n_clusters * 1_000_000 - total_ppm < n_clusters * 1_000_000
