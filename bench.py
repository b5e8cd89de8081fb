"""Benchmark runner — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

{"metric": "...", "value": <total_sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <float>, "docs_per_sec": <float>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: flagship extraction + one per operator family
BENCH_QUERIES = [
    "pipeline_extract",
    "pipeline_dual_extract",
    "pipeline_host_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_parts_per_brand",
    "sessionize_events",
    "events_tumbling_window",
    "doc_exact_dedup",
    "doc_token_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_topk_ivf",
    "doc_lang_id",
    "doc_token_chunks",
    "asof_join_attribution",  # shared as-of operator + gap payload (r5 s11; supersedes asof_purchase_last_click in the bench set, same operator)
    "corpus_curation",
    "media_qr_decode",
    "doc_repetition_filter",
    "ann_topk_int8",
    "pipeline_warc_extract",
    "pipeline_textract_extract",  # fifth dialect (r4)
    "doc_quality_classifier",  # hashed-linear scoring, zero-shuffle (r4)
    "crawl_ingest_funnel",  # composed ingest pipeline (r4)
    "paragraph_dedup",  # paragraph-granularity fp shuffle (r5)
    "crawl_pagerank",  # iterative graph loop on aggregated edges (r5)
    "html_anchor_stats",  # raw-payload regex mining over pages (r5)
    "bm25_retrieval",  # inverted-index ranked retrieval (r5 s8)
    "eval_ngram_overlap",  # shingle-join contamination measure (r5 s8)
    "kmv_distinct_sketch",  # bounded-state cardinality sketch (r5 s11)
    "cms_heavy_hitters",  # Count-Min frequency sketch (r5 s11)
    "collocation_lift_topk",  # vocabulary-keyed PMI lift (r5 s11)
    "ann_topk_pq",  # product-quantized ADC scan (r5 s12)
    "embedding_hard_negatives",  # contrastive pair mining (r5 s12)
    "cdc_chunk_dedup",  # content-defined chunk fingerprints (r5 s12)
    "bitext_margin_mine",  # CCMatrix margin-criterion pair mining (r5 s13)
    "embedding_kcenter_coreset",  # Gonzalez diversity coreset (r5 s13)
    "url_parallel_candidates",  # ParaCrawl URL-structure mining (r5 s13)
    "extraction_block_eval",  # block-verdict confusion vs ground truth (r5 s14)
    "epoch_shuffle_assignment",  # map-only Feistel epoch shuffle (r5 s14)
    "postings_varint_budget",  # block-postings index sizing (r5 s14)
    "boilerplate_strip_rewrite",  # RefinedWeb template-strip rewrite (r5 s13)
    "crawl_overlap_sketch",  # two-crawl KMV Jaccard estimate + eval (r5 s13)
    "headline_syndication_pairs",  # blocked edit-distance linkage (r5 s14)
    "capture_revisit_intervals",  # CDX revisit-run compression (r5 s14)
    "shard_manifest_diff",  # set-digest incremental release diff (r5 s14)
    "wand_block_max",  # Block-Max WAND pruning metadata (r5 s14)
    "vocab_drift",  # release-to-release OOV/tokenizer drift (r5 s14)
    "doclen_quantile_sketch",  # mergeable histogram percentiles (r5 s15)
    "source_quality_quantile_cut",  # per-source percentile calibration (r5 s15)
    "dedup_soft_weights",  # 1/cluster-size reweighting dedup (r5 s15)
    "redirect_chain_resolution",  # pointer-jump canonicalization (r5 s16)
    "confusable_skeleton_dedup",  # homoglyph-evasion dedup (r5 s16)
    "doc_pagination_stitch",  # directional overlap stitch join (r5 s16)
    "token_budget_quality_cut",  # token-weighted budget cut (r5 s16)
    "host_fair_share_alloc",  # water-filling crawl budget (r5 s16)
    "dedup_winnowing",  # MOSS positional fingerprint dedup (r5 s16)
    "doc_lang_mix",  # code-switching Gini-Simpson monitor (r5 s16)
    "cdx_prefix_compression",  # zipnum front-coding byte budget (r5 s16)
    "bootstrap_token_ci",  # one-pass Poisson bootstrap CI (r5 s16)
    "crawl_priority_fusion",  # OPIC authority x quality frontier head (r5 s16)
    "postings_elias_fano_budget",  # EF vs varint encoding decision (r5 s18)
    "registrable_domain_rollup",  # PSL longest-match eTLD+1 rollup (r5 s18)
    "vocab_growth_curve",  # Heaps-law crawl-saturation monitor (r5 s18)
    "host_novelty_ranking",  # per-host Good-Turing unseen mass (r5 s18)
    "neyman_sample_alloc",  # variance-optimal stratified budget (r5 s18)
    "decontaminate_fuzzy",  # MinHash-banded eval contamination (r5 s18)
    "vocab_chao1_estimate",  # Chao1/Good-Turing richness ceiling (r5 s18)
    "source_quality_wilson_gate",  # Wilson-bound source gate (r5 s18)
    "sort_layout_pruning_gain",  # zone-pruning sort-key advisor (r5 s18)
    "syndication_direction",  # directed copy graph over linkage (r5 s18)
    "ann_matryoshka_recall",  # prefix-truncation recall eval (r5 s18)
    "filter_overlap_matrix",  # four-gate ablation matrix (r5 s18)
    "postings_delta_update",  # LSM patch-vs-rebuild accounting (r5 s18)
    "host_colink_similarity",  # link-structure mirror detection (r5 s18)
]


def tree_cpu_seconds() -> float:
    """Cumulative utime+stime (plus reaped-child cutime+cstime) of this
    process and every live descendant (the JVM and its Python workers),
    from /proc. Wall time in a shared VM is hostage to neighbor load;
    the subtree's own CPU seconds are not — deltas of this give a
    window-robust per-doc cost. Including cutime/cstime (stat fields
    16-17) keeps CPU of workers that exit and are reaped between two
    samples: each tick lands exactly once — in a live process's own
    utime/stime or, after reaping, in its parent's cutime/cstime."""
    hz = os.sysconf("SC_CLK_TCK")
    stats = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm may contain spaces/parens: fields resume after the last ')'
        rest = raw[raw.rfind(")") + 2 :].split(" ")
        ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        stats[int(pid)] = (int(rest[1]), ticks)  # ppid, ticks
    me = os.getpid()
    mine = {me}
    changed = True
    while changed:
        changed = False
        for pid, (ppid, _) in stats.items():
            if pid not in mine and ppid in mine:
                mine.add(pid)
                changed = True
    return sum(t for pid, (_, t) in stats.items() if pid in mine) / hz


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    import __spark_entry__ as entrymod
    from ocr_wrapper_spark.session import get_spark

    # Host-health probe BEFORE the session: shared-VM neighbor load can
    # degrade per-doc time ~3x for hours; the probe result is embedded in
    # the output JSON so a number recorded in a sick window is visibly an
    # artifact (BENCH_r02's 2.2x "regression" was exactly this).
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import host_health

    host_probe = host_health.probe()
    print(f"# host probe: {host_probe}", file=sys.stderr)
    if not host_probe["healthy"]:
        print(
            "# WARNING: degraded host window "
            f"({host_probe['per_doc_ms']} ms/doc vs {host_health.HEALTHY_PER_DOC_MS_32P} healthy)"
            " — numbers below understate real throughput",
            file=sys.stderr,
        )

    spark = get_spark(app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()

    # warm the JVM + Arrow path once on a trivial action
    spark.range(1000).count()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        # best-of-2: the first pass absorbs worker/JIT warmup and VM
        # noise (documented ±50% between identical runs on this host)
        best, n = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()  # full materialization
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)

    # headline throughput: extraction over a MATERIALIZED pages table (the
    # north_rule input shape), 32x replicated (same input scaling_bench
    # measures): at replicate=8 (r1-r3 benches) a pass is ~2 s and per-job
    # overhead eats ~half the wall clock, understating docs/sec ~2x —
    # compare r<=3 headlines via headline_cpu_ms_per_doc, not docs/sec
    from ocr_wrapper_spark.plans.pipeline import run_extraction
    from ocr_wrapper_spark.sources.pages import materialize_pages

    # synthetic pages compress ~6x denser than real web html: shrink the
    # split size so 256 written files yield balanced task waves at 32
    # cores (64 fat files = 2 ragged waves and a straggler tail that
    # reads as variance)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")
    HEADLINE_REPLICATE = 32
    pages_path = materialize_pages(spark, sf_dir, replicate=HEADLINE_REPLICATE, partitions=256)
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    run_extraction(spark, pages.limit(4096)).count()  # warm workers
    best = None
    cpu0 = tree_cpu_seconds()
    for _ in range(3):
        t0 = time.perf_counter()
        run_extraction(spark, pages).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    cpu_delta = tree_cpu_seconds() - cpu0
    cpu_ms_per_doc = round(cpu_delta / (3 * n_pages) * 1000, 3)
    docs_per_sec = round(n_pages / best, 2)
    timings["extract_materialized"] = round(best, 3)
    print(
        f"# extract_materialized: {best:.2f}s ({n_pages} docs -> {docs_per_sec}/s, "
        f"{cpu_ms_per_doc} cpu-ms/doc)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "docs/sec, byte-identical extraction over materialized pages table",
                "value": docs_per_sec,
                "unit": "docs/sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "n_docs": n_pages,
                "headline_wall_sec": total,
                "headline_replicate": HEADLINE_REPLICATE,
                "headline_cpu_ms_per_doc": cpu_ms_per_doc,
                "host_probe": host_probe,
            }
        )
    )


if __name__ == "__main__":
    main()
