"""Release-integrity family: the checks a corpus release runs before
shipping — redirect-chain canonicalization (pointer jumping), homoglyph
/ zero-width evasion dedup (confusable skeletons), and a k-anonymity
release gate over quasi-identifier tuples.

Three ops a web-corpus release pipeline needs that nothing else in the
registry covers:

* **Redirect canonicalization** — CDX/WARC revisit records carry
  ``Location:`` chains (A -> B -> C); training-data provenance wants
  every url resolved to its final target plus the hop count. The chain
  edges here are synthesized deterministically from ``doc_id`` (standing
  in for the WARC redirect records), but the RESOLUTION ALGORITHM is the
  real one: pointer jumping / path doubling — ``ceil(log2(L))``
  equi-join rounds resolve chains of length <= L, vs L sequential joins.
  At 10^12 urls that is 4 shuffles instead of 15, each on a uniform
  high-cardinality key.
* **Confusable-skeleton dedup** — spam/SEO farms evade exact dedup by
  swapping ASCII letters for Cyrillic homoglyphs and injecting
  zero-width characters (the Unicode TR39 "confusables" attack). The
  skeleton map (strip zero-width, fold homoglyphs) re-unifies what raw
  md5 splits; groups whose members differ in RAW bytes but share a
  skeleton are exactly the evasion clusters an exact-dedup pass misses.
* **k-anonymity gate** — before a release ships, quasi-identifier
  tuples (host, lang, size bucket) with fewer than K documents are
  suppressed so no rare combination can be tied to a single origin
  (Sweeney 2002; the standard privacy release rule). One map-side
  combinable groupBy — scale-trivial by construction.

Every query carries an exact DuckDB oracle; all arithmetic is integer
(BIGINT ids, floor-div buckets, md5 hex), so cross-engine value hashes
are byte-stable. Engine-parity notes: Spark ``translate``/DuckDB
``translate`` both operate on CHARACTERS (verified for the Cyrillic
fold used here), and ``md5`` in both engines hashes the UTF-8 bytes of
the string (Spark via an explicit ``encode(.., 'UTF-8')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t, register

# ---------------------------------------------------------------------------
# redirect-chain resolution (pointer jumping / path doubling)
# ---------------------------------------------------------------------------

REDIRECT_CHAIN = 16  # max chain length: doc at position p points at p-1
PJ_ROUNDS = 4  # ceil(log2(REDIRECT_CHAIN - 1)) doubling rounds

# The oracle walks the chain SEQUENTIALLY (recursive CTE, one hop per
# iteration) — deliberately the naive algorithm, so the log-round
# pointer-jump implementation is checked against an independent
# formulation rather than a mirror of itself. The walk is
# existence-aware: a doc whose arithmetic parent is absent from the
# table is its own canonical target (chains break at gaps), which is
# also what the Spark side computes — no contiguity assumption.
_REDIRECT_ORACLE = f"""
    WITH RECURSIVE walk(doc_id, cur, hops) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT w.doc_id, p.doc_id, w.hops + 1
      FROM walk w
      JOIN documents p
        ON w.cur % {REDIRECT_CHAIN} <> 0 AND p.doc_id = w.cur - 1)
    SELECT doc_id,
           max_by(cur, hops) AS canonical_id,
           CAST(max(hops) AS BIGINT) AS hops
    FROM walk GROUP BY doc_id
"""


@register("redirect_chain_resolution", _REDIRECT_ORACLE)
def redirect_chain_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every url's redirect chain to its final target in
    O(log L) join rounds (pointer jumping / path doubling, the textbook
    parallel list-ranking step — Wyllie 1979, public).

    Edge synthesis: doc at chain position ``doc_id % {REDIRECT_CHAIN}``
    redirects to ``doc_id - 1``; position 0 is canonical. The edge is
    real only if the parent id EXISTS in the table (chains break at
    gaps), so the semantics hold for any id set — contiguous testdata,
    the 10x id-remapped replica, or a sparse production id space.

    Algorithm: maintain (doc_id, ptr, hops) where ptr starts at the
    direct parent (or self for roots) and each round substitutes
    ptr <- ptr(ptr), hops <- hops + hops(ptr). After k rounds ptr is
    the ancestor min(2^k, depth) hops up; {PJ_ROUNDS} rounds cover
    depth {REDIRECT_CHAIN - 1}. Roots carry (self, 0) so they are the
    fixed point and hop sums stop exactly at the canonical target.

    Scale shape: each round is ONE equi shuffle join of the frame with
    itself on a uniform high-cardinality key (ptr) — 10^12 rows resolve
    16-deep chains in 4 shuffles where the sequential walk needs 15;
    no window, no collect, no skew (chain structure is id-arithmetic,
    independent of the Zipf host draw)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    pos = F.col("doc_id") % REDIRECT_CHAIN
    want = d.select(
        "doc_id",
        F.when(pos != 0, F.col("doc_id") - 1).alias("parent_cand"),
    )
    parents = d.select(F.col("doc_id").alias("parent_cand"), F.lit(1).alias("_ex"))
    cur = want.join(parents, "parent_cand", "left").select(
        "doc_id",
        F.when(F.col("_ex").isNotNull(), F.col("parent_cand"))
        .otherwise(F.col("doc_id"))
        .alias("ptr"),
        F.when(F.col("_ex").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("hops"),
    )
    for _ in range(PJ_ROUNDS):
        jump = cur.select(
            F.col("doc_id").alias("j_id"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
        )
        cur = cur.join(jump, cur["ptr"] == jump["j_id"], "inner").select(
            "doc_id",
            F.col("j_ptr").alias("ptr"),
            (F.col("hops") + F.col("j_hops")).alias("hops"),
        )
    return cur.select("doc_id", F.col("ptr").alias("canonical_id"), "hops")


# ---------------------------------------------------------------------------
# confusable-skeleton dedup (homoglyph / zero-width evasion)
# ---------------------------------------------------------------------------

CONF_ASCII = "aeo"  # fold targets (skeleton alphabet)
CONF_CYRIL = "аео"  # Cyrillic а е о — pixel-identical homoglyphs
ZERO_WIDTH = "\u200b\u200c\u200d\ufeff"  # ZWSP ZWNJ ZWJ BOM
VARIANT_MOD = 7  # docs with doc_id % 7 == VARIANT_RES gain an obfuscated twin
VARIANT_RES = 3
VARIANT_OFFSET = 1_000_000_000_000  # twin ids, disjoint from any real id

_CONF_ORACLE = f"""
    WITH v AS (
      SELECT doc_id + {VARIANT_OFFSET} AS doc_id,
             regexp_replace(translate(text, '{CONF_ASCII}', '{CONF_CYRIL}'),
                            ' ', ' {ZERO_WIDTH[0]}', 'g') AS text
      FROM documents WHERE doc_id % {VARIANT_MOD} = {VARIANT_RES}),
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM v),
    sk AS (
      SELECT doc_id,
             md5(translate(regexp_replace(text, '[{ZERO_WIDTH}]', '', 'g'),
                           '{CONF_CYRIL}', '{CONF_ASCII}')) AS skeleton_fp,
             md5(text) AS raw_fp
      FROM corpus)
    SELECT skeleton_fp,
           count(*) AS n_docs,
           count(DISTINCT raw_fp) AS n_raw_variants,
           min(doc_id) AS canonical_doc,
           count(DISTINCT raw_fp) >= 2 AS evades_exact_dedup
    FROM sk GROUP BY skeleton_fp HAVING count(*) >= 2
"""


@register("confusable_skeleton_dedup", _CONF_ORACLE)
def confusable_skeleton_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups that survive homoglyph/zero-width obfuscation
    (Unicode TR39 confusable skeletons, public).

    The adversarial side is synthesized IN-QUERY so the planted
    positives are deterministic on any input: every doc with
    ``doc_id % {VARIANT_MOD} == {VARIANT_RES}`` gains a twin whose
    ASCII '{CONF_ASCII}' letters are swapped for Cyrillic homoglyphs
    and whose spaces carry a trailing zero-width space — byte-distinct,
    pixel-identical. Raw md5 splits every such pair; the skeleton
    (strip zero-width chars, fold homoglyphs back) re-unifies them.
    Output: one row per skeleton group of >= 2 docs with the member
    count, the count of distinct RAW fingerprints, and the verdict
    ``evades_exact_dedup`` (>= 2 raw variants means an exact-dedup pass
    would have missed the group). Natural exact duplicates in the
    corpus appear with ``n_raw_variants = 1`` — the control group.

    Scale shape: one narrow map (translate/regexp per row, JVM
    codegen), a union, and ONE groupBy on a uniform content hash with
    map-side partial aggregation; count(DISTINCT) is the standard
    two-phase expand — no window, no skew, no Python."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variants = d.filter((F.col("doc_id") % VARIANT_MOD) == VARIANT_RES).select(
        (F.col("doc_id") + VARIANT_OFFSET).alias("doc_id"),
        F.regexp_replace(
            F.translate(F.col("text"), CONF_ASCII, CONF_CYRIL),
            " ",
            " " + ZERO_WIDTH[0],
        ).alias("text"),
    )
    corpus = d.unionByName(variants)
    skeleton = F.translate(
        F.regexp_replace(F.col("text"), f"[{ZERO_WIDTH}]", ""),
        CONF_CYRIL,
        CONF_ASCII,
    )
    fps = corpus.select(
        "doc_id",
        F.md5(F.encode(skeleton, "UTF-8")).alias("skeleton_fp"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("raw_fp"),
    )
    return (
        fps.groupBy("skeleton_fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_fp").alias("n_raw_variants"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .withColumn("evades_exact_dedup", F.col("n_raw_variants") >= 2)
    )


# ---------------------------------------------------------------------------
# k-anonymity release gate
# ---------------------------------------------------------------------------

K_ANON = 5  # minimum group size for release (Sweeney's k)
SIZE_BUCKET_CHARS = 256  # quasi-identifier size bucket width


def _k_anon_oracle() -> str:
    # {cdf} is spliced at import time below (the shared Zipf host draw)
    from .operators.sampling import KNUTH_U_SQL

    u = KNUTH_U_SQL.format(k="doc_id")
    return f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars // {SIZE_BUCKET_CHARS} AS size_bucket,
             len(list_filter({{cdf}}, c -> c < ({u}))) AS host_idx
      FROM documents)
    SELECT concat('host', lpad(CAST(host_idx AS VARCHAR), 2, '0'),
                  '.example.com') AS host,
           lang, CAST(size_bucket AS BIGINT) AS size_bucket,
           count(*) AS n_docs,
           count(*) >= {K_ANON} AS released
    FROM h GROUP BY host_idx, lang, size_bucket
    """


@register("release_k_anonymity")  # oracle spliced below ({cdf})
def release_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate: quasi-identifier tuples (host, lang,
    {SIZE_BUCKET_CHARS}-char size bucket) with fewer than {K_ANON}
    documents are flagged suppressed so no rare combination in the
    shipped corpus can be tied to a single origin (Sweeney 2002,
    public; the standard privacy rule for data releases).

    Host comes from the shared Zipf draw (same Knuth-hash + cdf mapping
    as the crawl family), lang from the table, the size bucket by exact
    integer floor-div — every grouping key is engine-stable.

    Scale shape: ONE groupBy with map-side partial aggregation over a
    bounded-cardinality key space (|hosts| x |langs| x |buckets|) — the
    result is a tiny table regardless of input size, and the Zipf host
    skew is irrelevant because counting is combinable (no per-host
    window anywhere)."""
    from .text_queries import _host_idx_col

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    grouped = (
        d.select(
            _host_idx_col().alias("host_idx"),
            "lang",
            F.expr(f"n_chars div {SIZE_BUCKET_CHARS}").alias("size_bucket"),
        )
        .groupBy("host_idx", "lang", "size_bucket")
        .agg(F.count("*").alias("n_docs"))
    )
    host = F.concat(
        F.lit("host"),
        F.lpad(F.col("host_idx").cast("string"), 2, "0"),
        F.lit(".example.com"),
    )
    return grouped.select(
        host.alias("host"),
        "lang",
        F.col("size_bucket").cast("long").alias("size_bucket"),
        "n_docs",
        (F.col("n_docs") >= K_ANON).alias("released"),
    )


# splice the shared host cdf into the k-anonymity oracle
from .pipeline_queries import _host_cdf_sql as _cdf_sql_fn  # noqa: E402
from .relational import ORACLES as _ORACLES  # noqa: E402

_ORACLES["release_k_anonymity"] = _k_anon_oracle().replace("{cdf}", _cdf_sql_fn())
