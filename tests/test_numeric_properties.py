"""Property tests for the session-18 numeric primitives at value ranges
the parquet fixtures never reach: the double-seeded isqrt on the full
int64/128-bit grid, the Elias-Fano closed form vs a bit-exact reference
encoder, the Wilson bound's ordering/monotonicity contract, and PSL
longest-match on randomized label stacks."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# isqrt expression (shared by neyman_sample_alloc / source_quality_wilson_gate)
# ---------------------------------------------------------------------------


def _isqrt_py(t: int) -> int:
    """The exact python mirror of the SQL Newton-corrected double seed:
    one integer Newton step from floor(sqrt(double(t))) contracts the
    double-rounding drift (up to ~s * 2^-52 past 2^53) to < 2, then the
    +/-2 window finishes."""
    s0 = int(math.floor(math.sqrt(float(t))))
    s0 = (max(s0, 1) + t // max(s0, 1)) // 2

    def ok(c):
        c = max(c, 0)
        return c * c <= t

    if ok(s0 + 2):
        return s0 + 2
    if ok(s0 + 1):
        return s0 + 1
    if ok(s0):
        return s0
    if ok(s0 - 1):
        return max(s0 - 1, 0)
    return max(s0 - 2, 0)


@given(st.integers(min_value=0, max_value=(1 << 126) - 1))
@settings(max_examples=500, deadline=None)
def test_isqrt_double_seed_window_suffices_to_128_bits(t):
    """The +/-2 window around floor(sqrt(double(t))) always contains the
    true integer sqrt, up to the DECIMAL(38,0)/HUGEINT radicands the
    queries produce — i.e. the SQL CASE can never pick a wrong root."""
    assert _isqrt_py(t) == math.isqrt(t)


@given(st.integers(min_value=0, max_value=(1 << 62) - 1))
@settings(max_examples=200, deadline=None)
def test_isqrt_perfect_square_neighborhood(t):
    s = math.isqrt(t)
    for v in (s * s, s * s + 1, max(s * s - 1, 0)):
        assert _isqrt_py(v) == math.isqrt(v)


# ---------------------------------------------------------------------------
# Elias-Fano closed form vs a reference encoder
# ---------------------------------------------------------------------------


def _ef_encode_bits(ids: list[int], u: int) -> int:
    """Reference EF encoder: actually lay out the low-bit array and the
    high-bit unary stream, return total bits — the closed form must
    equal what an encoder would truly write."""
    n = len(ids)
    l = max(0, (u // n).bit_length() - 1)
    low_bits = n * l
    # high stream: for each bucket 0..(u >> l), a unary run of the ids
    # whose high part equals the bucket, terminated by a 0: total ones
    # = n, total zeros = (u >> l) + 1... the standard layout spends
    # n + (u >> l) bits (final terminator elided in the closed form)
    high_bits = n + (u >> l)
    return low_bits + high_bits


@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=60,
             unique=True)
)
@settings(max_examples=300, deadline=None)
def test_ef_closed_form_matches_reference_encoder(ids):
    from ocr_wrapper_spark.text_queries import POSTINGS_BLOCK  # noqa: F401

    ids = sorted(ids)
    u = ids[-1] + 1
    n = len(ids)
    l = max(0, (u // n).bit_length() - 1)
    closed = n * l + n + (u >> l)
    assert closed == _ef_encode_bits(ids, u)
    # monotone-representable: every id fits in l low bits + its bucket
    for i in ids:
        assert (i >> l) <= (u >> l)


@given(st.integers(min_value=1, max_value=1 << 60),
       st.integers(min_value=1, max_value=1 << 60))
@settings(max_examples=300, deadline=None)
def test_ef_floor_log_identity_random(u, n):
    """floor(log2(u/n)) == bit_length(u//n) - 1, verified EXACTLY via
    integer cross-multiplication (2^l <= u/n < 2^(l+1)) — float log2 is
    deliberately not the referee here: log2(2^49 - 1) rounds UP to 49.0
    in IEEE double, which is precisely why the production expression
    uses length(bin()) instead of libm."""
    if n > u:
        u, n = n, u
    l = (u // n).bit_length() - 1
    assert (1 << l) * n <= u < (1 << (l + 1)) * n


# ---------------------------------------------------------------------------
# Wilson bound contract
# ---------------------------------------------------------------------------


def _wilson(k: int, n: int) -> int:
    from ocr_wrapper_spark.curation_queries import _WILSON_SCALE

    arg = (k * (n - k) * _WILSON_SCALE + n * _WILSON_SCALE) // n
    s = math.isqrt(arg)
    return (1_000_000 * (k + 2) - 2 * s) // (n + 4)


@given(st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_wilson_bound_below_point_estimate_and_in_range(n):
    for k in {0, 1, n // 2, n - 1, n}:
        if k < 0 or k > n:
            continue
        lb = _wilson(k, n)
        assert -1 <= lb <= 1_000_000  # floor conventions allow lb == -1 at k=0
        # the lower bound never exceeds the point estimate (+1 ppm floor slack)
        assert lb <= k * 1_000_000 // n + 1


@given(st.integers(min_value=10, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_wilson_more_evidence_tightens_the_bound(n):
    """Same 50% point rate, 100x the sample: the bound must be closer
    to 500000 — the small-n-must-prove-itself property the gate uses."""
    gap_small = 500_000 - _wilson(n // 2, n)
    gap_large = 500_000 - _wilson((n * 100) // 2, n * 100)
    assert gap_large < gap_small


# ---------------------------------------------------------------------------
# PSL longest-match on randomized label stacks
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=2**40))
@settings(max_examples=300, deadline=None)
def test_psl_longest_match_dominates_any_shorter_rule(doc_id):
    from ocr_wrapper_spark.webmix_queries import PSL_RULES, _FQDN_NAMES  # noqa: F401
    from tests.test_growth_psl_ef import _fqdn

    rules = set(PSL_RULES)
    tk = _fqdn(doc_id).split(".")
    matches = [
        j for j in range(1, min(len(tk) - 1, 4) + 1)
        if ".".join(tk[-j:]) in rules
    ]
    assert matches  # every drawn suffix ends in a single-label rule
    kmax = max(matches)
    # the defining property: every shorter match is a SUFFIX of the
    # winning public suffix (label-boundary chain), so taking max(j)
    # is exactly "longest matching rule"
    win = ".".join(tk[-kmax:])
    for j in matches:
        assert win.endswith(".".join(tk[-j:]))


# ---------------------------------------------------------------------------
# Wilson gate radicand stays 128-bit on the Spark side (r5 ADVICE finding:
# the former `... div n_docs` IntegralDivide wrapped past 2^63)
# ---------------------------------------------------------------------------


def _wilson_row_py(n: int, k: int) -> tuple[int, int, bool]:
    S = 10**12
    wil_arg = (k * (n - k) * S + n * S) // n
    sq = math.isqrt(wil_arg)
    lb = (1_000_000 * (k + 2) - 2 * sq) // (n + 4)
    return k * 1_000_000 // n, lb, lb >= 400_000


def test_wilson_gate_radicand_past_int64(spark):
    """Sources large enough that k(n-k)*1e12/n passes 2^63 (the regime
    where the old IntegralDivide silently wrapped) publish the exact
    integer Wilson bound."""
    from ocr_wrapper_spark.curation_queries import wilson_gate_from_counts

    cases = [
        ("tiny", 10, 5),
        ("edge63", 40_000_000, 20_000_000),       # radicand ~1e19 > 2^63
        ("big", 10**11, 49_999_999_999),          # radicand ~2.5e22
        ("huge", 10**12, 500_000_000_000),        # radicand ~2.5e23 * 1e12 / n
        ("allkeep", 10**12, 10**12),
        ("nokeep", 10**12, 0),
    ]
    df = spark.createDataFrame(
        [(s, n, k) for s, n, k in cases], "source string, n_docs long, n_keep long"
    )
    got = {r["source"]: r for r in wilson_gate_from_counts(df).collect()}
    for s, n, k in cases:
        keep_ppm, lb, gated = _wilson_row_py(n, k)
        r = got[s]
        assert r["keep_ppm"] == keep_ppm, s
        assert r["wilson_lb_ppm"] == lb, (s, r["wilson_lb_ppm"], lb)
        assert r["gated_in"] == gated, s
