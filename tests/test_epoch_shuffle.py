"""Feistel epoch-shuffle family: bijectivity, epoch independence,
map-only plan, engine-exact replica (curation_queries
epoch_shuffle_assignment / epoch_shuffle_balance_eval)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ocr_wrapper_spark.curation_queries import (
    SHUFFLE_HALF_BITS,
    SHUFFLE_ROUNDS,
    epoch_shuffle_assignment,
    epoch_shuffle_balance_eval,
)

SF_SMOKE = "/root/testdata/sf0.001"

HALF = 1 << SHUFFLE_HALF_BITS
MASK = HALF - 1


def _f(r: int, rnd: int, epoch: int) -> int:
    h = hashlib.md5(f"{r}|{rnd}|{epoch}".encode()).hexdigest()
    return int(h[:15], 16) % HALF


def _perm(x: int, epoch: int) -> int:
    l, r = x >> SHUFFLE_HALF_BITS, x & MASK
    for rnd in range(SHUFFLE_ROUNDS):
        l, r = r, l ^ _f(r, rnd, epoch)
    return (l << SHUFFLE_HALF_BITS) | r


def _inv(y: int, epoch: int) -> int:
    l, r = y >> SHUFFLE_HALF_BITS, y & MASK
    for rnd in reversed(range(SHUFFLE_ROUNDS)):
        l, r = r ^ _f(l, rnd, epoch), l
    return (l << SHUFFLE_HALF_BITS) | r


def test_permutation_is_invertible_hence_bijective():
    """Every Feistel network inverts by running the rounds backwards —
    walking the inverse over a dense range AND the domain edges proves
    the map is a bijection on [0, 2^62)."""
    for epoch in range(3):
        for x in list(range(2000)) + [2**62 - 1, 2**62 - 2, HALF, HALF - 1]:
            assert _inv(_perm(x, epoch), epoch) == x
            assert 0 <= _perm(x, epoch) < 2**62


def test_epochs_produce_different_orders():
    ids = list(range(100))
    orders = [sorted(ids, key=lambda i: _perm(i, e)) for e in range(3)]
    assert orders[0] != orders[1] != orders[2]
    # and each is a genuine reordering, not near-identity
    assert sum(1 for a, b in zip(orders[0], ids) if a == b) < 10


def test_spark_assignment_matches_python_replica(spark):
    rows = epoch_shuffle_assignment(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        expect = _perm(r.doc_id, r.epoch)
        assert r.perm_pos == expect, (r.doc_id, r.epoch)
        assert r.shard == expect >> (2 * SHUFFLE_HALF_BITS - 6)


def test_assignment_plan_is_map_only(spark):
    """The whole point: a per-epoch global shuffle with ZERO exchange.
    The executed plan must contain no Exchange operator."""
    df = epoch_shuffle_assignment(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_balance_eval_bijectivity_evidence(spark):
    rows = epoch_shuffle_balance_eval(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_distinct_pos == r.n_docs
        assert 1 <= r.n_shards_used <= 64
        assert r.min_shard_docs >= 1 and r.max_shard_docs >= r.min_shard_docs
