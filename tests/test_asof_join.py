"""As-of join (click attribution): exact matching semantics on a
hand-built event log, plus the plan shape that makes the union +
carry-forward form linear where a range join would explode."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tests.conftest import SF_SMOKE


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    path = tmp_path / "events.parquet"
    pdf.to_parquet(path)
    return str(tmp_path)


def test_asof_matches_latest_prior_click_inclusive(spark, tmp_path):
    """Semantics: latest click at-or-before the purchase; same-instant
    click counts; click ties collapse to max event_id; a purchase with
    no prior click gets NULLs; clicks strictly after never match."""
    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    sf_dir = _write_events(
        tmp_path,
        [
            # user 1: purchase before any click -> NULL
            (10, t("2024-01-01T00:00:00"), 1, "purchase"),
            # two clicks at the same instant -> max event_id (22) wins
            (21, t("2024-01-01T00:01:00"), 1, "click"),
            (22, t("2024-01-01T00:01:00"), 1, "click"),
            (11, t("2024-01-01T00:02:00"), 1, "purchase"),
            # same-instant click + purchase -> inclusive match
            (23, t("2024-01-01T00:03:00"), 1, "click"),
            (12, t("2024-01-01T00:03:00"), 1, "purchase"),
            # later click must NOT attach to earlier purchases
            (24, t("2024-01-01T00:09:00"), 1, "click"),
            # user 2: clicks only, no purchases -> no output rows
            (30, t("2024-01-01T00:00:30"), 2, "click"),
            # user 3: purchases only
            (40, t("2024-01-01T00:00:40"), 3, "purchase"),
        ],
    )
    from ocr_wrapper_spark.relational import asof_join_attribution

    got = {
        r.event_id: (r.click_event_id, r.gap_us)
        for r in asof_join_attribution(spark, sf_dir).collect()
    }
    assert got == {
        10: (None, None),
        11: (22, 60_000_000),
        12: (23, 0),
        40: (None, None),
    }


def test_asof_is_one_exchange_no_range_join(spark):
    """The plan must be the union + single user_id exchange + one
    window pass — no sort-merge/broadcast join of the two sides, no
    range-join candidate explosion."""
    from ocr_wrapper_spark.relational import asof_join_attribution

    plan = (
        asof_join_attribution(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
    assert "Window" in plan
