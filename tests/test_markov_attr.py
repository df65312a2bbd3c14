"""Markov removal-effect attribution: hand-checkable journey edges.

Three users exercise every journey boundary case:
- A converts on their FIRST event (purchase)        -> start -> conv
- B clicks then purchases                           -> start -> click -> conv
- C views then errors, never purchases              -> start -> view -> error -> null

Chain (counts): start->{purchase-first: conv, click, view} 1/3 each;
click->conv 1; view->error 1; error->null 1. Absorption from start:
1/3 (direct) + 1/3 (via click) = 2/3. Removing click kills B's path
(-1/3); removing error changes nothing (C was already absorbed by null);
removing view likewise (view's subtree never converts).
"""

from datetime import datetime

import pytest

from station_data_ingestion_spark.queries import QUERIES


@pytest.fixture()
def tiny_events_dir(spark, tmp_path):
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "purchase", 10.0, None),
        (2, datetime(2024, 1, 1, 0, 0, 1), 2, "click", 1.0, None),
        (3, datetime(2024, 1, 1, 0, 0, 2), 2, "purchase", 20.0, None),
        (4, datetime(2024, 1, 1, 0, 0, 3), 3, "view", 0.5, None),
        (5, datetime(2024, 1, 1, 0, 0, 4), 3, "error", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_removal_effects_on_hand_chain(spark, tiny_events_dir):
    out = {
        r["channel"]: r.asDict()
        for r in QUERIES["events_markov_removal_attribution"]
        .fn(spark, tiny_events_dir)
        .collect()
    }
    assert set(out) == {"click", "error", "signup", "view"}
    # p_full = 2/3 (exact integer division path: 666666 micro)
    p_full = out["click"]["p_full_micro"]
    assert p_full == 666666
    # removing click: only the direct purchase converts -> 1/3
    assert out["click"]["p_drop_micro"] == 333333
    # its removal effect is half the conversion probability
    assert abs(out["click"]["removal_micro"] - 500000) <= 2
    # error and view sit on never-converting paths: zero removal effect
    assert out["error"]["removal_micro"] == 0
    assert out["view"]["removal_micro"] == 0
    # signup never appears: dropping it changes nothing
    assert out["signup"]["removal_micro"] == 0
    # all credit goes to click
    assert out["click"]["share_ppm"] == 1000000
    total_share = sum(r["share_ppm"] for r in out.values())
    assert total_share == 1000000
