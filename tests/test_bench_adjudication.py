"""The bench's self-adjudication logic (VERDICT r8 #1) — unit-tested
without Spark so the instrument itself is under test: verdict
thresholds, history substitution for noise, the unadjudicatable path,
and the compact regressed_2x rendering.
"""

import json
import types

import bench


class _FakeSpark:
    """Just enough surface for _adjudicate_regressions' cooldown."""

    class _Catalog:
        def clearCache(self):
            pass

    class _Jvm:
        class System:  # noqa: D106
            @staticmethod
            def gc():
                pass

    class _SC:
        pass

    catalog = _Catalog()
    sparkContext = _SC()
    sparkContext._jvm = _Jvm()


def _run(monkeypatch, rerun_seconds, query="q_fake"):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "timed_median", lambda fn, n=3: rerun_seconds)
    monkeypatch.setattr(bench, "materialize", lambda df: None)
    monkeypatch.setitem(
        bench.QUERIES, query, types.SimpleNamespace(fn=lambda s, d: None)
    )
    hd = {
        "regressed_2x": {query: 2.5},
        "prev_queries": {query: 1.0},
    }
    hist = {"queries": {query: 2.5}}
    bench._adjudicate_regressions(_FakeSpark(), "/nowhere", hd, hist)
    return hd, hist, query


def test_noise_verdict_substitutes_history(monkeypatch):
    hd, hist, q = _run(monkeypatch, rerun_seconds=1.1)
    rec = hd["adjudication"][q]
    assert rec["verdict"] == "noise"
    assert rec["rerun_ratio"] == 1.1
    # steady-state rerun replaces the contended sample in history
    assert hist["queries"][q] == 1.1
    # compact rendering carries the verdict inline
    assert hd["regressed_2x"][q] == "2.5x->1.1x noise"


def test_real_verdict_keeps_history(monkeypatch):
    hd, hist, q = _run(monkeypatch, rerun_seconds=2.4)
    rec = hd["adjudication"][q]
    assert rec["verdict"] == "real"
    # a confirmed regression must NOT be laundered out of history
    assert hist["queries"][q] == 2.5
    assert hd["regressed_2x"][q] == "2.5x->2.4x real"


def test_unknown_stage_is_unadjudicated(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    hd = {"regressed_2x": {"mystery": 3.0}, "prev_queries": {}}
    hist = {"queries": {"mystery": 3.0}}
    bench._adjudicate_regressions(_FakeSpark(), "/nowhere", hd, hist)
    assert hd["adjudication"]["mystery"]["verdict"] == "unadjudicated"
    assert hd["regressed_2x"]["mystery"] == "3.0x->unadjudicated"


def test_diff_and_append_history(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    out1 = {"sf": 0.1, "value": 10.0, "queries": {"a": 10.0}}
    hd, entry, path = bench._diff_history(out1)
    assert hd is None and entry["queries"] == {"a": 10.0}
    bench._append_history(entry, path)
    out2 = {"sf": 0.1, "value": 25.0, "queries": {"a": 25.0}}
    hd2, entry2, path2 = bench._diff_history(out2)
    assert hd2["regressed_2x"] == {"a": 2.5}
    assert hd2["prev_queries"] == {"a": 10.0}
    # the history file holds exactly one valid JSON line so far
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 1 and json.loads(lines[0])["value"] == 10.0


def test_probe_compact_rendering():
    assert bench._probe_compact({}) == "err"
    assert bench._probe_compact({"per_unit_ratio": 0.4}) == 0.4
    assert (
        bench._probe_compact(
            {"per_unit_ratio": 17.8, "expected_superlinear": "LOO"}
        )
        == "17.8 expected-quadratic"
    )
    assert (
        bench._probe_compact(
            {"per_unit_ratio": 2.2, "rerun_per_unit": 0.9,
             "verdict": "noise"}
        )
        == "2.2->0.9 noise"
    )
    assert (
        bench._probe_compact(
            {"per_unit_ratio": 2.2, "rerun_per_unit_min": 1.6,
             "verdict": "real"}
        )
        == "2.2->1.6 real"
    )
    assert (
        bench._probe_compact(
            {"per_unit_ratio": 1.4, "verdict": "noise (min shot linear)"}
        )
        == "1.4 noise (min shot linear)"
    )


def test_real_verdict_carries_environment_note(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "timed_median", lambda fn, n=3: 2.4)
    monkeypatch.setattr(bench, "materialize", lambda df: None)
    monkeypatch.setitem(
        bench.QUERIES, "q_env", types.SimpleNamespace(fn=lambda s, d: None)
    )
    hd = {
        "regressed_2x": {"q_env": 2.5},
        "prev_queries": {"q_env": 1.0},
        "job_overhead_ratio": 2.1,
    }
    bench._adjudicate_regressions(_FakeSpark(), "/nowhere", hd, {"queries": {}})
    rec = hd["adjudication"]["q_env"]
    assert rec["verdict"] == "real"
    assert "2.1x" in rec["environment_note"]


def test_probe_rotation_covers_every_stage(monkeypatch):
    """SPARK_GRAFT_PROBE_PICK=<round> selects one stage per family;
    consecutive picks must cycle through EVERY probe stage within
    max-family-size rounds, and every stage must be a registered query."""
    full, rot = (
        monkeypatch.delenv("SPARK_GRAFT_PROBE_PICK", raising=False)
        or bench._probe_stages()
    )
    assert rot is None
    assert set(full) <= set(bench.QUERIES)
    assert len(full) == len(set(full))
    span = max(len(f) for f in bench.PROBE_FAMILIES.values())
    seen: set[str] = set()
    for p in range(100, 100 + span):
        monkeypatch.setenv("SPARK_GRAFT_PROBE_PICK", str(p))
        stages, meta = bench._probe_stages()
        assert meta["pick"] == p
        assert len(stages) == len(bench.PROBE_FAMILIES)
        seen.update(stages)
    assert seen == set(full), sorted(set(full) - seen)
