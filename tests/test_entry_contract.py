"""Driver-contract hygiene: sample rotation must never wedge.

The external driver samples a PREFIX of __spark_entry__.queries();
ordering is least-certified-first. rows-only (no_oracle) queries have no
hash row, so if they didn't count as certified they would pin themselves
to the front of every sample forever, crowding out genuinely
never-checked queries (VERDICT r3 item #6)."""

import __spark_entry__ as entry_mod


def test_no_oracle_rows_counts_as_certified(tmp_path, monkeypatch):
    import json
    import os

    art = {
        "hash_green": {"rows_match": True, "schema_match": True,
                       "hash_match": True},
        "rows_only": {"err": "no_oracle", "spark_rows": 7},
        "errored": {"rows_match": None, "schema_match": None,
                    "hash_match": None},
        "rows_only_failed": {"err": "no_oracle", "spark_rows": None},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(art))
    monkeypatch.setattr(
        entry_mod.os.path, "dirname", lambda p: str(tmp_path)
    )
    counts = entry_mod._certification_counts()
    assert counts.get("hash_green") == 1
    assert counts.get("rows_only") == 1, (
        "no_oracle rows-only MUST count as certified or the sample wedges"
    )
    assert "errored" not in counts
    assert "rows_only_failed" not in counts


def test_stale_rows_only_row_does_not_certify_oracle_upgraded_query(
    tmp_path, monkeypatch
):
    """VERDICT r10 #1: once a query gains a SQL oracle, a rows-only row
    from before the upgrade no longer certifies it -- the query must
    re-front in the driver sample so the new oracle gets checked."""
    import json

    upgraded = next(
        n for n, qd in entry_mod.QUERIES.items() if qd.oracle is not None
    )
    rows_only_by_design = next(
        n for n, qd in entry_mod.QUERIES.items() if qd.oracle is None
    )
    art = {
        upgraded: {"err": "no_oracle", "spark_rows": 15},
        rows_only_by_design: {"err": "no_oracle", "spark_rows": 7},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(art))
    monkeypatch.setattr(entry_mod.os.path, "dirname", lambda p: str(tmp_path))
    counts = entry_mod._certification_counts()
    assert upgraded not in counts, (
        "stale rows-only row must NOT certify a query that now has an oracle"
    )
    assert counts.get(rows_only_by_design) == 1


def test_queries_order_puts_uncertified_first():
    q = entry_mod.queries()
    counts = entry_mod._certification_counts()
    names = list(q)
    # never-driver-certified queries all precede any certified one
    # (the original r4 spot-check pinned two then-new queries to the
    # front HALF; after many rounds of certification they legitimately
    # sit in the back — the invariant is the ordering rule itself)
    zeros = [n for n in names if counts.get(n, 0) == 0]
    if zeros and len(zeros) < len(names):
        first_certified = min(
            names.index(n) for n in names if counts.get(n, 0) > 0
        )
        last_zero = max(names.index(n) for n in zeros)
        assert last_zero < first_certified, (
            names[first_certified], names[last_zero]
        )
    # ordering is monotone in certification count
    seq = [counts.get(n, 0) for n in names]
    assert seq == sorted(seq)


def test_oracle_columns_are_subset_of_registry():
    o = entry_mod.oracle_sql()
    q = entry_mod.queries()
    assert set(o) <= set(q)
