"""Scale operators: salted join equivalence, bucketed co-located joins."""

import contextlib
import io

from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from station_data_ingestion_spark.operators.skew import salted_join


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a tail
    big = spark.range(0, 2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k3", 3.0)], "k string, w double"
    )
    plain = big.join(small, on=["k"]).select("rid", "k", "v", "w")
    salted = salted_join(
        big, small, on=["k"], n_salt=8, big_unique_cols=["rid"]
    ).select("rid", "k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "rid long, k string"
    )
    small = spark.createDataFrame([("a", 10), ("b", 20)], "k string, w long")
    out = {
        r["rid"]: r["w"]
        for r in salted_join(
            big, small, on=["k"], n_salt=4, big_unique_cols=["rid"], how="left"
        ).collect()
    }
    assert out == {1: 10, 2: 20, 3: None}


def test_salted_join_deterministic_salt(spark):
    """Same inputs -> same salts (no rand()): re-computation is stable.

    count() is invariant to the salt function (every big row matches one
    replica regardless of bucket), so determinism is asserted on which
    shuffle partition each row lands in -- a rand() salt would reassign
    rows between two evaluations of the same plan."""
    big = spark.range(0, 200).select(F.col("id").alias("rid"), F.lit("x").alias("k"))
    small = spark.createDataFrame([("x", 1)], "k string, w long")
    out = salted_join(
        big, small, on=["k"], n_salt=16, big_unique_cols=["rid"]
    ).withColumn("pid", F.spark_partition_id())
    first = {r.rid: r.pid for r in out.collect()}
    second = {r.rid: r.pid for r in out.collect()}
    assert first == second
    # the salt expression itself must be hash-derived, not rand():
    # (post-AQE partition ids can't show the spread -- coalescing folds
    # the tiny test output into one partition either way)
    op = out._jdf.queryExecution().optimizedPlan().toString()
    assert "rand(" not in op, op
    assert "xxhash64" in op, op


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        4,
    )
    # force the shuffle-join path so the test proves bucketing (a broadcast
    # would hide the missing exchange)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        p = _plan(j)
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # and it still computes the right thing
        expected = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)


def test_bucketed_merge_target_shuffles_updates_only(spark):
    """A merge target bucketed on the effective join keys (station_id,
    date) joins with ZERO target-side Exchange: the only shuffle left is
    the per-job update side. The composite-key window count also rides
    the bucket partitioning."""
    import shutil

    from station_data_ingestion_spark.operators.bucketing import (
        write_merge_target,
    )
    from station_data_ingestion_spark.operators.merge import (
        merge_observations,
        merge_plan,
    )

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS b_obs")
    shutil.rmtree(f"{warehouse}/b_obs", ignore_errors=True)
    rows = [
        ("s1", "2022-03-01", 1.0),
        ("s1", "2022-03-02", 2.0),
        ("s2", "2022-03-01", 3.0),
    ]
    obs = spark.createDataFrame(
        rows, "station_id string, date string, value double"
    ).withColumns(
        {
            "datatype": F.lit("temperature"),
            "period": F.lit("day"),
            "fill": F.lit("raw"),
        }
    )
    keys = ["datatype", "period", "date", "fill", "station_id"]
    try:
        write_merge_target(obs, "b_obs", n_buckets=4)
        target = spark.table("b_obs")
        updates = obs.withColumn(
            "value", F.when(F.col("station_id") == "s1", 9.0).otherwise(F.col("value"))
        )
        jplan = (
            merge_plan(target, updates, keys)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the bucketed TARGET subtree never shuffles: no Exchange between
        # the bucketed scan and the join (the update side carries the
        # join shuffle plus the dup-guard window's -- both bounded by the
        # small per-job update, never by the table)
        assert "Bucketed: true" in jplan, jplan
        lines = jplan.splitlines()
        scan_i = next(i for i, ln in enumerate(lines) if "spark_catalog.default.b_obs" in ln)
        join_i = next(i for i, ln in enumerate(lines) if "SortMergeJoin" in ln)
        assert not any(
            "Exchange" in ln for ln in lines[join_i + 1 : scan_i]
        ), jplan
        assert jplan.count("Exchange hashpartitioning") <= 2, jplan
        merged, stats = merge_observations(target, updates, keys)
        assert stats.created == 0 and stats.replaced == 2
        got = {
            (r.station_id, r.date): r.value for r in merged.collect()
        }
        assert got[("s1", "2022-03-01")] == 9.0 and got[("s2", "2022-03-01")] == 3.0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_obs")
        shutil.rmtree(f"{warehouse}/b_obs", ignore_errors=True)


def test_minhash_lsh_high_dup_corpus_matches_exact(spark, tmp_path):
    """Adversarial LSH corpus: most docs land in one band bucket.

    On a heavily-duplicated crawl the LSH candidate set is a large
    fraction of all pairs, so the rerank join must not force-broadcast
    candidates (it no longer does -- AQE chooses). Output must still
    equal the exact explode-join pair query on the same corpus.
    """
    from station_data_ingestion_spark.queries.llm_dedup import (
        _exact_jaccard_pairs,
        dedup_minhash_lsh,
    )

    base = " ".join(f"w{i}" for i in range(40))
    rows = [(i, f"{base} tail{i % 3}") for i in range(80)]  # ~3160 dup pairs
    rows += [(100 + i, " ".join(f"u{i}x{j}" for j in range(40))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    got = sorted(map(tuple, dedup_minhash_lsh(spark, str(tmp_path)).collect()))
    want = sorted(map(tuple, _exact_jaccard_pairs(docs, 0.8).collect()))
    assert len(want) > 3000  # the corpus really is adversarial
    assert got == want


def test_jaccard_df_cap_bounds_stop_shingle_blowup(spark, tmp_path):
    """One boilerplate shingle shared by 1k docs must not generate ~500k
    candidate pairs when the df cap is on; true near-dups whose overlap
    includes RARE shingles must survive the capped path unchanged."""
    from station_data_ingestion_spark.queries.llm_dedup import (
        _capped_candidates,
        _exact_jaccard_pairs,
        _exploded_shingles,
    )

    stop = "all rights reserved"  # one 3-gram shared by every doc
    n = 1000
    rows = [(i, f"{stop} " + " ".join(f"u{i}w{j}" for j in range(12)))
            for i in range(n)]
    # a planted near-dup pair: identical 15-word tail, j well above 0.8
    tail = " ".join(f"dup{j}" for j in range(15))
    rows += [(5000, f"{tail}"), (5001, f"{tail}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cands = _capped_candidates(_exploded_shingles(docs), max_doc_freq=50)
    n_cands = cands.count()
    # uncapped would be >= C(1000,2) ~ 500k; capped keeps only pairs
    # sharing a RARE shingle
    assert n_cands < 1000, n_cands

    capped = sorted(
        map(tuple, _exact_jaccard_pairs(docs, 0.8, max_doc_freq=50).collect())
    )
    assert (5000, 5001, 1.0) in capped
    # and the capped result equals the exact result on this corpus:
    # no 0.8-pair here depends solely on the stop shingle
    exact = sorted(map(tuple, _exact_jaccard_pairs(docs, 0.8).collect()))
    assert capped == exact


def test_prefix_filtered_jaccard_matches_exact_and_prunes(spark, tmp_path):
    """Prefix filtering must (1) return exactly the explode-join pairs
    and (2) generate FEWER candidate pairs on a boilerplate-heavy corpus
    (the rarest-prefix property: common shingles never seed candidates
    unless they fall inside a short prefix)."""
    from station_data_ingestion_spark.queries.llm_dedup import (
        _exact_jaccard_pairs,
        _exploded_shingles,
        _prefix_candidates,
        _prefix_filtered_jaccard_pairs,
    )

    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [
        # 60 docs sharing 10 boilerplate words + unique tails (not dups)
        (i, f"{boiler} " + " ".join(f"d{i}x{j}" for j in range(20)))
        for i in range(60)
    ]
    # planted near-dup pairs
    base = " ".join(f"w{i}" for i in range(40))
    rows += [(100, base + " tailA"), (101, base + " tailA"), (102, base + " tailB")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(map(tuple, _prefix_filtered_jaccard_pairs(docs, 0.8).collect()))
    want = sorted(map(tuple, _exact_jaccard_pairs(docs, 0.8).collect()))
    assert got == want and len(want) >= 2

    exploded = _exploded_shingles(docs)
    n_prefix = _prefix_candidates(exploded, 0.8).count()
    a = exploded.select(F.col("doc_id").alias("a_id"), F.col("shingle").alias("s"))
    b = exploded.select(F.col("doc_id").alias("b_id"), F.col("shingle").alias("s"))
    n_plain = (
        a.join(b, "s").filter("a_id < b_id").select("a_id", "b_id").distinct().count()
    )
    assert n_prefix < n_plain, (n_prefix, n_plain)
