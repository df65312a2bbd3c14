"""Query surface: every operator exposed as a named (Spark, oracle-SQL) pair.

Import order registers all queries into the registry; __spark_entry__.py
re-exports them to the verification driver.
"""

from station_data_ingestion_spark.queries import (  # noqa: F401
    dq,
    events,
    funnels,
    graph_q,
    llm_dedup,
    llm_pipeline,
    llm_quality,
    llm_similarity,
    llm_text,
    merge_q,
    ml_q,
    multimodal,
    recursive_q,
    relational,
    relational_ext,
    relational_ext2,
    relational_ext3,
    scalars,
    setops,
    sketch_q,
    snapshot_q,
    snapshot_q2,
    sources_q,
    stats_infer_q,
    stats_q,
    stats_rank_q,
    streaming_q,
    temporal_q,
    udx,
    windows,
)
from station_data_ingestion_spark.queries.registry import QUERIES  # noqa: F401


def _interleave_by_module() -> None:
    """Reorder QUERIES round-robin across source modules, in place.

    The external driver samples a prefix of the registry (50/86 in r1),
    which left whole operator families (windows, setops, scalars, TPC-H
    q11-q22) unsampled. Interleaving one query per module puts every
    family inside any prefix >= the module count (13), so each
    CORRECTNESS_r{N}.json row-set spans the full operator surface.
    Per-module relative order is preserved; the registry dict is mutated
    in place because other modules hold references to it.
    """
    by_mod: dict[str, list[str]] = {}
    for name, qd in QUERIES.items():
        by_mod.setdefault(qd.fn.__module__, []).append(name)
    queues = [list(names) for names in by_mod.values()]
    order: list[str] = []
    while queues:
        queues = [q for q in queues if q]
        for q in queues:
            if q:
                order.append(q.pop(0))
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in order})


_interleave_by_module()
