"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

SQL:2016 row-pattern recognition over per-key event streams, restated
for engines without the primitive: encode each key's time-ordered
events as a compact symbol string (one JVM aggregation — sort_array
over collect_list keeps ordering inside the aggregate, so there is no
global window), then run an ANCHORED REGEX over the string. Leftmost,
non-overlapping regex scanning IS MATCH_RECOGNIZE's default skip-past-
last-row semantics, so patterns like "signup, then only clicks/views,
then purchase" are `s[cv]*p` — declarative, engine-portable (Java
regex and RE2 agree on leftmost + character-class semantics; patterns
should avoid backtracking-divergent constructs like nested lazy
quantifiers), and auditable against a second engine.

Scale shape: one shuffle on the key; per-key state is that key's event
string (bounded by per-entity activity — the same assumption every
MATCH_RECOGNIZE implementation makes); the regex pass is linear in
total events. No Python stages.

[reference: none — the reference has no sequence operator; engine
surface in the Flink CEP / Snowflake MATCH_RECOGNIZE family]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_sequences(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    code: Column,
    max_events_per_key: int | None = None,
) -> DataFrame:
    """One row per key: ``key`` + ``seq`` (the symbol string of the
    key's events, ordered by ``order_cols`` — include a unique
    tiebreaker so the order is total and engine-independent).

    ``code`` must evaluate to a single-character string per event.

    ``max_events_per_key`` is the whale-key guard: per-key state is the
    key's whole event string, bounded only by per-entity activity (the
    standard MATCH_RECOGNIZE state bound). Without a cap, one bot/whale
    key silently builds an unbounded string on a single task. With a
    cap, any key exceeding it fails the job LOUDLY (raise_error naming
    the offending key) — the check fires on the collected array size
    BEFORE the symbol string is materialized, so the failure costs one
    aggregation buffer, not a giant string; callers pre-filter the
    named key (or raise the cap) and re-run. A hard memory bound would
    need a pre-count pass over the same shuffle — the loud-failure cap
    buys the observability without doubling the scan.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, code.alias("_c")))
    )
    if max_events_per_key is not None:
        if max_events_per_key <= 0:
            raise ValueError(
                f"max_events_per_key must be positive, got {max_events_per_key}"
            )
        guarded = F.when(
            F.size(ordered) <= max_events_per_key, ordered
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("sequence whale key "),
                    F.col(key).cast("string"),
                    F.lit(
                        f": event count exceeds max_events_per_key="
                        f"{max_events_per_key}; pre-filter bot/whale "
                        "keys or raise the cap"
                    ),
                )
            )
        )
    else:
        guarded = ordered
    return df.groupBy(key).agg(
        F.array_join(
            F.transform(guarded, lambda s: s["_c"]), ""
        ).alias("seq")
    )


def count_pattern(seq_df: DataFrame, pattern: str) -> DataFrame:
    """Append ``n_matches``: leftmost non-overlapping occurrences of
    ``pattern`` in each key's sequence (MATCH_RECOGNIZE's
    AFTER MATCH SKIP PAST LAST ROW counting)."""
    return seq_df.withColumn(
        "n_matches",
        F.size(F.regexp_extract_all("seq", F.lit(pattern), F.lit(0))),
    )
