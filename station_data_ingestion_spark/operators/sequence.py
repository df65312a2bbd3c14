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
) -> DataFrame:
    """One row per key: ``key`` + ``seq`` (the symbol string of the
    key's events, ordered by ``order_cols`` — include a unique
    tiebreaker so the order is total and engine-independent).

    ``code`` must evaluate to a single-character string per event.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(*order_cols, code.alias("_c")))
    )
    return df.groupBy(key).agg(
        F.array_join(
            F.transform(ordered, lambda s: s["_c"]), ""
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
