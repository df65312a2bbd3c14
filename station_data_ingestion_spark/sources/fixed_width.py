"""Fixed-width text source: the other classic station-feed format
(NOAA/GHCN-style column-position records). Pure JVM parsing — one
spark.read.text scan, substring/trim/strict-cast projections — so the
scan stays whole-stage-codegen with no Python in the row path.
[reference: the wide-CSV scan's string-preserving discipline
(src/driver.py:141) applied to position-delimited records]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def scan_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
    strict: bool = True,
) -> DataFrame:
    """Parse fixed-width records. ``colspecs``: (name, start_1_based,
    length, type) per field. Values are substring-extracted then
    right-trimmed (fixed-width pads with spaces); empty fields are
    NULL. ``strict=True`` raises on a non-castable non-empty value
    (the reference's strict-cast guard) instead of nulling it.
    """
    raw = spark.read.text(path)
    cols = []
    for name, start, length, dtype in colspecs:
        v = F.rtrim(F.substring(F.col("value"), start, length))
        v = F.when(v == "", None).otherwise(v)
        if dtype != "string":
            cast = v.try_cast(dtype)
            if strict:
                cast = F.when(
                    v.isNotNull() & cast.isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(f"fixed-width field {name}: non-"),
                            F.lit(f"{dtype} value '"),
                            v,
                            F.lit("'"),
                        )
                    ).cast(dtype),
                ).otherwise(cast)
            v = cast
        cols.append(v.alias(name))
    return raw.select(*cols)


def format_fixed_width(
    df: DataFrame, colspecs: list[tuple[str, int, int, str]]
) -> DataFrame:
    """Render rows as fixed-width lines (writer twin, used by tests and
    round-trip gates): each field is string-cast and right-padded to
    its width; overflow raises rather than silently truncating."""
    parts = []
    for name, _start, length, _dtype in colspecs:
        s = F.coalesce(F.col(name).cast("string"), F.lit(""))
        guarded = F.when(
            F.length(s) > length,
            F.raise_error(
                F.concat(
                    F.lit(f"field {name} overflows width {length}: '"),
                    s,
                    F.lit("'"),
                )
            ).cast("string"),
        ).otherwise(F.rpad(s, length, " "))
        parts.append(guarded)
    return df.select(F.concat(*parts).alias("value"))
