"""Scalar Column builders shared across queries (SURVEY.md section 2.7).

All JVM-side built-ins — no Python UDFs — so they stay inside whole-stage
codegen and push down where possible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULLISH = ("none", "null", "")


def stage_from_file_url(col: Column | str) -> Column:
    """Derive the stage name from a file url:
    ``REGEXP_REPLACE(SPLIT_PART(file_url,'/',1),'^@','')`` (`app.py:707`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.split_part(c, F.lit("/"), F.lit(1)), "^@", "")


def is_nullish(col: Column | str) -> Column:
    """The reference's null-ish scrub (`app.py:257-259`): values rendering as
    'none'/'null'/'' are dropped from display."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | F.lower(F.trim(c)).isin(*NULLISH)


def not_nullish(col: Column | str) -> Column:
    return ~is_nullish(col)


def try_to_timestamp(col: Column | str) -> Column:
    """Error-safe timestamp cast, Snowflake TRY_TO_TIMESTAMP_NTZ semantics
    (`app.py:701,709`): null on failure instead of raising."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)


def iff(cond: Column, a, b) -> Column:
    """Snowflake IFF (`app.py:714,732`)."""
    return F.when(cond, a).otherwise(b)
