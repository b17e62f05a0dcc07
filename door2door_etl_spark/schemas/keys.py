"""Deterministic surrogate-key derivation (SURVEY.md §2.7 F5).

The reference derives ``event_generated_id`` by concatenating the stringified
``unique_identifier`` columns (YAML declaration order), SHA-256-hashing, and
formatting the first 32 hex chars as a canonical UUID (reference
src/helper/helper.py:153-173, applied at :144-146).

This module reproduces that as pure built-in Catalyst expressions —
sha2/concat_ws/substring — no Python UDF, so the derivation stays inside
whole-stage codegen and is vectorized JVM-side (SURVEY.md §2.9).

Canonical stringification (engine-defined, documented divergence from pandas
reprs per SURVEY.md §7 risk register):
- NULL values stringify as the literal ``"None"`` (matches the pandas
  ``str(None)`` behavior the reference relies on, helper.py:164-173);
- timestamps stringify as ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` with the
  fractional part only when non-zero (matches ``str(pd.Timestamp)``);
- everything else uses Spark's cast-to-string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_TOKEN = "None"


def canonical_string(col: Column, data_type: T.DataType | None = None) -> Column:
    """Stringify one key component canonically (nulls -> ``"None"``)."""
    if isinstance(data_type, T.TimestampType) or isinstance(
        data_type, T.TimestampNTZType
    ):
        frac = F.date_format(col, "SSSSSS")
        base = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
        rendered = F.when(
            frac == F.lit("000000"), base
        ).otherwise(F.concat(base, F.lit("."), frac))
    else:
        rendered = col.cast("string")
    return F.coalesce(rendered, F.lit(NULL_TOKEN))


def surrogate_uuid_expr(
    key_cols: list[Column | str],
    key_types: list[T.DataType] | None = None,
) -> Column:
    """128-bit deterministic surrogate key as a canonical UUID string.

    ``sha2(concat(canonical strings), 256)`` truncated to 32 hex chars and
    formatted ``8-4-4-4-12`` — byte-for-byte the reference's scheme
    (helper.py:160-171) under the engine-canonical stringification above.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    types: list[T.DataType | None] = list(key_types) if key_types else [None] * len(cols)
    parts = [canonical_string(c, t) for c, t in zip(cols, types)]
    digest = F.sha2(F.concat(*parts), 256)
    return F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.substring(digest, 13, 4),
        F.substring(digest, 17, 4),
        F.substring(digest, 21, 12),
    )
