"""Column builders for the extended scalar-function surface.

Each builder returns a dict of name → Column so callers can
``df.withColumns(builder(col))`` or cherry-pick. Cross-engine notes (the
DuckDB oracle must produce bit-identical values) live next to the
expressions that need them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_parts(ts: Column) -> dict[str, Column]:
    """Calendar decomposition of a timestamp.

    ``dow`` is normalized to 0=Sunday..6=Saturday (Spark's ``dayofweek`` is
    1-based Sunday; DuckDB's is 0-based — subtracting 1 aligns them).
    ``week`` is ISO week-of-year in both engines.
    """
    return {
        "year": F.year(ts),
        "quarter": F.quarter(ts),
        "month": F.month(ts),
        "day": F.dayofmonth(ts),
        "dow": F.dayofweek(ts) - 1,
        "doy": F.dayofyear(ts),
        # dates are emitted as yyyy-MM-dd strings: DuckDB's client surfaces
        # DATE as a midnight Timestamp, so raw date columns never hash-match
        "month_start": F.date_format(F.date_trunc("month", ts), "yyyy-MM-dd"),
        "month_end": F.date_format(F.last_day(ts), "yyyy-MM-dd"),
        "plus_week": F.date_format(F.date_add(ts.cast("date"), 7), "yyyy-MM-dd"),
    }


def string_features(s: Column) -> dict[str, Column]:
    """String-function surface: case, slicing, padding, search, edit
    distance. All 1-based positions (Spark ``instr`` ≡ DuckDB ``strpos``)."""
    return {
        "upper": F.upper(s),
        "lower": F.lower(s),
        "sub": F.substring(s, 10, 6),
        "lpadded": F.lpad(s, 24, "."),
        "replaced": F.regexp_replace(s, "0+", "0"),
        "digits": F.regexp_extract(s, r"(\d+)", 1),
        "rev": F.reverse(s),
        "pos_zero": F.instr(s, "0"),
        "lev": F.levenshtein(s, F.lit("Customer")),
        "n_chars": F.length(s),
    }


def null_semantics(s: Column, sentinel: str) -> dict[str, Column]:
    """NULL-handling semantics: NULLIF / COALESCE / null-safe equality.

    ``is_sentinel`` goes through ``eqNullSafe`` against NULL (SQL ``<=>`` ≡
    DuckDB ``IS NOT DISTINCT FROM``) — TRUE exactly when NULLIF fired,
    never NULL itself; a plain ``= NULL`` would be NULL everywhere.
    """
    nulled = F.nullif(s, F.lit(sentinel))
    return {
        "maybe_null": nulled,
        "filled": F.coalesce(nulled, F.lit("(none)")),
        "is_sentinel": nulled.eqNullSafe(F.lit(None).cast("string")),
    }


def array_scalar_features(arr: Column) -> dict[str, Column]:
    """Array ops reduced to scalars (scalars hash identically across
    engines; raw array columns don't — string forms differ)."""
    sorted_arr = F.array_sort(arr)
    # try_element_at: an EMPTY array (tokenizing "" or whitespace) must
    # yield NULL first/last like every engine's list indexing, not an
    # ANSI out-of-bounds error (robustness_audit `nulls` finding)
    return {
        "n_items": F.size(arr),
        "first_sorted": F.try_element_at(sorted_arr, F.lit(1)),
        "last_sorted": F.try_element_at(sorted_arr, F.lit(-1)),
        "has_the": F.array_contains(arr, "the"),
        "n_distinct_items": F.size(F.array_distinct(arr)),
    }
