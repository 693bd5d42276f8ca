"""Shared text primitives for the datapipe operators.

Every operator here is verified against a DuckDB oracle, so all derived
values must be *portably deterministic*: identical strings in, identical
values out, in both engines. The only hash either engine is allowed to use
is ``md5`` (bit-identical everywhere); min/max over md5 hex strings is the
portable "min-hash" primitive. Spark's ``xxhash64`` is reserved for
engine-internal partitioning (bucketing, salting) where no oracle looks.

Tokenization semantics (the spec for both engines):

* lowercase, replace non-[a-z0-9] runs with a single space, trim;
* tokens = split on single space, drop empties;
* word k-shingles = k consecutive tokens joined by one space;
* char k-grams = k-byte substrings of the normalized text.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ------------------------------------------------------------------ Spark side


def norm_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def tokens(col: Column) -> Column:
    """Array of non-empty tokens of the *normalized* text."""
    return F.filter(F.split(norm_text(col), " "), lambda x: x != "")


def word_shingles(toks: Column, k: int) -> Column:
    """Array of k-word shingles (space-joined); empty if fewer than k
    tokens. Guarded: Spark ``sequence(1, 0)`` would count DOWN."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_grams(col: Column, k: int) -> Column:
    """Array of k-char grams of the normalized text."""
    s = norm_text(col)
    n = F.length(s)
    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - k + 1), lambda i: F.substring(s, i, k)),
    ).otherwise(F.array().cast("array<string>"))


def seeded_md5(seed: int, col: Column) -> Column:
    """Portable seeded hash: hex md5 of ``"<seed>|<value>"``."""
    return F.md5(F.concat(F.lit(f"{seed}|"), col))


# ----------------------------------------------------------------- DuckDB side
# SQL snippet builders kept textually parallel to the Spark expressions above.

SQL_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"


def sql_tokens(c: str) -> str:
    return f"list_filter(string_split({SQL_NORM.format(c=c)}, ' '), t -> t <> '')"


def sql_word_shingles(toks: str, k: int) -> str:
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"[array_to_string({toks}[i:i+{k - 1}], ' ') "
        f"FOR i IN generate_series(1, len({toks}) - {k - 1})] "
        f"ELSE [] END"
    )


def sql_char_grams(c: str, k: int) -> str:
    s = SQL_NORM.format(c=c)
    return (
        f"CASE WHEN length({s}) >= {k} THEN "
        f"[substr({s}, i, {k}) FOR i IN generate_series(1, length({s}) - {k - 1})] "
        f"ELSE [] END"
    )


def sql_seeded_md5(seed: int, expr: str) -> str:
    return f"md5('{seed}|' || {expr})"
