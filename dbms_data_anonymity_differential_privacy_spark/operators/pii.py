"""PII detection and redaction over free-text columns — the direct-
identifier scrubbing step of an anonymization pipeline (the reference
drops identifier COLUMNS, e.g. `fnlwgt`/`education` at
naive-suppresion.py:23-27; free text needs in-value scrubbing instead)
and a standard pre-training hygiene gate for LLM corpora.

Design: a fixed dictionary of PII regexes kept to the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, and ``\\b`` only; no lookaround, no backreferences — so every
operator here has an exact DuckDB twin and the whole scan is one map-only
stage of built-in expressions (whole-stage codegen, zero UDFs, zero
shuffles). At 100 TB this is the ideal operator shape: embarrassingly
parallel, pushdown-friendly, no state.

Detection counts use ``regexp_extract_all`` + ``size`` (Spark) vs
``len(regexp_extract_all(...))`` (DuckDB). Redaction chains
``regexp_replace`` in a FIXED order (most-specific pattern first) so both
engines produce byte-identical output; DuckDB needs the explicit ``'g'``
flag to match Spark's replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered most-specific-first: the redaction chain applies top to bottom,
# so a 16-digit card is consumed before the phone/SSN patterns could nibble
# at its groups, and emails are consumed before the IPv4 pattern could
# match a numeric mail domain.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern (0 for NULL
    text, matching the oracle's COALESCE)."""
    return F.coalesce(F.size(F.regexp_extract_all(text, F.lit(pattern), 0)), F.lit(0))


def with_pii_counts(
    df: DataFrame, text_col: str, patterns: dict[str, str] | None = None
) -> DataFrame:
    """Add one ``pii_<type>`` count column per pattern plus ``pii_total``.

    One projection over the scan — Catalyst fuses all patterns into a
    single codegen stage, so adding a pattern costs CPU, not a pass.
    """
    patterns = patterns or PII_PATTERNS
    t = F.col(text_col)
    out = df
    for label, pat in patterns.items():
        out = out.withColumn(f"pii_{label}", pii_count(t, pat))
    total = None
    for label in patterns:
        c = F.col(f"pii_{label}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    text: Column, patterns: dict[str, str] | None = None, fmt: str = "[{label}]"
) -> Column:
    """Replace every PII match with a typed placeholder (``[EMAIL]``,
    ``[SSN]``, ...). Chain order = dict order (most-specific first); both
    engines apply the identical chain, so output is byte-identical.
    """
    patterns = patterns or PII_PATTERNS
    out = text
    for label, pat in patterns.items():
        out = F.regexp_replace(out, pat, fmt.format(label=label.upper()))
    return out


def redact_pii_sql(text_expr: str, patterns: dict[str, str] | None = None,
                   fmt: str = "[{label}]") -> str:
    """The DuckDB twin of :func:`redact_pii`: the same replace chain as
    nested ``regexp_replace(..., 'g')`` calls, built from the same pattern
    dict so the two can never drift."""
    patterns = patterns or PII_PATTERNS
    out = text_expr
    for label, pat in patterns.items():
        out = f"regexp_replace({out}, '{pat}', '{fmt.format(label=label.upper())}', 'g')"
    return out


def pii_report(
    df: DataFrame, text_col: str, patterns: dict[str, str] | None = None
) -> DataFrame:
    """Corpus-level rollup: per PII type, how many rows contain it and how
    many total mentions occur. One aggregation, grouped on nothing —
    partial (map-side) aggregation makes the shuffle a single row per
    partition regardless of input size."""
    patterns = patterns or PII_PATTERNS
    t = F.col(text_col)
    aggs = []
    for label, pat in patterns.items():
        cnt = pii_count(t, pat)
        aggs.append(F.sum((cnt > 0).cast("long")).alias(f"rows_with_{label}"))
        aggs.append(F.sum(cnt).alias(f"mentions_{label}"))
    return df.agg(*aggs)
