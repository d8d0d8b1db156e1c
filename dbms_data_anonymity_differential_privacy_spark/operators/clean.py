"""Text cleaning and boilerplate-line filtering for crawl corpora.

The first transformation every web-scale training pipeline applies
(C4, Raffel et al. 2020 §2.2; CCNet, Wenzek et al. 2020): strip markup,
kill control characters, normalize exotic whitespace, and drop
boilerplate lines, BEFORE any dedup/quality/LM stage sees the text. The
reference has no text data at all (SURVEY §0); this is a north-star
LLM-data-pipeline component designed from the public Spark API.

Design rules (same as `operators/pii.py`): every pattern is kept to the
common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes with ``\\x{...}`` escapes (both engines), no lookaround, no
backreferences — and applied in ONE fixed order, so each operator has a
byte-identical DuckDB twin and the whole pass is map-only built-in
expressions: whole-stage codegen, zero UDFs, zero shuffles,
embarrassingly parallel at 100 TB.

Ordering note: the control-character step removes ``\\x0B`` (vertical
tab) BEFORE the whitespace collapse because Java's ``\\s`` includes
``\\x0B`` and RE2's does not — after the removal, both engines' ``\\s``
see the identical character set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (label, pattern, replacement) applied top to bottom. \x{...} escapes are
# the Java-regex / RE2 common syntax (Java's \uXXXX is NOT valid RE2).
CLEAN_STEPS: list[tuple[str, str, str]] = [
    # markup out first so tag innards can't leak into later classes
    ("html_tags", r"<[^>]*>", " "),
    # C0 controls + DEL, except \t \n \r (kept as whitespace for collapse)
    ("control_chars", r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]", ""),
    # unicode space separators -> plain space
    (
        "unicode_spaces",
        r"[\x{00A0}\x{1680}\x{2000}-\x{200B}\x{202F}\x{205F}\x{3000}]",
        " ",
    ),
    # collapse runs; safe cross-engine because \x0B is already gone
    ("collapse_ws", r"\s+", " "),
]


def clean_text(text: Column) -> Column:
    """Apply the full cleaning chain and trim. Byte-identical to
    :func:`clean_text_sql` on any input."""
    out = text
    for _, pat, repl in CLEAN_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def clean_text_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`clean_text`, generated from the same step
    table so the two can never drift (``'g'`` flag = Spark's
    replace-all default)."""
    out = text_expr
    for _, pat, repl in CLEAN_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return f"trim({out})"


# --- C4-style line filter ---------------------------------------------------

# A line survives iff it has >= min_words words AND ends in terminal
# punctuation AND contains no blocklisted boilerplate phrase (C4 §2.2's
# rules, minus the language-specific ones).
LINE_MIN_WORDS = 5
LINE_TERMINAL = r"""[.!?"']$"""
LINE_BLOCKLIST = ["javascript", "cookie", "subscribe", "all rights reserved"]


def _line_ok(line: Column) -> Column:
    t = F.trim(line)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    ends_ok = t.rlike(LINE_TERMINAL)
    lowered = F.lower(t)
    blocked = F.lit(False)
    for phrase in LINE_BLOCKLIST:
        blocked = blocked | lowered.contains(phrase)
    return (words >= LINE_MIN_WORDS) & ends_ok & ~blocked


def filter_boilerplate_lines(
    df: DataFrame, text_col: str = "text", out_col: str = "text_filtered"
) -> DataFrame:
    """Keep only content lines of each document (split on ``\\n``, apply
    the C4 rules per line, rejoin with ``\\n``). Adds ``n_lines`` /
    ``n_kept`` alongside ``out_col``. Map-only: per-row array ops, no
    explode, no shuffle."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, _line_ok)
    return df.select(
        "*",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(F.transform(kept, F.trim), "\n").alias(out_col),
    )


def line_filter_sql(text_expr: str) -> str:
    """DuckDB twin of the per-line keep predicate chain: returns a SQL
    expression yielding the filtered-and-rejoined text. Built from the
    same constants as the Spark side."""
    blocked = " OR ".join(
        f"contains(lower(trim(l)), '{p}')" for p in LINE_BLOCKLIST
    )
    terminal_sql = LINE_TERMINAL.replace("'", "''")
    keep = (
        f"len(list_filter(string_split_regex(trim(l), '\\s+'), w -> w <> ''))"
        f" >= {LINE_MIN_WORDS}"
        f" AND regexp_matches(trim(l), '{terminal_sql}')"
        f" AND NOT ({blocked})"
    )
    return (
        f"array_to_string(list_transform(list_filter(string_split({text_expr}, chr(10)), "
        f"l -> {keep}), l -> trim(l)), chr(10))"
    )
