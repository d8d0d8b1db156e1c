"""Keyed pseudonymization — extension X37.

Deterministic tokenization of identifier columns: replace each value
with a keyed one-way token so the same value maps to the same token
(joins and group-bys still work across tables sharing the secret) while
the raw identifier never leaves the engine. This is the GDPR Art. 4(5)
"pseudonymisation" primitive and the first step of most production
anonymization pipelines; the reference has nothing like it (its scripts
drop or group identifiers instead).

Token = hex-truncated SHA-256 of ``secret || '|' || value``. The secret
plays the role of an HMAC key; with a fixed-length secret prefix and a
one-shot hash the length-extension caveat of plain prefix-keyed SHA-256
does not yield token forgeries (an attacker without the secret cannot
compute any valid token), and the construction is expressible as the
same two built-ins on Spark and DuckDB, so the operator is
oracle-checkable bit-for-bit. Rotate the secret to unlink releases.

Scale shape: pure map-only projection — one ``sha2`` per cell inside
whole-stage codegen, zero shuffles, pushdown/pruning unaffected.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    secret: str,
    token_hex_chars: int = 16,
) -> DataFrame:
    """Replace each of ``cols`` with its keyed token (same name, string
    type). NULL stays NULL (no token leaks "this was null" beyond the
    NULL itself, matching SQL semantics on both engines).

    ``token_hex_chars`` truncates the 64-hex-char SHA-256 (16 hex chars =
    64 bits — collision-safe into the billions of distinct values by the
    birthday bound; raise it for larger identifier spaces).
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if not secret:
        raise ValueError("secret must be non-empty — an unkeyed hash is linkable by dictionary attack")
    if not 8 <= token_hex_chars <= 64:
        raise ValueError("token_hex_chars must be in [8, 64]")
    out = df
    for c in cols:
        tok = F.substring(
            F.sha2(F.concat_ws("|", F.lit(secret), F.col(c).cast("string")), 256),
            1,
            token_hex_chars,
        )
        # concat_ws skips NULL args, which would token-ize NULL as
        # sha(secret) — keep NULL as NULL explicitly instead
        out = out.withColumn(c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(tok))
    return out


def pseudonymize_sql_expr(col: str, secret: str, token_hex_chars: int = 16) -> str:
    """The DuckDB twin of one column's token expression (same built-ins,
    same byte stream hashed)."""
    return (
        f"CASE WHEN {col} IS NULL THEN NULL ELSE "
        f"substr(sha256('{secret}' || '|' || CAST({col} AS VARCHAR)), 1, {token_hex_chars}) END"
    )
