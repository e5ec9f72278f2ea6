"""Write-time data masking (the reference's DataMask SPI, SURVEY.md §2.9).

The reference ships three mask factories selected per column via
``orc.mask.*``: redact (char-class substitution,
``org/apache/orc/impl/mask/RedactMaskFactory.java``), SHA-256
(``SHA256MaskFactory``) and nullify (``NullifyMask``).  On Spark these
are plain ``withColumn`` transforms — all JVM-side, no UDFs.

Redact semantics follow the reference's default character classes:
uppercase -> 'X', lowercase -> 'x', digit -> '9', other kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def redact(df: DataFrame, column: str) -> DataFrame:
    """Character-class redaction: Aa1-Bb2 -> Xx9-Xx9 (reference defaults)."""
    masked = F.translate(
        F.col(column),
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
        "X" * 26 + "x" * 26 + "9" * 10,
    )
    return df.withColumn(column, masked)


def sha256_mask(df: DataFrame, column: str) -> DataFrame:
    """Replace a string column with its hex SHA-256 (SHA256MaskFactory)."""
    return df.withColumn(column, F.sha2(F.col(column).cast("string"), 256))


def nullify(df: DataFrame, column: str) -> DataFrame:
    """Replace every value with NULL, keeping the column type (NullifyMask)."""
    dtype = dict(df.dtypes)[column]
    return df.withColumn(column, F.lit(None).cast(dtype))


def apply_char_types(df: DataFrame, specs: dict[str, tuple[str, int]]) -> DataFrame:
    """Write-time CHAR/VARCHAR semantics over string columns
    (CharTreeWriter.writePadded CharTreeWriter.java:70-104 /
    VarcharTreeWriter.writeTruncated VarcharTreeWriter.java:64-86):
    ``{'col': ('char', n)}`` pads-or-truncates to exactly n;
    ``{'col': ('varchar', n)}`` truncates to at most n.  Spark DataFrames
    erase char/varchar to string, so this is the engine's write-time
    enforcement surface, applied before the encode job — all JVM-side
    expressions, no UDFs."""
    for col, (kind, n) in specs.items():
        if kind == "char":
            df = df.withColumn(col, F.rpad(F.substring(F.col(col), 1, n), n, " "))
        elif kind == "varchar":
            df = df.withColumn(col, F.substring(F.col(col), 1, n))
        else:
            raise ValueError(f"unknown char type {kind!r} for {col}")
    return df


def apply_masks(df: DataFrame, masks: dict[str, str]) -> DataFrame:
    """Apply a per-column mask spec: {column: 'redact'|'sha256'|'nullify'}.

    Mirrors the reference's per-column ``orc.mask.<name>`` selection; meant
    to run immediately before the encode job so masked values are what get
    encoded (write-time masking, like the reference).
    """
    fns = {"redact": redact, "sha256": sha256_mask, "nullify": nullify}
    for col, kind in masks.items():
        df = fns[kind](df, col)
    return df
