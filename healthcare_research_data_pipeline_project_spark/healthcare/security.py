"""Security column operations — parity with the reference's
SecurityManager (`healthcare-data-pipeline-main.py:40-80`) as
engine-side expressions (never driver-side row loops).

- `hash_pii`: SHA-256 hex, byte-identical to the reference's
  hashlib.sha256 (`:52-54`) so cross-system checks line up.
- `mask_pii_columns`: schema-name-driven masking (`:182-197`) —
  mrn→hash, ssn/phone/email→literal mask.
- `encrypt_column`/`decrypt_column`: AES-GCM via Spark's builtin
  `aes_encrypt`/`aes_decrypt`. The reference uses Fernet
  (AES-128-CBC+HMAC) — not bit-compatible, and both schemes are
  IV-randomized, so the contract is roundtrip equality, never
  ciphertext equality (the reference's own tests agree,
  healthcare-tests.py:76-83; SURVEY §7.6).
- `audit_event`: structured audit record (reference `:72-80`),
  engine-side so audit trails scale with the data.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK_LITERAL = "***MASKED***"
#: column-name patterns that force masking (reference `:191`)
MASK_NAME_PATTERN = re.compile(r"ssn|phone|email", re.IGNORECASE)
HASH_NAME_PATTERN = re.compile(r"mrn", re.IGNORECASE)


def hash_pii(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def mask_pii_columns(df: DataFrame) -> DataFrame:
    """Mask by schema-name scan: a driver-side decision (column names),
    executor-side execution (expressions)."""
    out = df
    for name in df.columns:
        if HASH_NAME_PATTERN.search(name):
            out = out.withColumn(name, hash_pii(name))
        elif MASK_NAME_PATTERN.search(name):
            out = out.withColumn(
                name, F.when(F.col(name).isNotNull(), F.lit(MASK_LITERAL))
            )
    return out


def encrypt_column(df: DataFrame, col: str, key: str) -> DataFrame:
    """AES-GCM encrypt a string column (key must be 16/24/32 bytes)."""
    return df.withColumn(
        col,
        F.base64(
            F.expr(f"aes_encrypt(cast({col} as binary), '{key}', 'GCM')")
        ),
    )


def decrypt_column(df: DataFrame, col: str, key: str) -> DataFrame:
    return df.withColumn(
        col,
        F.expr(f"aes_decrypt(unbase64({col}), '{key}', 'GCM')").cast("string"),
    )


def audit_event(df: DataFrame, user_id: str, action: str) -> DataFrame:
    """Attach a structured audit record per accessed row (reference
    logs one JSON line per action; at scale the audit trail is itself
    a table)."""
    return df.select(
        F.current_timestamp().alias("access_timestamp"),
        F.lit(user_id).alias("user_id"),
        F.lit(action).alias("action"),
        F.md5(F.to_json(F.struct(*df.columns))).alias("row_digest"),
    )
