"""Column-level encryption: Spark-native twin of the reference's field /
tenant encryption stack (``utils/encryption.py:25-250`` —
EncryptionKeyManager PBKDF2 key derivation :46-58, tenant keys :60-62,
field keys :64-69, Fernet field ciphers :72-146, TenantKeyManager
per-tenant field config :148-206, FieldLevelEncryption sensitive-pattern
auto-detect :210-250).

Spark-first re-expression: the reference encrypts row dicts driver-side
with Fernet; here encryption is a COLUMN transform (`aes_encrypt` /
`try_aes_decrypt`, JVM-side, whole-stage codegen) so a 100 TB corpus
encrypts at scan speed with zero Python in the loop and no shuffle. Key
derivation stays deterministic (master secret + identifier → SHA-256),
so any executor derives the same key from broadcast config; the PBKDF2
iteration hardening of the reference belongs to at-rest master-key
storage, which Spark delegates to the secret manager that injects
``master`` (keys never touch the data plane or the driver's disk).

GCM (default) carries a random IV per value — semantically secure,
ciphertexts differ run-to-run — so correctness queries compare
decrypt(encrypt(x)) round-trips, never raw ciphertexts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

#: reference `utils/encryption.py:216-221` — name-substring categories used
#: by FieldLevelEncryption.identify_sensitive_fields
SENSITIVE_NAME_PATTERNS: dict[str, list[str]] = {
    "pii": ["ssn", "social_security", "personal_id", "driver_license"],
    "contact": ["email", "phone", "address", "contact_info"],
    "financial": ["account", "routing", "credit_card", "payment"],
    "location": ["coordinates", "latitude", "longitude", "precise_location"],
}


def derive_key(master: str, identifier: str) -> bytes:
    """Deterministic 32-byte (AES-256) key for ``identifier`` under
    ``master`` (twin of EncryptionKeyManager.derive_key :46-58 — same
    master||identifier input contract, SHA-256 in place of PBKDF2; see
    module docstring). Returns the RAW 32-byte digest (full 256-bit
    entropy) passed to ``aes_encrypt`` as a BINARY key — a truncated hex
    string would silently halve the effective key strength to 128 bits."""
    return hashlib.sha256((master + "\x00" + identifier).encode("utf-8")).digest()


def tenant_key(master: str, tenant_id: str) -> bytes:
    """Per-tenant key (`generate_tenant_key` :60-62)."""
    return derive_key(master, f"tenant_{tenant_id}")


def field_key(master: str, field_name: str, tenant_id: str | None = None) -> bytes:
    """Per-field (optionally per-tenant) key (`generate_field_key` :64-69)."""
    identifier = f"field_{field_name}"
    if tenant_id:
        identifier += f"_tenant_{tenant_id}"
    return derive_key(master, identifier)


def encrypt_column(col: Column | str, key: str | bytes, mode: str = "GCM") -> Column:
    """Encrypt a column to base64 text (`encrypt_value` :92-103: Fernet →
    urlsafe-b64; here AES-GCM with a random 12-byte IV per value, prepended
    to the ciphertext by Spark). Null stays null. ``key`` may be raw bytes
    (BINARY key literal, the 256-bit path) or a 16/24/32-char string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(F.aes_encrypt(c.cast("string").cast("binary"), F.lit(key), F.lit(mode)))


def decrypt_column(col: Column | str, key: str | bytes, mode: str = "GCM") -> Column:
    """Decrypt a base64 ciphertext column back to string. Wrong key or
    corrupt payload → null (``try_aes_decrypt``), mirroring the reference's
    catch-and-log path (`decrypt_value` :105-121) without poisoning the job."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_aes_decrypt(F.unbase64(c), F.lit(key), F.lit(mode)).cast("string")


def identify_sensitive_columns(df: DataFrame, patterns: dict[str, list[str]] | None = None) -> dict[str, str]:
    """column name → category for names matching the sensitive substrings
    (`identify_sensitive_fields` :223-236 — first matching category wins)."""
    patterns = patterns or SENSITIVE_NAME_PATTERNS
    out: dict[str, str] = {}
    for name in df.columns:
        low = name.lower()
        for category, subs in patterns.items():
            if any(s in low for s in subs):
                out[name] = category
                break
    return out


def encrypt_columns(
    df: DataFrame,
    master: str,
    cols: list[str] | None = None,
    tenant_id: str | None = None,
    mode: str = "GCM",
) -> DataFrame:
    """Encrypt ``cols`` (default: auto-detected sensitive columns) in place,
    each under its own per-field/per-tenant key, and add the
    ``<col>_encrypted`` marker the reference writes (`encrypt_dict`
    :123-133). One projection — no shuffle, no Python."""
    target = cols if cols is not None else sorted(identify_sensitive_columns(df))
    out = df
    for c in target:
        out = out.withColumn(c, encrypt_column(c, field_key(master, c, tenant_id), mode))
        out = out.withColumn(f"{c}_encrypted", F.lit(True))
    return out


def decrypt_columns(
    df: DataFrame,
    master: str,
    cols: list[str],
    tenant_id: str | None = None,
    mode: str = "GCM",
) -> DataFrame:
    """Inverse of :func:`encrypt_columns` (`decrypt_dict` :135-146):
    decrypts each marked column and drops the marker."""
    out = df
    for c in cols:
        out = out.withColumn(c, decrypt_column(c, field_key(master, c, tenant_id), mode))
        if f"{c}_encrypted" in out.columns:
            out = out.drop(f"{c}_encrypted")
    return out
