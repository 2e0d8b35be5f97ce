"""Column-level encryption (crypto.py) — twin of reference
utils/encryption.py:25-250. Round-trip, tenant isolation, auto-detect."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.crypto import (
    SENSITIVE_NAME_PATTERNS,
    decrypt_column,
    decrypt_columns,
    derive_key,
    encrypt_column,
    encrypt_columns,
    field_key,
    identify_sensitive_columns,
    tenant_key,
)

MASTER = "unit-test-master"


def test_derive_key_deterministic_and_distinct():
    assert derive_key(MASTER, "x") == derive_key(MASTER, "x")
    assert len(derive_key(MASTER, "x")) == 32  # AES-256 key material
    assert derive_key(MASTER, "x") != derive_key(MASTER, "y")
    assert derive_key(MASTER, "x") != derive_key("other-master", "x")
    # tenant/field namespacing matches the reference identifier scheme
    assert tenant_key(MASTER, "a") != field_key(MASTER, "a")
    assert field_key(MASTER, "f", "t1") != field_key(MASTER, "f", "t2")


def test_roundtrip_and_tenant_isolation(spark):
    df = spark.createDataFrame(
        [(1, "alice@example.com"), (2, "bob@example.com"), (3, None)],
        "id int, contact_email string",
    )
    k1 = field_key(MASTER, "contact_email", "tenant_1")
    k2 = field_key(MASTER, "contact_email", "tenant_2")
    enc = df.select("id", encrypt_column("contact_email", k1).alias("cipher"))
    out = enc.select(
        "id",
        decrypt_column("cipher", k1).alias("rt"),
        decrypt_column("cipher", k2).alias("wrong"),
    ).orderBy("id")
    rows = out.collect()
    assert [r["rt"] for r in rows] == ["alice@example.com", "bob@example.com", None]
    # wrong tenant key never reads the value (try_aes_decrypt -> null)
    assert all(r["wrong"] is None for r in rows)


def test_ciphertext_differs_and_is_randomized(spark):
    df = spark.createDataFrame([("same",), ("same",)], "v string")
    k = field_key(MASTER, "v")
    two = df.select(encrypt_column("v", k).alias("c")).collect()
    assert all(r["c"] != "same" for r in two)
    # GCM random IV: same plaintext twice -> different ciphertexts
    assert two[0]["c"] != two[1]["c"]


def test_identify_sensitive_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", "y", "z", 1.0, "k")],
        "id int, contact_email string, ssn_last4 string, payment_token string, "
        "latitude double, notes string",
    )
    found = identify_sensitive_columns(df)
    assert found == {
        "contact_email": "contact",
        "ssn_last4": "pii",
        "payment_token": "financial",
        "latitude": "location",
    }
    assert "notes" not in found and "id" not in found


def test_encrypt_decrypt_columns_auto_detect(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co", "ok"), (2, "c@d.co", "fine")],
        "id int, contact_email string, notes string",
    )
    enc = encrypt_columns(df, MASTER, tenant_id="t9")
    assert "contact_email_encrypted" in enc.columns
    assert enc.filter(F.col("contact_email").isin("a@b.co", "c@d.co")).count() == 0
    # notes untouched
    assert sorted(r["notes"] for r in enc.collect()) == ["fine", "ok"]
    dec = decrypt_columns(enc, MASTER, ["contact_email"], tenant_id="t9")
    assert "contact_email_encrypted" not in dec.columns
    assert sorted(r["contact_email"] for r in dec.collect()) == ["a@b.co", "c@d.co"]
    # int columns survive the cast path
    enc_int = encrypt_columns(df, MASTER, cols=["id"])
    dec_int = decrypt_columns(enc_int, MASTER, ["id"])
    assert sorted(r["id"] for r in dec_int.select(F.col("id").cast("int").alias("id")).collect()) == [1, 2]


def test_patterns_cover_reference_categories():
    assert set(SENSITIVE_NAME_PATTERNS) == {"pii", "contact", "financial", "location"}
