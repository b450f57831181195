"""LSN encode/decode — pg_lsn semantics on BIGINT (SURVEY.md §2.8 F10-F12)."""

from __future__ import annotations

from postgres_cdc_reconciliation_spark.functions.lsn import (
    long_to_lsn,
    lsn_diff,
    lsn_to_long,
    pretty_bytes,
)

CASES = [
    ("0/0", 0),
    ("0/1A", 26),
    ("00000000/0000001A", 26),  # variable hex width
    ("1/0", 4294967296),
    ("1/50000", 4294967296 + 327680),
    ("7FFFFFFF/FFFFFFFF", (2**31 - 1) * 2**32 + (2**32 - 1)),
    ("a/b", 10 * 2**32 + 11),  # lowercase hex
]


def test_lsn_to_long(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "lsn string")
    got = [r[0] for r in df.select(lsn_to_long("lsn")).collect()]
    assert got == [v for _, v in CASES]


def test_roundtrip_canonical(spark):
    df = spark.createDataFrame([(v,) for _, v in CASES], "v long")
    got = [r[0] for r in df.select(long_to_lsn("v")).collect()]
    # canonical uppercase, no zero padding
    assert got[0] == "0/0" and got[1] == "0/1A" and got[3] == "1/0"
    # re-parse gives the value back
    df2 = spark.createDataFrame([(s,) for s in got], "lsn string")
    assert [r[0] for r in df2.select(lsn_to_long("lsn")).collect()] == [
        v for _, v in CASES
    ]


def test_lsn_diff_and_null(spark):
    df = spark.createDataFrame(
        [("1/100", "0/FF"), (None, "0/1")], "a string, b string"
    )
    out = df.select(
        lsn_diff(lsn_to_long("a"), lsn_to_long("b")).alias("d")
    ).collect()
    assert out[0][0] == 4294967296 + 256 - 255
    assert out[1][0] is None


def test_pretty_bytes(spark):
    df = spark.createDataFrame([(10,), (2048,), (5 * 1024 * 1024,)], "b long")
    got = [r[0] for r in df.select(pretty_bytes("b")).collect()]
    assert got == ["10 bytes", "2.0 KB", "5.0 MB"]
