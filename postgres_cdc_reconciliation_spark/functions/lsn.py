"""Postgres LSN (log sequence number) as native Spark column expressions.

The reference stores LSNs as TEXT ``'XXXXXXXX/YYYYYYYY'`` and casts to
``pg_lsn`` for ordered comparison and byte distance
(reference: check_batch_replication_status.sql:25,75,80 — ``::pg_lsn`` cast,
``>=`` comparison, ``pg_wal_lsn_diff``). Spark has no pg_lsn type, so we encode
an LSN as BIGINT ``hi * 2^32 + lo`` where hi/lo are the two hex halves. This
makes ordering, equality joins, and ``pg_wal_lsn_diff(a, b) == a - b`` exact
native 64-bit arithmetic — no UDF, fully codegen'd, pushdown-friendly.

Edge cases matched to Postgres semantics:
- variable hex width ('0/1A' == '00000000/0000001A'),
- case-insensitive hex parse, canonical uppercase on format,
- NULL in → NULL out.

Range: pg_lsn is unsigned 64-bit; the BIGINT encoding covers [0, 2^63) —
i.e. ~9.2 exabytes of WAL position, far beyond any real deployment. Values
at or above 8000000000000000/0 are outside the encoding and parse to NULL,
same as malformed text (see ``lsn_to_long``): a row the engine cannot
order costs itself, never the job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_32 = 4294967296  # 2^32


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lsn_to_long(c: Column | str) -> Column:
    """Parse 'H/L' hex LSN text into a comparable BIGINT (hi*2^32 + lo).

    Native expression (split + conv), no UDF; stays inside whole-stage
    codegen. Mirrors Postgres pg_lsn total order.

    Malformed or out-of-range text parses to NULL, never an error: one
    mangled LSN in a feed must cost its own event, not the apply job.
    Specifically (all found by the round-7 dirty-feed probe):
    - ``getItem`` on a splitless value raises INVALID_ARRAY_INDEX under
      ANSI → tolerant ``get()``;
    - ``conv`` quietly misparses partial-hex garbage → the halves are
      regex-validated (1-8 hex digits) instead of trusted;
    - hi ≥ 0x80000000 overflows the signed-BIGINT encoding (the docstring
      range bound above) → the hi regex rejects the upper half, and the
      arithmetic uses try_* ops anyway because whole-stage codegen's
      common-subexpression elimination can evaluate a CASE branch's
      arithmetic even for rows the guard excludes.
    Well-formed in-range LSNs are bit-identical to the unguarded parse.
    """
    c = _as_col(c)
    parts = F.split(c, "/")
    hi_s, lo_s = F.get(parts, 0), F.get(parts, 1)
    # ONE anchored regex validates the whole value — shape (exactly one
    # '/'), hex-ness of both halves, and the signed-range hi bound (≤7
    # digits, or 8 with top nibble 0-7) — because this runs per event on
    # the CDC hot path and a second rlike measurably costs (~0.5µs/event
    # for the two-half formulation at sf0.1)
    valid = c.rlike("^(?:[0-9a-fA-F]{1,7}|[0-7][0-9a-fA-F]{7})/[0-9a-fA-F]{1,8}$")
    hi = F.conv(hi_s, 16, 10).try_cast("long")
    lo = F.conv(lo_s, 16, 10).try_cast("long")
    return (
        F.when(valid, F.try_add(F.try_multiply(hi, F.lit(TWO_32)), lo))
        .otherwise(F.lit(None).cast("long"))
        .alias("lsn")
    )


def long_to_lsn(c: Column | str) -> Column:
    """Format a BIGINT-encoded LSN back to canonical 'H/L' uppercase hex text."""
    c = _as_col(c)
    # bit ops, not '/': float division loses precision near 2^63
    hi = F.shiftrightunsigned(c, 32)
    lo = c.bitwiseAND(F.lit(0xFFFFFFFF))
    return F.format_string("%X/%X", hi, lo)


def lsn_diff(a: Column | str, b: Column | str) -> Column:
    """pg_wal_lsn_diff(a, b): byte distance a - b on BIGINT-encoded LSNs.

    Reference: check_batch_replication_status.sql:80,
    docs/replication_troubleshooting.md:15.
    """
    return _as_col(a) - _as_col(b)


def pretty_bytes(c: Column | str) -> Column:
    """Tiered byte pretty-print ('... bytes' / 'KB' / 'MB' / 'GB').

    Reference: docs/replication_troubleshooting.md:24-28 (CASE + ROUND tiers).
    """
    c = _as_col(c).cast("double")
    kb, mb, gb = 1024.0, 1024.0**2, 1024.0**3
    return (
        F.when(c < kb, F.concat(c.cast("long").cast("string"), F.lit(" bytes")))
        .when(c < mb, F.concat(F.round(c / kb, 2).cast("string"), F.lit(" KB")))
        .when(c < gb, F.concat(F.round(c / mb, 2).cast("string"), F.lit(" MB")))
        .otherwise(F.concat(F.round(c / gb, 2).cast("string"), F.lit(" GB")))
    )
