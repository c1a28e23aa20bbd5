"""Order-preserving key encoding — string keys whose lexicographic
(memcmp) order equals the value order.

The reference's single source of truth for encoded row keys and
encoded-key index expressions is server/connector/key_encoding.h:30-38
(big-endian with sign-bit flip for ints/dates/timestamps, zero-escaped +
double-zero-terminated strings, per-element NULL markers for nested).
Here the same contract is re-expressed as pure JVM string expressions so
encoded keys can live in the term dictionary, sort under ORDER BY, and
benefit from parquet min/max pruning — which is what makes numeric/date
range claims (ts_le/ts_ge/ts_between) work through the inverted index
for indexed expression keys (cookbook computed-values.test).

Scheme per type (all produce ASCII strings, composable by concat):
- int64: hex(value XOR sign_bit) zero-padded to 16 — unsigned-compare
  order == signed numeric order.
- date: days-since-epoch through the int64 path.
- timestamp: epoch micros through the int64 path.
- string: NUL escaped as NUL+0x01 (the reference's kNullEsc,
  key_encoding.cpp), terminated by NUL+NUL, so in a
  composite key a prefix orders before its extensions and no field can
  bleed into the next.
- double with a fixed decimal scale: scaled to int64 (exact for the
  declared precision). Raw IEEE bit-twiddling (the reference's Dtoi64)
  has no JVM SQL expression; scaled-decimal keys are the documented
  portable subset.

NULL handling: encoders return NULL for NULL input (top-level NULL is the
caller's concern, exactly as AppendScalarValue's contract); `null_last`
wraps an encoded key with the reference's nested-element markers
(\\x01 + payload / \\x02 for NULL, nulls greatest).

FORMAT VERSIONS: the string NUL escape changed \\x00\\xff → \\x00\\x01 in
round 6 (ENCODING_VERSION 1 → 2) to match the reference byte-for-byte.
The change is a PERSISTED-FORMAT BREAK: expression indexes built with
version-1 keys mis-order/mismatch range claims against version-2 keys —
rebuild any index persisted before the bump. DiskSearchTable manifests
record `key_encoding_version`; loading a manifest whose version differs
from ENCODING_VERSION raises instead of silently mixing encodings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIGN_BIT = -9223372036854775808  # 1 << 63 as signed int64

#: persisted-format version (see FORMAT VERSIONS in the module
#: docstring): 1 = \x00\xff NUL escape, 2 = \x00\x01 (reference
#: byte-compatible). DiskSearchTable manifests record this and refuse
#: cross-version loads.
ENCODING_VERSION = 2

_NUL = "\x00"
_ESC = "\x00\x01"  # kNullEsc, byte-compatible with key_encoding.cpp
_TERM = "\x00\x00"


def encode_int(col: Column) -> Column:
    """int64 -> 16-char uppercase hex with the sign bit flipped."""
    flipped = col.cast("long").bitwiseXOR(F.lit(_SIGN_BIT))
    return F.lpad(F.hex(flipped), 16, "0")


def decode_int(key: Column) -> Column:
    """Inverse of encode_int (used by tests and covered-key readback)."""
    unsigned = F.conv(key, 16, 10).cast("decimal(22,0)")
    # 2^63 exceeds int64, so it rides in as a string literal
    return (unsigned
            - F.lit("9223372036854775808").cast("decimal(22,0)")).cast("long")


def encode_date(col: Column) -> Column:
    """date -> int64 key on days since epoch."""
    return encode_int(F.datediff(col, F.lit("1970-01-01")))


def encode_timestamp(col: Column) -> Column:
    """timestamp -> int64 key on epoch microseconds."""
    return encode_int(F.unix_micros(col))


def encode_double(col: Column, scale: int = 6) -> Column:
    """double -> int64 key at a fixed decimal scale (exact within the
    declared precision; documented portable subset of the reference's
    raw-bits Dtoi64)."""
    return encode_int(F.round(col.cast("double") * F.lit(10 ** scale), 0)
                      .cast("long"))


def encode_string(col: Column) -> Column:
    """NUL-escaped, double-NUL-terminated — safe inside composite keys."""
    return F.concat(
        F.replace(col.cast("string"), F.lit(_NUL), F.lit(_ESC)),
        F.lit(_TERM),
    )


def null_last(encoded: Column) -> Column:
    """Per-element NULL marker (key_encoding.h AppendValue: \\x01+payload,
    \\x02 for NULL — nulls greatest, matching PG array comparison)."""
    return F.when(encoded.isNull(), F.lit("\x02")).otherwise(
        F.concat(F.lit("\x01"), encoded)
    )


def composite(*parts: Column) -> Column:
    """Concatenate encoded parts into one composite key. Each part must
    come from an encoder above (fixed width or self-terminating), so the
    concatenation stays order-preserving field by field."""
    return F.concat(*[null_last(p) for p in parts])


def py_encode_int(v: int) -> str:
    """Driver-side twin of encode_int, for building range-claim bounds
    from Python literals (query compile time, zero Spark jobs)."""
    return format((int(v) ^ _SIGN_BIT) & 0xFFFFFFFFFFFFFFFF, "016X")


def duckdb_encode_int(expr: str) -> str:
    """DuckDB fragment computing the identical int64 key (differential
    oracle twin)."""
    return (
        f"lpad(upper(to_hex(xor(CAST({expr} AS BIGINT), "
        f"CAST(-9223372036854775808 AS BIGINT)))), 16, '0')"
    )
