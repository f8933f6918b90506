"""Byte-exact replication of the reference's dedup digest.

Reference recipe (sms-db.pl:318-339, esp. :325):
    sha256_hex(encode_utf8(join('', @record,
                map {($_->{data}, $_->{content_type})} @parts)))
where @record is the 8 @message_fields values in order (sms-db.pl:39).

Byte-parity notes (SURVEY.md §7 hard parts):
  - join separator is EMPTY;
  - undef fields are warned but hashed as '' (Perl join semantics) →
    coalesce(col, '');
  - numbers stringify as plain decimal (Perl scalar stringification ≡
    Spark CAST(long AS STRING));
  - binary part data: Perl holds decode_base64 output as a latin-1-ish
    byte string; encode_utf8 then expands bytes >0x7F into 2-byte UTF-8
    sequences. Replicated with encode(decode(bin, 'ISO-8859-1'), 'UTF-8').
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import MESSAGE_HASH_FIELDS


def _s(name: str) -> Column:
    return F.coalesce(F.col(name).cast("string"), F.lit(""))


def message_meta_bytes() -> Column:
    """UTF-8 bytes of the 8 metadata fields joined with '' in @message_fields order."""
    return F.encode(F.concat(*[_s(f) for f in MESSAGE_HASH_FIELDS]), "UTF-8")


def part_bytes(data_bin: Column, text: Column, content_type: Column) -> Column:
    """Bytes one part contributes: data then content_type (sms-db.pl:325).

    Text-lane parts contribute UTF-8 bytes of the text; binary-lane parts
    contribute the Perl encode_utf8-of-latin1 expansion of the raw bytes.
    """
    data_part = F.when(
        text.isNotNull(), F.encode(text, "UTF-8")
    ).otherwise(
        F.when(
            data_bin.isNotNull(),
            F.encode(F.decode(data_bin, "ISO-8859-1"), "UTF-8"),
        ).otherwise(F.encode(F.lit(""), "UTF-8"))
    )
    return F.concat(
        data_part, F.encode(F.coalesce(content_type, F.lit("")), "UTF-8")
    )


def message_hash(parts_concat: Column) -> Column:
    """64-char lowercase hex SHA-256 over metadata bytes ++ parts bytes.

    `parts_concat` is the ordered concatenation of part_bytes() for the
    message's parts (empty binary for a partless message).
    """
    return F.lower(
        F.sha2(F.concat(message_meta_bytes(), parts_concat), 256)
    )


def python_reference_hash(meta: list, parts: list[tuple]) -> str:
    """Driver-side oracle of the same recipe (for tests): meta is the 8
    field values (None → ''), parts is [(data_bytes_or_text, content_type)].
    Mirrors Perl: strings utf-8 encoded; raw bytes latin1-expanded."""
    buf = b""
    for v in meta:
        buf += ("" if v is None else str(v)).encode("utf-8")
    for data, ct in parts:
        if data is None:
            buf += b""
        elif isinstance(data, bytes):
            buf += data.decode("latin-1").encode("utf-8")
        else:
            buf += str(data).encode("utf-8")
        buf += ("" if ct is None else str(ct)).encode("utf-8")
    return hashlib.sha256(buf).hexdigest()
