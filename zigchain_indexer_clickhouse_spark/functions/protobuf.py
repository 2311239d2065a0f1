"""Minimal protobuf field walker as pure column expressions.

The reference decodes tx messages with a cosmjs Registry
(src/utils/decoder.js decodeTxMessages: each message is a protobuf
``Any`` whose field 1 is the typeUrl string). No protobuf runtime
exists in this container — and none is needed for the typeUrl: an
``Any``'s wire form starts with

    0x0A                    field 1, wire type 2 (length-delimited)
    varint length L         1 byte when L < 128, 2 bytes when L < 16384
    L bytes of UTF-8        the typeUrl itself

``any_type_url`` decodes exactly that with builtin string/convert
expressions over the hex form of the bytes — JVM-side, whole-stage
codegen, zero Python row UDFs. Handles the 1- and 2-byte varint cases
(typeUrls are far below 16 KiB); returns NULL when the blob doesn't
start with an Any field-1 tag, matching the reference's unknown-type
fallback path (decoder.js catch branch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encode_any(type_url: Column) -> Column:
    """Build the wire bytes of ``Any{type_url}`` (value field omitted) —
    the test harness's encoder, so decode checks run on REAL protobuf
    bytes. Supports the 1-byte varint case (url < 128 chars; every
    cosmos typeUrl qualifies); built from hex concat + unhex, all
    builtin expressions."""
    url_hex = F.hex(type_url.cast("binary"))
    len_hex = F.lpad(F.hex(F.length(type_url)), 2, "0")
    return F.unhex(F.concat(F.lit("0A"), len_hex, url_hex))


def any_type_url(blob: Column) -> Column:
    """Extract ``Any.type_url`` (field 1) from raw protobuf bytes with a
    varint/tag scan in pure expressions: hex the blob, check the 0x0A
    tag, decode the 1- or 2-byte varint length, slice that many bytes,
    UTF-8 decode. NULL for blobs not starting with field 1."""
    h = F.hex(blob)
    tag_ok = F.substring(h, 1, 2) == "0A"
    b0 = F.conv(F.substring(h, 3, 2), 16, 10).cast("int")
    b1 = F.conv(F.substring(h, 5, 2), 16, 10).cast("int")
    # varint: low 7 bits per byte, little-endian groups; high bit set
    # on b0 means a second byte follows
    one_byte = b0 < 128
    length = F.when(one_byte, b0).otherwise((b0 - 128) + b1 * 128)
    start = F.when(one_byte, F.lit(5)).otherwise(F.lit(7))
    url_hex = F.substring(h, start, length * 2)
    return F.when(tag_ok, F.decode(F.unhex(url_hex), "UTF-8")).otherwise(
        F.lit(None).cast("string")
    )
