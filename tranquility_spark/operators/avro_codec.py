"""Pure-stdlib Apache Avro binary codec + Object Container File framing.

Implements the subset of the PUBLIC Avro 1.x specification
(https://avro.apache.org/docs/++version++/specification/) that typed event
records need: primitives ``null boolean int long float double bytes
string``, unions, records, arrays, maps (string keys), and the
``timestamp-micros`` / ``timestamp-millis`` logical types; plus the Object
Container File framing (``Obj\\x01`` magic, avro-map file metadata,
16-byte sync-marker-delimited blocks, ``null`` codec).

Why this exists: the reference's binary wire-format event path is Smile
(``core/.../typeclass/ObjectWriter.scala#SmileObjectWriter`` [recall] —
declared absent by design in SURVEY §2), and the modern Kafka-ecosystem
equivalent a real user ships is AVRO. PySpark's production path for that is
the ``spark-avro`` data source (``from_avro`` / ``format("avro")``), which
is an EXTERNAL module not bundled in this environment — so, exactly like
the PNG/BMP/WAV codecs in ``codecs.py``, the decode slot is pluggable:
``impl="spark"`` binds the real data source when the jar is loaded, and
this module is the dependency-free ``impl="native"`` twin that keeps the
Spark-side plumbing (schema, mapInPandas batch shape, corrupt-record
accounting) real and testable in any environment.

Schemas are the standard Avro JSON schema, parsed to dicts. The codec
returns/accepts plain Python values (logical timestamp types stay raw
``int`` epoch units here; the source layer converts to datetimes so the
codec itself has no timezone policy).

Correctness anchoring: the encoder exists for fixture generation and
round-trip tests; the decoder is the product. To break the circularity of
round-trip-only testing, tests pin HAND-COMPUTED byte vectors from the
spec's own encoding table (zigzag longs: 0→00 -1→01 1→02 -2→03 2→04
-64→7f 64→80 01; ``"foo"`` → 06 66 6f 6f; IEEE-754 little-endian doubles)
— an encoder/decoder pair sharing one spec misreading cannot pass those.

Scale: this is the SMALL-DATA path by construction (fixtures, headers,
per-event wire payloads). At 100 TB the decode runs either JVM-side via
spark-avro (``impl="spark"``) or — for the native path — inside
Arrow-batched mapInPandas workers, embarrassingly parallel per file /
per payload, no shuffle anywhere.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


class AvroDecodeError(ValueError):
    """Malformed Avro binary data (buffer underrun, bad union branch,
    invalid length, bad UTF-8, framing violation)."""


# ---------------------------------------------------------------------------
# primitive wire format
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(zz: int) -> int:
    return (zz >> 1) ^ -(zz & 1)


def encode_long(n: int) -> bytes:
    """Avro int/long: zigzag then little-endian base-128 varint."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"long out of 64-bit range: {n}")
    zz = zigzag_encode(n) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    zz = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise AvroDecodeError("varint ran past end of buffer")
        if shift > 63:
            raise AvroDecodeError("varint longer than 64 bits")
        b = buf[pos]
        pos += 1
        zz |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    if zz >= 1 << 64:
        # a 10-byte varint whose final byte sets bits past 2^64 decodes to
        # a Python int OUTSIDE int64 — downstream pd.array(dtype='Int64')
        # would then OverflowError and kill the whole Arrow batch instead
        # of dead-lettering the one corrupt payload (ADVICE r9). Spec-legal
        # longs always zigzag into 64 bits.
        raise AvroDecodeError(f"varint exceeds 64-bit range: {zz}")
    return zigzag_decode(zz), pos


def _take(buf: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if n < 0:
        raise AvroDecodeError(f"negative length {n}")
    if pos + n > len(buf):
        raise AvroDecodeError("length ran past end of buffer")
    return buf[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------


def _type_name(schema: Any) -> Any:
    """The dispatch key of a schema node: bare string, or dict's 'type'
    (logical types dispatch on the UNDERLYING primitive per the spec —
    unknown logical annotations must not break decoding)."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    if isinstance(schema, dict):
        t = schema["type"]
        return "union" if isinstance(t, list) else t
    raise ValueError(f"unsupported schema node: {schema!r}")


def encode_value(value: Any, schema: Any) -> bytes:
    t = _type_name(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        for i, branch in enumerate(branches):
            if _matches(value, branch):
                return encode_long(i) + encode_value(value, branch)
        raise ValueError(f"value {value!r} matches no union branch {branches}")
    if t == "null":
        if value is not None:
            raise ValueError(f"non-null {value!r} for null schema")
        return b""
    if value is None:
        # reaching here means a non-union, non-null schema node got None —
        # a NULL in a non-nullable field. Name it, don't let int(None)
        # produce an opaque TypeError inside a 100 TB encode pass.
        raise ValueError(
            f"NULL value for non-nullable Avro type {t!r} (no null union "
            "branch in the schema)"
        )
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return encode_long(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        b = bytes(value)
        return encode_long(len(b)) + b
    if t == "string":
        b = str(value).encode("utf-8")
        return encode_long(len(b)) + b
    if t == "record":
        out = bytearray()
        for field in schema["fields"]:
            out += encode_value(value[field["name"]], field["type"])
        return bytes(out)
    if t == "array":
        items = list(value)
        out = bytearray()
        if items:
            out += encode_long(len(items))
            for item in items:
                out += encode_value(item, schema["items"])
        out += encode_long(0)
        return bytes(out)
    if t == "map":
        entries = dict(value)
        out = bytearray()
        if entries:
            out += encode_long(len(entries))
            for k, v in entries.items():
                out += encode_value(k, "string")
                out += encode_value(v, schema["values"])
        out += encode_long(0)
        return bytes(out)
    raise ValueError(f"unsupported Avro type: {t!r}")


def _matches(value: Any, branch: Any) -> bool:
    t = _type_name(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def decode_value(buf: bytes, pos: int, schema: Any) -> tuple[Any, int]:
    t = _type_name(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        idx, pos = decode_long(buf, pos)
        if not 0 <= idx < len(branches):
            raise AvroDecodeError(
                f"union branch {idx} out of range (0..{len(branches) - 1})"
            )
        return decode_value(buf, pos, branches[idx])
    if t == "null":
        return None, pos
    if t == "boolean":
        b, pos = _take(buf, pos, 1)
        if b[0] not in (0, 1):
            raise AvroDecodeError(f"boolean byte {b[0]} not 0/1")
        return bool(b[0]), pos
    if t in ("int", "long"):
        v, pos = decode_long(buf, pos)
        if t == "int" and not -(1 << 31) <= v < (1 << 31):
            # same dead-letter rationale as the 64-bit varint guard:
            # an 'int' field must fit 32 bits or the payload is corrupt
            raise AvroDecodeError(f"int out of 32-bit range: {v}")
        return v, pos
    if t == "float":
        b, pos = _take(buf, pos, 4)
        return struct.unpack("<f", b)[0], pos
    if t == "double":
        b, pos = _take(buf, pos, 8)
        return struct.unpack("<d", b)[0], pos
    if t == "bytes":
        n, pos = decode_long(buf, pos)
        return _take(buf, pos, n)
    if t == "string":
        n, pos = decode_long(buf, pos)
        b, pos = _take(buf, pos, n)
        try:
            return b.decode("utf-8"), pos
        except UnicodeDecodeError as ex:
            raise AvroDecodeError(f"invalid UTF-8 in string: {ex}") from ex
    if t == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = decode_value(buf, pos, field["type"])
        return rec, pos
    if t == "array":
        return _decode_blocked(
            buf,
            pos,
            lambda b, p: decode_value(b, p, schema["items"]),
            _min_encoded_width(schema["items"]),
        )
    if t == "map":
        def entry(b: bytes, p: int) -> tuple[tuple[str, Any], int]:
            k, p = decode_value(b, p, "string")
            v, p = decode_value(b, p, schema["values"])
            return (k, v), p

        pairs, pos = _decode_blocked(
            buf, pos, entry, 1 + _min_encoded_width(schema["values"])
        )
        return dict(pairs), pos
    raise AvroDecodeError(f"unsupported Avro type: {t!r}")


def _min_encoded_width(schema: Any) -> int:
    """Minimum bytes ONE value of this schema can encode to — the sound
    per-item bound for block-count sanity checks (a flat 'count > bytes
    left' test falsely rejected spec-legal blocks of zero-width items,
    e.g. arrays of null — ADVICE r9)."""
    t = _type_name(schema)
    if t == "null":
        return 0
    if t in ("boolean", "int", "long", "bytes", "string"):
        return 1  # one byte / one varint byte / one count byte
    if t == "float":
        return 4
    if t == "double":
        return 8
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        return 1 + min(_min_encoded_width(b) for b in branches)
    if t == "record":
        return sum(_min_encoded_width(f["type"]) for f in schema["fields"])
    if t in ("array", "map"):
        return 1  # at least the terminating 0 count
    return 0


#: memory-safety cap for blocks of ZERO-width items (arrays of null): the
#: remaining buffer gives no bound there, and a forged count would otherwise
#: materialize a list of up to 2^63 Nones. Real writers chunk blocks orders
#: of magnitude smaller; past this we call the payload corrupt.
_MAX_ZERO_WIDTH_BLOCK = 1 << 20


def _decode_blocked(
    buf: bytes, pos: int, item_fn, min_item_width: int = 1
) -> tuple[list, int]:
    """Avro array/map block framing: count-prefixed blocks until a 0 count;
    a NEGATIVE count means abs(count) items preceded by the block's byte
    size (the fast-skip affordance — we read through it)."""
    items: list = []
    while True:
        count, pos = decode_long(buf, pos)
        if count == 0:
            return items, pos
        if count < 0:
            count = -count
            _size, pos = decode_long(buf, pos)
        if min_item_width > 0:
            if count * min_item_width > len(buf) - pos:
                # items need >= count * min_width bytes — a count beyond
                # that can only loop to an underrun; fail fast with intent
                raise AvroDecodeError(f"block count {count} exceeds buffer")
        elif count > _MAX_ZERO_WIDTH_BLOCK:
            raise AvroDecodeError(
                f"zero-width block count {count} exceeds sanity cap"
            )
        for _ in range(count):
            item, pos = item_fn(buf, pos)
            items.append(item)


def decode_record(
    payload: bytes, schema: dict, reader_schema: dict | None = None
) -> dict:
    """Decode ONE record from a standalone wire payload (the Kafka
    value-bytes shape ``from_avro`` consumes). Trailing bytes are a
    decode error — a truncated/overlong payload must not pass silently.

    ``reader_schema`` engages Avro SCHEMA RESOLUTION (spec §'Schema
    Resolution' — the contract that makes rolling schema evolution work):
    the payload decodes against the WRITER schema, then maps to the
    reader's shape via :func:`resolve_record`."""
    value, pos = decode_value(bytes(payload), 0, schema)
    if pos != len(payload):
        raise AvroDecodeError(
            f"{len(payload) - pos} trailing bytes after record"
        )
    if reader_schema is not None:
        return resolve_record(value, schema, reader_schema)
    return value


# ---------------------------------------------------------------------------
# schema resolution (reader vs writer — the evolution contract)
# ---------------------------------------------------------------------------

#: writer type -> reader types it may promote to (Avro spec resolution table)
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def resolve_record(value: dict, writer: dict, reader: dict) -> dict:
    """Map a decoded writer-schema record onto the reader schema:

    - fields matched by NAME (order may differ between schemas)
    - writer-only fields are dropped
    - reader-only fields take the reader's ``default`` (its absence is a
      resolution error, exactly as the spec demands)
    - primitive promotions per the spec table (int→long→float→double,
      string↔bytes); anything else incompatible raises

    Pure value-level mapping — the wire bytes were already decoded with
    the writer schema, which is the only schema that can parse them."""
    writer_fields = {f["name"]: f for f in writer["fields"]}
    out = {}
    for rf in reader["fields"]:
        name = rf["name"]
        if name in writer_fields:
            out[name] = _resolve_value(
                value.get(name), writer_fields[name]["type"], rf["type"]
            )
        elif "default" in rf:
            out[name] = rf["default"]
        else:
            raise AvroDecodeError(
                f"reader field {name!r} absent from writer schema and has "
                "no default — schemas are incompatible"
            )
    return out


def _resolve_value(value, wtype, rtype):
    wt, rt = _type_name(wtype), _type_name(rtype)
    if wt == "union":
        # the branch was already chosen at decode time; resolve the VALUE
        # against the reader type (match by value shape — the decoded
        # python value carries enough type to re-dispatch)
        wbranches = wtype if isinstance(wtype, list) else wtype["type"]
        for b in wbranches:
            if _matches(value, b):
                return _resolve_value(value, b, rtype)
        if value is None:
            return _resolve_value(None, "null", rtype)
        raise AvroDecodeError(f"union value {value!r} matches no writer branch")
    if rt == "union":
        rbranches = rtype if isinstance(rtype, list) else rtype["type"]
        for b in rbranches:
            try:
                return _resolve_value(value, wtype, b)
            except AvroDecodeError:
                continue
        raise AvroDecodeError(
            f"writer type {wt!r} resolves to no branch of reader union"
        )
    if wt == "null":
        if rt != "null":
            raise AvroDecodeError("writer null cannot resolve to non-null")
        return None
    if wt == "record" and rt == "record":
        return resolve_record(value, wtype, rtype)
    if wt == "array" and rt == "array":
        return [
            _resolve_value(v, wtype["items"], rtype["items"]) for v in value
        ]
    if wt == "map" and rt == "map":
        return {
            k: _resolve_value(v, wtype["values"], rtype["values"])
            for k, v in value.items()
        }
    if wt == "boolean" and rt == "boolean":
        return value
    allowed = _PROMOTIONS.get(wt)
    if allowed is None or rt not in allowed:
        raise AvroDecodeError(
            f"writer type {wt!r} does not resolve to reader type {rt!r}"
        )
    if rt in ("float", "double"):
        return float(value)
    if rt == "string" and wt == "bytes":
        return bytes(value).decode("utf-8")
    if rt == "bytes" and wt == "string":
        return str(value).encode("utf-8")
    return value


# ---------------------------------------------------------------------------
# Object Container File framing
# ---------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def _sync_marker(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker (the spec says 'randomly
    generated'; determinism keeps committed fixtures byte-reproducible and
    is spec-legal — readers only ever compare it for equality)."""
    import hashlib

    return hashlib.md5(
        b"tranquility-spark-ocf\x00" + schema_json.encode("utf-8")
    ).digest()


def write_ocf(
    fh: io.BufferedIOBase,
    records: list,
    schema: dict,
    block_records: int = 1000,
) -> None:
    """Write an Object Container File with the ``null`` codec: magic,
    avro-map metadata (avro.schema, avro.codec), sync marker, then
    sync-delimited blocks of ``block_records`` records each."""
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = _sync_marker(schema_json)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": b"null",
    }
    fh.write(MAGIC)
    fh.write(encode_value(meta, _META_SCHEMA))
    fh.write(sync)
    for start in range(0, len(records), block_records):
        block = records[start : start + block_records]
        body = b"".join(encode_value(r, schema) for r in block)
        fh.write(encode_long(len(block)))
        fh.write(encode_long(len(body)))
        fh.write(body)
        fh.write(sync)


def read_ocf(data: bytes) -> tuple[dict, Iterator[dict]]:
    """Parse an Object Container File: returns ``(schema, record_iter)``.
    Only the ``null`` codec is supported (fixtures and tests; a real
    deflate/snappy file belongs on the ``impl="spark"`` path) — anything
    else raises with intent rather than mis-decoding."""
    if data[: len(MAGIC)] != MAGIC:
        raise AvroDecodeError("not an Avro Object Container File (bad magic)")
    meta, pos = decode_value(data, len(MAGIC), _META_SCHEMA)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise AvroDecodeError(
            f"unsupported OCF codec {codec!r} — use impl='spark' (spark-avro) "
            "for compressed containers"
        )
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except (KeyError, ValueError) as ex:
        raise AvroDecodeError(f"bad avro.schema metadata: {ex}") from ex
    sync, pos = _take(data, pos, SYNC_SIZE)

    def records() -> Iterator[dict]:
        p = pos
        while p < len(data):
            count, p = decode_long(data, p)
            size, p = decode_long(data, p)
            body, p = _take(data, p, size)
            got_sync, p = _take(data, p, SYNC_SIZE)
            if got_sync != sync:
                raise AvroDecodeError("sync marker mismatch (corrupt block)")
            bp = 0
            for _ in range(count):
                rec, bp = decode_value(body, bp, schema)
                yield rec
            if bp != size:
                raise AvroDecodeError(
                    f"block declared {size} bytes but records used {bp}"
                )

    return schema, records()
