"""Pure-stdlib Smile binary JSON codec (P2 — the reference's wire format).

Implements the subset of the PUBLIC Smile format specification
(https://github.com/FasterXML/smile-format-specification) that typed event
records need — closing SURVEY §2's one remaining ❌ LITERALLY rather than
by Avro analog: tranquility's server accepted Smile-encoded event bodies
(``core/.../typeclass/ObjectWriter.scala#SmileObjectWriter`` [recall],
Jackson's binary JSON), and this module decodes/encodes that wire format
with zero dependencies.

Supported (the event-record subset):

- header ``:)\\n`` + flags byte (version 0; shared-property-names and
  shared-string-values flags both honored on decode)
- objects / arrays / field names (short ASCII, short unicode, long
  unicode, shared-name back references incl. the 2-byte long form, with
  the spec's reset-at-1024 table behavior)
- values: null / true / false / empty string, small ints (single byte,
  zigzag -16..15), 32/64-bit zigzag vints, 32/64-bit IEEE floats in the
  spec's 7-bits-per-byte big-endian packing, tiny/short ASCII and unicode
  strings, long (``0xFC``-terminated) strings, shared-value back
  references (short and 2-byte long forms)
- binary values, BOTH spec forms (r11, VERDICT r10 #6 — byte[] fields in
  multimodal payloads over the wire): ``0xE8`` 7-bit-safe (unsigned-vint
  RAW length, then 7-bits-per-byte groups where a trailing group of N<7
  payload bytes packs into N+1 bytes with the final byte carrying the
  last N bits right-aligned — Jackson's exact tail layout) and ``0xFD``
  raw (unsigned-vint length + verbatim bytes; written only when the
  header's raw-binary flag is on, decoded leniently either way)
- back-to-back root-level values in one stream (how Jackson writes event
  sequences) via :func:`decode_stream`

- BigInteger (``0x26``) and BigDecimal (``0x2A``) — r12, VERDICT r11 #5:
  Jackson emits these for Java BigInteger/BigDecimal fields, which
  financial-ish payloads can carry. Layouts per the public spec and
  Jackson's generator: 0x26 = unsigned-vint RAW length + the 7-bit-safe
  binary packing of ``BigInteger.toByteArray()`` (big-endian two's
  complement, minimal length); 0x2A = SIGNED (zigzag) vint scale, then
  the unscaled value in the 0x26 layout; value = unscaled · 10^(-scale).
  Decode maps to Python ``int`` / ``decimal.Decimal``; encode emits 0x26
  for ints outside int64 and 0x2A for ``decimal.Decimal`` inputs.

The same anti-circularity discipline as ``avro_codec``: the encoder
exists for fixtures/round-trips; tests pin HAND-COMPUTED byte vectors
from the spec's token tables (e.g. small int 0 → ``0xC0``, ``true`` →
``0x23``, tiny-ASCII "foo" → ``0x42 66 6f 6f``, START/END_OBJECT ``0xFA``
/ ``0xFB``) so a shared spec misreading cannot survive.
"""

from __future__ import annotations

import decimal
import struct
from typing import Any, Iterator

HEADER = b"\x3a\x29\x0a"  # ":)\n"

FLAG_SHARED_NAMES = 0x01
FLAG_SHARED_VALUES = 0x02
FLAG_RAW_BINARY = 0x04

_MAX_SHARED = 1024  # spec: table RESETS when the 1025th entry would enter


class SmileDecodeError(ValueError):
    """Malformed or unsupported Smile data."""


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def zigzag32(n: int) -> int:
    return ((n << 1) ^ (n >> 31)) & 0xFFFFFFFF


def zigzag64(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF


def unzigzag(zz: int) -> int:
    return (zz >> 1) ^ -(zz & 1)


def encode_vint(zz: int) -> bytes:
    """Smile vint: 7 bits per byte MSB-first, except the LAST byte which
    has bit 7 set and carries only the low 6 bits."""
    out = [0x80 | (zz & 0x3F)]
    zz >>= 6
    while zz:
        out.append(zz & 0x7F)
        zz >>= 7
    return bytes(reversed(out))


def decode_vint(buf: bytes, pos: int) -> tuple[int, int]:
    zz = 0
    while True:
        if pos >= len(buf):
            raise SmileDecodeError("vint ran past end of buffer")
        b = buf[pos]
        pos += 1
        if b & 0x80:
            v = (zz << 6) | (b & 0x3F)
            if v >= 1 << 64:
                # spec-legal longs zigzag into 64 bits; anything past that
                # would escape int64 and OverflowError in the Arrow batch
                # instead of dead-lettering the payload (ADVICE r9)
                raise SmileDecodeError(f"vint exceeds 64-bit range: {v}")
            return v, pos
        zz = (zz << 7) | b
        if zz > 1 << 70:
            raise SmileDecodeError("vint longer than 64 bits")


def _encode_7bit(raw: bytes) -> bytes:
    """The spec's 7-bits-per-byte big-endian packing for fixed-width
    floats: N raw bytes -> ceil(8N/7) bytes, most significant bits first
    (the first byte carries the 8N mod 7 leading bits)."""
    n = int.from_bytes(raw, "big")
    nbits = len(raw) * 8
    nbytes = (nbits + 6) // 7
    out = bytearray()
    for i in range(nbytes - 1, -1, -1):
        out.append((n >> (7 * i)) & 0x7F)
    return bytes(out)


def _decode_7bit(buf: bytes, pos: int, raw_len: int) -> tuple[bytes, int]:
    nbytes = (raw_len * 8 + 6) // 7
    if pos + nbytes > len(buf):
        raise SmileDecodeError("7-bit float ran past end of buffer")
    n = 0
    for i in range(nbytes):
        b = buf[pos + i]
        if b & 0x80:
            raise SmileDecodeError("7-bit packing byte with high bit set")
        n = (n << 7) | b
    return n.to_bytes(raw_len, "big"), pos + nbytes


def _to_byte_array(n: int) -> bytes:
    """Java ``BigInteger.toByteArray()``: minimal big-endian two's
    complement with a sign bit — the representation both big-number
    tokens carry on the wire. Check values: 255 -> 00 FF, 127 -> 7F,
    -128 -> 80, -1 -> FF, 0 -> 00. Negative lengths come from (n+1)'s
    bit length (int.bit_length is magnitude-based, which over-counts
    exact powers of two like -128 by one byte)."""
    bits = n.bit_length() if n >= 0 else (n + 1).bit_length()
    length = max(1, (bits + 8) // 8)
    return n.to_bytes(length, "big", signed=True)


def _encode_7bit_binary(raw: bytes) -> bytes:
    """The spec's 7-bit-safe BINARY packing (0xE8) — distinct from the
    fixed-width float packing above: full groups of 7 payload bytes become
    8 output bytes of 7 bits each, MSB-first; a trailing group of N < 7
    payload bytes becomes N+1 output bytes whose FIRST N carry 7 bits each
    and whose LAST carries the remaining N bits right-aligned (Jackson's
    tail layout, verified against its generator arithmetic)."""
    out = bytearray()
    full, tail = divmod(len(raw), 7)
    for g in range(full):
        v = int.from_bytes(raw[g * 7 : g * 7 + 7], "big")
        for shift in range(49, -1, -7):
            out.append((v >> shift) & 0x7F)
    if tail:
        v = int.from_bytes(raw[full * 7 :], "big")
        bits = tail * 8
        for i in range(tail):
            out.append((v >> (bits - 7 * (i + 1))) & 0x7F)
        out.append(v & ((1 << tail) - 1))
    return bytes(out)


def _decode_7bit_binary(buf: bytes, pos: int, raw_len: int) -> tuple[bytes, int]:
    full, tail = divmod(raw_len, 7)
    nbytes = full * 8 + (tail + 1 if tail else 0)
    if pos + nbytes > len(buf):
        raise SmileDecodeError("7-bit binary ran past end of buffer")
    out = bytearray()
    p = pos
    for _ in range(full):
        v = 0
        for _ in range(8):
            b = buf[p]
            p += 1
            if b & 0x80:
                raise SmileDecodeError("7-bit binary byte with high bit set")
            v = (v << 7) | b
        out += v.to_bytes(7, "big")
    if tail:
        v = 0
        for _ in range(tail):
            b = buf[p]
            p += 1
            if b & 0x80:
                raise SmileDecodeError("7-bit binary byte with high bit set")
            v = (v << 7) | b
        last = buf[p]
        p += 1
        if last & ~((1 << tail) - 1):
            raise SmileDecodeError(
                "7-bit binary trailing byte has bits above the payload"
            )
        v = (v << tail) | last
        out += v.to_bytes(tail, "big")
    return bytes(out), p


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class SmileEncoder:
    """Streaming writer: ``write(value)`` per root-level value, Jackson's
    back-to-back event-sequence shape (one header, shared tables persist
    across records — exactly why the tables exist)."""

    def __init__(
        self,
        shared_names: bool = True,
        shared_values: bool = False,
        raw_binary: bool = False,
    ):
        self.shared_names = shared_names
        self.shared_values = shared_values
        self.raw_binary = raw_binary
        self._names: dict[str, int] = {}
        self._values: dict[str, int] = {}
        flags = (
            (FLAG_SHARED_NAMES if shared_names else 0)
            | (FLAG_SHARED_VALUES if shared_values else 0)
            | (FLAG_RAW_BINARY if raw_binary else 0)
        )
        self.buf = bytearray(HEADER + bytes([flags]))

    def write(self, value: Any) -> None:
        self._value(value)

    def getvalue(self) -> bytes:
        return bytes(self.buf)

    def _value(self, v: Any) -> None:
        b = self.buf
        if v is None:
            b.append(0x21)
        elif v is True:
            b.append(0x23)
        elif v is False:
            b.append(0x22)
        elif isinstance(v, int):
            if -16 <= v <= 15:
                b.append(0xC0 + zigzag32(v))
            elif -(1 << 31) <= v < 1 << 31:
                b.append(0x24)
                b += encode_vint(zigzag32(v))
            elif -(1 << 63) <= v < 1 << 63:
                b.append(0x25)
                b += encode_vint(zigzag64(v))
            else:
                # BigInteger (r12): unsigned-vint RAW length + 7-bit-safe
                # packing of toByteArray() — Jackson's exact layout
                raw = _to_byte_array(v)
                b.append(0x26)
                b += encode_vint(len(raw))
                b += _encode_7bit_binary(raw)
        elif isinstance(v, decimal.Decimal):
            # BigDecimal (r12): SIGNED (zigzag) vint scale + unscaled
            # BigInteger payload; value = unscaled * 10^-scale. NaN/Inf
            # have no BigDecimal form — reject like Jackson would.
            if not v.is_finite():
                raise ValueError(f"non-finite Decimal has no Smile form: {v}")
            sign, digits, exp = v.as_tuple()
            unscaled = int("".join(map(str, digits))) * (-1 if sign else 1)
            scale = -exp
            if not -(1 << 31) <= scale < 1 << 31:
                # Java BigDecimal scale is an int32; zigzag32 would silently
                # mask a wider scale into a WRONG in-range value that the
                # decoder's guard can never catch — reject like non-finite
                raise ValueError(
                    f"Decimal scale out of BigDecimal's int32 range: {scale}"
                )
            raw = _to_byte_array(unscaled)
            b.append(0x2A)
            b += encode_vint(zigzag32(scale))
            b += encode_vint(len(raw))
            b += _encode_7bit_binary(raw)
        elif isinstance(v, float):
            b.append(0x29)
            b += _encode_7bit(struct.pack(">d", v))
        elif isinstance(v, (bytes, bytearray)):
            # both spec binary forms carry the RAW length as an unsigned
            # (non-zigzag) vint; only the payload layout differs
            if self.raw_binary:
                b.append(0xFD)
                b += encode_vint(len(v))
                b += bytes(v)
            else:
                b.append(0xE8)
                b += encode_vint(len(v))
                b += _encode_7bit_binary(bytes(v))
        elif isinstance(v, str):
            self._string_value(v)
        elif isinstance(v, (list, tuple)):
            b.append(0xF8)
            for item in v:
                self._value(item)
            b.append(0xF9)
        elif isinstance(v, dict):
            b.append(0xFA)
            for k, item in v.items():
                self._name(str(k))
                self._value(item)
            b.append(0xFB)
        else:
            raise ValueError(f"unsupported Smile value type: {type(v)}")

    def _string_value(self, s: str) -> None:
        b = self.buf
        if s == "":
            b.append(0x20)
            return
        raw = s.encode("utf-8")
        is_ascii = len(raw) == len(s)
        if self.shared_values and len(raw) <= 64:
            idx = self._values.get(s)
            if idx is not None:
                if idx < 31:
                    b.append(0x01 + idx)
                else:
                    b.append(0xEC + (idx >> 8))
                    b.append(idx & 0xFF)
                return
            if len(self._values) >= _MAX_SHARED:
                self._values.clear()
            self._values[s] = len(self._values)
        if is_ascii and len(raw) <= 32:
            b.append(0x40 + len(raw) - 1)
        elif is_ascii and len(raw) <= 64:
            b.append(0x60 + len(raw) - 33)
        elif not is_ascii and 2 <= len(raw) <= 33:
            b.append(0x80 + len(raw) - 2)
        elif not is_ascii and len(raw) <= 64:
            b.append(0xA0 + len(raw) - 34)
        else:
            b.append(0xE0 if is_ascii else 0xE4)
            b += raw
            b.append(0xFC)
            return
        b += raw

    def _name(self, name: str) -> None:
        b = self.buf
        if name == "":
            b.append(0x20)
            return
        raw = name.encode("utf-8")
        if self.shared_names and len(raw) <= 64:
            idx = self._names.get(name)
            if idx is not None:
                if idx < 64:
                    b.append(0x40 + idx)
                else:
                    b.append(0x30 + (idx >> 8))
                    b.append(idx & 0xFF)
                return
            if len(self._names) >= _MAX_SHARED:
                self._names.clear()
            self._names[name] = len(self._names)
        is_ascii = len(raw) == len(name)
        if is_ascii and len(raw) <= 64:
            b.append(0x80 + len(raw) - 1)
            b += raw
        elif not is_ascii and 2 <= len(raw) <= 57:
            b.append(0xC0 + len(raw) - 2)
            b += raw
        else:
            b.append(0x34)
            b += raw
            b.append(0xFC)


def encode_stream(values: list, **kw) -> bytes:
    enc = SmileEncoder(**kw)
    for v in values:
        enc.write(v)
    return enc.getvalue()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class SmileDecoder:
    def __init__(self, data: bytes):
        self.data = bytes(data)
        if self.data[:3] != HEADER:
            raise SmileDecodeError("not Smile data (bad :)\\n header)")
        if len(self.data) < 4:
            raise SmileDecodeError("truncated Smile header")
        flags = self.data[3]
        if flags >> 4:
            raise SmileDecodeError(f"unsupported Smile version {flags >> 4}")
        self.shared_names = bool(flags & FLAG_SHARED_NAMES)
        self.shared_values = bool(flags & FLAG_SHARED_VALUES)
        self.raw_binary = bool(flags & FLAG_RAW_BINARY)
        self.pos = 4
        self._names: list[str] = []
        self._values: list[str] = []

    def at_end(self) -> bool:
        # 0xFF is the optional end-of-content marker
        return self.pos >= len(self.data) or self.data[self.pos] == 0xFF

    def decode_value(self) -> Any:
        b = self._byte()
        if b == 0x21:
            return None
        if b == 0x22:
            return False
        if b == 0x23:
            return True
        if b == 0x20:
            return ""
        if 0x01 <= b <= 0x1F:  # short shared value ref
            return self._shared_value(b - 1)
        if 0xEC <= b <= 0xEF:  # long shared value ref (10-bit index)
            return self._shared_value(((b & 0x03) << 8) | self._byte())
        if 0xC0 <= b <= 0xDF:  # small int, zigzag in the token byte
            return unzigzag(b - 0xC0)
        if b == 0x24:
            zz, self.pos = decode_vint(self.data, self.pos)
            return unzigzag(zz)
        if b == 0x25:
            zz, self.pos = decode_vint(self.data, self.pos)
            return unzigzag(zz)
        if b == 0x26:  # BigInteger: unsigned-vint RAW length + 7-bit payload
            raw, self.pos = self._big_raw()
            return int.from_bytes(raw, "big", signed=True)
        if b == 0x2A:  # BigDecimal: zigzag-vint scale + unscaled BigInteger
            zz, self.pos = decode_vint(self.data, self.pos)
            scale = unzigzag(zz)
            if not -(1 << 31) <= scale < 1 << 31:
                raise SmileDecodeError(f"BigDecimal scale out of int32: {scale}")
            raw, self.pos = self._big_raw()
            unscaled = int.from_bytes(raw, "big", signed=True)
            # context-free construction (no context rounding/overflow):
            # value = unscaled * 10^-scale exactly
            sign = 1 if unscaled < 0 else 0
            digits = tuple(int(d) for d in str(abs(unscaled)))
            return decimal.Decimal((sign, digits, -scale))
        if b == 0x28:
            raw, self.pos = _decode_7bit(self.data, self.pos, 4)
            return struct.unpack(">f", raw)[0]
        if b == 0x29:
            raw, self.pos = _decode_7bit(self.data, self.pos, 8)
            return struct.unpack(">d", raw)[0]
        if 0x40 <= b <= 0x5F:  # tiny ASCII 1..32
            return self._string(b - 0x40 + 1)
        if 0x60 <= b <= 0x7F:  # small ASCII 33..64
            return self._string(b - 0x60 + 33)
        if 0x80 <= b <= 0x9F:  # tiny unicode 2..33
            return self._string(b - 0x80 + 2)
        if 0xA0 <= b <= 0xBF:  # short unicode 34..65
            return self._string(b - 0xA0 + 34)
        if b in (0xE0, 0xE4):  # long string, 0xFC-terminated
            return self._long_string()
        if b == 0xE8:  # 7-bit-safe binary: unsigned-vint RAW length
            raw_len, self.pos = decode_vint(self.data, self.pos)
            if raw_len > len(self.data):  # forged length — fail before alloc
                raise SmileDecodeError(
                    f"7-bit binary length {raw_len} exceeds buffer"
                )
            raw, self.pos = _decode_7bit_binary(self.data, self.pos, raw_len)
            return raw
        if b == 0xFD:  # raw binary: unsigned-vint length + verbatim bytes
            # lenient decode: accepted even without the header flag (the
            # flag is advisory — it tells SCANNERS raw bytes may appear)
            raw_len, self.pos = decode_vint(self.data, self.pos)
            if self.pos + raw_len > len(self.data):
                raise SmileDecodeError("raw binary ran past end of buffer")
            raw = self.data[self.pos : self.pos + raw_len]
            self.pos += raw_len
            return raw
        if b == 0xF8:
            out = []
            while True:
                if self._peek() == 0xF9:
                    self.pos += 1
                    return out
                out.append(self.decode_value())
        if b == 0xFA:
            return self._object()
        raise SmileDecodeError(f"unsupported Smile value token 0x{b:02x}")

    # -- internals ----------------------------------------------------------

    def _big_raw(self) -> tuple[bytes, int]:
        """Shared magnitude reader for both big-number tokens: unsigned-vint
        RAW length + 7-bit-safe payload, with the 0xE8 forged-length guard
        (fail before allocating)."""
        raw_len, pos = decode_vint(self.data, self.pos)
        if raw_len > len(self.data):
            raise SmileDecodeError(
                f"big-number length {raw_len} exceeds buffer"
            )
        self.pos = pos
        return _decode_7bit_binary(self.data, self.pos, raw_len)

    def _byte(self) -> int:
        if self.pos >= len(self.data):
            raise SmileDecodeError("ran past end of buffer")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _peek(self) -> int:
        if self.pos >= len(self.data):
            raise SmileDecodeError("ran past end of buffer")
        return self.data[self.pos]

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise SmileDecodeError("string ran past end of buffer")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def _shared_value(self, idx: int) -> str:
        if not self.shared_values:
            raise SmileDecodeError(
                "shared-value reference in a stream whose header disables them"
            )
        if idx >= len(self._values):
            raise SmileDecodeError(f"shared value index {idx} out of range")
        return self._values[idx]

    def _remember_value(self, s: str, nbytes: int) -> str:
        if self.shared_values and nbytes <= 64:
            if len(self._values) >= _MAX_SHARED:
                self._values.clear()
            self._values.append(s)
        return s

    def _string(self, nbytes: int) -> str:
        try:
            s = self._take(nbytes).decode("utf-8")
        except UnicodeDecodeError as ex:
            raise SmileDecodeError(f"invalid UTF-8 in string: {ex}") from ex
        return self._remember_value(s, nbytes)

    def _long_string(self) -> str:
        end = self.data.find(0xFC, self.pos)
        if end < 0:
            raise SmileDecodeError("unterminated long string (no 0xFC)")
        raw = self.data[self.pos : end]
        self.pos = end + 1
        try:
            return raw.decode("utf-8")  # long strings are never shared
        except UnicodeDecodeError as ex:
            raise SmileDecodeError(f"invalid UTF-8 in string: {ex}") from ex

    def _object(self) -> dict:
        out: dict[str, Any] = {}
        while True:
            b = self._byte()
            if b == 0xFB:
                return out
            name = self._name(b)
            out[name] = self.decode_value()

    def _name(self, b: int) -> str:
        if b == 0x20:
            return ""
        if 0x40 <= b <= 0x7F:  # short shared name ref
            return self._shared_name(b - 0x40)
        if 0x30 <= b <= 0x33:  # long shared name ref (10-bit index)
            return self._shared_name(((b & 0x03) << 8) | self._byte())
        if 0x80 <= b <= 0xBF:  # short ASCII name 1..64
            return self._new_name(b - 0x80 + 1)
        if 0xC0 <= b <= 0xF7:  # short unicode name 2..57
            return self._new_name(b - 0xC0 + 2)
        if b == 0x34:  # long unicode name, 0xFC-terminated
            end = self.data.find(0xFC, self.pos)
            if end < 0:
                raise SmileDecodeError("unterminated long field name")
            raw = self.data[self.pos : end]
            self.pos = end + 1
            try:
                name = raw.decode("utf-8")
            except UnicodeDecodeError as ex:
                raise SmileDecodeError(f"invalid UTF-8 in name: {ex}") from ex
            # the spec shares every name <= 64 UTF-8 bytes REGARDLESS of
            # token: a 58..64-byte non-ASCII name rides the long token
            # (short unicode caps at 57) but the encoder — ours and
            # Jackson's — still registers it. Skipping registration here
            # desynced the tables, so later back-references resolved to the
            # WRONG name (ADVICE r9). Same reset-at-1024 logic as _new_name.
            if self.shared_names and len(raw) <= 64:
                if len(self._names) >= _MAX_SHARED:
                    self._names.clear()
                self._names.append(name)
            return name
        raise SmileDecodeError(f"unsupported Smile name token 0x{b:02x}")

    def _shared_name(self, idx: int) -> str:
        if not self.shared_names:
            raise SmileDecodeError(
                "shared-name reference in a stream whose header disables them"
            )
        if idx >= len(self._names):
            raise SmileDecodeError(f"shared name index {idx} out of range")
        return self._names[idx]

    def _new_name(self, nbytes: int) -> str:
        try:
            name = self._take(nbytes).decode("utf-8")
        except UnicodeDecodeError as ex:
            raise SmileDecodeError(f"invalid UTF-8 in name: {ex}") from ex
        if self.shared_names and nbytes <= 64:
            if len(self._names) >= _MAX_SHARED:
                self._names.clear()
            self._names.append(name)
        return name


def decode_stream(data: bytes) -> Iterator[Any]:
    """Iterate root-level values of one Smile stream (the Jackson
    event-sequence shape: single header, values back-to-back, shared
    tables carried across records)."""
    dec = SmileDecoder(data)
    while not dec.at_end():
        yield dec.decode_value()


def decode_record(payload: bytes) -> Any:
    """Decode ONE value from a standalone wire payload (own header —
    tranquility's HTTP/Kafka body shape). Trailing bytes (other than the
    optional 0xFF end marker) are an error."""
    dec = SmileDecoder(payload)
    value = dec.decode_value()
    if not dec.at_end():
        raise SmileDecodeError(
            f"{len(dec.data) - dec.pos} trailing bytes after value"
        )
    return value
