"""Lenient JSON -> typed-row decoder.

Reproduces the reference's per-type deserializers (odata_content.cpp:
122-183 dispatch; SURVEY.md §1.3):
- every type accepts the native JSON value OR a string and casts;
- timestamps accept ISO-8601, the OData v2 legacy ``/Date(ms±HHMM)/``
  format (odata_content.cpp:666-677, truncated to whole seconds), and
  raw epoch seconds (int/real, :680-688);
- arrays recurse per element (:726); objects build structs matching the
  target fields (:778);
- missing fields -> NULL (:1149-1152); deserialization errors -> NULL,
  never a row failure (:1155-1160) — PERMISSIVE-mode semantics;
- booleans are a documented strict SUPERSET of the reference matrix:
  the reference accepts only true/false, "true", "1", "0" (and errors on
  "false" and numerics, odata_content.cpp:195-207); we additionally
  accept "false" and 0/1 numerics, never remapping a reference-accepted
  value.

Payload row extraction handles both v4 (``value`` array) and v2
(``d.results`` / ``d``) shapes (odata_content.cpp:1122-1168), and the
v2 ``__metadata``/``__deferred`` exclusions (odata_read_functions.cpp:
43-54).
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal, InvalidOperation
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_V2_DATE_RE = re.compile(r"/Date\((-?\d+)([+-]\d{4})?\)/")
_META_KEYS = {"__metadata", "__deferred"}


def _to_bool(v: Any):
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        if v.lower() in ("true", "1"):
            return True
        if v.lower() in ("false", "0"):
            return False
    if isinstance(v, (int, float)):
        return bool(v)
    return None


def _to_int(v: Any, bits: int = 64):
    """Lenient int decode; values outside the target type's range become
    NULL (PERMISSIVE), matching the reference's range-checked deserializers
    (odata_content.cpp:210-458 TryCast paths)."""
    try:
        if isinstance(v, bool):
            # reference int deserializers have no bool branch — a JSON
            # bool for an int column is a type error -> NULL (PERMISSIVE)
            return None
        elif isinstance(v, (int, float)):
            out = int(v)
        elif isinstance(v, str) and v.strip():
            out = int(float(v)) if ("." in v or "e" in v.lower()) else int(v)
        else:
            return None
    except (ValueError, OverflowError):
        return None
    bound = 1 << (bits - 1)
    return out if -bound <= out < bound else None


def _to_float(v: Any):
    try:
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return float(v)
        if isinstance(v, str) and v.strip():
            return float(v)
    except ValueError:
        return None
    return None


def _to_decimal(v: Any):
    try:
        if isinstance(v, (int, float, str)) and not isinstance(v, bool):
            return Decimal(str(v))
    except (InvalidOperation, ValueError):
        return None
    return None


def _to_timestamp(v: Any):
    if isinstance(v, str):
        m = _V2_DATE_RE.fullmatch(v.strip())
        if m:
            # v2 legacy format: ms since epoch (+offset ignored, truncated
            # to whole seconds like the reference — C++ integer division
            # truncates toward zero, so pre-epoch values round UP).
            ms = int(m.group(1))
            secs = -((-ms) // 1000) if ms < 0 else ms // 1000
            return _epoch_secs(secs)
        try:
            s = v.strip().replace("Z", "+00:00")
            parsed = dt.datetime.fromisoformat(s)
            if parsed.tzinfo is not None:
                parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
            return parsed
        except ValueError:
            return None
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return _epoch_secs(int(v))
    return None


def _epoch_secs(secs: int):
    try:
        return dt.datetime.fromtimestamp(secs, dt.timezone.utc).replace(tzinfo=None)
    except (OverflowError, OSError, ValueError):
        # outside datetime's representable range -> NULL (PERMISSIVE)
        return None


def _to_date(v: Any):
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        # Numeric JSON for an Edm.Date column is DAYS since epoch
        # (odata_content.cpp:612-620 date_t(days)), not seconds; reals
        # truncate toward zero like static_cast<int64_t>.
        try:
            return dt.date(1970, 1, 1) + dt.timedelta(days=int(v))
        except (OverflowError, ValueError):
            return None
    ts = _to_timestamp(v)
    if ts is not None:
        return ts.date()
    return None


def _to_binary(v: Any):
    import base64

    if isinstance(v, str):
        try:
            return base64.b64decode(v)
        except Exception:
            return v.encode()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return None


def decode_value(v: Any, data_type: DataType):
    """Decode one JSON value to the Python value for ``data_type``."""
    if v is None:
        return None
    if isinstance(data_type, StringType):
        if isinstance(v, (dict, list)):
            import json

            return json.dumps(v)
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if isinstance(data_type, BooleanType):
        return _to_bool(v)
    if isinstance(data_type, (ByteType, ShortType, IntegerType, LongType)):
        bits = {ByteType: 8, ShortType: 16, IntegerType: 32, LongType: 64}
        return _to_int(v, bits[type(data_type)])
    if isinstance(data_type, (FloatType, DoubleType)):
        return _to_float(v)
    if isinstance(data_type, DecimalType):
        return _to_decimal(v)
    if isinstance(data_type, TimestampType):
        return _to_timestamp(v)
    if isinstance(data_type, DateType):
        return _to_date(v)
    if isinstance(data_type, BinaryType):
        return _to_binary(v)
    if isinstance(data_type, ArrayType):
        if isinstance(v, dict) and "results" in v:  # v2 nested collection shape
            v = v["results"]
        if not isinstance(v, list):
            return None
        return [decode_value(x, data_type.elementType) for x in v]
    if isinstance(data_type, StructType):
        if not isinstance(v, dict):
            return None
        return tuple(
            decode_value(v.get(f.name), f.dataType) for f in data_type.fields
        )
    return str(v)


def extract_rows_payload(doc: Any) -> list[dict]:
    """Pull the row array out of a v4 or v2 response document."""
    if isinstance(doc, dict):
        if "value" in doc and isinstance(doc["value"], list):  # v4
            return doc["value"]
        d = doc.get("d")
        if isinstance(d, dict) and isinstance(d.get("results"), list):  # v2
            return d["results"]
        if isinstance(d, list):  # v2 without results wrapper
            return d
        if isinstance(d, dict):  # single entity
            return [d]
        if "value" not in doc and "d" not in doc:
            return [doc]
    if isinstance(doc, list):
        return doc
    return []


def next_link(doc: Any, base_url: str | None = None) -> str | None:
    """v4 @odata.nextLink / v2 __next (root or inside d)
    (odata_content.cpp:1072-1100)."""
    if not isinstance(doc, dict):
        return None
    link = doc.get("@odata.nextLink") or doc.get("odata.nextLink") or doc.get("__next")
    if not link:
        d = doc.get("d")
        if isinstance(d, dict):
            link = d.get("__next")
    return link


def total_count(doc: Any) -> int | None:
    """v4 @odata.count / v2 __count (odata_content.cpp:1175-1196)."""
    if not isinstance(doc, dict):
        return None
    for key in ("@odata.count", "odata.count"):
        if key in doc:
            return _to_int(doc[key])
    d = doc.get("d")
    if isinstance(d, dict) and "__count" in d:
        return _to_int(d["__count"])
    return None


def decode_rows(doc: Any, schema: StructType) -> list[tuple]:
    """Decode a response document into tuples matching ``schema``."""
    out = []
    for obj in extract_rows_payload(doc):
        if not isinstance(obj, dict):
            continue
        clean = {k: v for k, v in obj.items() if k not in _META_KEYS}
        out.append(
            tuple(decode_value(clean.get(f.name), f.dataType) for f in schema.fields)
        )
    return out
