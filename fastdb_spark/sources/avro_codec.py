"""Minimal pure-Python Avro binary codec (Apache Avro 1.12 spec — public).

The reference's whole ingest surface is avro alert payloads on Kafka
(reference ``src/kafka_consumer.py:261-409``, schemas ``share/avsc/``).
The test image carries neither the spark-avro datasource jar nor a Python
avro package, so this module implements the binary encoding directly from
the public specification for the type subset those alert schemas use:
null, boolean, int, long, float, double, bytes, string, record, enum,
fixed, array, map, union.

Scope: payloads are decoded with the writer schema (schema resolution /
promotion is out of scope), no object-container files (Kafka messages are
raw datum bytes).  ``sources.kafka`` uses this as the decode/encode path
when ``pyspark.sql.avro.functions`` cannot reach a jar, via Arrow-batched
``mapInPandas`` — the slow-but-correct fallback; production clusters ship
the spark-avro jar and stay JVM-side.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


class SchemaParseError(ValueError):
    pass


def parse(schema: str | dict | list) -> "ParsedSchema":
    """Parse an avro schema (JSON text or already-loaded structure) into a
    resolved tree; named-type references (e.g. ``lsst.v10_0.diaSource``)
    must be defined earlier in the same document."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    names: dict[str, Any] = {}
    tree = _normalize(schema, names, namespace=None)
    return ParsedSchema(tree)


class ParsedSchema:
    def __init__(self, tree: Any):
        self.tree = tree

    def spark_type(self) -> T.DataType:
        return _spark_type(self.tree)

    def decode(self, data: bytes) -> Any:
        value, pos = _decode(self.tree, data, 0)
        if pos != len(data):
            raise ValueError(f"trailing bytes after datum: {len(data) - pos}")
        return value

    def encode(self, value: Any) -> bytes:
        out = bytearray()
        _encode(self.tree, value, out)
        return bytes(out)


def _fullname(name: str, namespace: str | None) -> str:
    return name if "." in name or not namespace else f"{namespace}.{name}"


def _normalize(s: Any, names: dict, namespace: str | None) -> Any:
    """Return a normalized schema node: a str for primitives, a dict for
    complex types, with named-type references resolved from ``names``."""
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return s
        ref = _fullname(s, namespace)
        if ref in names:
            return names[ref]
        if s in names:
            return names[s]
        raise SchemaParseError(f"unresolved named type: {s!r}")
    if isinstance(s, list):  # union
        return {"type": "union", "branches": [_normalize(b, names, namespace) for b in s]}
    if not isinstance(s, dict):
        raise SchemaParseError(f"bad schema node: {s!r}")
    t = s["type"]
    if t in _PRIMITIVES:
        return t
    if t == "record":
        ns = s.get("namespace", namespace)
        node: dict = {"type": "record", "name": _fullname(s["name"], ns), "fields": []}
        names[node["name"]] = node  # register before fields (recursion)
        node["fields"] = [
            {"name": f["name"], "schema": _normalize(f["type"], names, ns)}
            for f in s["fields"]
        ]
        return node
    if t == "enum":
        ns = s.get("namespace", namespace)
        node = {"type": "enum", "name": _fullname(s["name"], ns), "symbols": list(s["symbols"])}
        names[node["name"]] = node
        return node
    if t == "fixed":
        ns = s.get("namespace", namespace)
        node = {"type": "fixed", "name": _fullname(s["name"], ns), "size": int(s["size"])}
        names[node["name"]] = node
        return node
    if t == "array":
        return {"type": "array", "items": _normalize(s["items"], names, namespace)}
    if t == "map":
        return {"type": "map", "values": _normalize(s["values"], names, namespace)}
    # {"type": <named or primitive>, ...} wrapper form
    return _normalize(t, names, namespace)


# --- binary decode ---------------------------------------------------------


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """zigzag varint (spec: int and long share this encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _decode(s: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(s, str):
        if s == "null":
            return None, pos
        if s == "boolean":
            return buf[pos] == 1, pos + 1
        if s in ("int", "long"):
            return _read_long(buf, pos)
        if s == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if s == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if s == "bytes":
            n, pos = _read_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n
        if s == "string":
            n, pos = _read_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n
        raise ValueError(f"bad primitive {s!r}")
    t = s["type"]
    if t == "record":
        rec = {}
        for f in s["fields"]:
            rec[f["name"]], pos = _decode(f["schema"], buf, pos)
        return rec, pos
    if t == "union":
        idx, pos = _read_long(buf, pos)
        return _decode(s["branches"][idx], buf, pos)
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _decode(s["items"], buf, pos)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _read_long(buf, pos)
                k = buf[pos : pos + klen].decode("utf-8")
                pos += klen
                out[k], pos = _decode(s["values"], buf, pos)
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return s["symbols"][idx], pos
    if t == "fixed":
        n = s["size"]
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"bad schema node {t!r}")


# --- binary encode ---------------------------------------------------------


def _put_long(v: int, out: bytearray) -> None:
    # zigzag, written for arbitrary-precision Python ints (the C identity
    # (n << 1) ^ (n >> 63) assumes 64-bit two's complement)
    z = (v << 1) if v >= 0 else ((-v << 1) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _is_null(value: Any) -> bool:
    """pandas surfaces nullable ints/floats as NaN and nullable objects as
    None — both mean the null union branch on the wire."""
    if value is None:
        return True
    try:
        import math as _math

        return isinstance(value, float) and _math.isnan(value)
    except TypeError:  # pragma: no cover
        return False


def _union_branch(branches: list, value: Any) -> int:
    """Pick the union branch for a Python/pandas value — null vs the
    single non-null branch covers the alert schemas; otherwise first match
    by shape.  Accepts numpy scalars and ndarray/list interchangeably."""
    import numbers

    if _is_null(value):
        for i, b in enumerate(branches):
            if b == "null":
                return i
    is_bool = isinstance(value, bool) or type(value).__name__ == "bool_"
    for i, b in enumerate(branches):
        if b == "null":
            continue
        if isinstance(b, str):
            ok = {
                "boolean": lambda v: is_bool,
                # integral-valued floats count: pandas stores nullable
                # long columns as float64
                "int": lambda v: not is_bool
                and (
                    isinstance(v, numbers.Integral)
                    or (isinstance(v, numbers.Real) and float(v).is_integer())
                ),
                "long": lambda v: not is_bool
                and (
                    isinstance(v, numbers.Integral)
                    or (isinstance(v, numbers.Real) and float(v).is_integer())
                ),
                "float": lambda v: not is_bool and isinstance(v, numbers.Real),
                "double": lambda v: not is_bool and isinstance(v, numbers.Real),
                "bytes": lambda v: isinstance(v, (bytes, bytearray)),
                "string": lambda v: isinstance(v, str),
            }.get(b, lambda v: False)(value)
            if ok:
                return i
        elif b["type"] == "record" and isinstance(value, dict):
            return i
        elif b["type"] == "array" and _is_sequence(value):
            return i
        elif b["type"] == "map" and isinstance(value, dict):
            return i
        elif b["type"] == "enum" and isinstance(value, str):
            return i
        elif b["type"] == "fixed" and isinstance(value, (bytes, bytearray)):
            return i
    raise ValueError(f"no union branch for {type(value)}")


def _is_sequence(value: Any) -> bool:
    return isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray"


def _encode(s: Any, value: Any, out: bytearray) -> None:
    if isinstance(s, str):
        if s == "null":
            return
        if s == "boolean":
            out.append(1 if value else 0)
            return
        if s in ("int", "long"):
            _put_long(int(value), out)
            return
        if s == "float":
            out += struct.pack("<f", float(value))
            return
        if s == "double":
            out += struct.pack("<d", float(value))
            return
        if s == "bytes":
            _put_long(len(value), out)
            out += bytes(value)
            return
        if s == "string":
            raw = value.encode("utf-8")
            _put_long(len(raw), out)
            out += raw
            return
        raise ValueError(f"bad primitive {s!r}")
    t = s["type"]
    if t == "record":
        for f in s["fields"]:
            _encode(f["schema"], value[f["name"]], out)
        return
    if t == "union":
        idx = _union_branch(s["branches"], value)
        _put_long(idx, out)
        _encode(s["branches"][idx], value, out)
        return
    if t == "array":
        n = 0 if value is None else len(value)  # ndarray has no truthiness
        if n:
            _put_long(n, out)
            for v in value:
                _encode(s["items"], v, out)
        _put_long(0, out)
        return
    if t == "map":
        if value:
            _put_long(len(value), out)
            for k, v in value.items():
                raw = k.encode("utf-8")
                _put_long(len(raw), out)
                out += raw
                _encode(s["values"], v, out)
        _put_long(0, out)
        return
    if t == "enum":
        _put_long(s["symbols"].index(value), out)
        return
    if t == "fixed":
        if len(value) != s["size"]:
            raise ValueError(f"fixed size mismatch: {len(value)} != {s['size']}")
        out += bytes(value)
        return
    raise ValueError(f"bad schema node {t!r}")


# --- spark type mapping ----------------------------------------------------


def _spark_type(s: Any) -> T.DataType:
    if isinstance(s, str):
        return {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }[s]
    t = s["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], _spark_type(f["schema"]), nullable=True)
                for f in s["fields"]
            ]
        )
    if t == "union":
        non_null = [b for b in s["branches"] if b != "null"]
        if len(non_null) == 1:
            return _spark_type(non_null[0])
        raise SchemaParseError("multi-type unions have no Spark analog")
    if t == "array":
        return T.ArrayType(_spark_type(s["items"]), containsNull=True)
    if t == "map":
        return T.MapType(T.StringType(), _spark_type(s["values"]), valueContainsNull=True)
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    raise SchemaParseError(f"bad schema node {t!r}")
