"""Pure-Python reader for R's RData/.rda save format, version 2, XDR
(reference src/RDA.jl — a 309-LoC Julia reader for the same public
format; layout documented in the R Internals manual, "Serialization
Formats", and R's serialize.c).

Scope matches the reference reader: gzip/plain XDR streams holding
logical / integer / real / string vectors, generic vectors (lists),
pairlist attributes, symbols and back-references — enough for any saved
``data.frame`` (including factor columns and R NA patterns). Everything
decodes driver-side (.rda files are small, single-object saves by
construction) and lands in Spark via ``createDataFrame`` with an
explicit nullable schema.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import Any

# SEXP type tags (Rinternals.h; reference src/RDA.jl SXPtab)
_NILSXP = 0x00
_SYMSXP = 0x01
_LISTSXP = 0x02
_CHARSXP = 0x09
_LGLSXP = 0x0A
_INTSXP = 0x0D
_REALSXP = 0x0E
_CPLXSXP = 0x0F
_STRSXP = 0x10
_VECSXP = 0x13
_RAWSXP = 0x18
# serialize.c pseudo-tags
_BASEENV = 0xF1
_EMPTYENV = 0xF2
_GLOBALENV = 0xFD
_NILVALUE = 0xFE
_REFSXP = 0xFF

_NA_INT32 = -0x80000000
# R's NA_real_: an IEEE NaN whose low word is 1954 (reference
# src/RDA.jl R_NA_FLOAT64)
_NA_REAL_BITS = (0x7FF00000 << 32) | 1954


class _NAReal(float):
    """Marker so NA_real_ survives the float round-trip distinct from NaN."""


@dataclass
class RObj:
    """A decoded R object: python value + R attributes."""

    value: Any
    attrs: dict[str, Any] = field(default_factory=dict)

    def attr(self, name: str, default=None):
        a = self.attrs.get(name, default)
        return a.value if isinstance(a, RObj) else a


class _Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0
        self.refs: list[Any] = []

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated RData stream")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def f8(self) -> float:
        (bits,) = struct.unpack(">Q", self._take(8))
        if bits == _NA_REAL_BITS:
            return _NAReal("nan")
        return struct.unpack(">d", struct.pack(">Q", bits))[0]

    # -- item decoding ----------------------------------------------------

    def item(self) -> Any:
        flags = self.i4()
        typ = flags & 0xFF
        has_attr = bool(flags & (1 << 9))
        has_tag = bool(flags & (1 << 10))

        if typ == _REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.i4()
            return self.refs[idx - 1]
        if typ in (_NILVALUE, _NILSXP):
            return None
        if typ in (_GLOBALENV, _BASEENV, _EMPTYENV):
            return RObj(value=f"<env:{typ:#x}>")
        if typ == _SYMSXP:
            name = self.item()  # a CHARSXP
            sym = RObj(value=name)
            self.refs.append(sym)
            return sym
        if typ == _CHARSXP:
            n = self.i4()
            if n == -1:
                return None  # NA_character_
            return self._take(n).decode("utf-8", errors="replace")
        if typ == _LISTSXP:
            # pairlist: attr and tag precede car/cdr
            pairs: list[tuple[Any, Any]] = []
            while True:
                if has_attr:
                    self.item()
                tag = self.item() if has_tag else None
                car = self.item()
                pairs.append((_sym_name(tag), car))
                flags = self.i4()
                typ = flags & 0xFF
                if typ == _REFSXP:
                    idx = flags >> 8
                    pairs.append((None, self.refs[(idx or self.i4()) - 1]))
                    return pairs
                if typ in (_NILVALUE, _NILSXP):
                    return pairs
                if typ != _LISTSXP:
                    raise ValueError(f"malformed pairlist: next type {typ:#x}")
                has_attr = bool(flags & (1 << 9))
                has_tag = bool(flags & (1 << 10))
        if typ == _LGLSXP:
            n = self.i4()
            vals = [self.i4() for _ in range(n)]
            obj = RObj([None if v == _NA_INT32 else bool(v) for v in vals])
        elif typ == _INTSXP:
            n = self.i4()
            vals = [self.i4() for _ in range(n)]
            obj = RObj([None if v == _NA_INT32 else v for v in vals])
        elif typ == _REALSXP:
            n = self.i4()
            vals = [self.f8() for _ in range(n)]
            obj = RObj([None if isinstance(v, _NAReal) else v for v in vals])
        elif typ == _CPLXSXP:
            n = self.i4()
            obj = RObj([complex(self.f8(), self.f8()) for _ in range(n)])
        elif typ == _STRSXP:
            n = self.i4()
            obj = RObj([self.item() for _ in range(n)])
        elif typ == _VECSXP:
            n = self.i4()
            obj = RObj([self.item() for _ in range(n)])
        elif typ == _RAWSXP:
            n = self.i4()
            obj = RObj(self._take(n))
        else:
            raise ValueError(f"unsupported SEXP type {typ:#x} in RData stream")

        if has_attr:
            attrs = self.item()  # pairlist
            if attrs:
                obj.attrs = {k: v for k, v in attrs if k is not None}
        return obj


def _sym_name(tag: Any) -> str | None:
    if isinstance(tag, RObj) and isinstance(tag.value, str):
        return tag.value
    return None


def parse_rda(path: str) -> dict[str, Any]:
    """Decode the named objects saved in a .rda/.RData file into Python
    values (RObj wrappers carrying R attributes)."""
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        data = gzip.open(fh).read() if head == b"\x1f\x8b" else fh.read()
    if data[:5] not in (b"RDX2\n", b"RDA2\n"):
        raise ValueError(f"not an RData version-2 file: {data[:5]!r}")
    if data[5:7] != b"X\n":
        raise ValueError("only XDR-format RData streams are supported")
    rd = _Reader(data[7:])
    rd.i4(), rd.i4(), rd.i4()  # serialization/writer/min-reader versions
    top = rd.item()
    if not isinstance(top, list):
        raise ValueError("expected a pairlist of saved objects")
    return {name: val for name, val in top if name is not None}


def r_dataframe_to_columns(obj: RObj) -> tuple[list[str], list[list[Any]]]:
    """(colnames, columns) from a decoded R data.frame; factor columns
    are expanded to their string levels (reference reads them as
    PooledDataArray — the string level IS the value)."""
    names = obj.attr("names") or []
    cols = []
    for col in obj.value:
        if isinstance(col, RObj) and "factor" in (col.attr("class") or []):
            levels = col.attr("levels") or []
            col = RObj(
                [None if c is None else levels[c - 1] for c in col.value]
            )
        cols.append(col.value if isinstance(col, RObj) else col)
    return list(names), cols


def _spark_type(values: list[Any]) -> str:
    for v in values:
        if v is not None:
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "double"
            return "string"
    return "string"


def read_rda(spark, path: str) -> dict:
    """R .rda/.RData reader (reference src/RDA.jl, test/RDA.jl): returns
    {name: Spark DataFrame} for saved data.frames and {name: python
    value} for other vectors. Pure-Python XDR decode, no optional deps."""
    out: dict[str, Any] = {}
    for name, obj in parse_rda(path).items():
        classes = obj.attr("class") if isinstance(obj, RObj) else None
        if classes and "data.frame" in classes:
            colnames, cols = r_dataframe_to_columns(obj)
            schema = ", ".join(
                f"`{c}` {_spark_type(vals)}" for c, vals in zip(colnames, cols)
            )
            rows = list(zip(*cols)) if cols else []
            out[name] = spark.createDataFrame(rows, schema)
        else:
            out[name] = obj.value if isinstance(obj, RObj) else obj
    return out
