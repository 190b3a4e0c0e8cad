"""Minimal reader for R workspace files (.rda / .RData, RDX2/RDX3, XDR).

Implements just enough of R's serialization format (format spec in R
sources, ``serialize.c``) to load the reference's bundled datasets
(``/root/reference/data``: ``cell_lines``, ``cell_lines_small`` as lists of
data.frames; ``pbmc.ctrl``/``pbmc.stim`` as ``dgCMatrix`` S4 sparse
matrices). No R and no third-party readers are available in this
environment, so this is written from the format, not ported from any
implementation.

Supported: gzip/bzip2/xz compression, XDR ("X\\n") encoding, SEXP types
NILSXP, SYMSXP, LISTSXP, CLOSXP-free pairlists, CHARSXP, LGLSXP, INTSXP,
REALSXP, STRSXP, VECSXP, RAWSXP, S4SXP, REFSXP, attribute handling,
ALTREP (wrapped/compact representations commonly found in saved data).

Decoded R objects map to Python as:

* numeric/integer/logical vectors -> NumPy arrays (NA -> nan / -2**31)
* character vectors -> NumPy object arrays of str/None
* factor -> :class:`RFactor` (codes + levels; ``as_strings()``)
* data.frame -> dict of column name -> decoded column
* dgCMatrix -> :class:`RSparseMatrix` (CSC arrays; ``to_scipy()``)
* named list -> dict, unnamed list -> list
"""

from __future__ import annotations

import bz2
import dataclasses
import gzip
import lzma
import struct
from typing import Any, Dict, List, Optional

import numpy as np

# SEXP type codes (R internals)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CLOSXP = 3
ENVSXP = 4
PROMSXP = 5
LANGSXP = 6
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
EXPRSXP = 20
RAWSXP = 24
S4SXP = 25
# Pseudo-types used by the serialization format
BASEENV_SXP = 241
EMPTYENV_SXP = 242
GENERICREFSXP = 245
ALTREP_SXP = 238
ATTRLISTSXP = 239
ATTRLANGSXP = 240
UNBOUNDVALUE_SXP = 245
GLOBALENV_SXP = 253
NILVALUE_SXP = 254
REFSXP = 255
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247
MISSINGARG_SXP = 251

R_NA_INT = -2147483648


class RDataError(ValueError):
    pass


@dataclasses.dataclass
class RFactor:
    codes: np.ndarray  # int32, 1-based in R; stored 0-based here, NA -> -1
    levels: np.ndarray  # object array of str

    def as_strings(self) -> np.ndarray:
        out = np.empty(self.codes.shape, dtype=object)
        valid = self.codes >= 0
        out[valid] = self.levels[self.codes[valid]]
        out[~valid] = None
        return out

    def __len__(self):
        return len(self.codes)


@dataclasses.dataclass
class RSparseMatrix:
    """A Matrix-package CSC sparse matrix (dgCMatrix)."""

    data: np.ndarray  # x
    indices: np.ndarray  # i (row indices)
    indptr: np.ndarray  # p (column pointers)
    shape: tuple
    dimnames: Optional[list] = None

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csc_matrix(
            (self.data, self.indices, self.indptr), shape=self.shape
        )

    def toarray(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        ncol = self.shape[1]
        for c in range(ncol):
            sl = slice(self.indptr[c], self.indptr[c + 1])
            out[self.indices[sl], c] = self.data[sl]
        return out


@dataclasses.dataclass
class RObject:
    """Decoded SEXP with attributes, pre-conversion."""

    type: int
    value: Any
    attributes: Dict[str, Any] = dataclasses.field(default_factory=dict)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs: List[Any] = []

    # ---- primitives (XDR: big-endian) ------------------------------------
    def _read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise RDataError("unexpected EOF")
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack(">I", self._read(4))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._read(4))[0]

    def f64(self) -> float:
        return struct.unpack(">d", self._read(8))[0]

    def length(self) -> int:
        n = self.i32()
        if n == -1:  # long vector: two 32-bit words
            hi, lo = self.u32(), self.u32()
            return (hi << 32) | lo
        return n

    # ---- header -----------------------------------------------------------
    def read_header(self):
        magic = self._read(2)
        if magic == b"X\n":
            pass
        elif magic in (b"A\n", b"B\n"):
            raise RDataError("only XDR-format RData is supported")
        else:
            raise RDataError(f"bad serialization header {magic!r}")
        version = self.i32()
        self.i32()  # writer version
        self.i32()  # min reader version
        if version >= 3:
            enc_len = self.i32()
            self._read(enc_len)  # native encoding name
        return version

    # ---- SEXP reader -------------------------------------------------------
    def read_item(self) -> Any:
        flags = self.u32()
        typ = flags & 0xFF
        levels = flags >> 12
        is_obj = bool(flags & 0x100)
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if typ == NILVALUE_SXP or typ == NILSXP:
            return None
        if typ == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.u32()
            return self.refs[idx - 1]
        if typ == SYMSXP:
            sym = self.read_item()  # CHARSXP
            name = sym.value if isinstance(sym, RObject) else sym
            obj = RObject(SYMSXP, name)
            self.refs.append(obj)
            return obj
        if typ in (PACKAGESXP, NAMESPACESXP):
            # persistent name: a STRSXP-like char vec
            self.i32()  # dummy flag/version
            n = self.i32()
            names = [self._read_charsxp_item() for _ in range(n)]
            obj = RObject(typ, names)
            self.refs.append(obj)
            return obj
        if typ in (GLOBALENV_SXP, BASEENV_SXP, EMPTYENV_SXP, MISSINGARG_SXP):
            return RObject(typ, None)
        if typ == ENVSXP:
            # locked flag, enclos, frame, hashtab, attrib
            obj = RObject(ENVSXP, None)
            self.refs.append(obj)
            self.u32()
            obj.value = {
                "enclos": self.read_item(),
                "frame": self.read_item(),
                "hashtab": self.read_item(),
                "attrib": self.read_item(),
            }
            return obj
        if typ in (LISTSXP, LANGSXP):
            # pairlist node: attr?, tag?, CAR, CDR
            attrs = self.read_attributes() if has_attr else {}
            tag = self.read_item() if has_tag else None
            car = self.read_item()
            cdr = self.read_item()
            pairs = [(tag, car)]
            while isinstance(cdr, _PairTail):
                pairs.extend(cdr.pairs)
                cdr = cdr.rest
            tail = _PairTail(pairs, cdr)
            tail.attributes = attrs
            return tail
        if typ == CHARSXP:
            return RObject(CHARSXP, self._read_charsxp(levels))
        if typ == LGLSXP:
            n = self.length()
            vals = np.frombuffer(self._read(4 * n), dtype=">i4").astype(np.int32)
            arr = vals.astype(object)
            out = np.where(vals == R_NA_INT, None, vals != 0)
            obj = RObject(LGLSXP, out.astype(object))
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == INTSXP:
            n = self.length()
            vals = np.frombuffer(self._read(4 * n), dtype=">i4").astype(np.int32)
            obj = RObject(INTSXP, vals)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == REALSXP:
            n = self.length()
            vals = np.frombuffer(self._read(8 * n), dtype=">f8").astype(
                np.float64
            )
            obj = RObject(REALSXP, vals)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == STRSXP:
            n = self.length()
            vals = np.empty(n, dtype=object)
            for i in range(n):
                vals[i] = self._read_charsxp_item()
            obj = RObject(STRSXP, vals)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ in (VECSXP, EXPRSXP):
            n = self.length()
            vals = [self.read_item() for _ in range(n)]
            obj = RObject(VECSXP, vals)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == RAWSXP:
            n = self.length()
            obj = RObject(RAWSXP, np.frombuffer(self._read(n), dtype=np.uint8))
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == CPLXSXP:
            n = self.length()
            vals = np.frombuffer(self._read(16 * n), dtype=">c16").astype(
                np.complex128
            )
            obj = RObject(CPLXSXP, vals)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == S4SXP:
            obj = RObject(S4SXP, None)
            obj.attributes = self.read_attributes() if has_attr else {}
            return obj
        if typ == 22:  # EXTPTRSXP (e.g. data.table's .internal.selfref)
            obj = RObject(typ, None)
            self.refs.append(obj)
            self.read_item()  # protected value
            self.read_item()  # tag
            if has_attr:
                obj.attributes = self.read_attributes()
            return obj
        if typ == 23:  # WEAKREFSXP
            obj = RObject(typ, None)
            self.refs.append(obj)
            return obj
        if typ == ALTREP_SXP:
            info = self.read_item()  # class info (pairlist/symbols)
            state = self.read_item()
            attr = self.read_item()
            return _decode_altrep(info, state, attr)
        raise RDataError(f"unsupported SEXP type {typ}")

    def _read_charsxp(self, levels: int) -> Optional[str]:
        n = self.i32()
        if n == -1:
            return None
        raw = self._read(n)
        if levels & 0x4:  # LATIN1_MASK is 1<<2 at levels bit 2 (0x4)
            return raw.decode("latin-1")
        return raw.decode("utf-8", errors="replace")

    def _read_charsxp_item(self) -> Optional[str]:
        item = self.read_item()
        if item is None:
            return None
        if isinstance(item, RObject) and item.type == CHARSXP:
            return item.value
        raise RDataError("expected CHARSXP in string vector")

    def read_attributes(self) -> Dict[str, Any]:
        tail = self.read_item()
        attrs: Dict[str, Any] = {}
        if tail is None:
            return attrs
        if not isinstance(tail, _PairTail):
            raise RDataError("attributes must be a pairlist")
        for tag, car in tail.pairs:
            name = None
            if isinstance(tag, RObject) and tag.type == SYMSXP:
                name = tag.value
            attrs[name] = car
        return attrs


class _PairTail:
    """Decoded pairlist (association list)."""

    def __init__(self, pairs, rest):
        self.pairs = pairs
        self.rest = rest
        self.attributes: Dict[str, Any] = {}


def _decode_altrep(info, state, attr):
    """Decode common ALTREP payloads (compact_intseq, wrap_*, deferred_string)."""
    # info is a pairlist: (class symbol or serialized info)
    name = None
    if isinstance(info, _PairTail) and info.pairs:
        car = info.pairs[0][1]
        if isinstance(car, RObject) and car.type == SYMSXP:
            name = car.value
    if name == "compact_intseq":
        # state: REALSXP [n, start, step]
        n, start, step = [int(v) for v in state.value]
        return RObject(INTSXP, np.arange(start, start + n * step, step, dtype=np.int32))
    if name == "compact_realseq":
        n, start, step = state.value
        return RObject(
            REALSXP, np.arange(start, start + n * step, step, dtype=np.float64)
        )
    if name in ("wrap_real", "wrap_integer", "wrap_logical", "wrap_string",
                "wrap_raw", "wrap_complex"):
        # state: VECSXP [payload, metadata]
        payload = state.value[0] if isinstance(state, RObject) else state
        return payload
    if name == "deferred_string":
        payload = state.value[0] if isinstance(state, RObject) else state
        # payload is the numeric vector; coerce to strings like R would
        vals = payload.value
        out = np.array([_r_num_to_str(v) for v in vals], dtype=object)
        return RObject(STRSXP, out)
    raise RDataError(f"unsupported ALTREP class {name!r}")


def _r_num_to_str(v) -> str:
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


# ---- conversion to Python -------------------------------------------------


def _attr_value(attrs: Dict[str, Any], name: str):
    v = attrs.get(name)
    return _convert(v) if v is not None else None


def _convert(obj: Any) -> Any:
    """Convert a decoded RObject tree to friendly Python values."""
    if obj is None:
        return None
    if isinstance(obj, _PairTail):
        return {_sym_name(t): _convert(c) for t, c in obj.pairs}
    if not isinstance(obj, RObject):
        return obj
    attrs = obj.attributes or {}
    cls = None
    if "class" in attrs:
        cls_v = attrs["class"]
        cls = list(cls_v.value) if isinstance(cls_v, RObject) else None

    if obj.type == INTSXP and cls and "factor" in cls:
        levels = _attr_value(attrs, "levels")
        codes = obj.value.astype(np.int64) - 1  # R is 1-based; NA -> large neg
        codes[obj.value == R_NA_INT] = -1
        return RFactor(codes=codes, levels=np.asarray(levels, dtype=object))

    if obj.type == S4SXP:
        conv_attrs = {k: _convert(v) for k, v in attrs.items() if k}
        if cls and any(c in ("dgCMatrix", "lgCMatrix", "ngCMatrix") for c in cls):
            dim = conv_attrs["Dim"]
            x = conv_attrs.get("x")
            if x is None:  # pattern matrix
                x = np.ones(len(conv_attrs["i"]), dtype=np.float64)
            return RSparseMatrix(
                data=np.asarray(x),
                indices=np.asarray(conv_attrs["i"], dtype=np.int64),
                indptr=np.asarray(conv_attrs["p"], dtype=np.int64),
                shape=tuple(int(v) for v in dim),
                dimnames=conv_attrs.get("Dimnames"),
            )
        conv_attrs["__class__"] = cls
        return conv_attrs

    if obj.type == VECSXP:
        names = _attr_value(attrs, "names")
        vals = [_convert(v) for v in obj.value]
        if cls and ("data.frame" in cls):
            names = list(names) if names is not None else [
                f"V{i+1}" for i in range(len(vals))
            ]
            return dict(zip(names, vals))
        if names is not None and len(names) == len(vals) and all(
            n for n in names
        ):
            return dict(zip(list(names), vals))
        return vals

    if obj.type in (REALSXP, INTSXP, LGLSXP, STRSXP, CPLXSXP, RAWSXP):
        val = obj.value
        dim = _attr_value(attrs, "dim")
        if dim is not None:
            # R stores column-major
            val = np.asarray(val).reshape(tuple(int(x) for x in dim), order="F")
            dimnames = _attr_value(attrs, "dimnames")
            if dimnames is not None:
                return RMatrix(values=val, dimnames=dimnames)
        return val

    if obj.type == CHARSXP:
        return obj.value
    if obj.type == SYMSXP:
        return obj.value
    return obj


@dataclasses.dataclass
class RMatrix:
    values: np.ndarray
    dimnames: Optional[list]


def _sym_name(tag) -> Optional[str]:
    if isinstance(tag, RObject) and tag.type == SYMSXP:
        return tag.value
    return None


def _decompress(raw: bytes) -> bytes:
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    if raw[:3] == b"BZh":
        return bz2.decompress(raw)
    if raw[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(raw)
    return raw


def load_rdata(path: str) -> Dict[str, Any]:
    """Load a .rda/.RData file: returns {object_name: python_value}."""
    raw = _decompress(open(path, "rb").read())
    if raw[:5] not in (b"RDX2\n", b"RDX3\n"):
        raise RDataError(f"not an RData file: header {raw[:5]!r}")
    r = _Reader(raw[5:])
    r.read_header()
    top = r.read_item()
    out: Dict[str, Any] = {}
    if isinstance(top, _PairTail):
        for tag, car in top.pairs:
            out[_sym_name(tag)] = _convert(car)
    elif top is not None:
        out["value"] = _convert(top)
    return out
