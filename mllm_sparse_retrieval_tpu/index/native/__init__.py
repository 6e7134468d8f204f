"""ctypes binding for the native impact-index builder (libimpact_builder.so).

Builds the shared library on first use when a compiler is available; callers
fall back to the pure-Python builder when it is not (``available()`` gate).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libimpact_builder.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # Always invoke make: its dependency check rebuilds when the .cc is newer
    # than the .so, so source edits never execute against a stale binary.
    # A make failure only matters if no usable .so exists at all.
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_SO):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _build_failed = True
        return None

    lib.ib_create.restype = ctypes.c_void_p
    lib.ib_destroy.argtypes = [ctypes.c_void_p]
    lib.ib_add_jsonl.restype = ctypes.c_long
    lib.ib_add_jsonl.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
    lib.ib_add_doc.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int]
    lib.ib_finalize.argtypes = [ctypes.c_void_p]
    for name in ("ib_num_docs", "ib_num_terms", "ib_nnz",
                 "ib_terms_bytes", "ib_docids_bytes"):
        getattr(lib, name).restype = ctypes.c_long
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ib_kmax.restype = ctypes.c_int
    lib.ib_kmax.argtypes = [ctypes.c_void_p]
    for name, ctype in (
        ("ib_get_doc_terms", ctypes.c_int32),
        ("ib_get_doc_weights", ctypes.c_float),
        ("ib_get_csr_offsets", ctypes.c_int64),
        ("ib_get_csr_docs", ctypes.c_int32),
        ("ib_get_csr_weights", ctypes.c_float),
    ):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.POINTER(ctype)]
    lib.ib_get_terms.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.ib_get_docids.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeImpactBuilder:
    """Thin RAII wrapper over the C builder."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("native impact builder unavailable")
        self._lib = lib
        self._h = lib.ib_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ib_destroy(self._h)
            self._h = None

    def add_jsonl_file(self, path: str) -> int:
        with open(path, "rb") as f:
            data = f.read()
        n = self._lib.ib_add_jsonl(self._h, data, len(data))
        if n < 0:
            raise ValueError(f"malformed jsonl in {path}")
        return int(n)

    def add_jsonl_bytes(self, data: bytes) -> int:
        n = self._lib.ib_add_jsonl(self._h, data, len(data))
        if n < 0:
            raise ValueError("malformed jsonl buffer")
        return int(n)

    def finalize(self) -> dict:
        lib, h = self._lib, self._h
        lib.ib_finalize(h)
        n = lib.ib_num_docs(h)
        t = lib.ib_num_terms(h)
        nnz = lib.ib_nnz(h)
        k = lib.ib_kmax(h)

        doc_terms = np.empty(n * k, dtype=np.int32)
        doc_weights = np.empty(n * k, dtype=np.float32)
        csr_offsets = np.empty(t + 1, dtype=np.int64)
        csr_docs = np.empty(nnz, dtype=np.int32)
        csr_weights = np.empty(nnz, dtype=np.float32)
        lib.ib_get_doc_terms(h, doc_terms.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)))
        lib.ib_get_doc_weights(h, doc_weights.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
        lib.ib_get_csr_offsets(h, csr_offsets.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)))
        lib.ib_get_csr_docs(h, csr_docs.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)))
        lib.ib_get_csr_weights(h, csr_weights.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))

        def read_strings(n_items, bytes_fn, get_fn):
            nb = bytes_fn(h)
            buf = ctypes.create_string_buffer(max(nb, 1))
            lengths = np.empty(n_items, dtype=np.int64)
            get_fn(h, buf, lengths.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)))
            raw = buf.raw[:nb]
            out, pos = [], 0
            for length in lengths.tolist():
                out.append(raw[pos:pos + length].decode("utf-8"))
                pos += length
            return out

        terms = read_strings(t, lib.ib_terms_bytes, lib.ib_get_terms)
        doc_ids = read_strings(n, lib.ib_docids_bytes, lib.ib_get_docids)

        return {
            "doc_terms": doc_terms.reshape(n, k),
            "doc_weights": doc_weights.reshape(n, k),
            "csr_offsets": csr_offsets,
            "csr_docs": csr_docs,
            "csr_weights": csr_weights,
            "term_keys": terms,
            "doc_ids": doc_ids,
        }
