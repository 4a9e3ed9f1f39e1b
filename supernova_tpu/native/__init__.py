"""Native (C++) host-side components, loaded via ctypes.

Built lazily with g++ into a cache dir; every native entry point has a pure
Python fallback so the framework degrades gracefully without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "fastq_decode.cpp"
_LIB = None
_TRIED = False


def _build_dir() -> Path:
    d = Path(os.environ.get("SUPERNOVA_TPU_BUILD", "/tmp/supernova_tpu_native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_native():
    """-> ctypes CDLL or None (falls back to Python)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha1(src).hexdigest()[:12]
        so = _build_dir() / f"fastq_decode_{tag}.so"
        if not so.exists():
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    str(_SRC), "-o", str(so),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.fastq_scan.restype = ctypes.c_int
        lib.fastq_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fastq_decode.restype = ctypes.c_int
        lib.fastq_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def decode_fastq_bytes(data: bytes):
    """Decompressed FASTQ bytes -> (codes u8, quals u8 phred, offsets i64).
    Native fast path with Python fallback."""
    lib = load_native()
    if lib is not None:
        nrec = ctypes.c_int64(0)
        nbase = ctypes.c_int64(0)
        rc = lib.fastq_scan(data, len(data), ctypes.byref(nrec), ctypes.byref(nbase))
        if rc == 0:
            codes = np.empty(nbase.value, np.uint8)
            quals = np.empty(nbase.value, np.uint8)
            offsets = np.empty(nrec.value + 1, np.int64)
            rc = lib.fastq_decode(data, len(data), codes, quals, offsets, nrec.value)
            if rc == 0:
                return codes, quals, offsets
        raise ValueError(f"malformed FASTQ (native rc={rc})")
    # pure python fallback
    from ..core import dna
    from ..ingest.fastq import qual_str_to_phred

    codes_l, quals_l = [], []
    lines = data.decode().splitlines()
    for i in range(0, len(lines) - 3, 4):
        codes_l.append(dna.seq_to_codes(lines[i + 1]))
        quals_l.append(qual_str_to_phred(lines[i + 3]))
    lens = np.array([len(c) for c in codes_l], np.int64)
    offsets = np.zeros(len(codes_l) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    return (
        np.concatenate(codes_l) if codes_l else np.zeros(0, np.uint8),
        np.concatenate(quals_l) if quals_l else np.zeros(0, np.uint8),
        offsets,
    )


_NUC_LIB = None
_NUC_TRIED = False


def load_nucleate():
    """ctypes handle to the NucleateGraph glue core, or None."""
    global _NUC_LIB, _NUC_TRIED
    if _NUC_LIB is not None or _NUC_TRIED:
        return _NUC_LIB
    _NUC_TRIED = True
    try:
        src_path = Path(__file__).parent / "nucleate_core.cpp"
        src = src_path.read_bytes()
        tag = hashlib.sha1(src).hexdigest()[:12]
        so = _build_dir() / f"nucleate_core_{tag}.so"
        if not so.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src_path), "-o", str(so)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.nucleate_glue.restype = ctypes.c_int
        lib.nucleate_glue.argtypes = [
            i32, i64, ctypes.c_int64,          # vals, offs, n
            i64, ctypes.c_int64,               # kmers, n_edges
            i64,                               # cinv
            ctypes.c_int64, ctypes.c_int64,    # min_over, floor
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # adaptive, interior, max_partners
            i64, ctypes.c_int64,               # extra_pairs, n_extra
            i64,                               # parent (out)
        ]
        _NUC_LIB = lib
    except Exception:
        _NUC_LIB = None
    return _NUC_LIB
