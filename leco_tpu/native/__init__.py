"""Native (C++) components, built on demand with g++ and bound via ctypes.

Currently: the BPE merge engine for the CLIP tokenizer (bpe.cpp). The build
is cached next to the source; failures fall back to the pure-Python paths
silently (set LECO_TPU_NATIVE=0 to disable natives outright)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbpe.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "bpe.cpp")
    try:
        subprocess.run(
            [
                "g++",
                "-O2",
                "-shared",
                "-fPIC",
                "-std=c++17",
                src,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_bpe_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native BPE library, or None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LECO_TPU_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(
        _LIB_PATH
    ) < os.path.getmtime(os.path.join(_DIR, "bpe.cpp")):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
    ]
    lib.bpe_encode_word.restype = ctypes.c_int32
    lib.bpe_encode_word.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.bpe_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class NativeBPE:
    """ctypes wrapper: vocab/merges in, per-word BPE ids out."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        lib = load_bpe_library()
        if lib is None:
            raise RuntimeError("native BPE unavailable")
        self._lib = lib
        # tokens in id order
        by_id = sorted(vocab.items(), key=lambda kv: kv[1])
        assert [i for _, i in by_id] == list(range(len(by_id))), (
            "vocab ids must be dense 0..n-1 for the native engine"
        )
        tokens = (ctypes.c_char_p * len(by_id))(
            *[t.encode() for t, _ in by_id]
        )
        ml = (ctypes.c_char_p * len(merges))(*[a.encode() for a, _ in merges])
        mr = (ctypes.c_char_p * len(merges))(*[b.encode() for _, b in merges])
        self._handle = lib.bpe_create(tokens, len(by_id), ml, mr, len(merges))
        self._buf = (ctypes.c_int32 * 1024)()

    def encode_word(self, word: str) -> list[int]:
        n = self._lib.bpe_encode_word(
            self._handle, word.encode(), self._buf, 1024
        )
        ids = list(self._buf[:n])
        if any(i < 0 for i in ids):
            raise KeyError(f"native BPE produced unknown piece for {word!r}")
        return ids

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._handle)
        except Exception:
            pass
