"""ctypes bindings for the native ABC compiler (native/abc_compiler.cpp).

``compile_abc`` returns the same :class:`AbcTune` structure as the Python
parser; :func:`get_parser` picks the native implementation when the shared
library is built (``make -C native``) and falls back to pure Python
otherwise. The two implementations are differentially tested
(tests/test_native_abc.py).
"""

from __future__ import annotations

import ctypes
import os
from fractions import Fraction
from typing import Optional

from ai_music_generation_tpu.abcnotation.parser import AbcNote, AbcParser, AbcTune

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libabc_compiler.so",
)


class _AbcEventC(ctypes.Structure):
    _fields_ = [
        ("pitch", ctypes.c_int32),
        ("start_num", ctypes.c_int64),
        ("start_den", ctypes.c_int64),
        ("dur_num", ctypes.c_int64),
        ("dur_den", ctypes.c_int64),
        ("voice", ctypes.c_int32),
    ]


class _AbcResultC(ctypes.Structure):
    _fields_ = [
        ("events", ctypes.POINTER(_AbcEventC)),
        ("n_events", ctypes.c_int32),
        ("meter_num", ctypes.c_int32),
        ("meter_den", ctypes.c_int32),
        ("sharps", ctypes.c_int32),
        ("tempo_bpm", ctypes.c_double),
        ("unit_num", ctypes.c_int64),
        ("unit_den", ctypes.c_int64),
        ("n_voices", ctypes.c_int32),
        ("accomp_voice", ctypes.c_int32),  # -1 = none
    ]


_lib = None


def load_library(path: Optional[str] = None):
    global _lib
    if _lib is not None:
        return _lib
    path = path or _LIB_PATH
    if not os.path.exists(path):
        # self-bootstrap: the .so is a build artifact (not in git); build it
        # once if the toolchain is present. Set ABC_NATIVE_NOBUILD=1 to
        # skip (pure-Python parser is a full fallback either way).
        if path == _LIB_PATH and not os.environ.get("ABC_NATIVE_NOBUILD"):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(_LIB_PATH)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.abc_compile.argtypes = [ctypes.c_char_p]
    lib.abc_compile.restype = ctypes.POINTER(_AbcResultC)
    lib.abc_compile_opts.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.abc_compile_opts.restype = ctypes.POINTER(_AbcResultC)
    lib.abc_free.argtypes = [ctypes.POINTER(_AbcResultC)]
    lib.abc_free.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def compile_abc(abc_text: str, gchord: bool = False) -> AbcTune:
    """Parse via the native compiler. Raises RuntimeError if not built."""
    lib = load_library()
    if lib is None:
        raise RuntimeError(
            "native ABC compiler not built — run `make -C native`"
        )
    res_ptr = lib.abc_compile_opts(abc_text.encode("utf-8"), int(gchord))
    try:
        res = res_ptr.contents
        tune = AbcTune(
            meter=(res.meter_num, res.meter_den),
            unit_length=Fraction(res.unit_num, res.unit_den),
            tempo_bpm=res.tempo_bpm,
            sharps=res.sharps,
            n_voices=res.n_voices,
            accomp_voice=res.accomp_voice if res.accomp_voice >= 0 else None,
        )
        for k in range(res.n_events):
            e = res.events[k]
            tune.notes.append(
                AbcNote(
                    pitch=e.pitch,
                    start=Fraction(e.start_num, e.start_den),
                    duration=Fraction(e.dur_num, e.dur_den),
                    voice=e.voice,
                )
            )
        tune.notes.sort(key=lambda n: (n.voice, n.start, n.pitch))
        return tune
    finally:
        lib.abc_free(res_ptr)


class NativeAbcParser:
    """Drop-in parser using the C++ compiler."""

    def __init__(self, gchord: bool = False):
        self.gchord = gchord

    def parse(self, abc_text: str) -> AbcTune:
        return compile_abc(abc_text, gchord=self.gchord)


def get_parser(prefer_native: bool = True, gchord: bool = False):
    """Best available parser: native if built, else the Python reference."""
    if prefer_native and native_available():
        return NativeAbcParser(gchord=gchord)
    return AbcParser(gchord=gchord)
