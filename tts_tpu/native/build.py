"""Lazy builder/loader for the native C++ components (g++ -> shared lib,
cached next to the sources; ctypes bindings, no pybind11 dependency)."""

from __future__ import annotations

import ctypes
import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(src: str, out: str, extra_flags=()) -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           src, "-o", out, *extra_flags]
    subprocess.run(cmd, check=True, capture_output=True)


def _load(name: str, extra_flags=()) -> ctypes.CDLL:
    src = os.path.join(_THIS_DIR, f"{name}.cpp")
    lib = os.path.join(_THIS_DIR, f"lib{name}.so")
    if (not os.path.isfile(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        _build(src, lib, extra_flags)
    return ctypes.CDLL(lib)


def load_mas_library() -> ctypes.CDLL:
    lib = _load("mas")
    lib.maximum_path.restype = None
    return lib
