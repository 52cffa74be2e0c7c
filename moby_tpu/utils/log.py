"""Bitmask-leveled logging (the reference's FILE_LOG system).

Mirrors `Moby::Log` (src/Log.cpp, include/Moby/Log.h:20-25) and the level
bitmask (include/Moby/Constants.h:27-36): a global reporting mask selects
which subsystems emit; output goes to stderr or a file. The macro-compiled-
out-under-NDEBUG behavior maps to the zero-mask fast path.
"""

from __future__ import annotations

import sys
import time
from typing import Optional, TextIO

LOG_NONE = 0
LOG_SIMULATOR = 1
LOG_CONSTRAINT = 2
LOG_DYNAMICS = 4
LOG_BV = 8
LOG_COLDET = 32
LOG_COMPGEOM = 64
LOG_LINALG = 128
LOG_OPT = 256
LOG_MPC = 512
LOG_ALL = 0xFFFF

_NAMES = {
    "simulator": LOG_SIMULATOR,
    "constraint": LOG_CONSTRAINT,
    "dynamics": LOG_DYNAMICS,
    "bv": LOG_BV,
    "coldet": LOG_COLDET,
    "compgeom": LOG_COMPGEOM,
    "linalg": LOG_LINALG,
    "opt": LOG_OPT,
    "mpc": LOG_MPC,
    "all": LOG_ALL,
}

reporting_level: int = LOG_NONE
_out: TextIO = sys.stderr
_t0 = time.time()


def set_reporting_level(mask) -> None:
    """Accepts an int bitmask or a comma-separated name list
    ('simulator,constraint')."""
    global reporting_level
    if isinstance(mask, str):
        m = 0
        for part in mask.split(","):
            m |= _NAMES[part.strip().lower()]
        reporting_level = m
    else:
        reporting_level = int(mask)


def set_output(path: Optional[str]) -> None:
    """Log to a file (None -> stderr), like `Log::redirect`."""
    global _out
    _out = sys.stderr if path is None else open(path, "a")


def logging(level: int) -> bool:
    return bool(reporting_level & level)


def log(level: int, msg: str, *args) -> None:
    if reporting_level & level:
        if args:
            msg = msg % args
        _out.write(f"[{time.time() - _t0:10.4f}] {msg}\n")
        _out.flush()
