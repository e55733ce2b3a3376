"""Structured logger: twin of the reference server's logging layer.

The reference fork's server components call LOG_TRACE/LOG_DEBUG/LOG_INFO
/LOG_ERROR from a `logger.hpp` that is MISSING from the fork (upstream
rapidsnark's CPlusPlusLogging console logger; see /root/reference/src/
fullprover.cpp:12,70-100 and main_proofserver.cpp:18-19, which enables
console logging at DEBUG).  This module provides the working equivalent:
timestamped, level-gated stderr lines.

Level selection: ULTRAGROTH_LOG env var (trace|debug|info|error|off),
default info.  `trace`/`debug`/`info`/`error` mirror the four reference
macros; TRACE maps below DEBUG like CPlusPlusLogging's LOG_TRACE.
"""
from __future__ import annotations

import logging
import os
import sys

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_LEVELS = {"trace": TRACE, "debug": logging.DEBUG, "info": logging.INFO,
           "error": logging.ERROR, "off": logging.CRITICAL + 1}


def get_logger(name: str = "ultragroth") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s [%(levelname)s] %(name)s: %(message)s"))
        logger.addHandler(h)
        logger.propagate = False
        level = os.environ.get("ULTRAGROTH_LOG", "info").lower()
        logger.setLevel(_LEVELS.get(level, logging.INFO))
    return logger


def trace(logger: logging.Logger, msg: str, *args) -> None:
    logger.log(TRACE, msg, *args)
