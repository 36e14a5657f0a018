"""Leveled logging (ref: comm/logger.h LOG_ERROR/WARN/INFO/DEBUG/TRACE)."""

from __future__ import annotations

import logging
import os

_FMT = "[%(levelname)s] (%(filename)s:%(lineno)d) %(message)s"


def get_logger(name: str = "nsl_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(handler)
        # stop propagation: a root logger with its own handlers (pytest,
        # basicConfig callers) would print every message twice
        logger.propagate = False
        level = os.environ.get("NSL_LOG_LEVEL", "INFO").upper()
        if level not in logging._nameToLevel:
            level = "INFO"            # bad NSL_LOG_LEVEL must not crash
        logger.setLevel(level)
    return logger
