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
        logger.setLevel(os.environ.get("NSL_LOG_LEVEL", "INFO").upper())
    return logger
