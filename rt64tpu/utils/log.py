"""Breadcrumb logging — the RT64_LOG_* analog.

The reference writes function/file/line breadcrumbs to rt64.log,
compiled out in release (rt64_common.h:153-162). Here: a standard
logger, enabled with RT64TPU_LOG=1 (or a path), used by the frame
drivers for the same phase breadcrumbs.
"""

from __future__ import annotations

import logging
import os

_logger = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        _logger = logging.getLogger("rt64tpu")
        target = os.environ.get("RT64TPU_LOG", "")
        if target:
            handler = (
                logging.FileHandler(target)
                if target not in ("1", "stderr") else logging.StreamHandler()
            )
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(name)s %(message)s")
            )
            _logger.addHandler(handler)
            _logger.setLevel(logging.DEBUG)
        else:
            _logger.addHandler(logging.NullHandler())
    return _logger


def breadcrumb(msg: str) -> None:
    get_logger().debug(msg)
