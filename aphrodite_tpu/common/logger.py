"""Logging setup.

Capability parity with the reference's loguru-based logger
(``aphrodite/common/logger.py``) using only stdlib logging: leveled console
output, one-time messages, and an env-controlled log level.
"""

import logging
import os
import sys
from functools import lru_cache

_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%H:%M:%S"

_root_configured = False


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    level = os.environ.get("APHRODITE_TPU_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("aphrodite_tpu")
    root.setLevel(level)
    if not root.handlers:
        root.addHandler(handler)
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("aphrodite_tpu"):
        name = f"aphrodite_tpu.{name}"
    return logging.getLogger(name)


@lru_cache(maxsize=None)
def _log_once_key(key: str) -> bool:
    return True


def log_once(logger: logging.Logger, level: int, msg: str, *args) -> None:
    """Log a message only the first time it is seen (reference `log_once`)."""
    key = f"{logger.name}:{level}:{msg}"
    if _log_once_key.cache_info().currsize >= 0 and key not in getattr(
        log_once, "_seen", set()
    ):
        seen = getattr(log_once, "_seen", set())
        seen.add(key)
        log_once._seen = seen
        logger.log(level, msg, *args)
