"""Environment flags.

Lazy env-var accessors mirroring the capability of the reference's
``aphrodite/common/envs.py`` (153 flags); we keep only flags meaningful on
TPU and add TPU-specific ones.
"""

import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # Logging / debugging
    "APHRODITE_TPU_LOG_LEVEL": lambda: os.environ.get(
        "APHRODITE_TPU_LOG_LEVEL", "INFO"
    ),
    # Persistent XLA compilation cache directory (reference:
    # APHRODITE_XLA_CACHE_PATH, aphrodite/common/envs.py:37).
    "APHRODITE_TPU_XLA_CACHE_PATH": lambda: os.environ.get(
        "APHRODITE_TPU_XLA_CACHE_PATH",
        os.path.expanduser("~/.cache/aphrodite_tpu/xla_cache"),
    ),
    # Engine iteration watchdog (reference envs.py / async_aphrodite.py:34).
    "APHRODITE_TPU_ENGINE_ITERATION_TIMEOUT_S": lambda: int(
        os.environ.get("APHRODITE_TPU_ENGINE_ITERATION_TIMEOUT_S", "120")
    ),
    # Force attention implementation: "pallas" | "xla" (reference
    # APHRODITE_ATTENTION_BACKEND, attention/selector.py:92).
    "APHRODITE_TPU_ATTENTION_BACKEND": lambda: os.environ.get(
        "APHRODITE_TPU_ATTENTION_BACKEND", "auto"
    ),
    # Test hook: artificially preempt to exercise recompute paths
    # (reference scheduler.py:24-25).
    "APHRODITE_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT": lambda: bool(
        int(os.environ.get("APHRODITE_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT", "0"))
    ),
    # RPC frontend/engine split address base.
    "APHRODITE_TPU_RPC_BASE_PATH": lambda: os.environ.get(
        "APHRODITE_TPU_RPC_BASE_PATH", "/tmp"
    ),
    "APHRODITE_TPU_KEEP_ALIVE_ON_ENGINE_DEATH": lambda: bool(
        int(os.environ.get("APHRODITE_TPU_KEEP_ALIVE_ON_ENGINE_DEATH", "0"))
    ),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables.keys())
