"""aphrodite-tpu: a TPU-native LLM serving engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PygmalionAI/aphrodite-engine (continuous batching, paged KV cache, prefix
caching, the full Aphrodite sampler surface, quantization, OpenAI-compatible
serving) built TPU-first: SPMD over `jax.sharding.Mesh`, static-shape bucketed
compilation, in-graph sampling, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

# Multi-host bootstrap must precede ANY jax call that initializes the
# XLA backend, so it runs at package import. Env-gated: a no-op unless
# APHRODITE_NUM_HOSTS/APHRODITE_MULTIHOST is set (parallel/multihost.py).
import os as _os

if (_os.environ.get("APHRODITE_MULTIHOST")
        or int(_os.environ.get("APHRODITE_NUM_HOSTS", "1")) > 1):
    from aphrodite_tpu.parallel.multihost import maybe_initialize as _mh_init

    _mh_init()

from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.common.outputs import CompletionOutput, RequestOutput

__all__ = [
    "__version__",
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "LLM",
    "AphroditeEngine",
    "EngineArgs",
]


def __getattr__(name):
    # Lazy imports so that `import aphrodite_tpu` stays cheap and does not
    # pull in jax/transformers until an engine is actually constructed.
    if name == "LLM":
        from aphrodite_tpu.endpoints.llm import LLM

        return LLM
    if name == "AphroditeEngine":
        from aphrodite_tpu.engine.engine import AphroditeEngine

        return AphroditeEngine
    if name == "EngineArgs":
        from aphrodite_tpu.engine.args import EngineArgs

        return EngineArgs
    raise AttributeError(f"module 'aphrodite_tpu' has no attribute {name!r}")
