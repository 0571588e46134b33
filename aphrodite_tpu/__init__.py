"""aphrodite-tpu: a TPU-native LLM serving engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PygmalionAI/aphrodite-engine (continuous batching, paged KV cache, prefix
caching, the full Aphrodite sampler surface, quantization, OpenAI-compatible
serving) built TPU-first: SPMD over `jax.sharding.Mesh`, static-shape bucketed
compilation, in-graph sampling, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

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
