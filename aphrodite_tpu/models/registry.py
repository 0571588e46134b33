"""Model registry (reference: aphrodite/modeling/models/__init__.py:10-113).

Maps HF `architectures[0]` strings to model classes. Out-of-tree models can
register via `register_model` (reference `_OOT_MODELS:119`).
"""

from typing import Callable, Dict, Type

from aphrodite_tpu.common.config import ModelConfig
from aphrodite_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    """Qwen2/Qwen2.5: Llama topology + QKV bias + tied embeddings on the
    small variants (HF config carries tie_word_embeddings)."""

    attention_bias = True


class MistralForCausalLM(LlamaForCausalLM):
    """Mistral: Llama topology + sliding-window attention via config."""


_MODEL_REGISTRY: Dict[str, Type[LlamaForCausalLM]] = {
    "LlamaForCausalLM": LlamaForCausalLM,
    "MistralForCausalLM": MistralForCausalLM,
    "Qwen2ForCausalLM": Qwen2ForCausalLM,
}


def register_model(arch: str, cls) -> None:
    _MODEL_REGISTRY[arch] = cls


def get_supported_archs():
    return sorted(_MODEL_REGISTRY)


def get_model_class(model_config: ModelConfig):
    arch = model_config.architecture
    if arch not in _MODEL_REGISTRY:
        raise ValueError(
            f"model architecture {arch!r} is not supported yet. "
            f"Supported: {get_supported_archs()}")
    return _MODEL_REGISTRY[arch]
