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


class LlamaEmbeddingModel(LlamaForCausalLM):
    """Bare decoder used for embeddings (reference
    models/llama_embedding.py, e5-mistral-7b-instruct): checkpoints have
    no LM head, so the head ties to the embedding table (pooling never
    reads logits)."""

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        self.tie_word_embeddings = True


def _lazy(module: str, cls: str):
    def load():
        import importlib

        return getattr(
            importlib.import_module(f"aphrodite_tpu.models.{module}"), cls)

    return load


_MODEL_REGISTRY: Dict[str, Type[LlamaForCausalLM]] = {
    "LlamaForCausalLM": LlamaForCausalLM,
    "MistralForCausalLM": MistralForCausalLM,
    "Qwen2ForCausalLM": Qwen2ForCausalLM,
    # Llama-checkpoint aliases (reference models/__init__.py:11-36:
    # Aquila/AquilaChat2, InternLM v1, decapoda LLaMA, XVERSE all reuse
    # the llama graph + naming).
    "AquilaModel": LlamaForCausalLM,
    "AquilaForCausalLM": LlamaForCausalLM,
    "InternLMForCausalLM": LlamaForCausalLM,
    "LLaMAForCausalLM": LlamaForCausalLM,
    "XverseForCausalLM": LlamaForCausalLM,
    # Embedding models (reference _EMBEDDING_MODELS: MistralModel ->
    # LlamaEmbeddingModel); served via the pooling runner.
    "MistralModel": LlamaEmbeddingModel,
    "LlamaModel": LlamaEmbeddingModel,
}

# Lazily imported architectures (reference models/__init__.py lazy import).
_LAZY_REGISTRY = {
    "Qwen3ForCausalLM": _lazy("qwen3", "Qwen3ForCausalLM"),
    "Starcoder2ForCausalLM": _lazy("starcoder2",
                                   "Starcoder2ForCausalLM"),
    "Olmo2ForCausalLM": _lazy("olmo2", "Olmo2ForCausalLM"),
    "MambaForCausalLM": _lazy("mamba", "MambaForCausalLM"),
    "JambaForCausalLM": _lazy("jamba", "JambaForCausalLM"),
    "MixtralForCausalLM": _lazy("mixtral", "MixtralForCausalLM"),
    "GemmaForCausalLM": _lazy("gemma", "GemmaForCausalLM"),
    "Gemma2ForCausalLM": _lazy("gemma", "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": _lazy("gemma", "Gemma3ForCausalLM"),
    "Phi3ForCausalLM": _lazy("phi3", "Phi3ForCausalLM"),
    "LlavaForConditionalGeneration": _lazy(
        "llava", "LlavaForConditionalGeneration"),
    "LlavaNextForConditionalGeneration": _lazy(
        "llava_next", "LlavaNextForConditionalGeneration"),
    "BloomForCausalLM": _lazy("bloom", "BloomForCausalLM"),
    "MptForCausalLM": _lazy("mpt", "MPTForCausalLM"),
    "MPTForCausalLM": _lazy("mpt", "MPTForCausalLM"),
    "OPTForCausalLM": _lazy("opt", "OPTForCausalLM"),
    "GPT2LMHeadModel": _lazy("gpt2", "GPT2LMHeadModel"),
    "QWenLMHeadModel": _lazy("qwen", "QWenLMHeadModel"),
    "ChatGLMForConditionalGeneration":
        _lazy("chatglm", "ChatGLMForConditionalGeneration"),
    "ChatGLMModel": _lazy("chatglm", "ChatGLMForConditionalGeneration"),
    "EAGLEModel": _lazy("eagle", "EAGLEModel"),
    "Blip2ForConditionalGeneration":
        _lazy("blip2", "Blip2ForConditionalGeneration"),
    "ChameleonForConditionalGeneration":
        _lazy("chameleon", "ChameleonForConditionalGeneration"),
    "ChameleonForCausalLM":
        _lazy("chameleon", "ChameleonForConditionalGeneration"),
    "InternVLForConditionalGeneration":
        _lazy("internvl", "InternVLForConditionalGeneration"),
    # Remote-code OpenGVLab serialization (reference internvl.py:340):
    # same graph, alternate config/weight spellings.
    "InternVLChatModel":
        _lazy("internvl", "InternVLForConditionalGeneration"),
    # mistral-format consolidated checkpoints (params.json translation
    # names the composite arch directly; reference pixtral.py:129).
    "PixtralForConditionalGeneration":
        _lazy("pixtral", "PixtralForConditionalGeneration"),
    "BartForConditionalGeneration":
        _lazy("bart", "BartForConditionalGeneration"),
    "BartModel": _lazy("bart", "BartForConditionalGeneration"),
    "MBartForConditionalGeneration":
        _lazy("bart", "MBartForConditionalGeneration"),
    "UltravoxModel": _lazy("ultravox", "UltravoxModel"),
    "Qwen2AudioForConditionalGeneration": _lazy(
        "qwen2_audio", "Qwen2AudioForConditionalGeneration"),
    "MolmoForCausalLM": _lazy("molmo", "MolmoForCausalLM"),
    "T5ForConditionalGeneration":
        _lazy("t5", "T5ForConditionalGeneration"),
    "T5WithLMHeadModel": _lazy("t5", "T5ForConditionalGeneration"),
    "WhisperForConditionalGeneration": _lazy(
        "whisper", "WhisperForConditionalGeneration"),
    "MiniCPMV": _lazy("minicpmv", "MiniCPMV"),
    "LlavaNextVideoForConditionalGeneration": _lazy(
        "llava_next_video", "LlavaNextVideoForConditionalGeneration"),
    "Qwen2VLForConditionalGeneration":
        _lazy("qwen2_vl", "Qwen2VLForConditionalGeneration"),
    "JAISLMHeadModel": _lazy("jais", "JAISLMHeadModel"),
    "PhiMoEForCausalLM": _lazy("phimoe", "PhiMoEForCausalLM"),
    "PhimoeForCausalLM": _lazy("phimoe", "PhiMoEForCausalLM"),
    "DeciLMForCausalLM": _lazy("decilm", "DeciLMForCausalLM"),
    "GPTNeoXForCausalLM": _lazy("gpt_neox", "GPTNeoXForCausalLM"),
    "PhiForCausalLM": _lazy("phi", "PhiForCausalLM"),
    "CohereForCausalLM": _lazy("cohere", "CohereForCausalLM"),
    "GPTJForCausalLM": _lazy("gptj", "GPTJForCausalLM"),
    "StableLmForCausalLM": _lazy("stablelm", "StableLmForCausalLM"),
    "FalconForCausalLM": _lazy("falcon", "FalconForCausalLM"),
    "RWForCausalLM": _lazy("falcon", "FalconForCausalLM"),
    "GPTBigCodeForCausalLM": _lazy("gpt_bigcode",
                                   "GPTBigCodeForCausalLM"),
    "Qwen3MoeForCausalLM": _lazy("qwen3_moe", "Qwen3MoeForCausalLM"),
    "GraniteForCausalLM": _lazy("granite", "GraniteForCausalLM"),
    "OlmoeForCausalLM": _lazy("olmoe", "OlmoeForCausalLM"),
    "Qwen2MoeForCausalLM": _lazy("qwen2_moe", "Qwen2MoeForCausalLM"),
    "NemotronForCausalLM": _lazy("nemotron", "NemotronForCausalLM"),
    "DbrxForCausalLM": _lazy("dbrx", "DbrxForCausalLM"),
    "GlmForCausalLM": _lazy("glm", "GlmForCausalLM"),
    "PersimmonForCausalLM": _lazy("persimmon", "PersimmonForCausalLM"),
    "OlmoForCausalLM": _lazy("olmo", "OlmoForCausalLM"),
    "GraniteMoeForCausalLM": _lazy("granitemoe",
                                   "GraniteMoeForCausalLM"),
    "ArcticForCausalLM": _lazy("arctic", "ArcticForCausalLM"),
    "DeepseekV3ForCausalLM": _lazy("deepseek",
                                   "DeepseekV3ForCausalLM"),
    "DeepseekV2ForCausalLM": _lazy("deepseek",
                                   "DeepseekV2ForCausalLM"),
    "DeepseekForCausalLM": _lazy("deepseek", "DeepseekForCausalLM"),
    "Mamba2ForCausalLM": _lazy("mamba2", "Mamba2ForCausalLM"),
    "SmolLM3ForCausalLM": _lazy("smollm3", "SmolLM3ForCausalLM"),
    "ExaoneForCausalLM": _lazy("exaone", "ExaoneForCausalLM"),
    "OrionForCausalLM": _lazy("orion", "OrionForCausalLM"),
    "InternLM2ForCausalLM": _lazy("internlm2", "InternLM2ForCausalLM"),
    "BaiChuanForCausalLM": _lazy("baichuan", "BaiChuanForCausalLM"),
    "BaichuanForCausalLM": _lazy("baichuan", "BaichuanForCausalLM"),
    "MiniCPMForCausalLM": _lazy("minicpm", "MiniCPMForCausalLM"),
    "Phi3SmallForCausalLM": _lazy("phi3small", "Phi3SmallForCausalLM"),
    "PaliGemmaForConditionalGeneration": _lazy(
        "paligemma", "PaliGemmaForConditionalGeneration"),
    "FuyuForCausalLM": _lazy("fuyu", "FuyuForCausalLM"),
    "Phi3VForCausalLM": _lazy("phi3v", "Phi3VForCausalLM"),
    "MiniCPM3ForCausalLM": _lazy("minicpm", "MiniCPM3ForCausalLM"),
    "SolarForCausalLM": _lazy("solar", "SolarForCausalLM"),
    "QuantMixtralForCausalLM": _lazy("mixtral", "MixtralForCausalLM"),
    "StableLMEpochForCausalLM": _lazy("stablelm", "StableLmForCausalLM"),
    "StablelmForCausalLM": _lazy("stablelm", "StableLmForCausalLM"),
}


def register_model(arch: str, cls) -> None:
    _MODEL_REGISTRY[arch] = cls


def get_supported_archs():
    return sorted(set(_MODEL_REGISTRY) | set(_LAZY_REGISTRY))


def get_model_class(model_config: ModelConfig):
    arch = model_config.architecture
    if arch == "QWenLMHeadModel" and isinstance(
            model_config.hf_config.get("visual"), dict):
        # Qwen-VL: the same arch string as text QWen, plus a "visual"
        # config block.
        from aphrodite_tpu.models.qwen import QWenVL

        return QWenVL
    if arch == "Blip2ForConditionalGeneration" and "t5" in str(
            model_config.hf_config.get("model_type", "")):
        # Flan-T5-decoder BLIP-2 (hoisted text model_type is t5).
        from aphrodite_tpu.models.blip2 import (
            Blip2T5ForConditionalGeneration)

        return Blip2T5ForConditionalGeneration
    if arch == "LlavaForConditionalGeneration":
        # HF-format Pixtral ships under the Llava composite arch with a
        # pixtral vision tower (e.g. mistral-community/pixtral-12b).
        vc = model_config.hf_config.get("vision_config") or {}
        if vc.get("model_type") == "pixtral":
            from aphrodite_tpu.models.pixtral import (
                PixtralForConditionalGeneration)

            return PixtralForConditionalGeneration
    if arch == "MiniCPMV":
        # Version routing (reference minicpmv.py:239-250: explicit
        # config.version, else the 2.0 shape fingerprint).
        hf = model_config.hf_config
        ver = hf.get("version")
        if ver is None:
            ver = 2.0 if (hf.get("hidden_size") == 2304
                          and hf.get("query_num") == 64) else 2.5
        if float(ver) < 2.5:
            from aphrodite_tpu.models.minicpmv import MiniCPMV2_0

            return MiniCPMV2_0
    if arch in _MODEL_REGISTRY:
        return _MODEL_REGISTRY[arch]
    if arch in _LAZY_REGISTRY:
        return _LAZY_REGISTRY[arch]()
    raise ValueError(
        f"model architecture {arch!r} is not supported yet. "
        f"Supported: {get_supported_archs()}")
