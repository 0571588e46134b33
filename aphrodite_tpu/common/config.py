"""Engine configuration dataclasses.

TPU-native counterpart of the reference's 11 config objects
(``aphrodite/common/config.py:76-2018``). The set is smaller because whole
subsystems collapse under XLA (no CUDA-graph config, no NCCL backend
selection); parallelism is described as a device-mesh shape instead of
per-backend process groups.
"""

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.utils import cdiv

logger = init_logger(__name__)

_SUPPORTED_DTYPES = ("bfloat16", "float16", "float32")
# KV-cache dtypes: reference supports auto/fp8(_e4m3)/fp8_e5m2
# (common/config.py:772-782) plus int8 at the kernel level.
_SUPPORTED_KV_DTYPES = ("auto", "bfloat16", "fp8", "fp8_e4m3", "fp8_e5m2",
                        "int8")


def _read_hf_config(model: str) -> Dict[str, Any]:
    """Read a HuggingFace config.json from a local directory, or
    synthesize one from GGUF metadata when `model` is a .gguf file."""
    if model.endswith(".gguf"):
        from aphrodite_tpu.loader.gguf import gguf_to_hf_config

        return gguf_to_hf_config(model)
    path = os.path.join(model, "config.json")
    if not os.path.isfile(path):
        params = os.path.join(model, "params.json")
        if os.path.isfile(params):
            return _params_json_to_hf_config(params)
        raise FileNotFoundError(
            f"Could not find config.json under {model!r}. Only local model "
            "directories are supported in this environment (no network).")
    with open(path) as f:
        return json.load(f)


def _params_json_to_hf_config(path: str) -> Dict[str, Any]:
    """Translate a mistral-format params.json into HF config keys
    (reference transformers_utils/config.py:186-245 load_params_config):
    consolidated.safetensors checkpoints from Mistral releases, incl.
    Pixtral (vision_encoder block -> LLaVA-style composite)."""
    with open(path) as f:
        raw = json.load(f)
    key_map = {
        "dim": "hidden_size",
        "norm_eps": "rms_norm_eps",
        "n_kv_heads": "num_key_value_heads",
        "n_layers": "num_hidden_layers",
        "n_heads": "num_attention_heads",
        "hidden_dim": "intermediate_size",
    }

    def remap(node):
        if isinstance(node, dict):
            return {key_map.get(k, k): remap(v) for k, v in node.items()}
        return node

    cfg = remap(raw)
    cfg["hidden_act"] = cfg.pop("activation", "silu")
    cfg["tie_word_embeddings"] = cfg.pop("tie_embeddings", False)
    cfg.setdefault("max_position_embeddings",
                   cfg.get("max_seq_len", 128_000))
    moe = cfg.pop("moe", None)
    if moe:
        cfg["architectures"] = ["MixtralForCausalLM"]
        cfg["model_type"] = "mixtral"
        cfg["num_local_experts"] = int(
            moe.get("num_experts", moe.get("num_local_experts", 8)))
        cfg["num_experts_per_tok"] = int(moe.get("num_experts_per_tok", 2))
    else:
        cfg["architectures"] = ["MistralForCausalLM"]
        cfg["model_type"] = "mistral"
    if cfg.get("vision_encoder") is not None:
        vision = cfg.pop("vision_encoder")
        cfg = {"text_config": cfg, "vision_config": vision,
               "architectures": ["PixtralForConditionalGeneration"],
               "model_type": "pixtral"}
    cfg["_mistral_format"] = True
    return cfg


@dataclass
class ModelConfig:
    """Model architecture + checkpoint description.

    Reference: ModelConfig (common/config.py:76).
    """

    model: str
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    kv_cache_quant_targets: Optional[Tuple[int, int]] = None
    trust_remote_code: bool = False
    revision: Optional[str] = None
    enforce_eager: bool = False
    # Skip tokenizer loading; requests must pass prompt_token_ids
    # (reference ModelConfig.skip_tokenizer_init).
    skip_tokenizer_init: bool = False
    # Populated from config.json:
    hf_config: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.tokenizer is None:
            self.tokenizer = self.model
        if not self.hf_config:
            self.hf_config = _read_hf_config(self.model)
        if (self.hf_config.get("_mistral_format")
                and not self.skip_tokenizer_init
                and not os.path.isfile(os.path.join(
                    str(self.tokenizer), "tokenizer_config.json"))):
            if os.path.isfile(os.path.join(str(self.tokenizer),
                                           "tekken.json")):
                # tekken.json parses natively (transformers_utils/
                # tekken.py) — full text serving.
                pass
            else:
                # Sentencepiece .model.v* tokenizers still need an HF
                # twin; serve token-id-only.
                logger.warning(
                    "mistral-format checkpoint without an HF or tekken "
                    "tokenizer: pass prompt_token_ids (or set "
                    "tokenizer=<hf dir>)")
                self.skip_tokenizer_init = True
        if ("llm_config" in self.hf_config
                and "vision_config" in self.hf_config
                and "text_config" not in self.hf_config):
            # Remote-code InternVLChatModel spells the text config
            # "llm_config" (reference configs/internvl.py).
            self.hf_config["text_config"] = self.hf_config.pop(
                "llm_config")
        if ("text_config" in self.hf_config
                and ("vision_config" in self.hf_config
                     or "audio_config" in self.hf_config)):
            # Multimodal composite config (LLaVA-style): hoist the text
            # config's fields so the derived accessors (hidden size, kv
            # heads, vocab...) describe the language model, keeping the
            # vision_config + projector keys at the top level. The text
            # config wins conflicts — composite configs serialize junk
            # top-level defaults (e.g. PaliGemma's hidden_size: 2048) —
            # except "architectures", which names the composite arch.
            top = {k: v for k, v in self.hf_config.items()
                   if k != "text_config"}
            merged = {**top, **dict(self.hf_config["text_config"])}
            if "architectures" in top:
                merged["architectures"] = top["architectures"]
            self.hf_config = merged
        if (self.hf_config.get("model_type") == "eagle"
                and isinstance(self.hf_config.get("model"), dict)):
            # EAGLE draft config nests the wrapped model's config under
            # "model" (reference transformers_utils/configs/eagle.py);
            # hoist its keys so the derived accessors work. Top-level
            # keys win (EAGLEConfig applies kwargs onto the nested
            # config), except architectures stays ["EAGLEModel"].
            nested = dict(self.hf_config["model"])
            merged = {**nested, **self.hf_config}
            self.hf_config = merged
        if self.dtype == "auto":
            self.dtype = str(self.hf_config.get("torch_dtype", "bfloat16"))
            if self.dtype.startswith("torch."):
                self.dtype = self.dtype[len("torch."):]
            if self.dtype == "float16":
                # On TPU, bf16 is the native 16-bit type; fp16 checkpoints
                # are loaded and run as bf16 (same as reference TPU path).
                self.dtype = "bfloat16"
        if self.dtype not in _SUPPORTED_DTYPES:
            raise ValueError(f"unsupported dtype {self.dtype!r}")
        derived_max = int(
            self.hf_config.get("max_position_embeddings")
            or self.hf_config.get("n_positions")
            or self.hf_config.get("max_seq_len")
            or self.hf_config.get("seq_length") or 2048)
        if self.max_model_len is None:
            self.max_model_len = derived_max
        elif self.max_model_len > derived_max:
            rope_scaling = self.hf_config.get("rope_scaling")
            if not rope_scaling:
                logger.warning(
                    "max_model_len %d exceeds the model's "
                    "max_position_embeddings %d", self.max_model_len,
                    derived_max)
        if self.quantization is None:
            qcfg = self.hf_config.get("quantization_config")
            if qcfg:
                self.quantization = str(qcfg.get("quant_method", "")) or None
        if self.quantization in ("gptq", "marlin", "gptq_marlin_24"):
            # autogptq marlin serializations override the method name
            # (reference marlin.py:88-111 / gptq_marlin_24.py:105-119).
            qcfg = self.hf_config.get("quantization_config") or {}
            fmt_ = qcfg.get("checkpoint_format")
            if fmt_ == "marlin" or qcfg.get("is_marlin_format", False):
                self.quantization = "marlin"
            elif fmt_ == "marlin_24":
                self.quantization = "gptq_marlin_24"
        if self.quantization is None and not self.model.endswith(".gguf"):
            # SqueezeLLM ships a side quant_config.json instead of a
            # quantization_config block (reference squeezellm.py
            # get_config_filenames).
            qc_path = os.path.join(self.model, "quant_config.json")
            if os.path.isfile(qc_path):
                with open(qc_path) as f:
                    qc = json.load(f)
                if "wbits" in qc:
                    self.quantization = "squeezellm"
                elif "bits" in qc:
                    # DeepSpeedFP side file (reference deepspeedfp.py
                    # get_config_filenames: quant_config.json with
                    # bits/group_size).
                    self.quantization = "deepspeedfp"
            # QuIP# ships a side quantization_config.json with a
            # codebook key (reference quip.py get_config_filenames).
            qp_path = os.path.join(self.model, "quantization_config.json")
            if self.quantization is None and os.path.isfile(qp_path):
                with open(qp_path) as f:
                    qp = json.load(f)
                if "codebook" in qp:
                    self.quantization = "quip"
                    self.quip_config = qp

    # ---- derived architecture accessors ------------------------------------

    @property
    def architecture(self) -> str:
        archs = self.hf_config.get("architectures") or ["LlamaForCausalLM"]
        return archs[0]

    def get_hidden_size(self) -> int:
        return int(self.hf_config.get("hidden_size")
                   or self.hf_config.get("d_model"))

    def get_num_layers(self) -> int:
        return int(self.hf_config.get("num_hidden_layers")
                   or self.hf_config.get("n_layer")
                   or self.hf_config.get("n_layers")
                   or self.hf_config.get("num_layers"))

    def get_num_attention_heads(self) -> int:
        # Attention-free (SSM) configs have no heads; report 1 so
        # divisibility checks trivially pass.
        return int(self.hf_config.get("num_attention_heads")
                   or self.hf_config.get("n_head")
                   or self.hf_config.get("n_heads")
                   or self.hf_config.get("decoder_attention_heads")
                   or self.hf_config.get("num_heads") or 1)

    def get_total_num_kv_heads(self) -> int:
        return int(
            self.hf_config.get("num_key_value_heads",
                               self.get_num_attention_heads()))

    def get_num_kv_heads(self, tp_size: int = 1) -> int:
        """KV heads per model-parallel shard (>=1; heads are replicated when
        tp_size exceeds total kv heads, as in the reference)."""
        return max(1, self.get_total_num_kv_heads() // tp_size)

    def get_head_size(self) -> int:
        if "head_dim" in self.hf_config and self.hf_config["head_dim"]:
            return int(self.hf_config["head_dim"])
        return self.get_hidden_size() // self.get_num_attention_heads()

    def get_vocab_size(self) -> int:
        return int(self.hf_config.get("vocab_size")
                   or self.hf_config.get("padded_vocab_size"))

    def get_sliding_window(self) -> Optional[int]:
        if self.hf_config.get("use_sliding_window") is False:
            return None
        return self.hf_config.get("sliding_window")


@dataclass
class CacheConfig:
    """Paged KV cache configuration (reference CacheConfig,
    common/config.py:607)."""

    block_size: int = 16
    hbm_utilization: float = 0.9
    cache_dtype: str = "auto"
    num_device_blocks: Optional[int] = None  # set after memory profiling
    enable_prefix_caching: bool = False
    # JSON file of per-layer KV scales (reference --quantization-param-path,
    # weight_utils.py:504 kv_cache_scales_loader schema).
    quantization_param_path: Optional[str] = None
    # Override the profiled block count (useful for tests / CPU runs).
    num_device_blocks_override: Optional[int] = None

    def __post_init__(self) -> None:
        if self.block_size <= 0:
            raise ValueError("block_size must be positive")
        if not 0.0 < self.hbm_utilization <= 1.0:
            raise ValueError("hbm_utilization must be in (0, 1]")
        if self.cache_dtype not in _SUPPORTED_KV_DTYPES:
            raise ValueError(
                f"unsupported kv cache dtype {self.cache_dtype!r}; choose "
                f"from {_SUPPORTED_KV_DTYPES}")


@dataclass
class ParallelConfig:
    """Device-mesh description.

    Replaces the reference's process-group plumbing
    (aphrodite/distributed/parallel_state.py): parallelism is a
    `jax.sharding.Mesh` over axes ("data", "model"); XLA inserts the
    collectives the reference implements with NCCL/custom all-reduce.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Pipeline parallelism maps to an additional mesh axis / stage sharding;
    # kept in the config surface for parity, wired up in later stages.
    pipeline_parallel_size: int = 1
    # Context parallelism (beyond the reference, which has no SP/CP):
    # long-prompt PREFILL chunks shard their query tokens across chips
    # (weights and KV pages replicated; per-layer K/V all-gather), so
    # prefill latency scales ~cp-ways while decode runs replicated.
    # Mutually exclusive with tp/pp/dp in this version.
    context_parallel_size: int = 1

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size)

    def mesh_shape(self) -> Dict[str, int]:
        return {
            "data": self.data_parallel_size,
            "pipe": self.pipeline_parallel_size,
            "model": self.tensor_parallel_size,
        }


@dataclass
class SchedulerConfig:
    """Continuous-batching policy knobs (reference SchedulerConfig,
    common/config.py:1066)."""

    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_model_len: int = 2048
    enable_chunked_prefill: bool = True
    # Upper bound of scheduler steps executed per schedule() call
    # (multi-step decoding). 1 = classic per-token scheduling.
    num_scheduler_steps: int = 1
    preemption_mode: str = "recompute"
    # Prefill admission hold-off (reference --scheduler-delay-factor,
    # processing/scheduler.py:1399 _passed_delay): a waiting prompt is
    # admitted only once its age exceeds delay_factor x the last prompt
    # iteration's latency (or nothing is running). On TPU this matters
    # MORE than on GPU: multi-step decode windows only fuse on
    # pure-decode iterations, so back-to-back prompt admissions under
    # continuous arrivals degrade decode to single-step scheduling.
    delay_factor: float = 0.0

    def __post_init__(self) -> None:
        if self.max_num_batched_tokens is None:
            if self.enable_chunked_prefill:
                self.max_num_batched_tokens = max(512, self.max_num_seqs)
            else:
                self.max_num_batched_tokens = max(self.max_model_len, 2048)
        if not self.enable_chunked_prefill:
            # Without chunked prefill, a whole prompt must fit in a step.
            self.max_num_batched_tokens = max(self.max_num_batched_tokens,
                                              self.max_model_len)
        if self.max_num_batched_tokens < self.max_num_seqs:
            logger.warning(
                "max_num_batched_tokens (%d) < max_num_seqs (%d); decode "
                "batches will be capped by the token budget",
                self.max_num_batched_tokens, self.max_num_seqs)
        if self.preemption_mode != "recompute":
            raise ValueError(
                "only preemption_mode='recompute' is supported on TPU")


@dataclass
class LoRAConfig:
    """Multi-LoRA serving limits (reference aphrodite/lora/)."""

    max_loras: int = 4
    max_lora_rank: int = 16

    def __post_init__(self) -> None:
        if self.max_loras < 1:
            raise ValueError("max_loras must be >= 1")
        if self.max_lora_rank < 1:
            raise ValueError("max_lora_rank must be >= 1")


@dataclass
class PromptAdapterConfig:
    """Soft-prompt adapter limits (reference aphrodite/prompt_adapter/)."""

    max_prompt_adapters: int = 4
    max_prompt_adapter_token: int = 64


@dataclass
class SpeculativeConfig:
    """Speculative decoding (reference aphrodite/spec_decode/, §2.10).

    Two proposers share one in-graph verify path
    (sampling/spec_verify.py):
    - "ngram": prompt-lookup proposals (reference NGramWorker), host-side
      and free; rows without a match fall back to plain decode.
    - "draft": a small draft model (reference MultiStepWorker) proposes k
      tokens via a fused on-device scan; every row always gets k
      proposals. The draft keeps its own paged KV cache that shares the
      target's page tables, and runs alongside every prefill so no
      catch-up pass is ever needed (accepted proposals wrote exactly the
      right draft KV during proposal).
    """

    method: str = "ngram"
    num_speculative_tokens: int = 5
    ngram_prompt_lookup_max: int = 4
    ngram_prompt_lookup_min: int = 1
    # method == "draft": the draft model's config (built by EngineArgs).
    draft_model_config: Optional["ModelConfig"] = None
    # Draft tensor parallelism (reference
    # spec_decode/smaller_tp_proposer_worker.py:16, which likewise
    # supports 1 or the target's tp): 1 runs the draft REPLICATED on
    # every device (no head sharding, no collectives — the right call
    # for tiny drafts and the only option when the draft's head count
    # doesn't divide the target's tp); None auto-picks: target tp when
    # it divides the draft's heads, else 1.
    draft_tensor_parallel_size: Optional[int] = None

    def __post_init__(self) -> None:
        if self.method not in ("ngram", "draft", "eagle", "medusa",
                               "mlp_speculator"):
            raise ValueError(
                f"speculative method {self.method!r} not supported (yet)")
        if self.method != "ngram" and self.draft_model_config is None:
            raise ValueError(
                f"{self.method} speculation needs draft_model_config")
        if self.num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1")
        if self.ngram_prompt_lookup_min > self.ngram_prompt_lookup_max:
            raise ValueError("ngram_prompt_lookup_min > max")
        if self.draft_tensor_parallel_size not in (None, 1):
            raise ValueError(
                "draft_tensor_parallel_size supports 1 (replicated) or "
                "None (auto: target tp when divisible, else 1) — the "
                "same surface as the reference's "
                "smaller_tp_proposer_worker")


@dataclass
class DeviceConfig:
    """Target platform: 'tpu' for real chips, 'cpu' for tests
    (XLA host platform, optionally with a forced virtual device count)."""

    device: str = "auto"

    def __post_init__(self) -> None:
        if self.device == "auto":
            import jax

            platform = jax.default_backend()
            self.device = "tpu" if platform in ("tpu", "axon") else "cpu"


@dataclass
class LoadConfig:
    """Weight-loading strategy (reference model_loader/loader.py:1120)."""

    load_format: str = "auto"  # auto|safetensors|gguf|dummy|sharded_state|mistral

    def __post_init__(self) -> None:
        if self.load_format not in ("auto", "safetensors", "gguf",
                                    "dummy", "sharded_state", "mistral"):
            raise ValueError(f"unknown load_format {self.load_format!r}")


@dataclass
class EngineConfig:
    model_config: ModelConfig
    cache_config: CacheConfig
    parallel_config: ParallelConfig
    scheduler_config: SchedulerConfig
    device_config: DeviceConfig
    load_config: LoadConfig
    speculative_config: Optional["SpeculativeConfig"] = None
    lora_config: Optional["LoRAConfig"] = None
    prompt_adapter_config: Optional["PromptAdapterConfig"] = None

    def __post_init__(self) -> None:
        if (self.speculative_config is not None
                and self.scheduler_config.num_scheduler_steps > 1):
            raise ValueError(
                "speculative decoding and multi-step scheduling are "
                "mutually exclusive (reference behaves the same)")
        # Cross-validation (reference EngineConfig.__post_init__ verify
        # chain, common/config.py:1980-2018).
        self.scheduler_config.max_model_len = min(
            self.scheduler_config.max_model_len,
            self.model_config.max_model_len)
        tp = self.parallel_config.tensor_parallel_size
        hf = self.model_config.hf_config
        if str(hf.get("model_type", "")).startswith(("mamba",
                                                     "falcon_mamba")):
            # Attention-free SSMs shard the channel axis, not heads.
            inner = int(hf.get("intermediate_size")
                        or 2 * hf.get("hidden_size", 0))
            if inner % tp != 0:
                raise ValueError(
                    f"SSM intermediate_size ({inner}) must be divisible "
                    f"by tensor_parallel_size ({tp})")
            # Mamba2 additionally shards per-head leaves (A_log, dt_bias)
            # on the head axis; intermediate_size % tp == 0 does not imply
            # num_heads % tp == 0 when head_dim shares factors with tp.
            ssm_heads = hf.get("num_heads")
            if ssm_heads is not None and int(ssm_heads) % tp != 0:
                raise ValueError(
                    f"SSM num_heads ({ssm_heads}) must be divisible by "
                    f"tensor_parallel_size ({tp})")
        else:
            heads = self.model_config.get_num_attention_heads()
            if heads % tp != 0:
                # Asymmetric TP (reference parallel_state.py:1200): our
                # SPMD form zero-pads whole KV groups instead of splitting
                # ranks unevenly; only architectures on the base
                # forward/param machinery support it.
                ok = False
                try:
                    from aphrodite_tpu.models.registry import \
                        get_model_class

                    cls = get_model_class(self.model_config)
                    ok = bool(getattr(cls, "supports_head_padding",
                                      lambda: False)())
                except Exception:
                    ok = False
                if not ok:
                    raise ValueError(
                        f"num_attention_heads ({heads}) must be divisible "
                        f"by tensor_parallel_size ({tp}) (this "
                        f"architecture does not support asymmetric-TP "
                        f"head padding)")
                if self.lora_config is not None:
                    raise ValueError(
                        "asymmetric TP (padded head groups) is not "
                        "supported together with LoRA adapters: adapter "
                        "B matrices are sized for the unpadded head "
                        "layout")
        pp = self.parallel_config.pipeline_parallel_size
        if pp > 1:
            layers = self.model_config.get_num_layers()
            if layers % pp != 0:
                raise ValueError(
                    f"num_hidden_layers ({layers}) must be divisible by "
                    f"pipeline_parallel_size ({pp})")
            # Combined pp x tp: the pipe stage body is a partial-manual
            # shard_map over {"pipe"}; the attention/MoE ops open nested
            # partial-manual shard_maps over {"model"} inside it.

    def max_pages_per_seq(self) -> int:
        return cdiv(self.model_config.max_model_len,
                    self.cache_config.block_size)
