"""EngineArgs: flat user-facing knobs -> typed config objects.

Reference: aphrodite/engine/args_tools.py:60 (EngineArgs with 87 CLI flags,
create_engine_config). The surface here keeps the same names where the
concept carries over to TPU; CUDA-specific flags (gpu-memory-utilization ->
hbm-utilization, enforce-eager, CUDA graph sizing) are either renamed or
intentionally absent.
"""

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

from aphrodite_tpu.common.config import (CacheConfig, DeviceConfig,
                                         EngineConfig, LoadConfig,
                                         LoRAConfig, ModelConfig,
                                         ParallelConfig,
                                         PromptAdapterConfig,
                                         SchedulerConfig,
                                         SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    dtype: str = "auto"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    trust_remote_code: bool = False
    skip_tokenizer_init: bool = False
    load_format: str = "auto"
    # KV cache.
    block_size: int = 16
    hbm_utilization: float = 0.9
    kv_cache_dtype: str = "auto"
    quantization_param_path: Optional[str] = None
    num_device_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = False
    # Parallelism.
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    context_parallel_size: int = 1
    # Scheduling.
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    enable_chunked_prefill: bool = True
    num_scheduler_steps: int = 1
    # Hold new-prompt admission until the oldest waiting request's age
    # exceeds delay_factor x the last prompt iteration's latency
    # (reference --scheduler-delay-factor). Lets fused multi-step
    # decode windows run between prompt batches under continuous load.
    scheduler_delay_factor: float = 0.0
    # LoRA.
    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16
    # Long-context LoRA: rope scaling factors to preallocate table
    # regions for (reference long_lora_scaling_factors); adapters
    # declaring context_length = factor * max_position_embeddings can
    # then be served (models/llama.py long_lora_rope_offsets).
    long_lora_scaling_factors: Optional[Tuple[float, ...]] = None
    # Prompt adapters (soft prompts).
    enable_prompt_adapter: bool = False
    max_prompt_adapters: int = 4
    max_prompt_adapter_token: int = 64
    # Speculative decoding.
    speculative_model: Optional[str] = None  # "[ngram]"
    num_speculative_tokens: int = 5
    ngram_prompt_lookup_max: int = 4
    ngram_prompt_lookup_min: int = 1
    # Device.
    device: str = "auto"

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            dtype=self.dtype,
            seed=self.seed,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            trust_remote_code=self.trust_remote_code,
            skip_tokenizer_init=self.skip_tokenizer_init,
        )
        if self.long_lora_scaling_factors:
            factors = self.long_lora_scaling_factors
            if isinstance(factors, str):
                factors = [p for p in factors.split(",") if p.strip()]
            model_config.long_lora_scaling_factors = tuple(
                float(f) for f in factors)
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.hbm_utilization,
            cache_dtype=self.kv_cache_dtype,
            enable_prefix_caching=self.enable_prefix_caching,
            num_device_blocks_override=self.num_device_blocks_override,
            quantization_param_path=self.quantization_param_path,
        )
        parallel_config = ParallelConfig(
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            pipeline_parallel_size=self.pipeline_parallel_size,
            context_parallel_size=self.context_parallel_size,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            enable_chunked_prefill=self.enable_chunked_prefill,
            num_scheduler_steps=self.num_scheduler_steps,
            delay_factor=self.scheduler_delay_factor,
        )
        speculative_config = None
        if self.speculative_model is not None:
            if self.speculative_model == "[ngram]":
                speculative_config = SpeculativeConfig(
                    method="ngram",
                    num_speculative_tokens=self.num_speculative_tokens,
                    ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
                    ngram_prompt_lookup_min=self.ngram_prompt_lookup_min,
                )
            else:
                # Model-based speculation: a small draft LM (reference
                # MultiStepWorker) or a hidden-state proposer (Medusa /
                # MLPSpeculator) — detected from the checkpoint's
                # architectures. All serve the SAME token space at the
                # target's context length, in the target's dtype.
                draft_config = ModelConfig(
                    model=self.speculative_model,
                    tokenizer=self.tokenizer or self.model,
                    dtype=model_config.dtype,
                    seed=self.seed,
                    max_model_len=model_config.max_model_len,
                    trust_remote_code=self.trust_remote_code,
                    skip_tokenizer_init=True,
                )
                if (draft_config.get_vocab_size()
                        != model_config.get_vocab_size()):
                    raise ValueError(
                        "draft model vocab size "
                        f"({draft_config.get_vocab_size()}) must match "
                        f"the target ({model_config.get_vocab_size()})")
                from aphrodite_tpu.spec_decode.proposers import (
                    PROPOSER_ARCHS)

                archs = draft_config.hf_config.get("architectures") or []
                method = "draft"
                if archs and archs[0] in PROPOSER_ARCHS:
                    method = PROPOSER_ARCHS[archs[0]][0]
                elif archs and archs[0] == "EAGLEModel":
                    method = "eagle"
                speculative_config = SpeculativeConfig(
                    method=method,
                    num_speculative_tokens=self.num_speculative_tokens,
                    draft_model_config=draft_config,
                )
        return EngineConfig(
            model_config=model_config,
            cache_config=cache_config,
            parallel_config=parallel_config,
            scheduler_config=scheduler_config,
            device_config=DeviceConfig(device=self.device),
            load_config=LoadConfig(load_format=self.load_format),
            speculative_config=speculative_config,
            lora_config=(LoRAConfig(max_loras=self.max_loras,
                                    max_lora_rank=self.max_lora_rank)
                         if self.enable_lora else None),
            prompt_adapter_config=(PromptAdapterConfig(
                max_prompt_adapters=self.max_prompt_adapters,
                max_prompt_adapter_token=self.max_prompt_adapter_token)
                if self.enable_prompt_adapter else None),
        )

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in dataclasses.fields(EngineArgs):
            if f.name == "model":
                continue  # the CLI provides `model` as a positional
            name = "--" + f.name.replace("_", "-")
            ftype = str(f.type)
            if "bool" in ftype:
                parser.add_argument(name, action="store_true",
                                    default=f.default)
            elif "Tuple" in ftype:
                # e.g. --long-lora-scaling-factors 2.0,4.0
                parser.add_argument(name, type=str, default=f.default)
            elif "int" in ftype:
                parser.add_argument(name, type=int, default=f.default)
            elif "float" in ftype:
                parser.add_argument(name, type=float, default=f.default)
            else:
                parser.add_argument(name, type=str, default=f.default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{
            k: v for k, v in vars(args).items() if k in fields})
