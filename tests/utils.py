"""Test helpers: tiny local HF checkpoints (no network), batch builders.

Mirrors the reference's HfRunner-vs-AphroditeRunner strategy
(tests/conftest.py:239,588): HuggingFace transformers on CPU is the ground
truth; our engine must match its greedy tokens / logits.
"""

import json
import os
from typing import List, Optional

import numpy as np

TINY_LLAMA_KWARGS = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def make_tiny_tokenizer(save_dir: str, vocab_size: int = 256) -> None:
    """Train a tiny byte-level BPE tokenizer offline and save HF files."""
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<s>", "</s>", "<pad>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world, this is a tiny tokenizer",
        "one two three four five six seven eight nine ten",
    ] * 10
    tok.train_from_iterator(corpus, trainer)
    tok.save(os.path.join(save_dir, "tokenizer.json"))
    with open(os.path.join(save_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "pad_token": "<pad>",
                "model_max_length": 128,
            }, f)
    with open(os.path.join(save_dir, "special_tokens_map.json"), "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>",
                   "pad_token": "<pad>"}, f)


def make_tiny_llama_checkpoint(save_dir: str, seed: int = 0,
                               **overrides) -> None:
    """Create a random-weight tiny Llama HF checkpoint (safetensors)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    kwargs = dict(TINY_LLAMA_KWARGS)
    kwargs.update(overrides)
    torch.manual_seed(seed)
    config = LlamaConfig(**kwargs)
    model = LlamaForCausalLM(config)
    model = model.to(torch.float32)
    model.save_pretrained(save_dir, safe_serialization=True)
    make_tiny_tokenizer(save_dir, vocab_size=kwargs["vocab_size"])


def make_tiny_eagle_checkpoint(save_dir: str, seed: int = 7,
                               num_hidden_layers: int = 1,
                               include_norm: bool = True,
                               truncated_vocab: int = 0) -> None:
    """EAGLE draft checkpoint over the tiny-llama target geometry, in
    the vLLM-compatible layout (fc.weight + model.* + lm_head.weight;
    reference eagle.py:120 load_weights) with EAGLEConfig's nested
    "model" config format."""
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig

    kwargs = dict(TINY_LLAMA_KWARGS)
    kwargs["num_hidden_layers"] = num_hidden_layers
    torch.manual_seed(seed)
    from transformers import LlamaForCausalLM

    inner = LlamaForCausalLM(LlamaConfig(**kwargs)).to(torch.float32)
    sd = {k: v.contiguous() for k, v in inner.state_dict().items()}
    if not include_norm:
        # EAGLE checkpoints trained without a final norm omit it; the
        # loader must default to a unit RMSNorm scale.
        sd.pop("model.norm.weight")
    H = kwargs["hidden_size"]
    fc = torch.randn(H, 2 * H, dtype=torch.float32) * 0.05
    # Bias fc toward passing the token embedding through, so the draft
    # behaves llama-like instead of emitting pure noise.
    fc[:, :H] += torch.eye(H)
    sd["fc.weight"] = fc
    if truncated_vocab:
        # Top-k frequent-token draft vocab: lm_head shrinks to the
        # mapped rows and token_map carries their full-vocab ids.
        token_map = torch.arange(0, 2 * truncated_vocab, 2)
        sd["token_map"] = token_map
        sd["lm_head.weight"] = sd["lm_head.weight"][token_map].contiguous()
    os.makedirs(save_dir, exist_ok=True)
    save_file(sd, os.path.join(save_dir, "model.safetensors"))
    cfg = {
        "architectures": ["EAGLEModel"],
        "model_type": "eagle",
        "model": json.loads(LlamaConfig(**kwargs).to_json_string()),
        "truncated_vocab_size": truncated_vocab or kwargs["vocab_size"],
        "vocab_size": kwargs["vocab_size"],
    }
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(save_dir, vocab_size=kwargs["vocab_size"])


def make_tiny_checkpoint(save_dir: str, config, seed: int = 0) -> None:
    """Save a tiny random-weight checkpoint for any HF architecture."""
    import torch
    from transformers import AutoModelForCausalLM

    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(config)
    model = model.to(torch.float32)
    model.save_pretrained(save_dir, safe_serialization=True)
    make_tiny_tokenizer(save_dir, vocab_size=config.vocab_size)


def hf_greedy_generate(model_dir: str, prompt_ids: List[int],
                       max_new_tokens: int) -> List[int]:
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    input_ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids,
            max_new_tokens=max_new_tokens,
            do_sample=False,
            num_beams=1,
            pad_token_id=2,
        )
    return out[0, len(prompt_ids):].tolist()


def hf_full_logits(model_dir: str, token_ids: List[int]) -> np.ndarray:
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(model_dir,
                                             torch_dtype=torch.float32)
    model.eval()
    input_ids = torch.tensor([token_ids], dtype=torch.long)
    with torch.no_grad():
        logits = model(input_ids).logits
    return logits[0].float().numpy()
