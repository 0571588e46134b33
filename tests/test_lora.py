"""Multi-LoRA serving tests vs HF+PEFT ground truth.

Reference analog: tests/lora/* — adapter outputs must match the merged
(base + BA) model; base requests must be unaffected; multiple adapters
mix in one batch.
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from aphrodite_tpu.lora import LoRARequest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Tiny base model + two random LoRA adapters saved in PEFT format."""
    import torch
    from transformers import AutoModelForCausalLM
    from peft import LoraConfig, get_peft_model

    from tests.utils import make_tiny_llama_checkpoint

    base_dir = str(tmp_path_factory.mktemp("lora_base"))
    make_tiny_llama_checkpoint(base_dir)

    adapters = {}
    for idx, name in enumerate(["alpha", "beta"]):
        torch.manual_seed(100 + idx)
        model = AutoModelForCausalLM.from_pretrained(
            base_dir, torch_dtype=torch.float32)
        cfg = LoraConfig(
            r=8, lora_alpha=16,
            target_modules=["q_proj", "v_proj", "gate_proj", "down_proj"],
            init_lora_weights=False,  # random non-zero B: real deltas
        )
        peft_model = get_peft_model(model, cfg)
        adir = str(tmp_path_factory.mktemp(f"adapter_{name}"))
        peft_model.save_pretrained(adir)
        adapters[name] = adir
    return base_dir, adapters


def hf_lora_greedy(base_dir, adapter_dir, prompt_ids, max_new):
    import torch
    from transformers import AutoModelForCausalLM
    from peft import PeftModel

    model = AutoModelForCausalLM.from_pretrained(base_dir,
                                                 torch_dtype=torch.float32)
    model = PeftModel.from_pretrained(model, adapter_dir,
                                      torch_dtype=torch.float32)
    model = model.merge_and_unload()
    model.eval()
    input_ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(input_ids, max_new_tokens=max_new,
                             do_sample=False, num_beams=1, pad_token_id=2)
    return out[0, len(prompt_ids):].tolist()


def test_lora_matches_hf_peft(setup):
    base_dir, adapters = setup
    llm = LLM(model=base_dir, dtype="float32", enable_lora=True,
              max_loras=2, max_lora_rank=8, max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "the quick brown fox"
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    req = LoRARequest("alpha", 1, adapters["alpha"])
    got = llm.generate([prompt], sp,
                       lora_request=req)[0].outputs[0].token_ids
    expect = hf_lora_greedy(base_dir, adapters["alpha"],
                            tok.encode(prompt), 8)
    assert got == expect

    # Base model requests must be unaffected by loaded adapters.
    from tests.utils import hf_greedy_generate

    base_got = llm.generate([prompt], sp)[0].outputs[0].token_ids
    base_expect = hf_greedy_generate(base_dir, tok.encode(prompt), 8)
    assert base_got == base_expect
    assert base_got != got  # the adapter actually changed the output


def test_two_adapters_and_base_in_one_batch(setup):
    base_dir, adapters = setup
    llm = LLM(model=base_dir, dtype="float32", enable_lora=True,
              max_loras=2, max_lora_rank=8, max_num_seqs=8,
              num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "hello world"
    ids = tok.encode(prompt)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    # Issue all three concurrently (mixed batch on the engine).
    reqs = {
        "alpha": LoRARequest("alpha", 1, adapters["alpha"]),
        "beta": LoRARequest("beta", 2, adapters["beta"]),
    }
    llm.engine.add_request("r-base", prompt=prompt, sampling_params=sp)
    llm.engine.add_request("r-alpha", prompt=prompt, sampling_params=sp,
                           lora_request=reqs["alpha"])
    llm.engine.add_request("r-beta", prompt=prompt, sampling_params=sp,
                           lora_request=reqs["beta"])
    results = {}
    while llm.engine.has_unfinished_requests():
        for out in llm.engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids

    from tests.utils import hf_greedy_generate

    assert results["r-base"] == hf_greedy_generate(base_dir, ids, 6)
    assert results["r-alpha"] == hf_lora_greedy(base_dir,
                                                adapters["alpha"], ids, 6)
    assert results["r-beta"] == hf_lora_greedy(base_dir,
                                               adapters["beta"], ids, 6)


def test_lora_disabled_rejects_request(setup):
    base_dir, adapters = setup
    llm = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=64, block_size=8)
    with pytest.raises(ValueError, match="enable_lora"):
        llm.generate(["x"], SamplingParams(max_tokens=2),
                     lora_request=LoRARequest("a", 1, adapters["alpha"]))
