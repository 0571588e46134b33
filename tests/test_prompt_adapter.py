"""Soft-prompt (prompt-tuning) adapter tests vs HF+PEFT."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from aphrodite_tpu.prompt_adapter import PromptAdapterRequest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch
    from transformers import AutoModelForCausalLM
    from peft import PromptTuningConfig, get_peft_model, TaskType

    from tests.utils import make_tiny_llama_checkpoint

    base_dir = str(tmp_path_factory.mktemp("pa_base"))
    make_tiny_llama_checkpoint(base_dir)
    torch.manual_seed(5)
    model = AutoModelForCausalLM.from_pretrained(base_dir,
                                                 torch_dtype=torch.float32)
    cfg = PromptTuningConfig(task_type=TaskType.CAUSAL_LM,
                             num_virtual_tokens=8)
    peft_model = get_peft_model(model, cfg)
    adir = str(tmp_path_factory.mktemp("pa_adapter"))
    peft_model.save_pretrained(adir)
    return base_dir, adir


def hf_soft_prompt_greedy(base_dir, adapter_dir, prompt_ids, max_new):
    import torch
    from transformers import AutoModelForCausalLM
    from peft import PeftModel

    model = AutoModelForCausalLM.from_pretrained(base_dir,
                                                 torch_dtype=torch.float32)
    model = PeftModel.from_pretrained(model, adapter_dir,
                                      torch_dtype=torch.float32)
    model.eval()
    input_ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(input_ids, max_new_tokens=max_new,
                             do_sample=False, num_beams=1, pad_token_id=2)
    # PEFT prompt tuning returns only the non-virtual continuation.
    return out[0, len(prompt_ids):].tolist()


def test_soft_prompt_matches_hf_peft(setup):
    base_dir, adapter_dir = setup
    llm = LLM(model=base_dir, dtype="float32",
              enable_prompt_adapter=True, max_prompt_adapters=2,
              max_prompt_adapter_token=16, max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "the quick brown fox"
    ids = tok.encode(prompt)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    req = PromptAdapterRequest("tune", 1, adapter_dir)
    llm.engine.add_request("pa-1", prompt=prompt, sampling_params=sp,
                           prompt_adapter_request=req)
    results = {}
    while llm.engine.has_unfinished_requests():
        for out in llm.engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    expect = hf_soft_prompt_greedy(base_dir, adapter_dir, ids, 8)
    assert results["pa-1"] == expect

    # Plain requests remain unaffected.
    from tests.utils import hf_greedy_generate

    plain = llm.generate([prompt], sp)[0].outputs[0].token_ids
    assert plain == hf_greedy_generate(base_dir, ids, 8)


def test_prompt_adapter_disabled_rejects(setup):
    base_dir, adapter_dir = setup
    llm = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=64, block_size=8)
    with pytest.raises(ValueError, match="enable_prompt_adapter"):
        llm.engine.add_request(
            "x", prompt="hi", sampling_params=SamplingParams(max_tokens=2),
            prompt_adapter_request=PromptAdapterRequest("t", 1,
                                                        adapter_dir))


def test_soft_prompt_unload_and_slot_reuse(setup):
    """r5: /v1/soft_prompt/unload semantics — unload frees the slot,
    requests naming the adapter fail, and a reload reuses the slot
    with identical outputs."""
    base_dir, adapter_dir = setup
    llm = LLM(model=base_dir, dtype="float32",
              enable_prompt_adapter=True, max_prompt_adapters=1,
              max_prompt_adapter_token=16, max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    eng = llm.engine
    eng.load_soft_prompt("tune", adapter_dir)
    assert "tune" in eng.soft_prompt_slots()
    assert eng.unload_soft_prompt("tune")
    assert "tune" not in eng.soft_prompt_slots()
    assert not eng.unload_soft_prompt("tune")  # idempotent

    # Slot budget was 1: reload must succeed (slot reused).
    eng.load_soft_prompt("tune2", adapter_dir)
    assert eng.soft_prompt_slots() == {"tune2": 0}

    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    req = PromptAdapterRequest("tune2", 2, adapter_dir)
    eng.add_request("pa-r", prompt="hello", sampling_params=sp,
                    prompt_adapter_request=req)
    got = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                got[out.request_id] = out.outputs[0].token_ids
    ids = llm.get_tokenizer().encode("hello")
    expect = hf_soft_prompt_greedy(base_dir, adapter_dir, ids, 6)
    assert got["pa-r"] == expect
