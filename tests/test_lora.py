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


def test_long_context_lora(setup, tmp_path):
    """Long-context (LongLoRA-style) adapter: adapter_config declares
    context_length = 2x the base max_position_embeddings; with
    long_lora_scaling_factors=(2.0,) the engine serves PAST the base
    context using the adapter's linear-scaled rope region, matching an
    HF twin with rope_scaling {linear, factor 2} + merged adapter.
    Base requests in the same engine keep unscaled rope."""
    import json
    import os
    import shutil

    import torch
    from transformers import AutoModelForCausalLM

    base_dir, adapters = setup
    # Long adapter: copy alpha, declare context_length 256 (base 128).
    long_dir = str(tmp_path / "adapter_long")
    shutil.copytree(adapters["alpha"], long_dir)
    cfg_path = os.path.join(long_dir, "adapter_config.json")
    with open(cfg_path) as f:
        acfg = json.load(f)
    acfg["context_length"] = 256
    with open(cfg_path, "w") as f:
        json.dump(acfg, f)

    # HF twin: linear rope scaling x2 + merged adapter weights.
    twin = str(tmp_path / "twin_long")
    os.makedirs(twin)
    from peft import PeftModel

    model = AutoModelForCausalLM.from_pretrained(
        base_dir, torch_dtype=torch.float32)
    model = PeftModel.from_pretrained(model, adapters["alpha"],
                                      torch_dtype=torch.float32)
    model = model.merge_and_unload()
    model.config.rope_scaling = {"rope_type": "linear", "factor": 2.0}
    model.config.max_position_embeddings = 128
    model.save_pretrained(twin, safe_serialization=True)
    for f2 in os.listdir(base_dir):
        if "token" in f2:
            shutil.copy(os.path.join(base_dir, f2),
                        os.path.join(twin, f2))

    rng = np.random.default_rng(5)
    long_prompt = rng.integers(3, 250, size=(150,)).tolist()  # > 128
    short_prompt = rng.integers(3, 250, size=(20,)).tolist()

    llm = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=256, enable_lora=True, max_loras=2,
              max_lora_rank=8, long_lora_scaling_factors=(2.0,))
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    got = llm.generate(
        prompt_token_ids=[long_prompt], sampling_params=sp,
        lora_request=LoRARequest("long", 1, long_dir),
    )[0].outputs[0].token_ids

    m2 = AutoModelForCausalLM.from_pretrained(twin,
                                              torch_dtype=torch.float32)
    m2.eval()
    with torch.no_grad():
        out = m2.generate(torch.tensor([long_prompt]), max_new_tokens=8,
                          do_sample=False, num_beams=1, pad_token_id=2)
    expect = out[0, len(long_prompt):].tolist()
    assert got == expect

    # A base (no-LoRA) request in the same engine: plain rope.
    from tests.utils import hf_greedy_generate

    got_base = llm.generate(
        prompt_token_ids=[short_prompt],
        sampling_params=sp)[0].outputs[0].token_ids
    expect_base = hf_greedy_generate(base_dir, short_prompt, 8)
    assert got_base == expect_base


def test_fully_sharded_lora_tp4(tmp_path_factory):
    """Fully-sharded LoRA (reference lora/fully_sharded_layers.py):
    under tp the stacked adapter arrays shard like the base weights
    (column modules: B's out dim; row modules: A's in dim), and tp=4
    serving with an adapter stays token-exact vs tp=1."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import AutoModelForCausalLM

    from tests.utils import make_tiny_llama_checkpoint

    # kv heads divide tp=4 (same geometry as the multihost LoRA test).
    base_dir = str(tmp_path_factory.mktemp("fsl_base"))
    make_tiny_llama_checkpoint(base_dir, num_key_value_heads=4)
    torch.manual_seed(7)
    model = AutoModelForCausalLM.from_pretrained(
        base_dir, torch_dtype=torch.float32)
    cfg = LoraConfig(r=8, lora_alpha=16,
                     target_modules=["q_proj", "v_proj", "gate_proj",
                                     "down_proj"],
                     init_lora_weights=False)
    adir = str(tmp_path_factory.mktemp("fsl_adapter"))
    get_peft_model(model, cfg).save_pretrained(adir)

    prompts = ["the quick brown fox", "hello world"]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    req = LoRARequest("fsl", 1, adir)

    base = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               enable_lora=True, max_loras=2, max_lora_rank=8)
    expect = [o.outputs[0].token_ids
              for o in base.generate(prompts, sp, lora_request=req)]
    del base

    tp4 = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              tensor_parallel_size=4, enable_lora=True, max_loras=2,
              max_lora_rank=8)
    got = [o.outputs[0].token_ids
           for o in tp4.generate(prompts, sp, lora_request=req)]
    assert got == expect

    # The adapter arrays are actually sharded, not replicated.
    mgr = tp4.engine.runner.lora_manager
    dp = mgr.device_params(np.float32, mesh=tp4.engine.runner.mesh)
    b_q = dp["wq"]["B"]
    shard_shape = b_q.sharding.shard_shape(b_q.shape)
    assert shard_shape[3] == b_q.shape[3] // 4, (shard_shape, b_q.shape)
    a_down = dp["down"]["A"]
    shard_shape = a_down.sharding.shard_shape(a_down.shape)
    assert shard_shape[2] == a_down.shape[2] // 4
