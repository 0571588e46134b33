"""GGUF loading tests: parser, block decoders, e2e generation.

Mirrors the reference's gguf capability (quantization/gguf.py + CUDA
dequant kernels); files are produced by tests/gguf_writer.py, an
independent implementation of the public ggml spec.
"""

import numpy as np
import pytest

from aphrodite_tpu.loader import gguf as G
from tests.gguf_writer import (pack_q4_k, pack_q8_0, tiny_llama_to_gguf,
                               write_gguf)

RNG = np.random.default_rng(7)


def test_parse_metadata_and_f32_tensor(tmp_path):
    w = RNG.standard_normal((4, 8)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    write_gguf(path, {"general.architecture": "llama", "llama.x": 3},
               [("t0", [8, 4], G.GGML_F32, w.astype("<f4").tobytes())])
    gg = G.GGUFFile(path)
    assert gg.metadata["general.architecture"] == "llama"
    info = gg.tensors["t0"]
    out = G.dequant_tensor(gg, info)
    np.testing.assert_allclose(out, w, rtol=1e-6)


def test_q8_0_roundtrip(tmp_path):
    w = RNG.standard_normal((4, 64)).astype(np.float32)
    path = str(tmp_path / "q8.gguf")
    write_gguf(path, {}, [("t", [64, 4], G.GGML_Q8_0, pack_q8_0(w))])
    gg = G.GGUFFile(path)
    out = G.dequant_tensor(gg, gg.tensors["t"])
    err = np.abs(out - w).max() / np.abs(w).max()
    assert err < 0.01


def test_q4_k_decode_matches_formula(tmp_path):
    rows, n = 3, 512  # 2 super-blocks per row
    nsb = n // 256
    q = RNG.integers(0, 16, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.1 + 0.01).astype(np.float32)
    dmin = (RNG.random((rows, nsb)) * 0.05).astype(np.float32)
    sc = RNG.integers(1, 64, size=(rows, nsb, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(rows, nsb, 8)).astype(np.uint8)
    path = str(tmp_path / "q4k.gguf")
    write_gguf(path, {},
               [("t", [n, rows], G.GGML_Q4_K,
                 pack_q4_k(q, d, dmin, sc, mn))])
    gg = G.GGUFFile(path)
    out = G.dequant_tensor(gg, gg.tensors["t"])

    # Oracle: w[r, i] = d16*sc * q - dmin16*m  (f16-rounded d/dmin).
    d16 = d.astype(np.float16).astype(np.float32)
    dmin16 = dmin.astype(np.float16).astype(np.float32)
    want = np.zeros((rows, n), np.float32)
    for r in range(rows):
        for i in range(n):
            s, j = i // 256, (i % 256) // 32
            want[r, i] = (d16[r, s] * sc[r, s, j] * q[r, i] -
                          dmin16[r, s] * mn[r, s, j])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    # Container path: dequantize(int4 pieces) must equal the same oracle.
    qq, scale, zero = G.to_int4_pieces(gg, gg.tensors["t"])
    Gsz = n // scale.shape[1]
    assert Gsz == 32
    s_full = np.repeat(scale, 32, axis=1)
    z_full = np.repeat(zero, 32, axis=1)
    cont = (qq.astype(np.float32) - z_full) * s_full
    np.testing.assert_allclose(cont, want, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_hf(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_for_gguf"))
    make_tiny_llama_checkpoint(path)
    return path


def test_gguf_f32_e2e_matches_hf(tiny_hf, tmp_path):
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    gguf_path = str(tmp_path / "model.gguf")
    tiny_llama_to_gguf(tiny_hf, gguf_path, quant="f32")
    llm = LLM(model=gguf_path, tokenizer=tiny_hf, dtype="float32",
              max_num_seqs=4, num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "the quick brown fox"
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate([prompt], sp)[0].outputs[0]
    expect = hf_greedy_generate(tiny_hf, tok.encode(prompt), 8)
    assert out.token_ids == expect


def test_gguf_q8_0_e2e_close(tiny_hf, tmp_path):
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    gguf_path = str(tmp_path / "model_q8.gguf")
    tiny_llama_to_gguf(tiny_hf, gguf_path, quant="q8_0")
    llm = LLM(model=gguf_path, tokenizer=tiny_hf, dtype="float32",
              max_num_seqs=4, num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "hello world, this is"
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate([prompt], sp)[0].outputs[0]
    expect = hf_greedy_generate(tiny_hf, tok.encode(prompt), 12)
    agree = sum(a == b for a, b in zip(out.token_ids, expect))
    assert agree >= 8, (out.token_ids, expect)


def test_gguf_requires_tokenizer(tiny_hf, tmp_path):
    from aphrodite_tpu import LLM

    gguf_path = str(tmp_path / "m.gguf")
    tiny_llama_to_gguf(tiny_hf, gguf_path)
    with pytest.raises(ValueError, match="tokenizer"):
        LLM(model=gguf_path, dtype="float32",
            num_device_blocks_override=64)
