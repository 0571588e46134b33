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


# ---------------------------------------------------------------------------
# Tier-2 k-quant / i-quant container decoders (VERDICT r3 item 5): each
# format packs random explicit fields, round-trips through the parser,
# and must reproduce the per-element ggml dequant formula.
# ---------------------------------------------------------------------------


def _roundtrip(tmp_path, gtype, blob, rows, n):
    path = str(tmp_path / f"t{gtype}.gguf")
    write_gguf(path, {}, [("t", [n, rows], gtype, blob)])
    gg = G.GGUFFile(path)
    q, s, z = G.to_int4_pieces(gg, gg.tensors["t"])
    Gr = n // s.shape[1]
    w = (q.astype(np.float32) - np.repeat(z, Gr, axis=1)) * np.repeat(
        s, Gr, axis=1)
    dq = G.dequant_tensor(gg, gg.tensors["t"]).reshape(rows, n)
    np.testing.assert_allclose(w, dq, rtol=1e-5, atol=1e-6)
    return w


def _f16(x):
    return np.asarray(x, np.float16).astype(np.float32)


def test_q6_k_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_q6_k

    rows, n = 2, 512
    nsb = n // 256
    q = RNG.integers(0, 64, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    sc = RNG.integers(-100, 100, size=(rows, nsb, 16)).astype(np.int8)
    w = _roundtrip(tmp_path, G.GGML_Q6_K,
                   pack_q6_k(q, d, sc), rows, n)
    p = np.arange(n)
    want = (_f16(d)[:, p // 256] * sc[:, p // 256, (p % 256) // 16]
            * (q.astype(np.float32) - 32.0))
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-6)


def test_q5_k_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_q5_k

    rows, n = 2, 512
    nsb = n // 256
    q = RNG.integers(0, 32, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    dmin = (RNG.random((rows, nsb)) * 0.02).astype(np.float32)
    sc = RNG.integers(1, 64, size=(rows, nsb, 8)).astype(np.uint8)
    mn = RNG.integers(0, 64, size=(rows, nsb, 8)).astype(np.uint8)
    w = _roundtrip(tmp_path, G.GGML_Q5_K,
                   pack_q5_k(q, d, dmin, sc, mn), rows, n)
    p = np.arange(n)
    sb = (p % 256) // 32
    want = (_f16(d)[:, p // 256] * sc[:, p // 256, sb] * q
            - _f16(dmin)[:, p // 256] * mn[:, p // 256, sb])
    np.testing.assert_allclose(w, want, rtol=2e-4, atol=1e-5)


def test_q2_k_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_q2_k

    rows, n = 2, 512
    nsb = n // 256
    q = RNG.integers(0, 4, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    dmin = (RNG.random((rows, nsb)) * 0.02).astype(np.float32)
    sc = RNG.integers(1, 16, size=(rows, nsb, 16)).astype(np.uint8)
    mn = RNG.integers(0, 16, size=(rows, nsb, 16)).astype(np.uint8)
    w = _roundtrip(tmp_path, G.GGML_Q2_K,
                   pack_q2_k(q, d, dmin, sc, mn), rows, n)
    p = np.arange(n)
    sb = (p % 256) // 16
    want = (_f16(d)[:, p // 256] * sc[:, p // 256, sb] * q
            - _f16(dmin)[:, p // 256] * mn[:, p // 256, sb])
    np.testing.assert_allclose(w, want, rtol=2e-4, atol=1e-5)


def test_q3_k_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_q3_k

    rows, n = 2, 512
    nsb = n // 256
    q = RNG.integers(0, 8, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    sc6 = RNG.integers(0, 64, size=(rows, nsb, 16)).astype(np.uint8)
    w = _roundtrip(tmp_path, G.GGML_Q3_K,
                   pack_q3_k(q, d, sc6), rows, n)
    p = np.arange(n)
    want = (_f16(d)[:, p // 256]
            * (sc6[:, p // 256, (p % 256) // 16].astype(np.float32) - 32)
            * (q.astype(np.float32) - 4.0))
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-6)


def test_q5_0_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_q5_0

    rows, n = 2, 128
    q = RNG.integers(0, 32, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, n // 32)) * 0.05 + 0.01).astype(np.float32)
    w = _roundtrip(tmp_path, G.GGML_Q5_0, pack_q5_0(q, d), rows, n)
    p = np.arange(n)
    want = _f16(d)[:, p // 32] * (q.astype(np.float32) - 16.0)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-6)


def test_iq4_nl_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_iq4_nl

    rows, n = 2, 128
    idx = RNG.integers(0, 16, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, n // 32)) * 0.05 + 0.01).astype(np.float32)
    w = _roundtrip(tmp_path, G.GGML_IQ4_NL, pack_iq4_nl(idx, d), rows, n)
    p = np.arange(n)
    want = _f16(d)[:, p // 32] * G.KVALUES_IQ4NL[idx].astype(np.float32)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-6)


def test_iq4_xs_container_matches_formula(tmp_path):
    from tests.gguf_writer import pack_iq4_xs

    rows, n = 2, 512
    nsb = n // 256
    idx = RNG.integers(0, 16, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    sc6 = RNG.integers(0, 64, size=(rows, nsb, 8)).astype(np.uint8)
    w = _roundtrip(tmp_path, G.GGML_IQ4_XS,
                   pack_iq4_xs(idx, d, sc6), rows, n)
    p = np.arange(n)
    want = (_f16(d)[:, p // 256]
            * (sc6[:, p // 256, (p % 256) // 32].astype(np.float32) - 32)
            * G.KVALUES_IQ4NL[idx].astype(np.float32))
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-6)


def test_q6_k_serves_natively_not_dequantized(tmp_path):
    """A q6_k linear weight must load as a grouped CONTAINER (int8 q +
    per-16 scales — ~1.5 B/weight of HBM traffic instead of bf16's 2),
    not inflate to dense bf16 (VERDICT r3 item 5 done-bar)."""
    from tests.gguf_writer import pack_q6_k

    rows, n = 64, 512  # [out, in] = [64, 512]
    nsb = n // 256
    q = RNG.integers(0, 64, size=(rows, n)).astype(np.uint8)
    d = (RNG.random((rows, nsb)) * 0.05 + 0.01).astype(np.float32)
    sc = RNG.integers(-100, 100, size=(rows, nsb, 16)).astype(np.int8)
    path = str(tmp_path / "q6.gguf")
    write_gguf(path, {}, [("t", [n, rows], G.GGML_Q6_K,
                           pack_q6_k(q, d, sc))])
    gg = G.GGUFFile(path)
    qz, s, z = G.to_int4_pieces(gg, gg.tensors["t"])
    assert qz.dtype == np.int8 and qz.shape == (rows, n)
    assert s.shape == (rows, n // 16)
    from aphrodite_tpu.quantization.int4 import maybe_pack

    c = maybe_pack({"q4": np.ascontiguousarray(qz.T),
                    "scale": np.ascontiguousarray(s.T),
                    "zero": np.ascontiguousarray(z.T)})
    # 6-bit values exceed a nibble: must stay an UNPACKED int8 container
    # (packing would corrupt), still half of bf16 weight bytes.
    assert "q4" in c and "q4p" not in c


def test_gguf_q6_k_e2e_close(tiny_hf, tmp_path):
    """q6_k end-to-end: the engine serves the native container; greedy
    tokens should track the f32 engine closely (quantization noise may
    flip late tokens; prefix must agree)."""
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import make_tiny_llama_checkpoint

    # k-quant super-blocks need 256-divisible row lengths; the default
    # tiny checkpoint (64-wide) is below one super-block.
    tiny_hf = str(tmp_path / "hf256")
    make_tiny_llama_checkpoint(tiny_hf, hidden_size=256,
                               intermediate_size=512,
                               num_attention_heads=4,
                               num_key_value_heads=2)
    path = str(tmp_path / "m-q6k.gguf")
    tiny_llama_to_gguf(tiny_hf, path, quant="q6_k")
    llm = LLM(model=path, dtype="float32", max_num_seqs=2,
              num_device_blocks_override=64, block_size=8,
              tokenizer=tiny_hf)
    params = llm.engine.runner.params
    lw = params["layers"]
    # Native container, not bf16 inflation (q6 values exceed a nibble
    # so the container stays unpacked int8 with per-16 scales).
    hit = [k for k, v in lw.items() if isinstance(v, dict)]
    assert hit, f"no quantized containers in {list(lw)}"
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate(["hello world"], sp)[0].outputs[0]
    assert len(out.token_ids) == 8

    base = LLM(model=tiny_hf, dtype="float32", max_num_seqs=2,
               num_device_blocks_override=64, block_size=8)
    ref = base.generate(["hello world"], sp)[0].outputs[0]
    agree = sum(a == b for a, b in
                zip(out.token_ids, ref.token_ids))
    assert agree >= 4, (out.token_ids, ref.token_ids)
