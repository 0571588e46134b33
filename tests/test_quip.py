"""QuIP# (E8P12) support: codebook decode, generated Hadamard
matrices, and the load-time fold vs a straight-line oracle of the
reference apply() pipeline (aphrodite/quantization/quip.py:156-195)."""

import numpy as np
import pytest

from aphrodite_tpu.quantization import quip as Q

RNG = np.random.default_rng(42)


def test_packed_abs_grid_shape_and_norms():
    g = Q.packed_abs_grid().astype(np.float64) / 4.0
    assert g.shape == (256, 8)
    # Every row is a (half-integer) E8-family point: norm^2 <= 12 and
    # quarter-integral entries on the 1/2 grid.
    n2 = (g ** 2).sum(1)
    assert (n2 <= 12.0 + 1e-9).all()
    assert np.allclose(g * 2, np.round(g * 2))
    # Rows are unique (a bijective 8-bit abs index).
    assert len({tuple(r) for r in g.tolist()}) == 256


def test_decode_e8p_values_are_codebook_points():
    idx = RNG.integers(0, 1 << 16, size=(4, 16), dtype=np.uint16)
    w = Q.decode_e8p(idx.astype(np.int16))
    assert w.shape == (4, 128)
    v = w.reshape(-1, 8)
    # All decoded vectors live on the quarter-odd-integer grid
    # (E8 + 1/4 shifted lattice scaled: values are odd multiples of 1/4).
    q4 = v * 4
    assert np.allclose(q4, np.round(q4))
    assert (np.abs(np.round(q4)) % 2 == 1).all()


@pytest.mark.parametrize("n", [4, 8, 12, 20, 28, 36, 44, 52, 64, 108])
def test_hadamard_orders(n):
    h = Q.hadamard_matrix(n)
    assert h is not None
    assert (np.abs(h) == 1).all()
    assert (h @ h.T == n * np.eye(n, dtype=np.int64)).all()


def test_hadamard_gap_order_returns_none():
    assert Q.hadamard_matrix(92) is None  # Williamson-only order


@pytest.mark.parametrize("use_rand", [False, True])
@pytest.mark.parametrize("in_size,out_size", [
    (64, 64),      # both pure power-of-2 (K = 1)
    (96, 64),      # base 3 -> H12 (Paley I q=11)
    (80, 96),      # base 5 -> H20 (Paley I q=19)
    (56, 64),      # base 7 -> H28 (Paley I over GF(27))
])
def test_fold_matches_reference_apply(in_size, out_size, use_rand):
    _, _, q_in = Q.get_hadK(in_size, use_rand)
    _, _, q_out = Q.get_hadK(out_size, use_rand)
    qidxs = RNG.integers(0, 1 << 16,
                         size=(q_out, q_in // 8),
                         dtype=np.uint16).astype(np.int16)
    su = RNG.choice([-1.0, 1.0], size=in_size).astype(np.float32)
    sv = RNG.choice([-1.0, 1.0], size=out_size).astype(np.float32)
    wscale = 0.73
    w_eff = Q.fold_quip_linear(qidxs, wscale, su, sv, in_size, out_size,
                               use_rand=use_rand)
    assert w_eff.shape == (out_size, in_size)
    x = RNG.standard_normal((3, in_size)).astype(np.float32)
    want = Q.reference_quip_apply(x, qidxs, wscale, su, sv, out_size,
                                  use_rand=use_rand)
    got = x.astype(np.float64) @ w_eff.astype(np.float64).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quip_loader_iterator(tmp_path):
    """A synthetic QuIP checkpoint round-trips through the dequant
    iterator into dense .weight tensors."""
    import safetensors.numpy as stnp

    in_size, out_size = 64, 64
    qidxs = RNG.integers(0, 1 << 16, size=(out_size, in_size // 8),
                         dtype=np.uint16).astype(np.int16)
    su = RNG.choice([-1.0, 1.0], size=in_size).astype(np.float16)
    sv = RNG.choice([-1.0, 1.0], size=out_size).astype(np.float16)
    tensors = {
        "model.layers.0.mlp.up_proj.Qidxs": qidxs,
        "model.layers.0.mlp.up_proj.Wscale": np.asarray(0.5, np.float32),
        "model.layers.0.mlp.up_proj.SU": su,
        "model.layers.0.mlp.up_proj.SV": sv,
        "model.embed.weight": RNG.standard_normal((8, 4)).astype(
            np.float32),
    }
    stnp.save_file(tensors, str(tmp_path / "model.safetensors"))
    out = dict(Q.quip_dequant_iterator(str(tmp_path)))
    assert "model.layers.0.mlp.up_proj.weight" in out
    w = out["model.layers.0.mlp.up_proj.weight"]
    assert w.shape == (out_size, in_size)
    want = Q.fold_quip_linear(qidxs, 0.5, su.astype(np.float32),
                              sv.astype(np.float32), in_size, out_size)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)
    assert "model.embed.weight" in out


# ---------------------------------------------------------------------------
# End-to-end: quantize a tiny Llama into QuIP# format (real nearest-
# codebook encoding under the incoherence transform), serve it through
# LLM, and require close agreement with the f32 HF baseline.
# ---------------------------------------------------------------------------


def _encode_e8p(a: np.ndarray) -> np.ndarray:
    """[m, n] -> nearest-codebook int16[m, n/8] (exhaustive over the
    2^16 index space; fine at tiny dims)."""
    all_idx = np.arange(1 << 16, dtype=np.uint16).astype(np.int16)
    table = Q.decode_e8p(all_idx[None, :]).reshape(1 << 16, 8)
    m, n = a.shape
    g = a.reshape(m * n // 8, 8)
    # argmin ||g - t||^2 == argmax (2 g.t - ||t||^2), chunked.
    t2 = (table ** 2).sum(1)
    best = np.empty(g.shape[0], np.int64)
    for lo in range(0, g.shape[0], 512):
        sl = g[lo:lo + 512]
        score = 2.0 * sl @ table.T - t2[None, :]
        best[lo:lo + 512] = score.argmax(1)
    return all_idx[best].reshape(m, n // 8).astype(np.int16)


def _quip_quantize_checkpoint(src: str, dst: str) -> None:
    import json
    import os
    import shutil

    import safetensors.numpy as stnp

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    os.makedirs(dst, exist_ok=True)
    for fname in os.listdir(src):
        if not fname.endswith(".safetensors"):
            shutil.copy(os.path.join(src, fname),
                        os.path.join(dst, fname))
    out = {}
    for name, arr in safetensors_weight_iterator(src):
        w = np.asarray(arr, np.float32)
        is_proj = (name.endswith(".weight") and w.ndim == 2
                   and ("self_attn" in name or "mlp" in name))
        if not is_proj:
            out[name] = w
            continue
        o, i = w.shape
        _, k_l, q_in = Q.get_hadK(i, False)
        _, k_r, q_out = Q.get_hadK(o, False)
        assert (k_l, k_r) == (1, 1) and (q_in, q_out) == (i, o)
        # incoherence: A = M_out W M_in / Wscale (M = H/sqrt(n),
        # orthonormal + symmetric at power-of-2 dims)
        a = Q.matmul_hadU(w, None, 1, i)  # W @ M_in
        a = Q.matmul_hadU(a.T, None, 1, o).T  # M_out @ (.)
        a = np.asarray(a, np.float64)
        rms = float(np.sqrt((a ** 2).mean()))
        # Pick the Wscale that minimizes reconstruction error (the
        # codebook has a fixed dynamic range; clipping vs resolution).
        best = None
        for c in (0.5, 0.7, 0.9, 1.1):
            ws = rms / c
            enc = _encode_e8p(a / ws)
            err = float(((Q.decode_e8p(enc) * ws - a) ** 2).mean())
            if best is None or err < best[0]:
                best = (err, ws, enc)
        _, wscale, qidxs = best
        base = name[:-len(".weight")]
        out[base + ".Qidxs"] = qidxs
        out[base + ".Wscale"] = np.asarray(wscale, np.float32)
        out[base + ".SU"] = np.ones(i, np.float32)
        out[base + ".SV"] = np.ones(o, np.float32)
    stnp.save_file(out, os.path.join(dst, "model.safetensors"))
    with open(os.path.join(dst, "quantization_config.json"), "w") as f:
        json.dump({"codebook": "E8P12", "use_rand": False}, f)


def test_quip_e2e_matches_dequantized_twin(tmp_path):
    """Packed-vs-dequantized-twin token equality (the
    tests/test_marlin_formats.py pattern): serving the QuIP checkpoint
    must produce EXACTLY the tokens of an HF checkpoint whose weights
    are the folded dense equivalents. (Closeness to the original f32
    model is a property of 2-bit quantization quality, not of this
    engine — a tiny random model has no redundancy to survive it.)"""
    import shutil

    import safetensors.numpy as stnp

    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate, make_tiny_llama_checkpoint

    src = str(tmp_path / "f32")
    make_tiny_llama_checkpoint(src)
    dst = str(tmp_path / "quip")
    _quip_quantize_checkpoint(src, dst)

    # Twin: the same checkpoint with folded dense weights.
    twin = str(tmp_path / "twin")
    shutil.copytree(src, twin)
    folded = dict(Q.quip_dequant_iterator(dst))
    stnp.save_file({k: np.ascontiguousarray(v, np.float32)
                    for k, v in folded.items()},
                   str(tmp_path / "twin" / "model.safetensors"))

    llm = LLM(model=dst, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    assert llm.engine.model_config.quantization == "quip"
    tok = llm.get_tokenizer()
    prompt = "the quick brown fox"
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate([prompt], sp)[0].outputs[0]
    expect = hf_greedy_generate(twin, tok.encode(prompt), 12)
    assert out.token_ids == expect
