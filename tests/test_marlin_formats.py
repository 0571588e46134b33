"""Marlin-family + HQQ + QuantLLM-FPx checkpoint loading tests.

Each format packs a tiny llama with a TEST-SIDE packer written directly
from the published layout (reference marlin_utils_test*.py /
quant_utils.py semantics), saves both the packed checkpoint and a dense
twin holding the exact dequantized values, and asserts the two engines
are token-identical — any permutation/packing/scale mistake in the
loader shows up as divergence.

Marlin tile constraints (N % 64 == 0, K % 16 == 0) exclude the tiny
model's k/v projections (out=32); those stay dense, which also
exercises the loaders' pass-through path.
"""

import json
import os
import shutil

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox", "one two three four"]


def _greedy(model_dir, quantization=None):
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              quantization=quantization)
    out = [o.outputs[0].token_ids for o in llm.generate(PROMPTS, sp)]
    del llm
    return out


def _write_checkpoint(dense_dir, out_dir, tensors, quant_cfg=None,
                      extra_cfg_files=None):
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              os.path.join(out_dir, "model.safetensors"))
    for fn in os.listdir(dense_dir):
        if not fn.endswith(".safetensors"):
            shutil.copy(os.path.join(dense_dir, fn),
                        os.path.join(out_dir, fn))
    if quant_cfg is not None:
        with open(os.path.join(out_dir, "config.json")) as f:
            cfg = json.load(f)
        cfg["quantization_config"] = quant_cfg
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(cfg, f)
    for fn, payload in (extra_cfg_files or {}).items():
        with open(os.path.join(out_dir, fn), "w") as f:
            json.dump(payload, f)


@pytest.fixture(scope="module")
def dense_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    d = str(tmp_path_factory.mktemp("tiny_dense_marlin"))
    make_tiny_llama_checkpoint(d)
    return d


def _dense_tensors(dense_dir):
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    return {k: np.asarray(v)
            for k, v in safetensors_weight_iterator(dense_dir)}


# ---------------------------------------------------------------------------
# test-side packers (independent implementations of the published
# layouts; the loader must invert these exactly)


def _perm_1024(num_bits, variant):
    perm = []
    for i in range(32):
        col = i // 4
        if variant == "marlin24":
            rows = [2 * (i % 4), 2 * (i % 4) + 1,
                    2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1]
            block_cols = []
            for block in (0, 1):
                for r in rows:
                    block_cols.append(16 * r + (col // 2) * 256 +
                                      8 * (col % 2) + 4 * block)
            for j in range(4):
                perm.extend(p + j for p in block_cols)
        else:
            if variant.startswith("qqq"):
                rows = [4 * (i % 4) + d for d in range(4)]
            else:
                rows = [2 * (i % 4), 2 * (i % 4) + 1,
                        2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1]
            block_cols = []
            for block in (0, 1):
                for r in rows:
                    block_cols.append(16 * r + col + 8 * block)
            for j in range(4):
                perm.extend(p + 256 * j for p in block_cols)
    perm = np.asarray(perm, np.int64)
    if variant == "qqq_channel":
        lanes = [4, 0, 5, 1, 6, 2, 7, 3]
    elif num_bits == 4:
        lanes = [0, 2, 4, 6, 1, 3, 5, 7]
    else:
        lanes = [0, 2, 1, 3]
    return perm.reshape(-1, len(lanes))[:, lanes].ravel()


def _pack_weights(q, num_bits, variant):
    """q [K, N] int values -> marlin int32 [K/16, N*16/(32/bits)]."""
    k, n = q.shape
    t = q.reshape(k // 16, 16, n // 16, 16).transpose(0, 2, 1, 3)
    t = t.reshape(k // 16, n * 16)
    perm = _perm_1024(num_bits, variant)
    t = t.reshape(-1, perm.size)[:, perm].reshape(k // 16, n * 16)
    pf = 32 // num_bits
    mask = (1 << num_bits) - 1
    packed = np.zeros((k // 16, n * 16 // pf), np.uint32)
    for i in range(pf):
        packed |= (t[:, i::pf].astype(np.uint32) & mask) << (num_bits * i)
    return packed.view(np.int32)


def _scale_perm_tables(variant):
    if variant == "marlin24":
        grouped = [i * 8 + j for i in range(8)
                   for j in (0, 4, 1, 5, 2, 6, 3, 7)]
        single = list(range(64))
    else:
        grouped = [i + 8 * j for i in range(8) for j in range(8)]
        single = [2 * i + j for i in range(4)
                  for j in (0, 1, 8, 9, 16, 17, 24, 25)]
    return grouped, single


def _pack_scales(s, n, grouped_case, variant):
    grouped, single = _scale_perm_tables(variant)
    table = np.asarray(grouped if grouped_case else single)
    return s.reshape(-1, table.size)[:, table].reshape(-1, n)


def _sym_quantize(w_kn, num_bits, group):
    """GPTQ-style symmetric quantization (quant_utils.py:123-206),
    [K, N] -> (stored uint values, scales [K/g, N], dequant [K, N])."""
    k, n = w_kn.shape
    g = k if group in (-1, k) else group
    wg = w_kn.reshape(k // g, g, n).astype(np.float64)
    max_q = (1 << (num_bits - 1)) - 1
    min_q = -(1 << (num_bits - 1))
    s = np.maximum(np.abs(wg.max(axis=1)) / max_q,
                   np.abs(wg.min(axis=1)) / -min_q)
    s = np.maximum(s, 1e-12)
    qs = np.clip(np.rint(wg / s[:, None]), min_q, max_q).astype(np.int64)
    w_ref = (qs * s[:, None]).reshape(k, n)
    bias = 1 << (num_bits - 1)
    return ((qs + bias).reshape(k, n), s.astype(np.float32),
            w_ref.astype(np.float32))


def _targets(tensors, need_tiles=True):
    for name, arr in tensors.items():
        if not name.endswith(".weight") or arr.ndim != 2:
            continue
        if not any(t in name for t in
                   ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                    "up_proj", "down_proj")):
            continue
        out_d, in_d = arr.shape
        if need_tiles and (out_d % 64 or in_d % 32):
            continue
        yield name, arr


# ---------------------------------------------------------------------------
# marlin (classic)


def test_marlin_matches_rounded_dense(dense_dir, tmp_path):
    tensors = _dense_tensors(dense_dir)
    packed, twin = {}, {}
    group = 16
    n_q = 0
    for name, arr in tensors.items():
        packed[name] = arr
        twin[name] = arr
    for name, arr in _targets(tensors):
        w_kn = np.ascontiguousarray(arr.T)  # [K=in, N=out]
        k, n = w_kn.shape
        q, s, _ = _sym_quantize(w_kn, 4, group)
        s16 = s.astype(np.float16)  # checkpoint precision
        base = name[:-len(".weight")]
        del packed[name]
        packed[base + ".B"] = _pack_weights(q, 4, "marlin")
        packed[base + ".s"] = _pack_scales(s16, n, True, "marlin")
        w_ref = ((q.astype(np.int32) - 8) *
                 np.repeat(s16.astype(np.float32), group, axis=0))
        twin[name] = np.ascontiguousarray(w_ref.T.astype(np.float32))
        n_q += 1
    assert n_q == 2 * 5  # k/v excluded by the N%64 tile constraint

    mdir, ddir = str(tmp_path / "marlin"), str(tmp_path / "marlin_dense")
    _write_checkpoint(dense_dir, mdir, packed, quant_cfg={
        "quant_method": "gptq", "bits": 4, "group_size": group,
        "checkpoint_format": "marlin"})
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(mdir) == _greedy(ddir)


# ---------------------------------------------------------------------------
# gptq_marlin_24 (2:4 sparse)


def _meta_reorder_offsets_test(m, meta_ncols):
    rows = np.repeat(np.arange(m)[:, None], meta_ncols, axis=1)
    cols = np.repeat(np.arange(meta_ncols)[None, :], m, axis=0)
    rows = (rows // 64 * 64 + (rows % 2) * 2 + (rows % 8) // 4 +
            ((rows % 32) % 4) // 2 * 32 + ((rows % 64) // 8) * 4)
    tr = ((rows % 2 == 0) & (cols % 2 == 1)).astype(np.int64)
    bl = ((rows % 2 == 1) & (cols % 2 == 0)).astype(np.int64)
    rows = rows + tr - bl
    cols = cols - tr + bl
    return (cols // 2 * (m * 2) + rows * 2 + cols % 2).reshape(-1)


def _compress_24(signed_nk):
    """[N, K] signed values with 2:4 sparsity along K -> compressed
    [N, K/2] + reordered int16 meta (marlin_utils_test_24.py:59-186)."""
    m, k = signed_nk.shape
    quads = signed_nk.reshape(m, k // 4, 4)
    nz = quads != 0
    m0, m1, m2, m3 = (nz[..., i] for i in range(4))
    expr0 = m0 & m1
    expr1 = ~m0 & m1
    expr2 = ~m0 & ~m1
    bit0, bit1 = expr1, expr2
    bit2 = expr0 | expr2 | m3
    bit3 = expr1 | ~m1
    idx0 = (bit0 + 2 * bit1).astype(np.int64)
    idx1 = (bit2 + 2 * bit3).astype(np.int64)
    v0 = np.take_along_axis(quads, idx0[..., None], axis=2)[..., 0]
    v1 = np.take_along_axis(quads, idx1[..., None], axis=2)[..., 0]
    comp = np.stack([v0, v1], axis=-1).reshape(m, k // 2)
    meta4 = (idx0 | (idx1 << 2)).reshape(m, k // 16, 4)
    meta = (meta4[..., 0] | (meta4[..., 1] << 4) | (meta4[..., 2] << 8) |
            (meta4[..., 3] << 12)).astype(np.uint16)
    flat = np.empty(m * (k // 16), np.uint16)
    flat[_meta_reorder_offsets_test(m, k // 16)] = meta.reshape(-1)
    return comp, flat.reshape(k // 32, 2 * m).view(np.int16)


def test_marlin24_matches_rounded_dense(dense_dir, tmp_path):
    tensors = _dense_tensors(dense_dir)
    packed = dict(tensors)
    twin = dict(tensors)
    n_q = 0
    for name, arr in _targets(tensors):
        w_kn = np.ascontiguousarray(arr.T).astype(np.float64)
        k, n = w_kn.shape
        # Prune 2 smallest |w| per group of 4 along K, per column.
        gq = w_kn.T.reshape(n, k // 4, 4)
        order = np.argsort(np.abs(gq), axis=2)
        mask = np.ones_like(gq, bool)
        np.put_along_axis(mask, order[:, :, :2], False, axis=2)
        w24 = (gq * mask).reshape(n, k).T  # [K, N]
        q, s, _ = _sym_quantize(w24, 4, -1)
        s16 = s.astype(np.float16)
        signed = q.astype(np.int64) - 8
        comp, meta = _compress_24(np.ascontiguousarray(signed.T))
        base = name[:-len(".weight")]
        del packed[name]
        packed[base + ".B_24"] = _pack_weights(
            np.ascontiguousarray(comp.T) + 8, 4, "marlin24")
        packed[base + ".B_meta"] = meta
        packed[base + ".s"] = _pack_scales(s16, n, False, "marlin24")
        w_ref = (signed.astype(np.int32) *
                 np.repeat(s16.astype(np.float32), k, axis=0))
        twin[name] = np.ascontiguousarray(w_ref.T.astype(np.float32))
        n_q += 1
    assert n_q == 2 * 5

    mdir = str(tmp_path / "m24")
    ddir = str(tmp_path / "m24_dense")
    _write_checkpoint(dense_dir, mdir, packed, quant_cfg={
        "quant_method": "gptq", "bits": 4, "group_size": -1,
        "checkpoint_format": "marlin_24"})
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(mdir) == _greedy(ddir)


# ---------------------------------------------------------------------------
# qqq


def test_qqq_group_matches_rounded_dense(dense_dir, tmp_path):
    tensors = _dense_tensors(dense_dir)
    packed = dict(tensors)
    twin = dict(tensors)
    group = 16
    for name, arr in _targets(tensors):
        w_kn = np.ascontiguousarray(arr.T).astype(np.float64)
        k, n = w_kn.shape
        wg = w_kn.reshape(k // group, group, n)
        s_g = np.abs(wg).max(axis=1) * (2.0 / 15.0)  # [k/g, n]
        s_g = np.maximum(s_g, 1e-12)
        qs = np.clip(np.rint(wg / s_g[:, None]) + 8, 0, 15)
        w1 = ((qs - 8) * s_g[:, None]).reshape(k, n)
        s_ch = np.abs(w1).max(axis=0, keepdims=True) / 127.0  # [1, n]
        fused = (s_g / s_ch).astype(np.float16)  # stored half
        base = name[:-len(".weight")]
        del packed[name]
        packed[base + ".B"] = _pack_weights(
            qs.reshape(k, n).astype(np.int64), 4, "qqq_group")
        packed[base + ".s_group"] = _pack_scales(fused, n, True, "qqq")
        s_ch32 = s_ch.astype(np.float32)
        packed[base + ".s_channel"] = _pack_scales(s_ch32, n, False, "qqq")
        # The loader reconstructs (q-8) * fused_half * s_channel with
        # the checkpoint-precision scales.
        w_deq = ((qs.reshape(k, n).astype(np.int32) - 8) *
                 np.repeat(fused.astype(np.float32), group, axis=0) *
                 s_ch32)
        twin[name] = np.ascontiguousarray(w_deq.T.astype(np.float32))
    mdir, ddir = str(tmp_path / "qqq"), str(tmp_path / "qqq_dense")
    _write_checkpoint(dense_dir, mdir, packed, quant_cfg={
        "quant_method": "qqq", "wbits": 4, "group_size": group})
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(mdir) == _greedy(ddir)


def test_qqq_channelwise_matches_rounded_dense(dense_dir, tmp_path):
    tensors = _dense_tensors(dense_dir)
    packed = dict(tensors)
    twin = dict(tensors)
    for name, arr in _targets(tensors):
        w_kn = np.ascontiguousarray(arr.T).astype(np.float64)
        k, n = w_kn.shape
        s_ch = np.abs(w_kn).max(axis=0, keepdims=True) / 7.0
        s_ch = np.maximum(s_ch, 1e-12)
        qs = np.clip(np.rint(w_kn / s_ch), -7, 7).astype(np.int64)
        stored = (s_ch / 16.0).astype(np.float32)
        base = name[:-len(".weight")]
        del packed[name]
        packed[base + ".B"] = _pack_weights(qs & 0xF, 4, "qqq_channel")
        packed[base + ".s_channel"] = _pack_scales(stored, n, False, "qqq")
        packed[base + ".s_group"] = np.zeros((0,), np.float16)
        w_ref = qs.astype(np.int32) * stored * 16.0
        twin[name] = np.ascontiguousarray(w_ref.T.astype(np.float32))
    mdir, ddir = str(tmp_path / "qqqc"), str(tmp_path / "qqqc_dense")
    _write_checkpoint(dense_dir, mdir, packed, quant_cfg={
        "quant_method": "qqq", "wbits": 4, "group_size": -1})
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(mdir) == _greedy(ddir)


# ---------------------------------------------------------------------------
# hqq


def test_hqq_matches_rounded_dense(dense_dir, tmp_path):
    tensors = _dense_tensors(dense_dir)
    packed = dict(tensors)
    twin = dict(tensors)
    group = 16
    n_q = 0
    for name, arr in _targets(tensors, need_tiles=False):
        w = np.asarray(arr, np.float64)  # HF [out, in]
        out_d, in_d = w.shape
        wg = w.reshape(out_d, in_d // group, group)
        mx, mn = wg.max(axis=2), wg.min(axis=2)
        qscale = 15.0 / np.maximum(mx - mn, 1e-8)
        zero = -mn * qscale
        q = np.clip(np.rint(wg * qscale[..., None] + zero[..., None]),
                    0, 15).astype(np.uint8)
        stored_scale = (1.0 / qscale).astype(np.float32)
        stored_zero = zero.astype(np.float32)
        # Mirror the loader's f32 arithmetic with the stored values.
        w_ref = ((q.reshape(out_d, in_d).astype(np.float32) -
                  np.repeat(stored_zero, group, axis=1)) *
                 np.repeat(stored_scale, group, axis=1))
        q2 = q.reshape(out_d, in_d)
        w_q = ((q2[:out_d // 2] << 4) | q2[out_d // 2:]).astype(np.uint8)
        base = name[:-len(".weight")]
        del packed[name]
        packed[base + ".W_q"] = w_q
        # hqq serializes scale/zero flat; exercise the reshape path.
        packed[base + ".scale"] = stored_scale.reshape(-1, 1)
        packed[base + ".zero"] = stored_zero.reshape(-1, 1)
        packed[base + ".shape"] = np.asarray([out_d, in_d], np.int64)
        packed[base + ".nbits"] = np.asarray([4], np.int64)
        twin[name] = np.ascontiguousarray(w_ref.astype(np.float32))
        n_q += 1
    assert n_q == 2 * 7  # every linear qualifies (no tile constraint)
    mdir, ddir = str(tmp_path / "hqq"), str(tmp_path / "hqq_dense")
    _write_checkpoint(dense_dir, mdir, packed, quant_cfg={
        "quant_method": "hqq",
        "quant_config": {"weight_quant_params":
                         {"nbits": 4, "group_size": group}}})
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(mdir) == _greedy(ddir)


# ---------------------------------------------------------------------------
# quant_llm fpx


def test_fpx_grid_round():
    from aphrodite_tpu.quantization.quant_llm import fpx_grid, round_to_fpx

    # E2M3: bias 1; normals 1.0->(1.875)*2^2; max_normal 7.5.
    grid = fpx_grid(2, 3)
    assert grid[0] == 0.0
    assert np.isclose(grid[-1], 7.5)
    assert grid.size == 32
    # A row whose max is exactly max_normal survives unchanged at the
    # top, and values round to nearest grid points after scaling.
    w = np.array([[7.5, 3.7, -0.11, 0.0]], np.float32)
    out = round_to_fpx(w, 2, 3, reduce_axis=-1)
    assert out[0, 0] == 7.5 and out[0, 3] == 0.0
    # 3.7/1.0 scale -> nearest of {3.5, 3.75} = 3.75
    assert np.isclose(out[0, 1], 3.75)
    # Ties round to the even grid code: 0.6875 is midway between
    # 0.625 (code 0b00101, odd) and 0.75 (code 0b00110, even).
    w = np.array([[7.5, 0.6875]], np.float32)
    out = round_to_fpx(w, 2, 3, reduce_axis=-1)
    assert np.isclose(out[0, 1], 0.75)


def test_fp6_engine_matches_prerounded_dense(dense_dir, tmp_path):
    from aphrodite_tpu.quantization.quant_llm import round_to_fpx

    tensors = _dense_tensors(dense_dir)
    twin = dict(tensors)
    for name, arr in _targets(tensors, need_tiles=False):
        twin[name] = round_to_fpx(np.asarray(arr, np.float32), 2, 3,
                                  reduce_axis=-1)
    ddir = str(tmp_path / "fp6_dense")
    _write_checkpoint(dense_dir, ddir, twin)
    assert _greedy(dense_dir, quantization="fp6") == _greedy(ddir)
