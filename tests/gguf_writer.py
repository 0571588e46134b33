"""Minimal GGUF v3 writer for tests (independent re-implementation of the
public ggml spec — used to validate the loader's parser and block
decoders without network access to real GGUF checkpoints)."""

import struct
from typing import Any, Dict, List, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747
_T_U32, _T_F32, _T_STR, _T_ARR, _T_U64 = 4, 6, 8, 9, 10
_T_BOOL = 7


def _w_str(out, s: str):
    b = s.encode()
    out += struct.pack("<Q", len(b)) + b
    return out


def _w_value(out: bytearray, v):
    if isinstance(v, bool):
        out += struct.pack("<I", _T_BOOL) + struct.pack("<B", int(v))
    elif isinstance(v, int):
        out += struct.pack("<I", _T_U32) + struct.pack("<I", v)
    elif isinstance(v, float):
        out += struct.pack("<I", _T_F32) + struct.pack("<f", v)
    elif isinstance(v, str):
        out += struct.pack("<I", _T_STR)
        _w_str(out, v)
    else:
        raise TypeError(type(v))
    return out


def pack_q8_0(w: np.ndarray) -> bytes:
    """[rows, row_len] float -> q8_0 blocks."""
    rows, n = w.shape
    assert n % 32 == 0
    blocks = w.reshape(rows, -1, 32)
    d = np.abs(blocks).max(axis=2) / 127.0
    d = np.where(d == 0, 1e-8, d).astype(np.float32)
    q = np.clip(np.round(blocks / d[:, :, None]), -128,
                127).astype(np.int8)
    out = bytearray()
    d16 = d.astype(np.float16)
    for r in range(rows):
        for b in range(blocks.shape[1]):
            out += d16[r, b].tobytes() + q[r, b].tobytes()
    return bytes(out)


def pack_q4_k(q: np.ndarray, d: np.ndarray, dmin: np.ndarray,
              sc: np.ndarray, mn: np.ndarray) -> bytes:
    """Pack explicit Q4_K super-blocks.

    q: uint8[rows, n] values in 0..15 (n % 256 == 0)
    d, dmin: f32[rows, nsb]; sc, mn: uint8[rows, nsb, 8] values in 0..63.
    """
    rows, n = q.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            out += np.float16(d[r, s]).tobytes()
            out += np.float16(dmin[r, s]).tobytes()
            scales = np.zeros(12, np.uint8)
            for j in range(4):
                scales[j] = sc[r, s, j] & 63
                scales[j + 4] = mn[r, s, j] & 63
            for j in range(4, 8):
                scales[j - 4] |= (sc[r, s, j] >> 4) << 6
                scales[j] |= (mn[r, s, j] >> 4) << 6
                scales[j + 4] = (sc[r, s, j] & 0xF) | (
                    (mn[r, s, j] & 0xF) << 4)
            out += scales.tobytes()
            vals = q[r, s * 256:(s + 1) * 256].reshape(8, 32)
            qs = np.zeros((4, 32), np.uint8)
            for c in range(4):
                qs[c] = vals[2 * c] | (vals[2 * c + 1] << 4)
            out += qs.tobytes()
    return bytes(out)


def write_gguf(path: str, metadata: Dict[str, Any],
               tensors: List[Tuple[str, List[int], int, bytes]],
               alignment: int = 32) -> None:
    """tensors: (name, ggml_dims, ggml_type, raw_block_bytes)."""
    out = bytearray()
    out += struct.pack("<II", GGUF_MAGIC, 3)
    out += struct.pack("<QQ", len(tensors), len(metadata) + 1)
    _w_str(out, "general.alignment")
    _w_value(out, alignment)
    for k, v in metadata.items():
        _w_str(out, k)
        _w_value(out, v)
    offset = 0
    datas = []
    for name, dims, gtype, data in tensors:
        _w_str(out, name)
        out += struct.pack("<I", len(dims))
        for dd in dims:
            out += struct.pack("<Q", dd)
        out += struct.pack("<I", gtype)
        out += struct.pack("<Q", offset)
        pad = (-len(data)) % alignment
        datas.append(data + b"\x00" * pad)
        offset += len(data) + pad
    start = len(out)
    pad = (-start) % alignment
    out += b"\x00" * pad
    for d in datas:
        out += d
    with open(path, "wb") as f:
        f.write(bytes(out))


def tiny_llama_to_gguf(hf_dir: str, gguf_path: str,
                       quant: str = "f32") -> None:
    """Convert the tiny test Llama checkpoint to a GGUF file."""
    import json
    import os

    from safetensors import safe_open

    with open(os.path.join(hf_dir, "config.json")) as f:
        cfg = json.load(f)

    tensors_np = {}
    for fn in os.listdir(hf_dir):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(hf_dir, fn), framework="np") as f:
                for name in f.keys():
                    tensors_np[name] = np.asarray(f.get_tensor(name),
                                                  dtype=np.float32)

    name_map = {
        "model.embed_tokens.weight": "token_embd.weight",
        "model.norm.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        name_map.update({
            f"{p}.input_layernorm.weight": f"blk.{i}.attn_norm.weight",
            f"{p}.self_attn.q_proj.weight": f"blk.{i}.attn_q.weight",
            f"{p}.self_attn.k_proj.weight": f"blk.{i}.attn_k.weight",
            f"{p}.self_attn.v_proj.weight": f"blk.{i}.attn_v.weight",
            f"{p}.self_attn.o_proj.weight": f"blk.{i}.attn_output.weight",
            f"{p}.post_attention_layernorm.weight":
            f"blk.{i}.ffn_norm.weight",
            f"{p}.mlp.gate_proj.weight": f"blk.{i}.ffn_gate.weight",
            f"{p}.mlp.up_proj.weight": f"blk.{i}.ffn_up.weight",
            f"{p}.mlp.down_proj.weight": f"blk.{i}.ffn_down.weight",
        })

    gg_tensors = []
    for hf_name, gg_name in name_map.items():
        if hf_name not in tensors_np:
            continue
        arr = tensors_np[hf_name]
        # ggml dims: [row_len, rows] with rows = out features.
        if arr.ndim == 2:
            dims = [arr.shape[1], arr.shape[0]]
        else:
            dims = [arr.shape[0]]
        block = 32 if quant == "q8_0" else 256
        quantizable = (quant != "f32" and arr.ndim == 2
                       and "norm" not in gg_name
                       and arr.shape[1] % block == 0
                       and gg_name not in ("token_embd.weight",))
        if quantizable and quant == "q8_0":
            gg_tensors.append((gg_name, dims, 8, pack_q8_0(arr)))
        elif quantizable and quant == "q6_k":
            gg_tensors.append((gg_name, dims, 14, quantize_q6_k(arr)))
        else:
            gg_tensors.append((gg_name, dims, 0,
                               arr.astype("<f4").tobytes()))

    metadata = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg["hidden_size"],
        "llama.block_count": cfg["num_hidden_layers"],
        "llama.attention.head_count": cfg["num_attention_heads"],
        "llama.attention.head_count_kv": cfg["num_key_value_heads"],
        "llama.feed_forward_length": cfg["intermediate_size"],
        "llama.context_length": cfg["max_position_embeddings"],
        "llama.attention.layer_norm_rms_epsilon": cfg["rms_norm_eps"],
        "llama.rope.freq_base": cfg.get("rope_theta", 10000.0),
        "llama.attention.key_length": cfg.get(
            "head_dim",
            cfg["hidden_size"] // cfg["num_attention_heads"]),
    }
    write_gguf(gguf_path, metadata, gg_tensors)


def pack_q6_k(q: np.ndarray, d: np.ndarray, scales: np.ndarray) -> bytes:
    """q: uint8[rows, n] values 0..63 (canonical order), d f32[rows,nsb],
    scales int8[rows, nsb, 16]."""
    rows, n = q.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            blk = q[r, s * 256:(s + 1) * 256].reshape(2, 4, 32)
            ql = np.zeros((2, 64), np.uint8)
            qh = np.zeros((2, 32), np.uint8)
            for h in range(2):
                l0, l1, l2, l3 = blk[h]
                ql[h, 0:32] = (l0 & 0xF) | ((l2 & 0xF) << 4)
                ql[h, 32:64] = (l1 & 0xF) | ((l3 & 0xF) << 4)
                qh[h] = ((l0 >> 4) | ((l1 >> 4) << 2) | ((l2 >> 4) << 4)
                         | ((l3 >> 4) << 6))
            out += ql.tobytes() + qh.tobytes()
            out += scales[r, s].astype(np.int8).tobytes()
            out += np.float16(d[r, s]).tobytes()
    return bytes(out)


def pack_q5_k(q: np.ndarray, d: np.ndarray, dmin: np.ndarray,
              sc: np.ndarray, mn: np.ndarray) -> bytes:
    """q uint8[rows, n] 0..31; rest like pack_q4_k."""
    rows, n = q.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            out += np.float16(d[r, s]).tobytes()
            out += np.float16(dmin[r, s]).tobytes()
            scales = np.zeros(12, np.uint8)
            for j in range(4):
                scales[j] = sc[r, s, j] & 63
                scales[j + 4] = mn[r, s, j] & 63
            for j in range(4, 8):
                scales[j - 4] |= (sc[r, s, j] >> 4) << 6
                scales[j] |= (mn[r, s, j] >> 4) << 6
                scales[j + 4] = (sc[r, s, j] & 0xF) | (
                    (mn[r, s, j] & 0xF) << 4)
            out += scales.tobytes()
            vals = q[r, s * 256:(s + 1) * 256].reshape(4, 2, 32)
            qh = np.zeros(32, np.uint8)
            qs = np.zeros((4, 32), np.uint8)
            for c in range(4):
                lo, hi = vals[c]
                qs[c] = (lo & 0xF) | ((hi & 0xF) << 4)
                qh |= ((lo >> 4) << (2 * c)) | ((hi >> 4) << (2 * c + 1))
            out += qh.tobytes() + qs.tobytes()
    return bytes(out)


def pack_q2_k(q: np.ndarray, d: np.ndarray, dmin: np.ndarray,
              sc: np.ndarray, mn: np.ndarray) -> bytes:
    """q uint8[rows, n] 0..3; sc/mn uint8[rows, nsb, 16] 0..15."""
    rows, n = q.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            out += ((sc[r, s] & 0xF) | (mn[r, s] << 4)).astype(
                np.uint8).tobytes()
            blk = q[r, s * 256:(s + 1) * 256].reshape(2, 4, 32)
            qs = np.zeros((2, 32), np.uint8)
            for h in range(2):
                for j in range(4):
                    qs[h] |= (blk[h, j] & 3) << (2 * j)
            out += qs.tobytes()
            out += np.float16(d[r, s]).tobytes()
            out += np.float16(dmin[r, s]).tobytes()
    return bytes(out)


def pack_q3_k(q: np.ndarray, d: np.ndarray, sc6: np.ndarray) -> bytes:
    """q uint8[rows, n] 0..7; sc6 uint8[rows, nsb, 16] 0..63."""
    rows, n = q.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            blk = q[r, s * 256:(s + 1) * 256].reshape(2, 4, 32)
            hmask = np.zeros(32, np.uint8)
            qs = np.zeros((2, 32), np.uint8)
            for h in range(2):
                for j in range(4):
                    qs[h] |= (blk[h, j] & 3) << (2 * j)
                    hmask |= (blk[h, j] >> 2) << (h * 4 + j)
            out += hmask.tobytes() + qs.tobytes()
            raw = np.zeros(12, np.uint8)
            v = sc6[r, s]
            for i in range(4):
                raw[i] = (v[i] & 0xF) | ((v[8 + i] & 0xF) << 4)
                raw[4 + i] = (v[4 + i] & 0xF) | ((v[12 + i] & 0xF) << 4)
                raw[8 + i] = (((v[i] >> 4) & 3) | (((v[4 + i] >> 4) & 3)
                              << 2) | (((v[8 + i] >> 4) & 3) << 4)
                              | (((v[12 + i] >> 4) & 3) << 6))
            out += raw.tobytes()
            out += np.float16(d[r, s]).tobytes()
    return bytes(out)


def pack_q5_0(q: np.ndarray, d: np.ndarray) -> bytes:
    """q uint8[rows, n] 0..31, d f32[rows, n/32]."""
    rows, n = q.shape
    out = bytearray()
    for r in range(rows):
        for b in range(n // 32):
            v = q[r, b * 32:(b + 1) * 32]
            qs = (v[:16] & 0xF) | ((v[16:] & 0xF) << 4)
            qh = 0
            for j in range(16):
                qh |= int(v[j] >> 4) << j
                qh |= int(v[16 + j] >> 4) << (16 + j)
            out += np.float16(d[r, b]).tobytes()
            out += struct.pack("<I", qh) + qs.astype(np.uint8).tobytes()
    return bytes(out)


def pack_iq4_nl(idx: np.ndarray, d: np.ndarray) -> bytes:
    """idx uint8[rows, n] table indices 0..15, d f32[rows, n/32]."""
    rows, n = idx.shape
    out = bytearray()
    for r in range(rows):
        for b in range(n // 32):
            v = idx[r, b * 32:(b + 1) * 32]
            qs = v[:16] | (v[16:] << 4)
            out += np.float16(d[r, b]).tobytes()
            out += qs.astype(np.uint8).tobytes()
    return bytes(out)


def pack_iq4_xs(idx: np.ndarray, d: np.ndarray,
                sc6: np.ndarray) -> bytes:
    """idx uint8[rows, n] 0..15; d f32[rows, nsb]; sc6 uint8[rows,nsb,8]
    values 0..63."""
    rows, n = idx.shape
    nsb = n // 256
    out = bytearray()
    for r in range(rows):
        for s in range(nsb):
            v = sc6[r, s]
            sh = 0
            for j in range(8):
                sh |= int(v[j] >> 4) << (2 * j)
            sl = np.zeros(4, np.uint8)
            for j in range(8):
                sl[j // 2] |= (v[j] & 0xF) << (4 * (j % 2))
            blk = idx[r, s * 256:(s + 1) * 256].reshape(8, 32)
            qs = np.zeros((8, 16), np.uint8)
            for sb in range(8):
                qs[sb] = blk[sb, :16] | (blk[sb, 16:] << 4)
            out += np.float16(d[r, s]).tobytes()
            out += struct.pack("<H", sh) + sl.tobytes() + qs.tobytes()
    return bytes(out)


def quantize_q6_k(w: np.ndarray) -> bytes:
    """Naive q6_k quantization of float rows (two-level: f16 d per 256,
    int8 sub-scale per 16, 6-bit values biased by 32)."""
    rows, n = w.shape
    assert n % 256 == 0
    nsb = n // 256
    blocks = w.reshape(rows, nsb, 16, 16)
    sub_amax = np.abs(blocks).max(axis=3)  # [rows, nsb, 16]
    d = sub_amax.max(axis=2) / (31.0 * 127.0)  # [rows, nsb]
    d = np.where(d == 0, 1e-8, d).astype(np.float32)
    sc = np.clip(np.round(sub_amax / (31.0 * d[:, :, None])), 1,
                 127).astype(np.int8)
    denom = d[:, :, None, None] * sc[:, :, :, None].astype(np.float32)
    q = np.clip(np.round(blocks / denom) + 32, 0, 63).astype(np.uint8)
    return pack_q6_k(q.reshape(rows, n), d, sc)
