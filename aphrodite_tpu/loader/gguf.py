"""GGUF checkpoint loading: parser + k-quant block decoders.

TPU-native answer to the reference's GGUF stack (quantization/gguf.py,
gguf_utils/ reader and the CUDA dequant/mmq kernels kernels/quantization/
gguf/*): the file format and block layouts follow the public ggml spec.

Key design point: **Q4-family blocks map losslessly onto our int4
container** ({q4 [K,N] in 0..15, scale [K/32,N], zero [K/32,N]}, see
quantization/qlinear.py) because ggml's  w = d*sc*q - dmin*m  is exactly
(q - zero)*scale with scale = d*sc, zero = dmin*m/(d*sc). So GGUF q4_k /
q4_0 / q4_1 checkpoints keep serving weight-quantized through the fused
dequant-matmul Pallas kernel — no precision loss, no bf16 inflation.
Q5/Q6/Q8 blocks dequantize to the model dtype at load (kernel tier
later).

No external `gguf` package is used (not available here); the parser
supports GGUF v2/v3 little-endian files.
"""

import struct
from typing import Any, BinaryIO, Dict, Iterator, List, Optional, Tuple

import numpy as np

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)

GGUF_MAGIC = 0x46554747  # "GGUF"

# Metadata value types.
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32 = 0, 1, 2, 3, 4, 5
_T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = (
    6, 7, 8, 9, 10, 11, 12)

# ggml tensor types (subset).
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 10, 11, 12, 13, 14
GGML_BF16 = 30

QK_K = 256
# type -> (block_elems, block_bytes)
BLOCK_INFO = {
    GGML_F32: (1, 4),
    GGML_F16: (1, 2),
    GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18),
    GGML_Q4_1: (32, 20),
    GGML_Q5_0: (32, 22),
    GGML_Q5_1: (32, 24),
    GGML_Q8_0: (32, 34),
    GGML_Q4_K: (QK_K, 144),
    GGML_Q5_K: (QK_K, 176),
    GGML_Q6_K: (QK_K, 210),
}


def _read_str(f: BinaryIO) -> str:
    n = struct.unpack("<Q", f.read(8))[0]
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: int):
    if vtype == _T_U8:
        return struct.unpack("<B", f.read(1))[0]
    if vtype == _T_I8:
        return struct.unpack("<b", f.read(1))[0]
    if vtype == _T_U16:
        return struct.unpack("<H", f.read(2))[0]
    if vtype == _T_I16:
        return struct.unpack("<h", f.read(2))[0]
    if vtype == _T_U32:
        return struct.unpack("<I", f.read(4))[0]
    if vtype == _T_I32:
        return struct.unpack("<i", f.read(4))[0]
    if vtype == _T_F32:
        return struct.unpack("<f", f.read(4))[0]
    if vtype == _T_BOOL:
        return bool(f.read(1)[0])
    if vtype == _T_STR:
        return _read_str(f)
    if vtype == _T_U64:
        return struct.unpack("<Q", f.read(8))[0]
    if vtype == _T_I64:
        return struct.unpack("<q", f.read(8))[0]
    if vtype == _T_F64:
        return struct.unpack("<d", f.read(8))[0]
    if vtype == _T_ARR:
        etype = struct.unpack("<I", f.read(4))[0]
        n = struct.unpack("<Q", f.read(8))[0]
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown gguf metadata type {vtype}")


class GGUFTensorInfo:
    def __init__(self, name: str, dims: List[int], ggml_type: int,
                 offset: int):
        self.name = name
        self.dims = dims  # ggml order: dims[0] is contiguous (row length)
        self.ggml_type = ggml_type
        self.offset = offset


class GGUFFile:
    """Parsed GGUF: metadata dict + lazy tensor access via memmap."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.metadata: Dict[str, Any] = {}
        self.tensors: Dict[str, GGUFTensorInfo] = {}
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path} is not a GGUF file")
            if version not in (2, 3):
                raise ValueError(f"unsupported GGUF version {version}")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = _read_str(f)
                vtype = struct.unpack("<I", f.read(4))[0]
                self.metadata[key] = _read_value(f, vtype)
            for _ in range(n_tensors):
                name = _read_str(f)
                ndim = struct.unpack("<I", f.read(4))[0]
                dims = list(struct.unpack(f"<{ndim}Q", f.read(8 * ndim)))
                ggml_type = struct.unpack("<I", f.read(4))[0]
                offset = struct.unpack("<Q", f.read(8))[0]
                self.tensors[name] = GGUFTensorInfo(name, dims, ggml_type,
                                                    offset)
            align = self.metadata.get("general.alignment", 32)
            pos = f.tell()
            self.data_start = (pos + align - 1) // align * align
        self._mmap = np.memmap(path, dtype=np.uint8, mode="r")

    def raw_blocks(self, info: GGUFTensorInfo) -> np.ndarray:
        """uint8[rows, row_bytes] raw block data for a 2D/1D tensor."""
        elems, bbytes = BLOCK_INFO[info.ggml_type]
        row_len = info.dims[0]
        rows = int(np.prod(info.dims[1:])) if len(info.dims) > 1 else 1
        assert row_len % elems == 0, (info.name, row_len, elems)
        row_bytes = row_len // elems * bbytes
        start = self.data_start + info.offset
        data = self._mmap[start:start + rows * row_bytes]
        return np.asarray(data).reshape(rows, row_bytes)


# ---------------------------------------------------------------------------
# Block decoders. All operate on uint8[rows, row_bytes] -> per-row output.
# ---------------------------------------------------------------------------


def _f16(u8pair: np.ndarray) -> np.ndarray:
    return u8pair.view(np.float16).astype(np.float32)


def decode_f32(raw: np.ndarray, row_len: int) -> np.ndarray:
    return raw.view(np.float32).reshape(-1, row_len)


def decode_f16(raw: np.ndarray, row_len: int) -> np.ndarray:
    return raw.view(np.float16).astype(np.float32).reshape(-1, row_len)


def decode_bf16(raw: np.ndarray, row_len: int) -> np.ndarray:
    import ml_dtypes

    return raw.view(ml_dtypes.bfloat16).astype(np.float32).reshape(
        -1, row_len)


def decode_q8_0(raw: np.ndarray, row_len: int) -> np.ndarray:
    """block: d f16 + 32 int8; w = d * q."""
    rows = raw.shape[0]
    blocks = raw.reshape(rows, -1, 34)
    d = blocks[:, :, :2].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)  # [rows, nb, 1]
    q = blocks[:, :, 2:].copy().view(np.int8).astype(np.float32)
    return (d * q).reshape(rows, row_len)


def decode_q4_0_container(raw: np.ndarray, row_len: int):
    """Q4_0 -> int4 container pieces (q [rows,row_len], scale, zero with
    group 32). w = d * (q - 8)."""
    rows = raw.shape[0]
    blocks = raw.reshape(rows, -1, 18)
    d = blocks[:, :, :2].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]  # [rows, nb]
    qs = blocks[:, :, 2:]  # [rows, nb, 16]
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    # ggml q4_0 layout: value j in 0..15 from low nibble, 16..31 high.
    q = np.concatenate([lo, hi], axis=2).reshape(rows, row_len)
    scale = d
    zero = np.full_like(scale, 8.0)
    return q, scale, zero


def decode_q4_1_container(raw: np.ndarray, row_len: int):
    """Q4_1: w = d * q + m -> zero = -m/d."""
    rows = raw.shape[0]
    blocks = raw.reshape(rows, -1, 20)
    d = blocks[:, :, :2].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]
    m = blocks[:, :, 2:4].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]
    qs = blocks[:, :, 4:]
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    q = np.concatenate([lo, hi], axis=2).reshape(rows, row_len)
    safe_d = np.where(d == 0, 1e-8, d)
    return q, d, -m / safe_d


def _q4k_scale_min(scales: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min table of Q4_K/Q5_K
    (ggml get_scale_min_k4): 8 (sc, m) pairs per super-block."""
    # scales: [rows, nsb, 12] uint8
    sc = np.zeros(scales.shape[:2] + (8,), np.float32)
    mn = np.zeros_like(sc)
    s = scales.astype(np.uint16)
    for j in range(4):
        sc[:, :, j] = (s[:, :, j] & 63).astype(np.float32)
        mn[:, :, j] = (s[:, :, j + 4] & 63).astype(np.float32)
    for j in range(4, 8):
        sc[:, :, j] = ((s[:, :, j + 4] & 0xF) |
                       ((s[:, :, j - 4] >> 6) << 4)).astype(np.float32)
        mn[:, :, j] = ((s[:, :, j + 4] >> 4) |
                       ((s[:, :, j] >> 6) << 4)).astype(np.float32)
    return sc, mn


def decode_q4_k_container(raw: np.ndarray, row_len: int):
    """Q4_K super-block (256): d f16, dmin f16, scales[12], qs[128].
    Sub-block j (32 values): w = (d*sc_j) * q - (dmin*m_j)
    -> container scale = d*sc_j, zero = dmin*m_j / (d*sc_j)."""
    rows = raw.shape[0]
    blocks = raw.reshape(rows, -1, 144)
    nsb = blocks.shape[1]
    d = blocks[:, :, 0:2].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]  # [rows, nsb]
    dmin = blocks[:, :, 2:4].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]
    sc, mn = _q4k_scale_min(blocks[:, :, 4:16])  # [rows, nsb, 8]
    qs = blocks[:, :, 16:144]  # [rows, nsb, 128]
    # Layout: 4 chunks of 32 bytes; chunk c holds sub-blocks 2c (low
    # nibbles) and 2c+1 (high nibbles).
    qs = qs.reshape(rows, nsb, 4, 32)
    lo = (qs & 0xF).astype(np.int8)  # sub-blocks 0,2,4,6
    hi = (qs >> 4).astype(np.int8)  # sub-blocks 1,3,5,7
    q = np.stack([lo, hi], axis=3)  # [rows, nsb, 4, 2, 32]
    q = q.reshape(rows, nsb, 8, 32).reshape(rows, row_len)
    scale = d[:, :, None] * sc  # [rows, nsb, 8]
    zero = np.where(scale != 0,
                    (dmin[:, :, None] * mn) / np.where(scale == 0, 1.0,
                                                       scale), 0.0)
    scale = scale.reshape(rows, -1)  # group = 32
    zero = zero.reshape(rows, -1)
    return q, scale.astype(np.float32), zero.astype(np.float32)


def decode_q6_k(raw: np.ndarray, row_len: int) -> np.ndarray:
    """Q6_K (256): ql[128], qh[64], scales[16] i8, d f16.
    w = d * sc_j * (q6 - 32), 16 sub-blocks of 16."""
    rows = raw.shape[0]
    blocks = raw.reshape(rows, -1, 210)
    nsb = blocks.shape[1]
    ql = blocks[:, :, 0:128]
    qh = blocks[:, :, 128:192]
    scales = blocks[:, :, 192:208].copy().view(np.int8).astype(np.float32)
    d = blocks[:, :, 208:210].reshape(rows, -1, 2).copy().view(
        np.float16).astype(np.float32)[:, :, 0]
    # ggml layout: per 128-value half (n=0,1): for l in 0..31:
    #   q[l+ 0] = (ql[l]    & 0xF) | ((qh[l] >> 0 & 3) << 4)
    #   q[l+32] = (ql[l+32] & 0xF) | ((qh[l] >> 2 & 3) << 4)
    #   q[l+64] = (ql[l]    >>  4) | ((qh[l] >> 4 & 3) << 4)
    #   q[l+96] = (ql[l+32] >>  4) | ((qh[l] >> 6 & 3) << 4)
    ql = ql.reshape(rows, nsb, 2, 64)
    qh = qh.reshape(rows, nsb, 2, 32)
    l0 = (ql[:, :, :, 0:32] & 0xF) | ((qh & 0x3) << 4)
    l1 = (ql[:, :, :, 32:64] & 0xF) | (((qh >> 2) & 0x3) << 4)
    l2 = (ql[:, :, :, 0:32] >> 4) | (((qh >> 4) & 0x3) << 4)
    l3 = (ql[:, :, :, 32:64] >> 4) | (((qh >> 6) & 0x3) << 4)
    q = np.concatenate([l0, l1, l2, l3], axis=3).astype(np.float32) - 32.0
    # Scales: 16 sub-blocks of 16 values -> within each 128-half there
    # are 8 scale entries (j = half*8 + l//16).
    sc = scales.reshape(rows, nsb, 16)
    sc = np.repeat(sc, 16, axis=2).reshape(rows, nsb, 2, 128)
    out = d[:, :, None, None] * sc * q
    return out.reshape(rows, row_len)


def dequant_tensor(gg: GGUFFile, info: GGUFTensorInfo) -> np.ndarray:
    """Full-precision [out, in] float32 for any supported tensor type."""
    row_len = info.dims[0]
    raw = gg.raw_blocks(info)
    t = info.ggml_type
    if t == GGML_F32:
        out = decode_f32(raw, row_len)
    elif t == GGML_F16:
        out = decode_f16(raw, row_len)
    elif t == GGML_BF16:
        out = decode_bf16(raw, row_len)
    elif t == GGML_Q8_0:
        out = decode_q8_0(raw, row_len)
    elif t == GGML_Q6_K:
        out = decode_q6_k(raw, row_len)
    elif t in (GGML_Q4_0, GGML_Q4_1, GGML_Q4_K):
        q, scale, zero = to_int4_pieces(gg, info)
        G = row_len // scale.shape[1]
        s = np.repeat(scale, G, axis=1)
        z = np.repeat(zero, G, axis=1)
        out = (q.astype(np.float32) - z) * s
    else:
        raise ValueError(
            f"GGUF tensor type {t} ({info.name}) not supported yet")
    shape = list(reversed(info.dims))
    return out.reshape(shape)


def to_int4_pieces(gg: GGUFFile, info: GGUFTensorInfo):
    """(q [rows,row_len], scale [rows,row_len/32], zero) for q4 types."""
    row_len = info.dims[0]
    raw = gg.raw_blocks(info)
    t = info.ggml_type
    if t == GGML_Q4_0:
        return decode_q4_0_container(raw, row_len)
    if t == GGML_Q4_1:
        return decode_q4_1_container(raw, row_len)
    if t == GGML_Q4_K:
        return decode_q4_k_container(raw, row_len)
    raise ValueError(f"not a q4 type: {t}")


# ---------------------------------------------------------------------------
# Model integration
# ---------------------------------------------------------------------------

# GGUF tensor name -> our param path (llama-family archs).
_GGUF_LAYER_MAP = {
    "blk.{i}.attn_norm.weight": "layers.input_norm",
    "blk.{i}.attn_q.weight": "layers.wq",
    "blk.{i}.attn_k.weight": "layers.wk",
    "blk.{i}.attn_v.weight": "layers.wv",
    "blk.{i}.attn_output.weight": "layers.wo",
    "blk.{i}.ffn_norm.weight": "layers.post_norm",
    "blk.{i}.ffn_gate.weight": "layers.gate",
    "blk.{i}.ffn_up.weight": "layers.up",
    "blk.{i}.ffn_down.weight": "layers.down",
    "blk.{i}.attn_q.bias": "layers.bq",
    "blk.{i}.attn_k.bias": "layers.bk",
    "blk.{i}.attn_v.bias": "layers.bv",
}
_GGUF_GLOBAL_MAP = {
    "token_embd.weight": "embed",
    "output_norm.weight": "final_norm",
    "output.weight": "lm_head",
}

_ARCH_TO_HF = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "phi3": "Phi3ForCausalLM",
}


def gguf_to_hf_config(path: str) -> Dict[str, Any]:
    """Synthesize an HF-style config dict from GGUF metadata (reference
    transformers_utils config extraction for gguf)."""
    gg = GGUFFile(path)
    md = gg.metadata
    arch = md.get("general.architecture", "llama")

    def g(key, default=None):
        return md.get(f"{arch}.{key}", default)

    heads = int(g("attention.head_count", 32))
    embd = int(g("embedding_length", 4096))
    vocab = gg.tensors["token_embd.weight"].dims[1] if \
        "token_embd.weight" in gg.tensors else len(
            md.get("tokenizer.ggml.tokens", []) or [32000])
    cfg = {
        "architectures": [_ARCH_TO_HF.get(arch, "LlamaForCausalLM")],
        "hidden_size": embd,
        "intermediate_size": int(g("feed_forward_length", 11008)),
        "num_hidden_layers": int(g("block_count", 32)),
        "num_attention_heads": heads,
        "num_key_value_heads": int(g("attention.head_count_kv", heads)),
        "max_position_embeddings": int(g("context_length", 2048)),
        "rms_norm_eps": float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "vocab_size": int(vocab),
        "torch_dtype": "bfloat16",
        "tie_word_embeddings": "output.weight" not in gg.tensors,
    }
    head_dim = g("attention.key_length")
    if head_dim:
        cfg["head_dim"] = int(head_dim)
    return cfg


def load_gguf_params_to_host(model, path: str) -> Dict[str, Any]:
    """Assemble the host params pytree from a GGUF file. Q4-family linear
    weights stay quantized (int4 containers); everything else dequants to
    float32 (cast to model dtype at placement)."""
    from aphrodite_tpu.loader.weights import _set_path

    gg = GGUFFile(path)
    num_layers = model.num_layers
    quantizable = set(model.quantizable_weights())

    name_map: Dict[str, Tuple[str, Optional[int]]] = {}
    for template, our_path in _GGUF_LAYER_MAP.items():
        for i in range(num_layers):
            name_map[template.format(i=i)] = (our_path, i)
    for name, our_path in _GGUF_GLOBAL_MAP.items():
        name_map[name] = (our_path, None)

    pieces: Dict[str, List[Optional[Any]]] = {}
    params: Dict[str, Any] = {}
    for name, info in gg.tensors.items():
        target = name_map.get(name)
        if target is None:
            logger.debug("skipping unmapped gguf tensor %s", name)
            continue
        our_path, layer_idx = target
        is_q4 = info.ggml_type in (GGML_Q4_0, GGML_Q4_1, GGML_Q4_K)
        if our_path in quantizable and is_q4:
            q, scale, zero = to_int4_pieces(gg, info)
            # ggml rows = out features; our layout is [in, out].
            from aphrodite_tpu.quantization.int4 import maybe_pack

            piece = maybe_pack({
                "q4": np.ascontiguousarray(q.T),
                "scale": np.ascontiguousarray(scale.T),
                "zero": np.ascontiguousarray(zero.T),
            })
        else:
            arr = dequant_tensor(gg, info)  # [out, in] or [n]
            if arr.ndim == 2 and our_path not in ("embed",):
                arr = np.ascontiguousarray(arr.T)
            piece = arr
        if hasattr(model, "maybe_pad_kv_weight") and not isinstance(
                piece, dict):
            piece = model.maybe_pad_kv_weight(our_path, piece)
        if layer_idx is None:
            _set_path(params, our_path, piece)
        else:
            pieces.setdefault(our_path, [None] * num_layers)
            pieces[our_path][layer_idx] = piece

    for our_path, layer_list in pieces.items():
        missing = [i for i, a in enumerate(layer_list) if a is None]
        if missing:
            raise ValueError(f"gguf missing layers {missing[:4]} for "
                             f"{our_path}")
        if isinstance(layer_list[0], dict):
            stacked = {
                k: np.stack([c[k] for c in layer_list], axis=0)
                for k in layer_list[0]
            }
        else:
            stacked = np.stack(layer_list, axis=0)
        _set_path(params, our_path, stacked)
    return params
