"""Marlin-family packed checkpoints -> dense weights at load time.

The reference serves these through hand-tuned CUDA tile kernels
(quantization/marlin.py, gptq_marlin_24.py, qqq.py); the packed layouts
are pure permutations of a plain [K, N] int-quantized matrix designed
around Ampere's mma.sync tiles, so they carry nothing a TPU kernel can
use. We invert the permutations on host at load and serve dense (or let
the runtime int4/int8 re-quantization take over afterwards).

Layout spec (from the reference's packers,
quantization/utils/marlin_utils_test.py:30-92 marlin_permute_weights /
marlin_weights + get_weight_perm, marlin_utils.py:172-193
get_scale_perms / marlin_permute_scales):

  1. tile:   q[K, N] -> reshape(K/16, 16, N/16, 16).transpose(0,2,1,3)
             .reshape(K/16, N*16)
  2. perm:   rows of 1024 columns shuffled by a fixed per-format table
             (built from the mma thread map, then lane-interleaved)
  3. pack:   groups of `32/bits` consecutive columns fold into one
             int32, value i at bit `bits*i`

Scales are row-permuted by a 64-entry table (grouped) or a 32/64-entry
"single" table (channelwise) then reshaped to [K/g, N].

Variants:
- marlin (quantize_config checkpoint_format "marlin"): B int32
  [K/16, N], s fp16; 4-bit symmetric, value = (q - 8) * s.
- gptq_marlin_24 (checkpoint_format "marlin_24",
  gptq_marlin_24.py:253-255): B_24 packs the 2:4-COMPRESSED [K/2, N]
  matrix, B_meta carries the CUTLASS sparse metadata (2-bit in-quad
  positions, rows reordered by the ColumnMajorInterleaved<2> scatter of
  marlin_utils_test_24.py:28-54), s as marlin with its own scale perm.
- qqq (qqq.py:226-229): B as marlin with QQQ's perm, s_group fp16
  [K/g, N] fused group scales plus s_channel fp32 [1, N]; per-channel
  checkpoints store signed nibbles and s_channel pre-divided by
  2^(8-bits) (quant_utils.py:292-308).
"""

from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)


# ---------------------------------------------------------------------------
# permutation tables


def _interleaved(perm: np.ndarray, lanes) -> np.ndarray:
    lanes = np.asarray(lanes)
    return perm.reshape(-1, lanes.size)[:, lanes].ravel()


def _weight_perm(num_bits: int, variant: str) -> np.ndarray:
    """The 1024-entry column permutation applied per tile-row block."""
    out = []
    for i in range(32):
        col = i // 4
        if variant == "marlin24":
            rows = [2 * (i % 4), 2 * (i % 4) + 1,
                    2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1]
            base = [16 * r + (col // 2) * 256 + 8 * (col % 2) + 4 * b
                    for b in (0, 1) for r in rows]
            out += [p + j for j in range(4) for p in base]
        elif variant.startswith("qqq"):
            rows = [4 * (i % 4) + d for d in range(4)]
            base = [16 * r + col + 8 * b for b in (0, 1) for r in rows]
            out += [p + 256 * j for j in range(4) for p in base]
        else:  # classic marlin
            rows = [2 * (i % 4), 2 * (i % 4) + 1,
                    2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1]
            base = [16 * r + col + 8 * b for b in (0, 1) for r in rows]
            out += [p + 256 * j for j in range(4) for p in base]
    perm = np.asarray(out, np.int64)
    if variant == "qqq_channel":
        lanes = [4, 0, 5, 1, 6, 2, 7, 3]
    elif num_bits == 4:
        lanes = [0, 2, 4, 6, 1, 3, 5, 7]
    else:
        lanes = [0, 2, 1, 3]
    return _interleaved(perm, lanes)


def _scale_perms(variant: str) -> Tuple[np.ndarray, np.ndarray]:
    if variant == "marlin24":
        grouped = [i * 8 + j for i in range(8)
                   for j in (0, 4, 1, 5, 2, 6, 3, 7)]
        single = list(range(64))
    else:
        grouped = [i + 8 * j for i in range(8) for j in range(8)]
        single = [2 * i + j for i in range(4)
                  for j in (0, 1, 8, 9, 16, 17, 24, 25)]
    return np.asarray(grouped, np.int64), np.asarray(single, np.int64)


# ---------------------------------------------------------------------------
# inverses


def _unpack_weights(packed: np.ndarray, size_k: int, size_n: int,
                    num_bits: int, perm: np.ndarray) -> np.ndarray:
    """int32 [K/16, N*16/(32/bits)] -> uint [K, N] quantized values."""
    pf = 32 // num_bits
    mask = (1 << num_bits) - 1
    b = np.ascontiguousarray(packed).view(np.uint32)
    rows = b.shape[0]
    q = np.zeros((rows, b.shape[1] * pf), np.uint32)
    for i in range(pf):
        q[:, i::pf] = (b >> (num_bits * i)) & mask
    z = q.reshape(-1, perm.size)
    x = np.empty_like(z)
    x[:, perm] = z
    x = x.reshape(rows, size_n * 16)
    return (x.reshape(size_k // 16, size_n // 16, 16, 16)
            .transpose(0, 2, 1, 3).reshape(size_k, size_n))


def _unperm_scales(s: np.ndarray, size_k: int, size_n: int, group_size: int,
                   variant: str) -> np.ndarray:
    grouped, single = _scale_perms(variant)
    table = grouped if 0 < group_size < size_k else single
    z = np.asarray(s).reshape(-1, table.size)
    x = np.empty_like(z)
    x[:, table] = z
    return x.reshape(-1, size_n)


def _meta_reorder_offsets(m: int, meta_ncols: int) -> np.ndarray:
    """Scatter offsets of the CUTLASS ColumnMajorInterleaved<2> int16
    metadata layout (marlin_utils_test_24.py:28-54 /
    cutlass/util/host_reorder.h); gathering at these offsets undoes it."""
    dst_rows = np.repeat(np.arange(m)[:, None], meta_ncols, axis=1)
    dst_cols = np.repeat(np.arange(meta_ncols)[None, :], m, axis=0)
    group_x, group_y = 64, 32  # int16 metadata
    dst_rows = (dst_rows // group_x * group_x + (dst_rows % 2) * 2 +
                (dst_rows % 8) // 4 + ((dst_rows % group_y) % 4) // 2 * 32 +
                ((dst_rows % group_x) // 8) * 4)
    topright = ((dst_rows % 2 == 0) & (dst_cols % 2 == 1)).astype(np.int64)
    botleft = ((dst_rows % 2 == 1) & (dst_cols % 2 == 0)).astype(np.int64)
    dst_rows = dst_rows + topright - botleft
    dst_cols = dst_cols - topright + botleft
    return (dst_cols // 2 * (m * 2) + dst_rows * 2 + dst_cols % 2).reshape(-1)


def _expand_24(sparse: np.ndarray, meta_stored: np.ndarray,
               size_k: int) -> np.ndarray:
    """[M, K/2] compressed values + reordered int16 metadata -> [M, K]
    dense (zeros at pruned positions). Each int16 covers 4 quads of 4;
    quad bits [2q:2q+2]=position of value 2q, [2q+2:2q+4]=value 2q+1."""
    m = sparse.shape[0]
    meta_ncols = size_k // 16
    flat = np.ascontiguousarray(meta_stored).view(np.uint16).reshape(-1)
    meta = flat[_meta_reorder_offsets(m, meta_ncols)].reshape(m, meta_ncols)
    fields = np.stack([(meta >> (4 * j)) & 0xF for j in range(4)],
                      axis=2).reshape(m, size_k // 4)
    idx0 = (fields & 3).astype(np.int64)
    idx1 = ((fields >> 2) & 3).astype(np.int64)
    dense = np.zeros((m, size_k), sparse.dtype)
    d4 = dense.reshape(m, size_k // 4, 4)
    s2 = sparse.reshape(m, size_k // 4, 2)
    np.put_along_axis(d4, idx0[..., None], s2[:, :, 0:1], axis=2)
    np.put_along_axis(d4, idx1[..., None], s2[:, :, 1:2], axis=2)
    return dense


def _sext(q: np.ndarray, num_bits: int) -> np.ndarray:
    q = q.astype(np.int32)
    half = 1 << (num_bits - 1)
    return np.where(q >= half, q - (1 << num_bits), q)


def _group_expand(s: np.ndarray, size_k: int) -> np.ndarray:
    return np.repeat(s, size_k // s.shape[0], axis=0)


# ---------------------------------------------------------------------------
# per-layer dequantizers ([K, N] -> returned transposed to HF [N, K])


def marlin_dequant(B: np.ndarray, s: np.ndarray,
                   group_size: int) -> np.ndarray:
    size_n = s.shape[-1]
    size_k = B.shape[0] * 16
    q = _unpack_weights(B, size_k, size_n, 4, _weight_perm(4, "marlin"))
    su = _unperm_scales(s, size_k, size_n, group_size, "marlin")
    w = (q.astype(np.int32) - 8) * _group_expand(
        su.astype(np.float32), size_k)
    return np.ascontiguousarray(w.T.astype(np.float32))


def marlin24_dequant(B24: np.ndarray, Bmeta: np.ndarray, s: np.ndarray,
                     num_bits: int, group_size: int) -> np.ndarray:
    size_n = s.shape[-1]
    size_k = B24.shape[0] * 16 * 2
    q = _unpack_weights(B24, size_k // 2, size_n, num_bits,
                        _weight_perm(num_bits, "marlin24"))
    bias = 1 << (num_bits - 1)
    signed = np.ascontiguousarray((q.astype(np.int32) - bias).T)
    qd = _expand_24(signed, Bmeta, size_k).T  # [K, N]
    su = _unperm_scales(s, size_k, size_n, group_size, "marlin24")
    w = qd * _group_expand(su.astype(np.float32), size_k)
    return np.ascontiguousarray(w.T.astype(np.float32))


def qqq_dequant(B: np.ndarray, s_channel: np.ndarray,
                s_group: Optional[np.ndarray],
                group_size: int) -> np.ndarray:
    size_n = s_channel.shape[-1]
    size_k = B.shape[0] * 16
    per_group = s_group is not None and s_group.size > 0
    perm = _weight_perm(4, "qqq_group" if per_group else "qqq_channel")
    q = _unpack_weights(B, size_k, size_n, 4, perm)
    if per_group:
        sg = _unperm_scales(s_group, size_k, size_n, group_size, "qqq")
        sc = _unperm_scales(s_channel, size_k, size_n, size_k, "qqq")
        w = ((q.astype(np.int32) - 8) *
             _group_expand(sg.astype(np.float32), size_k) *
             sc.astype(np.float32))
    else:
        # Channelwise: signed nibbles; stored scale carries a /2^(8-4)
        # to offset the kernel's shift-unpack (quant_utils.py:304-308).
        sc = _unperm_scales(s_channel, size_k, size_n, size_k, "qqq")
        w = _sext(q, 4) * sc.astype(np.float32) * 16.0
    return np.ascontiguousarray(w.T.astype(np.float32))


# ---------------------------------------------------------------------------
# checkpoint iterators


def _gather(model_dir: str, suffixes) -> Dict[str, np.ndarray]:
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side: Dict[str, np.ndarray] = {}
    for name, arr in safetensors_weight_iterator(model_dir):
        if any(name.endswith(sfx) for sfx in suffixes):
            side[name] = np.asarray(arr)
    return side


def marlin_dequant_iterator(model_dir: str, group_size: int
                            ) -> Iterable[Tuple[str, np.ndarray]]:
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side = _gather(model_dir, (".s",))
    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".s"):
            continue
        if name.endswith(".B") and name[:-2] + ".s" in side:
            n_deq += 1
            yield name[:-2] + ".weight", marlin_dequant(
                np.asarray(arr), side[name[:-2] + ".s"], group_size)
        elif name.endswith(".workspace"):
            continue
        else:
            yield name, arr
    logger.info("marlin: dequantized %d packed tensors", n_deq)


def marlin24_dequant_iterator(model_dir: str, num_bits: int, group_size: int
                              ) -> Iterable[Tuple[str, np.ndarray]]:
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side = _gather(model_dir, (".B_meta", ".s"))
    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".B_meta") or name.endswith(".s"):
            continue
        if name.endswith(".B_24") and name[:-5] + ".s" in side:
            base = name[:-5]
            n_deq += 1
            yield base + ".weight", marlin24_dequant(
                np.asarray(arr), side[base + ".B_meta"], side[base + ".s"],
                num_bits, group_size)
        elif name.endswith(".workspace"):
            continue
        else:
            yield name, arr
    logger.info("marlin_24: dequantized %d sparse tensors", n_deq)


def qqq_dequant_iterator(model_dir: str, group_size: int
                         ) -> Iterable[Tuple[str, np.ndarray]]:
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side = _gather(model_dir, (".s_channel", ".s_group"))
    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".s_channel") or name.endswith(".s_group"):
            continue
        if name.endswith(".B") and name[:-2] + ".s_channel" in side:
            base = name[:-2]
            n_deq += 1
            yield base + ".weight", qqq_dequant(
                np.asarray(arr), side[base + ".s_channel"],
                side.get(base + ".s_group"), group_size)
        elif name.endswith(".workspace"):
            continue
        else:
            yield name, arr
    logger.info("qqq: dequantized %d packed tensors", n_deq)


def hqq_dequant_iterator(model_dir: str, nbits: int, group_size: int
                         ) -> Iterable[Tuple[str, np.ndarray]]:
    """HQQ checkpoints -> dense weights at load.

    Format (reference quantization/hqq_marlin.py:128-205 + the hqq lib's
    pack_4bit_u8): X.W_q uint8 [out/2, in] with output row r in the HIGH
    nibble of packed row r and row out/2+r in the LOW nibble (8-bit:
    unpacked [out, in]); X.scale / X.zero stored flat, reshaping to
    [out, in/group]; value = (q - zero) * scale. The meta entries the
    reference ignores (shape, nbits, axis, ...) are dropped here too,
    except X.shape which recovers the unpacked dims."""
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    meta_sfx = (".zero", ".scale", ".shape", ".nbits", ".axis",
                ".channel_wise", ".compute_dtype", ".encoded_state_dict",
                ".group_size", ".offload_meta", ".optimize", ".packing",
                ".quant_scale", ".quant_zero", ".round_zero",
                ".stores_quant_config", ".unpack_view_dtype",
                ".view_as_float")
    side = _gather(model_dir, meta_sfx)
    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if any(name.endswith(sfx) for sfx in meta_sfx):
            continue
        if name.endswith(".W_q"):
            base = name[:-len(".W_q")]
            shape = side.get(base + ".shape")
            packed = np.asarray(arr, np.uint8)
            if shape is not None:
                out_dim, in_dim = int(shape[0]), int(shape[1])
            else:
                in_dim = packed.shape[-1]
                out_dim = packed.size // in_dim * (2 if nbits == 4 else 1)
            packed = packed.reshape(-1, in_dim)
            if nbits == 4:
                q = np.empty((out_dim, in_dim), np.uint8)
                q[:out_dim // 2] = packed >> 4
                q[out_dim // 2:] = packed & 0xF
            else:
                q = packed
            zero = np.asarray(side[base + ".zero"],
                              np.float32).reshape(out_dim, -1)
            scale = np.asarray(side[base + ".scale"],
                               np.float32).reshape(out_dim, -1)
            reps = in_dim // zero.shape[1]
            w = ((q.astype(np.float32) - np.repeat(zero, reps, axis=1)) *
                 np.repeat(scale, reps, axis=1))
            n_deq += 1
            yield base + ".weight", np.ascontiguousarray(w)
        else:
            yield name, arr
    logger.info("hqq: dequantized %d packed tensors", n_deq)
