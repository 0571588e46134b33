"""Checkpoint loading: safetensors -> sharded device params.

Re-design of the reference loader stack (model_loader/loader.py:1120,
weight_utils.py): instead of per-layer torch weight_loader hooks, the model
declares (hf_name -> our_path, transpose) mappings; per-layer tensors are
stacked on a leading [L] axis (the forward is a lax.scan) and placed onto
the mesh with `jax.device_put(arr, NamedSharding)` — XLA slices host-side
so each device only receives its shard.

Supported formats: safetensors (single or indexed shards), dummy (random
init for profiling, reference DummyModelLoader loader.py:373).
"""

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from aphrodite_tpu.common.config import LoadConfig, ModelConfig
from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)


def _np_from_torch_st(tensor) -> np.ndarray:
    """Convert a safetensors-returned array to numpy float-friendly form."""
    return tensor


def mistral_weights_iterator(model_dir: str, model_config):
    """consolidated.safetensors (mistral-format) -> HF-named tensors.

    Reference: llama.py:375-397 mistral_mapping + :570-590
    maybe_remap_mistral (text stack, incl. the interleaved->half-split
    rotary permutation of wq/wk) and pixtral.py:241-280 load_weights
    (vision_encoder / vision_language_adapter). Vision attention weights
    get the same rotary permutation: the mistral tower applies rope on
    interleaved pairs via complex multiply, our tower (like HF's
    conversion) uses the half-split rotate-half convention."""
    hf = model_config.hf_config
    txt_heads = int(hf.get("num_attention_heads", 32))
    txt_kv = int(hf.get("num_key_value_heads", txt_heads))
    v = dict(hf.get("vision_config") or {})
    v_heads = int(v.get("num_attention_heads", 16))
    is_composite = bool(v)

    def rope_permute(w: np.ndarray, n_heads: int) -> np.ndarray:
        out_d, in_d = w.shape
        d = out_d // n_heads
        return np.ascontiguousarray(
            w.reshape(n_heads, d // 2, 2, in_d).transpose(0, 2, 1, 3)
            .reshape(out_d, in_d))

    text_map = {
        "layers": "model.layers", "attention": "self_attn",
        "wq": "q_proj", "wk": "k_proj", "wv": "v_proj", "wo": "o_proj",
        "attention_norm": "input_layernorm", "feed_forward": "mlp",
        "w1": "gate_proj", "w2": "down_proj", "w3": "up_proj",
        "ffn_norm": "post_attention_layernorm",
        "tok_embeddings": "model.embed_tokens", "output": "lm_head",
        "norm": "model.norm",
    }
    vision_map = {
        "vision_encoder": "vision_tower", "wq": "q_proj",
        "wk": "k_proj", "wv": "v_proj", "wo": "o_proj",
        "w1": "gate_proj", "w2": "down_proj", "w3": "up_proj",
        "vision_language_adapter": "multi_modal_projector",
        "w_in": "linear_1", "w_out": "linear_2",
    }

    for name, arr in safetensors_weight_iterator(model_dir):
        parts = name.split(".")
        if parts[0] in ("vision_encoder", "vision_language_adapter"):
            arr = np.asarray(arr)
            if "wq" in parts or "wk" in parts:
                arr = rope_permute(arr, v_heads)
            yield ".".join(vision_map.get(p, p) for p in parts), arr
            continue
        arr = np.asarray(arr)
        if "wq" in parts:
            arr = rope_permute(arr, txt_heads)
        elif "wk" in parts:
            arr = rope_permute(arr, txt_kv)
        new = ".".join(text_map.get(p, p) for p in parts)
        if is_composite:
            new = "language_model." + new
        yield new, arr


def safetensors_weight_iterator(
    model_dir: str,
) -> Iterable[Tuple[str, np.ndarray]]:
    """Yield (name, np.ndarray) for every tensor in the checkpoint.

    bf16 tensors are yielded as ml_dtypes.bfloat16 numpy arrays (the
    safetensors numpy backend supports this natively).
    """
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    files: List[str] = []
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = sorted(fn for fn in os.listdir(model_dir)
                       if fn.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(
            f"no .safetensors files found under {model_dir}")
    for fn in files:
        path = os.path.join(model_dir, fn)
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _set_path(tree: Dict[str, Any], path: str, value) -> None:
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_path(tree: Dict[str, Any], path: str):
    node = tree
    for k in path.split("."):
        node = node[k]
    return node


def load_hf_params_to_host(
    model,  # LlamaForCausalLM-like
    model_dir: str,
    weights_iter=None,
) -> Dict[str, Any]:
    """Assemble the model's host-side params pytree from an HF checkpoint.

    Mapping sources (all optional beyond the first two):
    - hf_param_mappings(): one tensor per (layer, path), stacked on [L]
    - hf_global_mappings(): layer-independent tensors
    - hf_expert_mappings(): per-(layer, expert) tensors, stacked [L, E]
      (MoE models; requires `num_experts`)
    - hf_split_mappings(): fused tensors split along the output dim into
      several paths (e.g. Phi-3 qkv_proj / gate_up_proj)
    """
    num_layers = model.num_layers
    per_layer_maps = model.hf_param_mappings()
    global_maps = model.hf_global_mappings()
    expert_maps = getattr(model, "hf_expert_mappings", lambda: [])()
    split_maps = getattr(model, "hf_split_mappings", lambda: [])()
    # Aux stacks: per-layer weights of a sub-module with its OWN layer
    # count (e.g. a multimodal vision tower): (template, path, T, count).
    aux_maps = getattr(model, "hf_aux_mappings", lambda: [])()
    num_experts = getattr(model, "num_experts", 0)

    # hf name -> ("layer"|"global"|"expert"|"split", ...)
    lookup: Dict[str, Tuple] = {}
    for template, our_path, transpose in per_layer_maps:
        for i in range(num_layers):
            lookup[template.format(i=i)] = ("layer", our_path, transpose, i)
    for hf_name, our_path, transpose in global_maps:
        lookup[hf_name] = ("global", our_path, transpose, None)
    # MoE layers: either a contiguous [start, end) range or an explicit
    # (possibly interleaved) index list (e.g. Jamba's period/offset
    # expert layers).
    e_indices = getattr(model, "expert_layer_indices", None)
    if e_indices is None:
        e_start, e_end = getattr(model, "expert_layer_range",
                                 (0, num_layers))
        e_indices = list(range(e_start, e_end))
    for template, our_path, transpose in expert_maps:
        for pos, i in enumerate(e_indices):
            for e in range(num_experts):
                lookup[template.format(i=i, e=e)] = (
                    "expert", our_path, transpose, (pos, e))
    for template, slices, transpose in split_maps:
        for i in range(num_layers):
            lookup[template.format(i=i)] = ("split", slices, transpose, i)
    aux_counts: Dict[str, int] = {}
    for entry in aux_maps:
        template, our_path, transpose, count = entry[:4]
        # Optional 5th element: layer-index offset into the template
        # (e.g. deepseek MoE layers start after first_k_dense_replace),
        # OR an explicit index list for interleaved sub-stacks (e.g.
        # Jamba's mamba/attention layers).
        start = entry[4] if len(entry) > 4 else 0
        if isinstance(start, (list, tuple)):
            indices = list(start)
        else:
            indices = [start + i for i in range(count)]
        if isinstance(our_path, (list, tuple)):
            # Fused aux tensor split along the (post-transpose) output
            # dim into several stacks (e.g. InternViT's attn.qkv on a
            # vision tower with its own layer count).
            for sub_path, _, _ in our_path:
                aux_counts[sub_path] = count
            for pos, i in enumerate(indices):
                lookup[template.format(i=i)] = ("aux_split", our_path,
                                                transpose, pos)
        elif count == 1 and indices == [0] and "{i}" not in template:
            lookup[template] = ("global", our_path, transpose, None)
        else:
            aux_counts[our_path] = count
            for pos, i in enumerate(indices):
                lookup[template.format(i=i)] = ("aux", our_path,
                                                transpose, pos)

    pieces: Dict[str, List[Optional[np.ndarray]]] = {
        our_path: [None] * num_layers
        for _, our_path, _ in per_layer_maps
    }
    for template, slices, _ in split_maps:
        for our_path, _, _ in slices:
            pieces[our_path] = [None] * num_layers
    expert_pieces: Dict[str, List[List[Optional[np.ndarray]]]] = {
        our_path: [[None] * num_experts for _ in range(len(e_indices))]
        for _, our_path, _ in expert_maps
    }
    aux_pieces: Dict[str, List[Optional[np.ndarray]]] = {
        our_path: [None] * count
        for our_path, count in aux_counts.items()
    }
    params: Dict[str, Any] = {}
    if weights_iter is None:
        weights_iter = safetensors_weight_iterator(model_dir)
    for name, arr in weights_iter:
        info = lookup.get(name)
        if info is None:
            if "rotary_emb" not in name:
                logger.debug("skipping unmapped weight %s", name)
            continue
        kind, target, transpose, idx = info
        arr = np.asarray(arr)
        if transpose:
            arr = arr.T
        if kind == "split":
            for our_path, start, end in target:
                part = arr[..., start:end]
                if hasattr(model, "maybe_pad_kv_weight"):
                    part = model.maybe_pad_kv_weight(our_path, part)
                pieces[our_path][idx] = part
            continue
        if kind == "aux_split":
            for our_path, start, end in target:
                aux_pieces[our_path][idx] = arr[..., start:end]
            continue
        if kind == "layer" and hasattr(model, "maybe_pad_kv_weight_layer"):
            # Layer-aware variant for per-layer-heterogeneous weights
            # (DeciLM variable GQA degrouping).
            arr = model.maybe_pad_kv_weight_layer(target, arr, idx)
        elif hasattr(model, "maybe_pad_kv_weight"):
            arr = model.maybe_pad_kv_weight(target, arr)
        if kind == "global":
            _set_path(params, target, arr)
        elif kind == "layer":
            pieces[target][idx] = arr
        elif kind == "aux":
            aux_pieces[target][idx] = arr
        else:  # expert
            i, e = idx
            expert_pieces[target][i][e] = arr

    for our_path, layer_list in pieces.items():
        missing = [i for i, a in enumerate(layer_list) if a is None]
        if missing:
            raise ValueError(
                f"checkpoint is missing layers {missing[:4]}... for "
                f"{our_path}")
        _set_path(params, our_path, np.stack(layer_list, axis=0))
    for our_path, grid in expert_pieces.items():
        stacked = np.stack(
            [np.stack(layer, axis=0) for layer in grid], axis=0)
        _set_path(params, our_path, stacked)  # [L, E, ...]
    for our_path, layer_list in aux_pieces.items():
        missing = [i for i, a in enumerate(layer_list) if a is None]
        if missing:
            raise ValueError(
                f"checkpoint is missing aux layers {missing[:4]}... for "
                f"{our_path}")
        _set_path(params, our_path, np.stack(layer_list, axis=0))

    # Model-specific post-processing (e.g. conv kernel -> matmul form).
    if hasattr(model, "finalize_params"):
        model.finalize_params(params)
    # Tied embeddings: nothing to do (forward uses embed.T).
    expected = model.param_shapes()
    _check_shapes(expected, params, prefix="")
    return params


def _check_shapes(expected, got, prefix: str) -> None:
    for k, v in expected.items():
        path = f"{prefix}{k}"
        if k not in got:
            raise ValueError(f"missing param {path}")
        if isinstance(v, dict):
            _check_shapes(v, got[k], prefix=path + ".")
        else:
            if tuple(got[k].shape) != tuple(v):
                raise ValueError(
                    f"param {path}: checkpoint shape {got[k].shape} != "
                    f"expected {v}")


_CONTAINER_KEYS = ("q", "q4", "q4p")


def _is_quant_container(node) -> bool:
    return isinstance(node, dict) and any(k in node
                                          for k in _CONTAINER_KEYS)


def _container_child_spec(base_spec, child_key: str, arr: np.ndarray):
    """Sharding spec for a quantized-container member, derived from the
    dense weight's spec: quantized values shard like the weight; scales/
    zeros shard the same way except axes their (possibly size-1 grouped)
    shape can't split — those are replicated."""
    from jax.sharding import PartitionSpec as P

    spec = tuple(base_spec) + (None,) * (arr.ndim - len(tuple(base_spec)))
    fixed = []
    for axis_spec, size in zip(spec, arr.shape):
        # Singleton axes (per-channel scale's K dim of 1) can't split.
        fixed.append(None if size == 1 else axis_spec)
    return P(*fixed)


# Dummy-weight leaves at or above this element count are re-generated
# directly on device instead of transferred (the host->device path can be
# very slow, e.g. a remote-relay link; a 1.4B model is minutes of H2D).
_SYNTH_MIN_ELEMS = 1 << 20


def _synthesize_leaf_on_device(arr: np.ndarray, spec, target_dtype,
                               mesh: Optional[Mesh], seed: int):
    """Generate a device array statistically matching `arr` without
    transferring it: floats become normal(mean, std) draws, ints become
    uniform random bits (shape/dtype/sharding preserved). Only used for
    dummy (profiling) weights, where values need sane magnitudes, not
    specific contents."""
    import jax.numpy as jnp

    sharding = (NamedSharding(mesh, spec) if mesh is not None else None)
    key = jax.random.key(seed)
    if np.issubdtype(arr.dtype, np.floating):
        std = float(arr.std()) or 1.0
        mean = float(arr.mean())

        def gen(k, s, m):
            x = jax.random.normal(k, arr.shape, jnp.float32)
            return (x * s + m).astype(jnp.dtype(target_dtype))

        fn = jax.jit(gen, out_shardings=sharding)
        return fn(key, std, mean)

    if not np.issubdtype(arr.dtype, np.integer):
        # Exotic dtype (fp8/bf16 on host) — random bits could encode
        # NaN/inf; signal the caller to transfer normally.
        return None

    # Integer (packed quantized) leaf: random bits of the same width.
    bits_dtype = jnp.dtype(f"uint{arr.dtype.itemsize * 8}")

    def gen_bits(k):
        return jax.lax.bitcast_convert_type(
            jax.random.bits(k, arr.shape, bits_dtype),
            jnp.dtype(arr.dtype))

    fn = jax.jit(gen_bits, out_shardings=sharding)
    return fn(key)


def _divisible_spec_or_replicated(shape, spec, mesh):
    """jax.device_put requires sharded dims to divide exactly. Weights
    whose dims do not divide the mesh axis (e.g. a vocab axis under
    asymmetric tp=3) fall back to replicated placement — GSPMD still
    partitions the consuming matmuls as it sees fit."""
    from jax.sharding import PartitionSpec

    for dim, part in enumerate(tuple(spec)):
        if part is None:
            continue
        names = part if isinstance(part, tuple) else (part,)
        size = 1
        for nm in names:
            size *= mesh.shape[nm]
        if dim >= len(shape) or shape[dim] % size:
            logger.warning(
                "replicating weight of shape %s: dim %d not divisible "
                "by mesh axes %s (size %d)", shape, dim, names, size)
            return PartitionSpec()
    return spec


def place_params_on_mesh(
    model,
    host_params: Dict[str, Any],
    mesh: Optional[Mesh],
    dtype,
    synthesize_large: bool = False,
) -> Dict[str, Any]:
    """Cast + transfer the host pytree to (sharded) device arrays.

    Quantized containers keep their member dtypes (int8/fp8 values, f32
    scales); dense float weights are cast to the model dtype. With
    `synthesize_large` (dummy weights only), big leaves are generated on
    device instead of transferred.
    """
    import jax.numpy as jnp

    shardings = model.param_shardings()
    synth_seed = [0]

    def place(arr, spec, cast):
        arr = np.asarray(arr)
        if synthesize_large and arr.size >= _SYNTH_MIN_ELEMS:
            synth_seed[0] += 1
            synth = _synthesize_leaf_on_device(
                arr, spec, dtype if cast else arr.dtype, mesh,
                synth_seed[0])
            if synth is not None:
                return synth
        # Integer leaves (index tables like EAGLE's token_map) keep
        # their dtype; only float weights cast to the model dtype.
        if cast and not np.issubdtype(arr.dtype, np.floating):
            cast = False
        target = jnp.asarray(arr, dtype=dtype) if cast else jnp.asarray(arr)
        if mesh is not None:
            spec = _divisible_spec_or_replicated(arr.shape, spec, mesh)
            return jax.device_put(target, NamedSharding(mesh, spec))
        return jax.device_put(target)

    def walk(hp, sp, path=""):
        out = {}
        for k, v in hp.items():
            if _is_quant_container(v):
                base_spec = sp[k]
                out[k] = {
                    ck: place(cv, _container_child_spec(base_spec, ck, cv),
                              cast=False)
                    for ck, cv in v.items()
                }
            elif isinstance(v, dict):
                out[k] = walk(v, sp[k], path=f"{path}{k}.")
            else:
                out[k] = place(v, sp[k], cast=True)
        return out

    return walk(host_params, shardings)


def quantize_params_at_load(model, host_params: Dict[str, Any],
                            method) -> Dict[str, Any]:
    """Runtime weight quantization of a full-precision checkpoint
    (reference tpu_int8.py:93-100 pattern, generalized)."""
    if getattr(method, "EXPERT_ONLY", False):
        paths = getattr(model, "expert_weights", lambda: None)()
        if not paths:
            raise ValueError(
                f"quantization {method.NAME!r} targets MoE expert "
                f"weights, but {type(model).__name__} declares none")
    else:
        paths = model.quantizable_weights()
    for path in paths:
        w = _get_path(host_params, path)
        _set_path(host_params, path, method.quantize_from_float(w))
        logger.info("quantized %s at load (%s)", path, method.NAME)
    return host_params


def load_kv_cache_scales(
    model_dir: str,
    num_layers: int,
    quantization_param_path: Optional[str] = None,
    tp_rank: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-layer (k_scale[L], v_scale[L]) for a quantized KV cache.

    Sources, in priority order (reference semantics):
    1. `--quantization-param-path` JSON: {"kv_cache": {"scaling_factor":
       {tp_rank: {layer: scale}}}} (weight_utils.py:504; one scale per
       layer, applied to both K and V as the reference does).
    2. checkpoint tensors `model.layers.{i}.self_attn.{k,v}_scale`
       (fp8 checkpoints, weight_utils.py:632 remapping).
    3. all-ones fallback (correct for fp8_e5m2; e4m3 benefits from
       calibrated scales, reference kv_cache.py:37-76 warns likewise).
    """
    k_scales = np.ones((num_layers,), np.float32)
    v_scales = np.ones((num_layers,), np.float32)
    if quantization_param_path:
        with open(quantization_param_path) as f:
            schema = json.load(f)
        factors = schema["kv_cache"]["scaling_factor"]
        layer_map = factors.get(str(tp_rank), factors.get(tp_rank, {}))
        for layer_str, scale in layer_map.items():
            idx = int(layer_str)
            if 0 <= idx < num_layers:
                k_scales[idx] = float(scale)
                v_scales[idx] = float(scale)
        return k_scales, v_scales
    try:
        for name, arr in safetensors_weight_iterator(model_dir):
            if name.endswith(".k_scale") or name.endswith(".v_scale"):
                parts = name.split(".")
                try:
                    idx = int(parts[parts.index("layers") + 1])
                except (ValueError, IndexError):
                    continue
                if name.endswith(".k_scale"):
                    k_scales[idx] = float(np.asarray(arr).reshape(()))
                else:
                    v_scales[idx] = float(np.asarray(arr).reshape(()))
    except FileNotFoundError:
        pass
    return k_scales, v_scales


def _checkpoint_has_packed_tensors(model_dir: str) -> bool:
    """True when the safetensors files carry GPTQ/AWQ packed tensors."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            names = json.load(f)["weight_map"].keys()
        return any(n.endswith(".qweight") for n in names)
    for fn in os.listdir(model_dir):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(model_dir, fn),
                           framework="np") as f:
                if any(n.endswith(".qweight") for n in f.keys()):
                    return True
    return False


def load_quantized_hf_params_to_host(
    model,
    model_dir: str,
    quant_method: str,
) -> Dict[str, Any]:
    """Load a GPTQ/AWQ checkpoint: packed int32 tensors -> containers.

    GPTQ/AWQ store Linear tensors as `<prefix>.qweight/.qzeros/.scales`
    (+ optional `g_idx`) already laid out [in, out] — no transpose
    (unlike dense HF Linear weights). Per-layer containers are unpacked
    then stacked on the leading layer axis for the lax.scan forward.
    """
    from aphrodite_tpu.quantization import int4 as int4_mod

    is_awq = quant_method.startswith("awq")
    num_layers = model.num_layers
    per_layer_maps = model.hf_param_mappings()
    global_maps = model.hf_global_mappings()
    quantizable = set(model.quantizable_weights())

    # weight-name templates for quantized linears: strip ".weight".
    linear_prefix: Dict[str, str] = {}  # our_path -> hf prefix template
    dense_lookup: Dict[str, Tuple[str, bool, Optional[int]]] = {}
    for template, our_path, transpose in per_layer_maps:
        if our_path in quantizable:
            assert template.endswith(".weight"), template
            linear_prefix[our_path] = template[:-len(".weight")]
        else:
            for i in range(num_layers):
                dense_lookup[template.format(i=i)] = (our_path, transpose,
                                                      i)
    for hf_name, our_path, transpose in global_maps:
        dense_lookup[hf_name] = (our_path, transpose, None)

    # Collect all tensors (quantized checkpoints are small enough to
    # gather the packed pieces before unpacking).
    raw: Dict[str, np.ndarray] = {}
    params: Dict[str, Any] = {}
    pieces: Dict[str, List[Optional[np.ndarray]]] = {
        our_path: [None] * num_layers
        for _, our_path, _ in per_layer_maps
        if our_path not in quantizable
    }
    for name, arr in safetensors_weight_iterator(model_dir):
        info = dense_lookup.get(name)
        if info is not None:
            our_path, transpose, layer_idx = info
            arr = np.asarray(arr)
            if transpose:
                arr = arr.T
            if hasattr(model, "maybe_pad_kv_weight"):
                arr = model.maybe_pad_kv_weight(our_path, arr)
            if layer_idx is None:
                _set_path(params, our_path, arr)
            else:
                pieces[our_path][layer_idx] = arr
        else:
            raw[name] = np.asarray(arr)

    for our_path, layer_list in pieces.items():
        missing = [i for i, a in enumerate(layer_list) if a is None]
        if missing:
            raise ValueError(f"missing layers {missing[:4]} for {our_path}")
        _set_path(params, our_path, np.stack(layer_list, axis=0))

    # Unpack + stack the quantized linears.
    for our_path, prefix_t in linear_prefix.items():
        containers = []
        for i in range(num_layers):
            prefix = prefix_t.format(i=i)
            try:
                qweight = raw[f"{prefix}.qweight"]
                qzeros = raw[f"{prefix}.qzeros"]
                scales = raw[f"{prefix}.scales"]
            except KeyError as e:
                raise ValueError(
                    f"quantized checkpoint is missing {e} for {prefix}")
            if is_awq:
                c = int4_mod.load_awq_tensors(qweight, qzeros, scales)
            else:
                g_idx = raw.get(f"{prefix}.g_idx")
                c = int4_mod.load_gptq_tensors(qweight, qzeros, scales,
                                               g_idx)
            containers.append(c)
        if len({frozenset(c) for c in containers}) > 1:
            # Mixed packed/unpacked layers (e.g. one desc_act layer):
            # normalize to the unpacked q4 form so stacking is uniform.
            from aphrodite_tpu.ops.quant_matmul import unpack_int4_rows

            containers = [
                {"q4": unpack_int4_rows(c.pop("q4p")), **c}
                if "q4p" in c else c for c in containers
            ]
        stacked = {
            k: np.stack([c[k] for c in containers], axis=0)
            for k in containers[0]
        }
        if model.num_kv_heads_padded != model.num_kv_heads:
            if getattr(model, "_kv_pad_mode", "none") == "zero":
                stacked = _pad_int4_container_heads(model, our_path,
                                                    stacked)
            elif our_path in ("layers.wk", "layers.wv"):
                raise NotImplementedError(
                    "tp > num_kv_heads with int4 checkpoints not "
                    "supported yet")
        _set_path(params, our_path, stacked)
    return params


def _pad_int4_container_heads(model, our_path: str,
                              c: Dict[str, np.ndarray]):
    """Asymmetric-TP zero padding for pre-quantized containers: padded
    output columns (wq/wk/wv) or input row groups (wo) carry q=0,
    scale=0, zero=0, so they dequantize to exact zeros (the head-padding
    no-op invariant; see LlamaForCausalLM.maybe_pad_kv_weight)."""
    D = model.head_dim
    extra_cols = 0
    if our_path == "layers.wq":
        extra_cols = (model.num_heads_padded - model.num_heads) * D
    elif our_path in ("layers.wk", "layers.wv"):
        extra_cols = (model.num_kv_heads_padded - model.num_kv_heads) * D
    if extra_cols:
        def pad_n(a):
            return np.concatenate(
                [a, np.zeros(a.shape[:-1] + (extra_cols,), a.dtype)],
                axis=-1)

        return {k: pad_n(v) for k, v in c.items()}
    if our_path != "layers.wo":
        return c
    # wo pads K (rows). Group quantization slices K into G-sized groups;
    # NH*D and NH'*D are multiples of the head dim, and G divides the
    # original K, so padded rows extend whole groups when G | extra.
    extra_rows = (model.num_heads_padded - model.num_heads) * D
    if extra_rows == 0:
        return c
    K = (c["q4"].shape[-2] if "q4" in c else 2 * c["q4p"].shape[-2])
    G = K // c["scale"].shape[-2]
    if extra_rows % G or "q4p" in c:
        # q4p's half-split row packing interleaves K/2 halves; repacking
        # around padding is not worth it — fall back to unpacked form.
        from aphrodite_tpu.ops.quant_matmul import unpack_int4_rows

        if "q4p" in c:
            c = {"q4": unpack_int4_rows(c.pop("q4p")), **c}
    if extra_rows % G:
        raise NotImplementedError(
            f"wo group size {G} does not divide head padding "
            f"{extra_rows}")

    def pad_rows(a, rows):
        pad = np.zeros(a.shape[:-2] + (rows, a.shape[-1]), a.dtype)
        return np.concatenate([a, pad], axis=-2)

    return {
        "q4": pad_rows(c["q4"], extra_rows),
        "scale": pad_rows(c["scale"], extra_rows // G),
        "zero": pad_rows(c["zero"], extra_rows // G),
    }


def load_model_params(
    model,
    model_config: ModelConfig,
    load_config: LoadConfig,
    mesh: Optional[Mesh],
) -> Dict[str, Any]:
    import jax.numpy as jnp

    from aphrodite_tpu.quantization import get_quantization_method

    quant = model_config.quantization
    method = get_quantization_method(quant)
    fmt = load_config.load_format
    if fmt == "auto":
        if model_config.model.endswith(".gguf"):
            fmt = "gguf"
        elif is_sharded_state_dir(model_config.model):
            fmt = "sharded_state"
        elif model_config.hf_config.get("_mistral_format"):
            fmt = "mistral"
        else:
            has_st = any(
                fn.endswith(".safetensors")
                for fn in os.listdir(model_config.model))
            fmt = "safetensors" if has_st else "dummy"
    if fmt == "mistral":
        logger.info("loading mistral-format (consolidated) weights "
                    "from %s", model_config.model)
        host = load_hf_params_to_host(
            model, model_config.model,
            weights_iter=mistral_weights_iterator(model_config.model,
                                                  model_config))
        return place_params_on_mesh(model, host, mesh,
                                    jnp.dtype(model_config.dtype))
    if fmt == "sharded_state":
        logger.info("loading sharded state from %s", model_config.model)
        host = load_sharded_state_to_host(model_config.model)
        return place_params_on_mesh(model, host, mesh,
                                    jnp.dtype(model_config.dtype))
    if fmt == "gguf":
        from aphrodite_tpu.loader.gguf import load_gguf_params_to_host

        logger.info("loading GGUF weights from %s", model_config.model)
        host = load_gguf_params_to_host(model, model_config.model)
        return place_params_on_mesh(model, host, mesh,
                                    jnp.dtype(model_config.dtype))
    if fmt == "safetensors":
        logger.info("loading weights from %s", model_config.model)
        if quant and quant.lower() == "aqlm":
            from aphrodite_tpu.loader.bnb import aqlm_dequant_iterator

            nbits = int((model_config.hf_config.get(
                "quantization_config") or {}).get(
                    "nbits_per_codebook", 16))
            host = load_hf_params_to_host(
                model, model_config.model,
                weights_iter=aqlm_dequant_iterator(model_config.model,
                                                   nbits))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and quant.lower() == "quip":
            # QuIP# E8P12: decode + fold the incoherence pipeline to a
            # dense weight at load (quantization/quip.py; reference
            # serves via CUDA decompress kernels instead).
            from aphrodite_tpu.quantization.quip import (
                quip_dequant_iterator)

            qcfg = (getattr(model_config, "quip_config", None)
                    or model_config.hf_config.get("quantization_config")
                    or {})
            if qcfg.get("codebook", "E8P12") != "E8P12":
                raise ValueError(
                    f"QuIP codebook {qcfg.get('codebook')!r} not "
                    "supported (only E8P12, matching the reference)")
            host = load_hf_params_to_host(
                model, model_config.model,
                weights_iter=quip_dequant_iterator(
                    model_config.model,
                    use_rand=bool(qcfg.get("use_rand", True))))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and quant.lower() == "squeezellm":
            from aphrodite_tpu.loader.bnb import squeezellm_dequant_iterator

            host = load_hf_params_to_host(
                model, model_config.model,
                weights_iter=squeezellm_dequant_iterator(
                    model_config.model))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and quant.lower() == "bitsandbytes":
            # bitsandbytes nf4/fp4/int8 checkpoints dequantize at load
            # (reference BitsAndBytesModelLoader, model_loader/loader.py
            # :667; TPU serves them dense — bnb's LUT formats have no
            # MXU-friendly layout).
            from aphrodite_tpu.loader.bnb import bnb_dequant_iterator

            host = load_hf_params_to_host(
                model, model_config.model,
                weights_iter=bnb_dequant_iterator(model_config.model))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        qcfg = model_config.hf_config.get("quantization_config") or {}
        if quant and quant.lower() in ("hqq", "qqq", "marlin",
                                       "gptq_marlin_24"):
            # Marlin/HQQ tile-packed checkpoints: pure permutations of
            # plain int-quantized matrices (CUDA mma artifacts), undone
            # on host at load; served dense (loader/marlin.py).
            from aphrodite_tpu.loader import marlin as marlin_mod

            q = quant.lower()
            if q == "hqq":
                wq = (qcfg.get("quant_config") or {}).get(
                    "weight_quant_params") or {}
                it = marlin_mod.hqq_dequant_iterator(
                    model_config.model, int(wq.get("nbits", 4)),
                    int(wq.get("group_size", 64)))
            elif q == "qqq":
                it = marlin_mod.qqq_dequant_iterator(
                    model_config.model, int(qcfg.get("group_size", -1)))
            elif q == "marlin":
                it = marlin_mod.marlin_dequant_iterator(
                    model_config.model, int(qcfg.get("group_size", -1)))
            else:
                it = marlin_mod.marlin24_dequant_iterator(
                    model_config.model, int(qcfg.get("bits", 4)),
                    int(qcfg.get("group_size", -1)))
            host = load_hf_params_to_host(model, model_config.model,
                                          weights_iter=it)
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and quant.lower() == "modelopt":
            # ModelOpt FP8 checkpoints: fp8_e4m3 weights + per-tensor
            # weight_scale (+ static input_scale, unused — we quantize
            # activations dynamically). Dequantize at load, then
            # re-quantize through our fp8 W8A8 path so serving keeps
            # the int8/fp8 matmul perf (reference modelopt.py serves
            # via apply_fp8_linear).
            from aphrodite_tpu.loader.bnb import modelopt_dequant_iterator
            from aphrodite_tpu.quantization import fp8 as fp8_mod

            host = load_hf_params_to_host(
                model, model_config.model,
                weights_iter=modelopt_dequant_iterator(model_config.model))
            host = quantize_params_at_load(model, host, fp8_mod)
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and quant.lower() == "deepspeedfp":
            # DeepSpeedFP quantizes a NORMAL checkpoint to fp6/fp8 at
            # load for memory (reference deepspeedfp.py create_weights
            # + quantizer); the eXmY rounding of our quant_llm path is
            # the same capability (bits from quant_config.json).
            from aphrodite_tpu.quantization import quant_llm

            bits = int((qcfg or {}).get("bits", 6))
            ebits, mbits = {4: (2, 1), 6: (3, 2), 8: (4, 3),
                            12: (4, 7)}.get(bits, (3, 2))
            host = load_hf_params_to_host(model, model_config.model)
            for path in model.quantizable_weights():
                w = _get_path(host, path)
                _set_path(host, path,
                          quant_llm.round_to_fpx(w, ebits, mbits,
                                                 reduce_axis=-2))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if quant and (quant.lower() == "quant_llm"
                      or quant.lower() in
                      ("fp2", "fp3", "fp4", "fp5", "fp6", "fp7")):
            # QuantLLM FPx: dense fp16 checkpoints quantized at load to
            # the eXmY grid (reference fp6.py quant_weight_loader); the
            # rounded weights serve dense — same numerics as the CUDA
            # dequant-GEMM.
            from aphrodite_tpu.quantization import quant_llm

            ebits, mbits = quant_llm.parse_bits(quant.lower(), qcfg)
            host = load_hf_params_to_host(model, model_config.model)
            for path in model.quantizable_weights():
                w = _get_path(host, path)
                _set_path(host, path,
                          quant_llm.round_to_fpx(w, ebits, mbits,
                                                 reduce_axis=-2))
            return place_params_on_mesh(model, host, mesh,
                                        jnp.dtype(model_config.dtype))
        if (method is not None and not method.RUNTIME_QUANTIZE
                and _checkpoint_has_packed_tensors(model_config.model)):
            # Checkpoint itself is quantized (GPTQ/AWQ packed tensors).
            host = load_quantized_hf_params_to_host(model,
                                                    model_config.model,
                                                    quant.lower())
        else:
            host = load_hf_params_to_host(model, model_config.model)
            if method is not None and method.RUNTIME_QUANTIZE:
                host = quantize_params_at_load(model, host, method)
            elif method is not None:
                # int4 requested on a dense checkpoint: runtime 4-bit
                # group quantization (benches / ablations).
                from aphrodite_tpu.quantization import int4 as int4_mod

                for path in model.quantizable_weights():
                    w = _get_path(host, path)
                    _set_path(host, path,
                              int4_mod.quantize_from_float(w))
    elif fmt == "dummy":
        logger.info("using dummy (random) weights")
        host = model.random_params(seed=model_config.seed)
        if method is not None and method.RUNTIME_QUANTIZE:
            host = quantize_params_at_load(model, host, method)
        elif method is not None:
            from aphrodite_tpu.quantization import int4 as int4_mod

            for path in model.quantizable_weights():
                w = _get_path(host, path)
                _set_path(host, path, int4_mod.quantize_from_float(w))
    else:
        raise ValueError(f"unknown load format {fmt}")
    return place_params_on_mesh(model, host, mesh,
                                jnp.dtype(model_config.dtype),
                                synthesize_large=(fmt == "dummy"))


# ---------------------------------------------------------------------------
# Sharded state: save/load the FINAL param pytree (post name-mapping, post
# transpose/stack, post quantization) for fast startup.
# Reference: model_loader/loader.py ShardedStateLoader + LLM
# save_sharded_state examples — ours stores one npz of raw array bytes plus
# a JSON manifest (exotic dtypes like bfloat16/fp8 round-trip as bytes).
# ---------------------------------------------------------------------------

_SHARDED_STATE_NPZ = "aphrodite_tpu_state.npz"
_SHARDED_STATE_MANIFEST = "aphrodite_tpu_state.json"


def is_sharded_state_dir(model_dir: str) -> bool:
    return os.path.isfile(os.path.join(model_dir, _SHARDED_STATE_NPZ))


def save_sharded_state(params: Dict[str, Any], out_dir: str,
                       source_model_dir: Optional[str] = None) -> None:
    """Write the runner's param pytree to `out_dir`, copying config +
    tokenizer files from the source model dir so the directory is a
    self-contained loadable model."""
    import json
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    walk(params)
    manifest = {}
    arrays = {}
    for i, (path, arr) in enumerate(sorted(flat.items())):
        key = f"a{i}"
        manifest[key] = {
            "path": path,
            "dtype": str(arr.dtype),
            "shape": list(arr.shape),
        }
        arrays[key] = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
    np.savez(os.path.join(out_dir, _SHARDED_STATE_NPZ), **arrays)
    with open(os.path.join(out_dir, _SHARDED_STATE_MANIFEST), "w") as f:
        json.dump(manifest, f)
    if source_model_dir and os.path.isdir(source_model_dir) and \
            os.path.abspath(source_model_dir) != os.path.abspath(out_dir):
        for fn in os.listdir(source_model_dir):
            if fn.endswith((".json", ".model", ".txt")) and \
                    not fn.endswith(".safetensors.index.json"):
                shutil.copy(os.path.join(source_model_dir, fn),
                            os.path.join(out_dir, fn))


def load_sharded_state_to_host(model_dir: str) -> Dict[str, Any]:
    import json

    import jax.numpy as jnp

    with open(os.path.join(model_dir, _SHARDED_STATE_MANIFEST)) as f:
        manifest = json.load(f)
    params: Dict[str, Any] = {}
    with np.load(os.path.join(model_dir, _SHARDED_STATE_NPZ)) as z:
        for key, meta in manifest.items():
            arr = z[key].view(jnp.dtype(meta["dtype"])).reshape(
                meta["shape"])
            _set_path(params, meta["path"].replace("/", "."), arr)
    return params
