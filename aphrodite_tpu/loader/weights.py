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
) -> Dict[str, Any]:
    """Assemble the model's host-side params pytree from an HF checkpoint."""
    num_layers = model.num_layers
    per_layer_maps = model.hf_param_mappings()
    global_maps = model.hf_global_mappings()

    # hf name -> (our_path, transpose, layer_idx or None)
    lookup: Dict[str, Tuple[str, bool, Optional[int]]] = {}
    for template, our_path, transpose in per_layer_maps:
        for i in range(num_layers):
            lookup[template.format(i=i)] = (our_path, transpose, i)
    for hf_name, our_path, transpose in global_maps:
        lookup[hf_name] = (our_path, transpose, None)

    # Collect per-layer pieces, then stack.
    pieces: Dict[str, List[Optional[np.ndarray]]] = {
        our_path: [None] * num_layers
        for _, our_path, _ in per_layer_maps
    }
    params: Dict[str, Any] = {}
    seen = set()
    for name, arr in safetensors_weight_iterator(model_dir):
        info = lookup.get(name)
        if info is None:
            if "rotary_emb" not in name:
                logger.debug("skipping unmapped weight %s", name)
            continue
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
        seen.add(name)

    for our_path, layer_list in pieces.items():
        missing = [i for i, a in enumerate(layer_list) if a is None]
        if missing:
            raise ValueError(
                f"checkpoint is missing layers {missing[:4]}... for "
                f"{our_path}")
        _set_path(params, our_path, np.stack(layer_list, axis=0))

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


def place_params_on_mesh(
    model,
    host_params: Dict[str, Any],
    mesh: Optional[Mesh],
    dtype,
) -> Dict[str, Any]:
    """Cast + transfer the host pytree to (sharded) device arrays."""
    import jax.numpy as jnp

    shardings = model.param_shardings()

    def place(path, arr, spec):
        arr = np.asarray(arr)
        target = jnp.asarray(arr, dtype=dtype)
        if mesh is not None:
            return jax.device_put(target, NamedSharding(mesh, spec))
        return jax.device_put(target)

    def walk(hp, sp, path=""):
        out = {}
        for k, v in hp.items():
            if isinstance(v, dict):
                out[k] = walk(v, sp[k], path=f"{path}{k}.")
            else:
                out[k] = place(f"{path}{k}", v, sp[k])
        return out

    return walk(host_params, shardings)


def load_model_params(
    model,
    model_config: ModelConfig,
    load_config: LoadConfig,
    mesh: Optional[Mesh],
) -> Dict[str, Any]:
    import jax.numpy as jnp

    fmt = load_config.load_format
    if fmt == "auto":
        has_st = any(
            fn.endswith(".safetensors")
            for fn in os.listdir(model_config.model))
        fmt = "safetensors" if has_st else "dummy"
    if fmt == "safetensors":
        logger.info("loading weights from %s", model_config.model)
        host = load_hf_params_to_host(model, model_config.model)
    elif fmt == "dummy":
        logger.info("using dummy (random) weights")
        host = model.random_params(seed=model_config.seed)
    else:
        raise ValueError(f"unknown load format {fmt}")
    return place_params_on_mesh(model, host, mesh,
                                jnp.dtype(model_config.dtype))
