"""Multi-LoRA adapter management.

TPU-native re-design of the reference LoRA stack (aphrodite/lora/:
LoRAModelManager with LRU slots, Punica SGMV/BGMV Triton+CUDA kernels,
per-layer wrapped Linear classes, lora/models.py:291,610). Here:

- Adapter weights for all slots live in ONE stacked device array per
  target module: A [L, n_slots, H, r_max], B [L, n_slots, r_max, out]
  (layer-stacked so they ride the model's lax.scan).
- Slot 0 is the null adapter (zeros); requests without LoRA route there.
- The per-token "which adapter" computation is grouped-matmul shaped:
  tokens are sorted by slot and run through jax.lax.ragged_dot — the
  same TPU formulation as MoE experts (ops/moe.py), which is exactly
  what Punica's SGMV computes on GPU.
- alpha/r scaling is folded into A at load, so runtime is just two
  grouped matmuls per target module.
"""

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.lora.request import LoRARequest

logger = init_logger(__name__)

# Our param-path name per HF target module name.
_TARGET_TO_PATH = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}


def load_peft_adapter(path: str
                      ) -> Tuple[Dict[str, Any], int, float, Dict]:
    """Read a PEFT LoRA checkpoint: (tensors, r, scaling, config)."""
    cfg_path = os.path.join(path, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    r = int(cfg["r"])
    alpha = float(cfg.get("lora_alpha", r))
    scaling = alpha / r
    from safetensors import safe_open

    tensors = {}
    st = os.path.join(path, "adapter_model.safetensors")
    with safe_open(st, framework="np") as f:
        for name in f.keys():
            tensors[name] = np.asarray(f.get_tensor(name),
                                       dtype=np.float32)
    return tensors, r, scaling, cfg


class LoRAManager:
    """Owns the slot-stacked adapter arrays for one model."""

    def __init__(self, model, max_loras: int = 4,
                 max_lora_rank: int = 16, dtype=np.float32) -> None:
        self.model = model
        self.max_loras = max_loras
        self.max_rank = max_lora_rank
        self.num_slots = max_loras + 1  # slot 0 = null adapter
        self.dtype = dtype
        self._name_to_slot: Dict[str, int] = {}
        self._slot_to_name: Dict[int, str] = {}
        self._lru: List[int] = []  # slot ids, most recent last
        # Per-slot long-context rope scaling factor (1.0 = plain).
        self._slot_factor: Dict[int, float] = {}

        L = model.num_layers
        H = model.hidden_size
        NH, NKV, D = (model.num_heads, model.num_kv_heads_padded,
                      model.head_dim)
        F = model.intermediate_size
        out_dims = {
            "wq": NH * D, "wk": NKV * D, "wv": NKV * D, "wo": H,
            "gate": F, "up": F, "down": H,
        }
        in_dims = {
            "wq": H, "wk": H, "wv": H, "wo": NH * D,
            "gate": H, "up": H, "down": F,
        }
        self.host_A: Dict[str, np.ndarray] = {}
        self.host_B: Dict[str, np.ndarray] = {}
        for m, out in out_dims.items():
            self.host_A[m] = np.zeros(
                (L, self.num_slots, in_dims[m], self.max_rank), dtype)
            self.host_B[m] = np.zeros(
                (L, self.num_slots, self.max_rank, out), dtype)
        self._device_params: Optional[Dict[str, Any]] = None

    @property
    def num_active(self) -> int:
        return len(self._name_to_slot)

    def list_adapters(self) -> List[str]:
        return sorted(self._name_to_slot)

    def _allocate_slot(self) -> int:
        for s in range(1, self.num_slots):
            if s not in self._slot_to_name:
                return s
        # Evict least-recently-used.
        victim = self._lru.pop(0)
        name = self._slot_to_name.pop(victim)
        del self._name_to_slot[name]
        logger.info("evicted LoRA adapter %s from slot %d", name, victim)
        return victim

    def add_adapter(self, name: str, path: str) -> int:
        """Load (or return) the slot of adapter `name`."""
        slot = self._name_to_slot.get(name)
        if slot is not None:
            self._touch(slot)
            return slot
        if os.environ.get("APHRODITE_TPU_TEST_LORA_FAIL") == name:
            # Test hook (multi-host pod-atomic rollback): simulates a
            # host-local load failure, e.g. non-shared adapter storage
            # (the APHRODITE_TPU_TEST_ENABLE_ARTIFICIAL_PREEMPT
            # pattern).
            raise RuntimeError(
                f"test hook: simulated LoRA load failure for {name!r}")
        tensors, r, scaling, cfg = load_peft_adapter(path)
        if r > self.max_rank:
            raise ValueError(
                f"adapter rank {r} exceeds max_lora_rank {self.max_rank}")
        # Long-context (LongLoRA-style) adapters declare the context
        # they were tuned for; factor = context / base max positions
        # (reference lora/models.py from_local_checkpoint
        # scaling_factor). The model must have preallocated the
        # factor's rope region (long_lora_scaling_factors).
        factor = 1.0
        ctx = cfg.get("context_length")
        if ctx:
            base_max = float(getattr(self.model, "orig_max_position",
                                     self.model.max_position))
            factor = float(ctx) / base_max
            offsets = getattr(self.model, "long_lora_rope_offsets",
                              {1.0: 0})
            if factor > 1.0 and factor not in offsets:
                raise ValueError(
                    f"adapter {name!r} needs rope scaling factor "
                    f"{factor} (context_length {ctx}); declare it in "
                    f"long_lora_scaling_factors (have "
                    f"{sorted(offsets)})")
        slot = self._allocate_slot()
        self._slot_factor[slot] = factor
        # Zero the slot, then fill from the checkpoint.
        for m in self.host_A:
            self.host_A[m][:, slot] = 0.0
            self.host_B[m][:, slot] = 0.0
        num_layers = self.model.num_layers
        for tname, arr in tensors.items():
            # e.g. base_model.model.model.layers.3.self_attn.q_proj.
            #        lora_A.weight  (A: [r, in], B: [out, r])
            parts = tname.split(".")
            try:
                li = parts.index("layers")
                layer = int(parts[li + 1])
                module = parts[li + 3] if parts[li + 2] in (
                    "self_attn", "mlp") else parts[li + 2]
                kind = parts[-2]  # lora_A | lora_B
            except (ValueError, IndexError):
                logger.warning("skipping unrecognized LoRA tensor %s",
                               tname)
                continue
            path_key = _TARGET_TO_PATH.get(module)
            if path_key is None or layer >= num_layers:
                continue
            if kind == "lora_A":
                # [r, in] -> [in, r]; fold in the alpha/r scaling.
                self.host_A[path_key][layer, slot, :, :arr.shape[0]] = \
                    arr.T * scaling
            elif kind == "lora_B":
                # [out, r] -> [r, out]
                self.host_B[path_key][layer, slot, :arr.shape[1], :] = \
                    arr.T
        self._name_to_slot[name] = slot
        self._slot_to_name[slot] = name
        self._touch(slot)
        self._device_params = None  # re-upload on next access
        logger.info("loaded LoRA adapter %s (r=%d) into slot %d", name, r,
                    slot)
        return slot

    def rope_offsets_by_slot(self) -> List[int]:
        """Per-slot offset into the model's appended long-context rope
        regions (0 for plain adapters and the null slot)."""
        offsets = getattr(self.model, "long_lora_rope_offsets",
                          {1.0: 0})
        return [offsets.get(self._slot_factor.get(s, 1.0), 0)
                for s in range(self.num_slots)]

    def remove_adapter(self, name: str) -> bool:
        slot = self._name_to_slot.pop(name, None)
        if slot is None:
            return False
        del self._slot_to_name[slot]
        self._slot_factor.pop(slot, None)
        if slot in self._lru:
            self._lru.remove(slot)
        for m in self.host_A:
            self.host_A[m][:, slot] = 0.0
            self.host_B[m][:, slot] = 0.0
        self._device_params = None
        return True

    def _touch(self, slot: int) -> None:
        if slot in self._lru:
            self._lru.remove(slot)
        self._lru.append(slot)

    def slot_for(self, lora_request: Optional[LoRARequest]) -> int:
        if lora_request is None:
            return 0
        slot = self._name_to_slot.get(lora_request.lora_name)
        if slot is None:
            slot = self.add_adapter(lora_request.lora_name,
                                    lora_request.lora_path)
        self._touch(slot)
        return slot

    def device_params(self, model_dtype, mesh=None) -> Dict[str, Any]:
        """Stacked device arrays {module: {"A": ..., "B": ...}}.

        With a tp mesh the adapters are FULLY SHARDED like the base
        weights (reference lora/fully_sharded_layers.py): column-wise
        modules (wq/wk/wv/gate/up) shard B's output dim over "model";
        row-wise modules (wo/down) shard A's input dim, so each rank
        holds and computes only its slice of the adapter delta (the
        [T, r] intermediate partial-sums across ranks exactly like the
        base row-parallel matmul). Rank-r dims stay replicated."""
        if self._device_params is None:
            import jax
            import jax.numpy as jnp

            use_mesh = (mesh is not None
                        and "model" in getattr(mesh, "axis_names", ())
                        and mesh.shape.get("model", 1) > 1)
            if use_mesh:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                tp = mesh.shape["model"]
                self._device_params = {}
                for m in self.host_A:
                    a_np = self.host_A[m].astype(model_dtype)
                    b_np = self.host_B[m].astype(model_dtype)
                    row_wise = m in ("wo", "down")
                    a_spec = (P(None, None, "model", None)
                              if row_wise and a_np.shape[2] % tp == 0
                              else P())
                    b_spec = (P(None, None, None, "model")
                              if not row_wise and b_np.shape[3] % tp == 0
                              else P())
                    self._device_params[m] = {
                        "A": jax.device_put(
                            a_np, NamedSharding(mesh, a_spec)),
                        "B": jax.device_put(
                            b_np, NamedSharding(mesh, b_spec)),
                    }
            else:
                self._device_params = {
                    m: {
                        "A": jnp.asarray(self.host_A[m], model_dtype),
                        "B": jnp.asarray(self.host_B[m], model_dtype),
                    }
                    for m in self.host_A
                }
        return self._device_params
