"""Soft-prompt (prompt-tuning) adapter manager.

Reference: aphrodite/prompt_adapter/ + adapter_commons/ — trained virtual
token embeddings are prepended to the prompt. TPU-native mechanism: the
embedding table is pre-extended with `n_slots x max_virtual_tokens`
reserved rows at engine start (static shapes — no recompiles on adapter
load); loading an adapter writes its embeddings into its slot's rows and
requests reference them with synthetic token ids >= vocab_size.

PEFT prompt-tuning checkpoints carry `prompt_embeddings`
[num_virtual, H] in adapter_model.safetensors.
"""

import os
from typing import Dict, List, Optional

import numpy as np

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.prompt_adapter.request import PromptAdapterRequest

logger = init_logger(__name__)


class PromptAdapterManager:
    def __init__(self, vocab_size: int, hidden_size: int,
                 max_adapters: int = 4,
                 max_virtual_tokens: int = 64) -> None:
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.max_adapters = max_adapters
        self.max_virtual = max_virtual_tokens
        self._name_to_slot: Dict[str, int] = {}
        self._slot_len: Dict[int, int] = {}

    @property
    def num_extra_rows(self) -> int:
        return self.max_adapters * self.max_virtual

    def slot_rows(self, slot: int) -> slice:
        base = self.vocab_size + slot * self.max_virtual
        return slice(base, base + self.max_virtual)

    def load(self, request: PromptAdapterRequest, params: Dict,
             dtype) -> Dict:
        """Load the adapter into a free slot; returns updated params
        (embed rows written functionally)."""
        import jax.numpy as jnp

        name = request.prompt_adapter_name
        if name in self._name_to_slot:
            return params
        if len(self._name_to_slot) >= self.max_adapters:
            raise ValueError(
                f"prompt-adapter slots exhausted ({self.max_adapters})")
        # First free slot (unload returns slots for reuse).
        free = [s for s in range(self.max_adapters)
                if s not in self._name_to_slot.values()]
        slot = free[0]
        from safetensors import safe_open

        st = os.path.join(request.prompt_adapter_local_path,
                          "adapter_model.safetensors")
        with safe_open(st, framework="np") as f:
            emb = None
            for key in f.keys():
                if "prompt_embeddings" in key or key == "embedding":
                    emb = np.asarray(f.get_tensor(key), dtype=np.float32)
                    break
        if emb is None:
            raise ValueError(f"no prompt_embeddings tensor in {st}")
        if emb.shape[0] > self.max_virtual:
            raise ValueError(
                f"adapter has {emb.shape[0]} virtual tokens > "
                f"max_virtual_tokens {self.max_virtual}")
        self._name_to_slot[name] = slot
        self._slot_len[slot] = emb.shape[0]
        rows = self.slot_rows(slot)
        embed = params["embed"]
        embed = embed.at[rows.start:rows.start + emb.shape[0]].set(
            jnp.asarray(emb, embed.dtype))
        params = dict(params)
        params["embed"] = embed
        logger.info("loaded prompt adapter %s (%d virtual tokens) into "
                    "slot %d", name, emb.shape[0], slot)
        return params

    def unload(self, name: str) -> bool:
        """Free an adapter's slot for reuse (its embed rows stay until
        the next load overwrites them — requests naming the adapter
        fail with 'not loaded' immediately). Serves the reference's
        /v1/soft_prompt/unload route and the multi-host rollback."""
        slot = self._name_to_slot.pop(name, None)
        if slot is None:
            return False
        self._slot_len.pop(slot, None)
        return True

    def virtual_token_ids(self,
                          request: Optional[PromptAdapterRequest]
                          ) -> List[int]:
        if request is None:
            return []
        slot = self._name_to_slot.get(request.prompt_adapter_name)
        if slot is None:
            raise ValueError(
                f"prompt adapter {request.prompt_adapter_name!r} is not "
                "loaded")
        rows = self.slot_rows(slot)
        return list(range(rows.start, rows.start + self._slot_len[slot]))
