"""EAGLE draft model: a llama-style decoder whose input embedding is
fc([token_embedding, previous hidden state]).

Reference: aphrodite/modeling/models/eagle.py (EAGLE). The draft is a
FULL autoregressive decoder with its own paged KV cache and lm_head;
its only structural difference from the wrapped architecture is the
input: fc([emb(t_p), f_{p-1}]) where f is the TARGET model's hidden
state (the feature that emitted t_p), zeroed at position 0
(eagle.py:86-88). During the k-step proposal scan the draft's own
output hidden plays the role of f (the paper's feature autoregression).

Runner integration (worker/model_runner.py): the target's hidden at
each token must ride along with every draft-KV sync pass, with a
device-resident per-sequence carry (keyed by the sequence's FIRST KV
page — stable for its lifetime) bridging chunked-prefill boundaries
and engine steps.

Config: EAGLEConfig nests the wrapped model's config under "model"
(transformers_utils/configs/eagle.py) and also flattens its keys to
the top level; we hoist the nested dict for robustness.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.quantization.qlinear import qmatmul


class EAGLEModel(LlamaForCausalLM):
    tie_word_embeddings_default = False

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        hf = model_config.hf_config
        nested = hf.get("model")
        if isinstance(nested, dict):
            for k, v in nested.items():
                hf.setdefault(k, v)
        tv = hf.get("truncated_vocab_size")
        self.truncated_vocab: Optional[int] = None
        if tv not in (None, hf.get("vocab_size")):
            # Draft vocab truncated to the top-k most frequent tokens;
            # the checkpoint carries a `token_map` tensor mapping draft
            # logit rows to full-vocab ids (reference eagle.py:100-113:
            # full logits are -inf outside the map).
            self.truncated_vocab = int(tv)
        super().__init__(model_config, parallel_config)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        H = self.hidden_size
        shapes["fc"] = (2 * H, H)
        if self.truncated_vocab:
            shapes["lm_head"] = (H, self.truncated_vocab)
            shapes["token_map"] = (self.truncated_vocab,)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["fc"] = P()
        if self.truncated_vocab:
            specs["token_map"] = P()
        return specs

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_global_mappings()
        maps.append(("fc.weight", "fc", True))
        if self.truncated_vocab:
            maps.append(("token_map", "token_map", False))
        return maps

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        logits = super().compute_logits(params, hidden)
        if not self.truncated_vocab:
            return logits
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        full = jnp.full((*logits.shape[:-1], self.vocab_size), neg,
                        logits.dtype)
        return full.at[..., params["token_map"]].set(logits)

    def finalize_params(self, params: Dict[str, Any]) -> None:
        # EAGLE checkpoints trained without a final norm may omit
        # model.norm.weight; the reference leaves the nn default (unit
        # RMSNorm scale) in place (eagle.py:157 load_weights only maps
        # present tensors).
        import numpy as np

        if "final_norm" not in params:
            params["final_norm"] = np.ones((self.hidden_size,), np.float32)

    def forward_with_hidden(
        self,
        params: Dict[str, Any],
        kv_pages: jax.Array,
        batch: ForwardBatch,
        prev_hidden: jax.Array,  # [T, H] target/feature stream
        *,
        mesh=None,
    ) -> Tuple[jax.Array, jax.Array]:
        emb = params["embed"][batch.token_ids].astype(self.dtype)
        x = jnp.concatenate([emb, prev_hidden.astype(self.dtype)],
                            axis=-1)
        x = qmatmul(x, params["fc"]).astype(self.dtype)
        # Position 0 has no previous feature (eagle.py:88).
        x = jnp.where((batch.positions == 0)[:, None],
                      jnp.zeros_like(x), x)
        b = batch._replace(
            embeds_override=x,
            embeds_mask=jnp.ones(batch.token_ids.shape, bool))
        return self.forward(params, kv_pages, b, mesh=mesh)
