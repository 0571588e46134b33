"""Hidden-state speculative proposers: Medusa and MLPSpeculator.

Reference: aphrodite/modeling/models/medusa.py (ResidualBlock heads on
the target's hidden state, top-1 proposals) and mlp_speculator.py
(autoregressive MLP stages over [prev_state, token embedding]).

Both proposers read the hidden state that emitted a step's LAST token
(h predicts position p+1 via the LM head; head/stage j predicts
p+1+j), so proposals for the NEXT engine step fall out of the current
step's forward for free — the runner carries them per sequence and the
verifier treats them as delta drafts (accept prob = p(token); exact
rejection sampling, same as n-gram proposals).

These classes implement the loader's model interface (param_shapes /
mappings / random_params) but are NOT causal LMs — they attach to the
runner as `hidden_proposer`.
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _walk_random(shapes, rng):
    out = {}
    for k, v in shapes.items():
        if isinstance(v, dict):
            out[k] = _walk_random(v, rng)
        elif k.endswith("ln_w"):
            out[k] = np.ones(v, np.float32)
        else:
            scale = 1.0 / np.sqrt(v[-1] if len(v) > 1 else 1)
            out[k] = rng.standard_normal(v).astype(np.float32) * scale
    return out


class MedusaProposer:
    """Medusa heads: per head, num_hidden_layers residual SiLU blocks
    then an LM head; proposal = argmax (reference medusa.py top-1)."""

    is_hidden_proposer = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        self.hidden_size = int(hf["hidden_size"])
        self.vocab_size = int(hf["vocab_size"])
        self.num_heads = int(hf.get("medusa_num_heads")
                             or hf.get("num_heads"))
        self.num_block_layers = int(hf.get("medusa_num_layers")
                                    or hf.get("num_hidden_layers") or 1)
        if hf.get("truncated_vocab_size") not in (None,
                                                  self.vocab_size):
            raise NotImplementedError("medusa token_map / truncated "
                                      "vocab not supported yet")
        self.dtype = jnp.dtype(model_config.dtype)
        self.in_dim = self.hidden_size  # target hidden size expected
        # Loader interface: no plain per-layer stack.
        self.num_layers = 0
        self.num_experts = self.num_block_layers
        self.expert_layer_indices = list(range(self.num_heads))

    @property
    def k(self) -> int:
        return self.num_heads

    def param_shapes(self) -> Dict[str, Any]:
        Hn, Ln, H, V = (self.num_heads, self.num_block_layers,
                        self.hidden_size, self.vocab_size)
        return {
            "blocks": (Hn, Ln, H, H),
            "lm_heads": (Hn, H, V),
        }

    def param_shardings(self) -> Dict[str, Any]:
        return {"blocks": P(), "lm_heads": P(None, None, "model")}

    def quantizable_weights(self) -> List[str]:
        return []

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return []

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return []

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        # Head index rides the "layer" slot, block-layer the "expert"
        # slot -> stacked [num_heads, num_block_layers, H, H]. The
        # reference strips an optional "medusa_heads." prefix
        # (medusa.py:160); accept both namings.
        return [(p + "blocks.{i}.layers.{e}.weight", "blocks", True)
                for p in ("", "medusa_heads.")]

    def hf_aux_mappings(self):
        return [(p + "lm_heads.{i}.weight", "lm_heads", True,
                 self.num_heads) for p in ("", "medusa_heads.")]

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        return _walk_random(self.param_shapes(), np.random.default_rng(seed))

    def propose(self, params: Dict[str, Any], hidden: jax.Array,
                last_token: jax.Array) -> jax.Array:
        """hidden f[S, H], last_token i32[S] (unused) -> i32[S, k]."""
        del last_token
        h = hidden.astype(self.dtype)
        toks = []
        for head in range(self.num_heads):
            x = h
            for l in range(self.num_block_layers):
                x = x + jax.nn.silu(
                    jnp.dot(x, params["blocks"][head, l]).astype(
                        jnp.float32)).astype(self.dtype)
            logits = jnp.dot(x, params["lm_heads"][head],
                             preferred_element_type=jnp.float32)
            toks.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
        return jnp.stack(toks, axis=1)


class MLPSpeculatorProposer:
    """IBM MLP speculator: autoregressive MLP stages where stage j mixes
    the projected previous state with the last token's embedding,
    normalizes (L2 layernorm), activates (GELU), and predicts via its
    own LM head (reference mlp_speculator.py generate_proposals)."""

    is_hidden_proposer = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        self.vocab_size = int(hf["vocab_size"])
        self.emb_dim = int(hf["emb_dim"])
        inner = int(hf.get("inner_dim") or 0)
        self.inner_dim = inner if inner != 0 else self.emb_dim
        self.n_predict = int(hf["n_predict"])
        # Stage count follows num_lookahead_tokens (reference
        # mlp_speculator.py max_speculative_tokens); n_predict only
        # enters the state/emb mixing weights.
        self.num_lookahead = int(hf.get("num_lookahead_tokens")
                                 or self.n_predict)
        self.tie_weights = bool(hf.get("tie_weights", False))
        self.scale_input = bool(hf.get("scale_input", False))
        self.state_weight = 0.5 ** (0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight ** 2) * (self.inner_dim / 2))
        self.ln_eps = 1e-6
        self.dtype = jnp.dtype(model_config.dtype)
        self.in_dim = self.emb_dim  # target hidden size expected
        self.num_layers = 0

    @property
    def k(self) -> int:
        return self.num_lookahead

    def _stages(self) -> int:
        return 1 if self.tie_weights else self.num_lookahead

    def param_shapes(self) -> Dict[str, Any]:
        S, Di, De, V = (self._stages(), self.inner_dim, self.emb_dim,
                        self.vocab_size)
        shapes = {
            "emb": (S, V, Di),
            "proj_first": (De, Di),
            "head": (S, Di, V),
            "ln_w": (S, Di),
            "ln_b": (S, Di),
        }
        if self.num_lookahead > 1:
            rest = 1 if self.tie_weights else self.num_lookahead - 1
            shapes["proj_rest"] = (rest, Di, Di)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        return {k: P() for k in self.param_shapes()}

    def quantizable_weights(self) -> List[str]:
        return []

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return []

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return []

    def hf_aux_mappings(self):
        S = self._stages()
        rest = 1 if self.tie_weights else self.num_lookahead - 1
        maps = []
        for prefix in ("", "speculator."):
            maps += [
                (prefix + "emb.{i}.weight", "emb", False, S),
                (prefix + "proj.0.weight", "proj_first", True, 1),
                (prefix + "head.{i}.weight", "head", True, S),
                (prefix + "ln.{i}.weight", "ln_w", False, S),
                (prefix + "ln.{i}.bias", "ln_b", False, S),
            ]
            if self.num_lookahead > 1:
                maps.append((prefix + "proj.{i}.weight", "proj_rest",
                             True, rest, 1))
        return maps

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        return _walk_random(self.param_shapes(), np.random.default_rng(seed))

    def propose(self, params: Dict[str, Any], hidden: jax.Array,
                last_token: jax.Array) -> jax.Array:
        state = hidden.astype(jnp.float32)  # [S, emb_dim]
        if self.scale_input:
            state = state * jax.lax.rsqrt(
                jnp.mean(state * state, axis=-1, keepdims=True)
                + self.ln_eps) / math.sqrt(2.0)
        tok = last_token
        toks = []
        for i in range(self.num_lookahead):
            s = 0 if self.tie_weights else i
            z = params["emb"][s][tok].astype(jnp.float32)  # [S, Di]
            if i == 0:
                proj = params["proj_first"]
            else:
                proj = params["proj_rest"][0 if self.tie_weights
                                           else i - 1]
            state = jnp.dot(state, proj.astype(jnp.float32))
            state = state + z * (self.emb_weight / self.state_weight)
            # L2 layernorm (no mean subtraction) + affine, then GELU.
            state = state * jax.lax.rsqrt(
                jnp.mean(state * state, axis=-1, keepdims=True)
                + self.ln_eps)
            state = state * params["ln_w"][s] + params["ln_b"][s]
            state = jax.nn.gelu(state, approximate=False)
            logits = jnp.dot(state, params["head"][s],
                             preferred_element_type=jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            toks.append(tok)
        return jnp.stack(toks, axis=1)


PROPOSER_ARCHS = {
    "MedusaModel": ("medusa", MedusaProposer),
    "MedusaForCausalLM": ("medusa", MedusaProposer),
    "MLPSpeculatorPreTrainedModel": ("mlp_speculator",
                                     MLPSpeculatorProposer),
}
