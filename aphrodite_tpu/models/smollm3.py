"""SmolLM3: Llama topology with periodic NoPE layers (no_rope_layers —
every 4th layer skips rotary embedding entirely).

Reference: aphrodite models registry (smollm3).
"""

import jax.numpy as jnp

from aphrodite_tpu.models.llama import LlamaForCausalLM


class SmolLM3ForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        mask = hf.get("no_rope_layers")
        if mask is None:
            interval = int(hf.get("no_rope_layer_interval", 4))
            mask = [0 if (i + 1) % interval == 0 else 1
                    for i in range(self.num_layers)]
        # Config convention: 1 = rope enabled, 0 = NoPE layer.
        self.rope_layer_mask = jnp.asarray([bool(v) for v in mask])
