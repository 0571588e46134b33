"""StarCoder2 decoder.

Reference: aphrodite/modeling/models/starcoder2.py. Llama-style RoPE
attention with biases everywhere, LayerNorm (not RMSNorm), plain
gelu MLP (c_fc/c_proj), tied embeddings on small variants, sliding
window.
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class Starcoder2ForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    tie_word_embeddings_default = True
