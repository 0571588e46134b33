"""Qwen v1 (Qwen-7B/14B, QWenLMHeadModel): Llama math with fused biased
c_attn, w1/w2 swapped gate naming, and intermediate_size declared at 2x.

Reference: aphrodite/modeling/models/qwen.py (QWenMLP uses
config.intermediate_size // 2; gate_up packs [w2; w1], qwen.py:960-961).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):
    attention_bias = True  # fused c_attn carries bias

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-6))
        hf.setdefault("rope_theta", hf.get("rotary_emb_base", 10000.0))
        hf.setdefault("max_position_embeddings",
                      hf.get("seq_length", 2048))
        if not hf.get("_qwen_ffn_halved"):
            # QWen configs declare intermediate_size at 2x the actual FFN
            # width (the checkpoint's w1/w2 are each half).
            hf["intermediate_size"] = int(hf["intermediate_size"]) // 2
            hf["_qwen_ffn_halved"] = True
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "attn.c_proj.weight", "layers.wo", True),
            (h + "ln_2.weight", "layers.post_norm", False),
            # w2 is the gate, w1 the up projection (reference mapping).
            (h + "mlp.w2.weight", "layers.gate", True),
            (h + "mlp.w1.weight", "layers.up", True),
            (h + "mlp.c_proj.weight", "layers.down", True),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("transformer.h.{i}.attn.c_attn.weight",
             [("layers.wq", 0, H), ("layers.wk", H, 2 * H),
              ("layers.wv", 2 * H, 3 * H)], True),
            ("transformer.h.{i}.attn.c_attn.bias",
             [("layers.bq", 0, H), ("layers.bk", H, 2 * H),
              ("layers.bv", 2 * H, 3 * H)], False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("transformer.wte.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps
