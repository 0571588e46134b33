"""Nemotron: squared-ReLU ungated MLP, LayerNorm1p ((1+w) weights WITH
bias), partial rotary, untied head.

Reference: aphrodite/modeling/models/nemotron.py (NemotronForCausalLM).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class NemotronForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    norm_weight_offset = 1.0
    gated_mlp = False
    ungated_act = "relu2"

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("norm_eps", 1e-5))
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [m for m in super().hf_param_mappings()
                if not m[1].startswith("layers.fc")]
        return maps + [
            ("model.layers.{i}.mlp.up_proj.weight", "layers.fc1", True),
            ("model.layers.{i}.mlp.down_proj.weight", "layers.fc2", True),
        ]
