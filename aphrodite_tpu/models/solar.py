"""Solar (Upstage solar-pro / 10.7B DUS): Llama naming + bskcn backbone
skip connections — snapshot activations at bskcn_1/bskcn_2 layers and
blend them back (weight bskcn_tv) at bskcn_3/bskcn_4 layers.

Reference: aphrodite/modeling/models/solar.py:320-339 (inference uses
bskcn_tv[1]).
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class SolarForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        tv = hf.get("bskcn_tv") or [0.9, 0.8]
        sets = {k: list(hf.get(f"bskcn_{n}") or [])
                for k, n in (("s1", 1), ("s2", 2), ("s3", 3), ("s4", 4))}
        if any(sets.values()):
            self.bskcn = dict(tv=float(tv[1]), **sets)
        else:
            self.bskcn = None
