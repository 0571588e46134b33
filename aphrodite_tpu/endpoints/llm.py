"""Offline batch inference API (reference: aphrodite/endpoints/llm.py:30).

`LLM(model=...).generate(prompts, sampling_params)` — the same surface the
reference exposes, driving the engine's hot loop directly (call stack
SURVEY.md §3.3) with no RPC layer.
"""

from typing import List, Optional, Sequence, Union

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.outputs import RequestOutput
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.engine import AphroditeEngine

logger = init_logger(__name__)


class LLM:
    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        dtype: str = "auto",
        seed: int = 0,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        kv_cache_dtype: str = "auto",
        block_size: int = 16,
        hbm_utilization: float = 0.9,
        enable_prefix_caching: bool = False,
        tensor_parallel_size: int = 1,
        max_num_seqs: int = 256,
        max_num_batched_tokens: Optional[int] = None,
        enable_chunked_prefill: bool = True,
        num_device_blocks_override: Optional[int] = None,
        load_format: str = "auto",
        trust_remote_code: bool = False,
        **kwargs,
    ) -> None:
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer,
            dtype=dtype,
            seed=seed,
            max_model_len=max_model_len,
            quantization=quantization,
            kv_cache_dtype=kv_cache_dtype,
            block_size=block_size,
            hbm_utilization=hbm_utilization,
            enable_prefix_caching=enable_prefix_caching,
            tensor_parallel_size=tensor_parallel_size,
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            enable_chunked_prefill=enable_chunked_prefill,
            num_device_blocks_override=num_device_blocks_override,
            load_format=load_format,
            trust_remote_code=trust_remote_code,
            **kwargs,
        )
        self.engine = AphroditeEngine.from_engine_args(engine_args)
        # Offline generation reads text only at finish: skip per-step
        # incremental detokenization on the hot loop (stop strings
        # still force it per sequence).
        self.engine.lazy_detokenize = True
        self._request_counter = 0

    def get_tokenizer(self):
        return self.engine.tokenizer

    def save_sharded_state(self, path: str) -> None:
        """Write the loaded (possibly quantized) weights as a fast-boot
        sharded-state directory; load it back with model=<path>."""
        self.engine.runner.save_sharded_state(path)

    def chat(
        self,
        messages,
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        use_tqdm: bool = False,
        chat_template: Optional[str] = None,
        add_generation_prompt: bool = True,
    ) -> List[RequestOutput]:
        """Chat-style generation (reference LLM.chat, endpoints/llm.py):
        applies the tokenizer's chat template to one conversation (list
        of {role, content} dicts) or a list of conversations."""
        if messages and isinstance(messages[0], dict):
            conversations = [messages]
        else:
            conversations = list(messages)
        tok = self.engine.tokenizer
        prompts = []
        for conv in conversations:
            if getattr(tok, "chat_template", None) or chat_template:
                text = tok.apply_chat_template(
                    conv, tokenize=False,
                    add_generation_prompt=add_generation_prompt,
                    chat_template=chat_template)
            else:
                text = "".join(f"<|{m['role']}|>\n{m['content']}\n"
                               for m in conv)
                if add_generation_prompt:
                    text += "<|assistant|>\n"
            prompts.append(text)
        return self.generate(prompts, sampling_params, use_tqdm=use_tqdm)

    def generate(
        self,
        prompts: Union[str, Sequence[str], None] = None,
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        prompt_token_ids: Optional[Sequence[List[int]]] = None,
        use_tqdm: bool = False,
        lora_request=None,
        prompt_adapter_request=None,
    ) -> List[RequestOutput]:
        if prompts is not None and isinstance(prompts, (str, dict)):
            prompts = [prompts]
        num = len(prompts) if prompts is not None else len(prompt_token_ids)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * num
        if len(sampling_params) != num:
            raise ValueError("sampling_params length mismatch")

        request_ids = []
        for i in range(num):
            self._request_counter += 1
            rid = str(self._request_counter)
            request_ids.append(rid)
            prompt = prompts[i] if prompts is not None else None
            ids = (prompt_token_ids[i]
                   if prompt_token_ids is not None else None)
            mm_data = None
            dec_ids = None
            if isinstance(prompt, dict):
                # vLLM-style multimodal input: {"prompt": ... |
                # "prompt_token_ids": ..., "multi_modal_data":
                # {"image": pixel_values}} (reference inputs/data.py).
                # Encoder-decoder requests may add
                # "decoder_prompt_token_ids" (the main prompt feeds the
                # encoder).
                mm_data = prompt.get("multi_modal_data")
                ids = prompt.get("prompt_token_ids", ids)
                dec_ids = prompt.get("decoder_prompt_token_ids")
                prompt = prompt.get("prompt")
            self.engine.add_request(
                request_id=rid,
                prompt=prompt,
                sampling_params=sampling_params[i],
                prompt_token_ids=ids,
                lora_request=lora_request,
                multi_modal_data=mm_data,
                decoder_prompt_token_ids=dec_ids,
                prompt_adapter_request=prompt_adapter_request,
            )
        return self._run_engine(request_ids, use_tqdm)

    def encode(
        self,
        prompts: Union[str, Sequence[str], None] = None,
        prompt_token_ids: Optional[Sequence[List[int]]] = None,
        pooling: str = "last",
    ):
        """Embeddings (reference LLM.encode, endpoints/llm.py:433)."""
        from aphrodite_tpu.common.outputs import EmbeddingRequestOutput

        if prompts is not None and isinstance(prompts, str):
            prompts = [prompts]
        if prompt_token_ids is None:
            tok = self.engine.tokenizer
            prompt_token_ids = [tok.encode(p) for p in prompts]
        embeddings = self.engine.encode(list(prompt_token_ids),
                                        pooling=pooling)
        return [
            EmbeddingRequestOutput(
                request_id=str(i),
                prompt_token_ids=list(ids),
                embedding=[float(x) for x in emb],
            ) for i, (ids, emb) in enumerate(
                zip(prompt_token_ids, embeddings))
        ]

    def _run_engine(self, request_ids: List[str],
                    use_tqdm: bool) -> List[RequestOutput]:
        pbar = None
        if use_tqdm:
            from tqdm import tqdm

            pbar = tqdm(total=len(request_ids), desc="generating")
        results = {}
        try:
            while self.engine.has_unfinished_requests():
                for out in self.engine.step():
                    if out.finished:
                        results[out.request_id] = out
                        if pbar is not None:
                            pbar.update(1)
        except Exception:
            # Abort this call's requests so a failed step (e.g. a faulty
            # user logits processor) doesn't wedge the engine for later
            # generate() calls on the same LLM object.
            for rid in request_ids:
                if rid not in results:
                    self.engine.abort_request(rid)
            if pbar is not None:
                pbar.close()
            raise
        if pbar is not None:
            pbar.close()
        missing = [rid for rid in request_ids if rid not in results]
        if missing:
            raise RuntimeError(f"requests never finished: {missing[:4]}")
        return [results[rid] for rid in request_ids]
