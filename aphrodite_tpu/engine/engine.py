"""The synchronous engine: request intake -> schedule -> execute -> outputs.

Re-design of the reference AphroditeEngine (aphrodite/engine/
aphrodite_engine.py:116): `add_request()` tokenizes and enqueues,
`step()` runs one scheduler+device iteration and returns `RequestOutput`s
for every request touched this step. There is no executor/worker process
tree — JAX's single-controller model drives all chips of the mesh from this
process, so the reference's layers 6-8 (executor, worker, RPC broadcast)
collapse into the ModelRunner (SURVEY.md §2.5 TPU-native mapping).
"""

import time
from typing import Any, Dict, Iterable, List, Optional, Union

from aphrodite_tpu.common.config import EngineConfig
from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.outputs import RequestOutput
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.common.sequence import (Logprob, Sequence, SequenceGroup,
                                           SequenceStatus)
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.metrics import StatLogger, Stats
from aphrodite_tpu.engine.stop_checker import StopChecker
from aphrodite_tpu.processing.scheduler import Scheduler
from aphrodite_tpu.transformers_utils.detokenizer import (
    detokenize_incrementally)
from aphrodite_tpu.transformers_utils.tokenizer import get_tokenizer
from aphrodite_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)


class AphroditeEngine:
    def __init__(self, engine_config: EngineConfig) -> None:
        self.config = engine_config
        self.model_config = engine_config.model_config
        self.scheduler_config = engine_config.scheduler_config

        # Debug aid (reference APHRODITE_TRACE_FUNCTION,
        # worker_base.py init): trace every internal call/return.
        import os as _os
        if _os.environ.get("APHRODITE_TPU_TRACE_FUNCTION", "0") == "1":
            import time as _time

            from aphrodite_tpu.common.logger import (
                enable_trace_function_call)

            path = _os.path.join(
                _os.environ.get("APHRODITE_TPU_TRACE_DIR", "/tmp"),
                f"aphrodite_tpu_trace_{int(_time.time())}.log")
            enable_trace_function_call(path)

        if self.model_config.skip_tokenizer_init:
            self.tokenizer = None
            self.eos_token_id = None
        elif self.model_config.tokenizer.endswith(".gguf"):
            raise ValueError(
                "GGUF models need an HF tokenizer: pass tokenizer=<dir> "
                "(or skip_tokenizer_init=True for token-id-only usage)")
        else:
            self.tokenizer = get_tokenizer(
                self.model_config.tokenizer,
                trust_remote_code=self.model_config.trust_remote_code)
            self.eos_token_id = self.tokenizer.eos_token_id

        self.runner = ModelRunner(engine_config)
        self.runner.load_model()
        self.runner.initialize_cache()
        if self.runner._multihost:
            # Release the follower processes' replay loops when the
            # primary exits (reference: empty broadcast dict stops the
            # worker loop, worker_base.py:269-289).
            import atexit

            from aphrodite_tpu.parallel import multihost

            if multihost.is_primary():
                atexit.register(multihost.primary_broadcast_stop)

        self.scheduler = Scheduler(engine_config.scheduler_config,
                                   engine_config.cache_config)
        if engine_config.speculative_config is not None:
            # Decodes must reserve room for k speculative tokens.
            self.scheduler.num_lookahead_slots = max(
                self.scheduler.num_lookahead_slots,
                engine_config.speculative_config.num_speculative_tokens)
        self.stop_checker = StopChecker(self.model_config.max_model_len)
        # Offline consumers (LLM.generate) read text only at finish;
        # they opt into lazy detokenization. Streaming frontends keep
        # per-step incremental text.
        self.lazy_detokenize = False

        self._seq_counter = 0
        self._groups: Dict[str, SequenceGroup] = {}
        # Guided requests parked while their token FSM compiles on the
        # build pool: (request_id, group, seqs, to_schedule, future).
        self._fsm_parked: List[tuple] = []
        self._generation_config = self._load_generation_config()
        self.stat_logger = StatLogger(self.model_config.model)
        # Per-phase wall time of engine iterations (schedule / execute /
        # postprocess), cumulative since engine start plus the latest
        # iteration — surfaced via Prometheus gauges and the
        # /v1/internal/engine_stats route. The reference exposes only
        # aggregate iteration stats; the phase split is what TPU tuning
        # actually needs (host gaps show up here, not in device time).
        self.phase_timings = {
            "iterations": 0,
            "schedule_s": 0.0,
            "execute_s": 0.0,
            "postprocess_s": 0.0,
            "last_schedule_ms": 0.0,
            "last_execute_ms": 0.0,
            "last_postprocess_ms": 0.0,
            # Pure-decode accounting: iterations with zero prefill
            # tokens, their full step wall time, and the tokens they
            # appended. decode_tokens/decode_s IS steady-state decode
            # throughput — measured, not inferred by subtracting a
            # separate prefill run (bench.py uses exactly this).
            "decode_iterations": 0,
            "decode_s": 0.0,
            "decode_tokens": 0,
            # Speculative-decode acceptance accounting (reference
            # spec_decode/metrics.py:51 AsyncMetricsCollector): draft
            # tokens proposed, drafts accepted by the verifier, and
            # tokens emitted (accepted + bonus). acceptance rate =
            # accepted/proposed; system efficiency = emitted/(k+1 per
            # scheduled row). Production k-tuning reads these.
            "spec_proposed_tokens": 0,
            "spec_accepted_tokens": 0,
            "spec_emitted_tokens": 0,
        }

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs) -> "AphroditeEngine":
        return cls(engine_args.create_engine_config())

    def _load_generation_config(self) -> Dict[str, Any]:
        import json
        import os

        path = os.path.join(self.model_config.model,
                            "generation_config.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def _next_seq_id(self) -> int:
        self._seq_counter += 1
        return self._seq_counter

    # ------------------------------------------------------------------
    # Request intake
    # ------------------------------------------------------------------

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        prompt_adapter_request: Optional[Any] = None,
        multi_modal_data: Optional[Dict[str, Any]] = None,
        decoder_prompt_token_ids: Optional[List[int]] = None,
    ) -> None:
        # Multi-host note: guided decoding and host logits processors
        # ARE served — FSM state and callables live on the primary;
        # followers get this step's packed allow-mask in the step
        # mirror and the edited logits over a mid-execute broadcast
        # (parallel/multihost.py freeze_outputs / MIRRORED_PROCS, the
        # TPU equivalent of the reference's driver-side logits
        # processing under Ray multi-node).
        if lora_request is not None and self.runner.lora_manager is None:
            raise ValueError(
                "LoRA request received but enable_lora=False")
        if prompt_adapter_request is not None:
            pam = self.runner.prompt_adapter_manager
            if pam is None:
                raise ValueError("prompt adapter request received but "
                                 "enable_prompt_adapter=False")
            fresh = (prompt_adapter_request.prompt_adapter_name
                     not in pam._name_to_slot)
            self.runner.params = pam.load(prompt_adapter_request,
                                          self.runner.params,
                                          None)
            if fresh and self.runner._multihost:
                # Validated locally first (see add_lora); followers
                # mirror the load so their embed rows match.
                from aphrodite_tpu.parallel import multihost

                multihost.primary_broadcast_padapt(
                    prompt_adapter_request.prompt_adapter_name,
                    prompt_adapter_request.prompt_adapter_id,
                    prompt_adapter_request.prompt_adapter_local_path)
                if not multihost.agree_adapter_load(True):
                    pam.unload(
                        prompt_adapter_request.prompt_adapter_name)
                    raise ValueError(
                        f"soft prompt "
                        f"{prompt_adapter_request.prompt_adapter_name!r}"
                        " failed to load on one or more follower hosts;"
                        " rolled back pod-wide")
        if request_id in self._groups:
            raise ValueError(f"duplicate request_id {request_id!r}")
        if sampling_params is None:
            sampling_params = SamplingParams()
        if prompt_token_ids is None:
            if prompt is None:
                raise ValueError("either prompt or prompt_token_ids required")
            prompt_token_ids = self.tokenizer.encode(prompt)
        if sampling_params.truncate_prompt_tokens is not None:
            prompt_token_ids = prompt_token_ids[
                -sampling_params.truncate_prompt_tokens:]
        if prompt_adapter_request is not None:
            # Soft prompt: prepend the adapter's virtual token ids (rows
            # reserved past the vocab in the embedding table).
            virtual = self.runner.prompt_adapter_manager.\
                virtual_token_ids(prompt_adapter_request)
            prompt_token_ids = virtual + list(prompt_token_ids)
        # Encoder-decoder: the PROMPT feeds the encoder; the decoder
        # stream starts from decoder_start_token_id unless an explicit
        # decoder prompt is given (reference enc-dec input processing,
        # inputs/preprocess.py).
        encoder_token_ids = None
        encoder_audio = None
        if self.runner._multihost and (
                getattr(self.runner.model, "encoder_takes_audio", False)
                or getattr(self.runner.model, "is_encoder_decoder",
                           False)):
            # Reject at ADMISSION, not in the step mirror (a freeze-time
            # raise would kill the serving loop): the encoder runs
            # host-driven cross-KV plumbing the follower replay does not
            # mirror yet.
            raise ValueError(
                "encoder-decoder models are not supported on multi-host "
                "deployments")
        if getattr(self.runner.model, "encoder_takes_audio", False):
            # Whisper-style: the prompt IS the decoder prompt; the
            # encoder consumes audio features from multi_modal_data.
            import numpy as np
            mel = (multi_modal_data or {}).get("audio")
            if mel is None:
                raise ValueError(
                    "audio-encoder models need multi_modal_data="
                    "{'audio': log_mel [mels, frames]}")
            encoder_audio = np.asarray(mel, np.float32)
            enc_len = self.runner.model.encoder_feature_len(encoder_audio)
            encoder_token_ids = [0] * enc_len
            multi_modal_data = None
        elif getattr(self.runner.model, "is_encoder_decoder", False):
            encoder_token_ids = list(prompt_token_ids)
            if decoder_prompt_token_ids:
                prompt_token_ids = list(decoder_prompt_token_ids)
            else:
                prompt_token_ids = [
                    self.runner.model.decoder_start_token_id
                ]
        elif decoder_prompt_token_ids:
            raise ValueError(
                "decoder_prompt_token_ids is only valid for "
                "encoder-decoder models")
        sampling_params = sampling_params.clone()
        sampling_params.update_from_generation_config(
            self._generation_config, self.eos_token_id)

        # Multimodal: expand each image-placeholder token to the model's
        # per-image feature count, encode the image(s) through the vision
        # tower NOW (once per request), and record the splice spans
        # (reference models/llava.py input processor + merge).
        mm_spans = None
        mm_hash = None
        mrope_table = None
        mrope_delta = 0
        # Encoder-decoder multimodal (BLIP2-T5): placeholders live in
        # the ENCODER prompt; features splice into the encoder program.
        mm_target_encoder = encoder_token_ids is not None
        if mm_target_encoder and multi_modal_data:
            prompt_token_ids, encoder_token_ids = (encoder_token_ids,
                                                   prompt_token_ids)
        if multi_modal_data:
            model = self.runner.model
            if not getattr(model, "is_multimodal", False):
                raise ValueError(
                    f"model {self.model_config.architecture} does not "
                    "accept multi_modal_data")
            if getattr(model, "image_token_str", None) and \
                    self.tokenizer is not None:
                # Remote-code checkpoints name the placeholder instead
                # of carrying its id (InternVL's <IMG_CONTEXT>;
                # reference internvl.py:282): resolve once.
                enc = self.tokenizer.encode(model.image_token_str,
                                            add_special_tokens=False)
                if len(enc) == 1:
                    model.image_token_index = int(enc[0])
                model.image_token_str = None
            # Placeholder id per accepted modality. Single-modality
            # models expose `modality` (+ image_token_index); models
            # accepting several (Qwen2-VL image+video) expose
            # `modality_token_ids`.
            tok_map = getattr(model, "modality_token_ids", None)
            if tok_map is None:
                tok_map = {getattr(model, "modality", "image"):
                           model.image_token_index}
            unknown = set(multi_modal_data) - set(tok_map)
            if unknown or not multi_modal_data:
                raise ValueError(
                    f"multi_modal_data must carry {sorted(tok_map)}; "
                    f"got {sorted(multi_modal_data)}")
            import numpy as np
            # Encode each item through the tower NOW; feature counts
            # may vary per item (LLaVA-NeXT tiles, Fuyu patch grids,
            # video frame counts), so placeholders expand to each
            # item's own count.
            queues = {}  # modality -> [(item, feats), ...]
            hash_parts = []
            for mod, v in multi_modal_data.items():
                items = list(v) if isinstance(v, (list, tuple)) else [v]
                queues[mod] = []
                for im in items:
                    if isinstance(im, dict):
                        # Structured item (e.g. LLaVA-NeXT anyres:
                        # tiled pixel_values + original image_size).
                        for part in im.values():
                            hash_parts.append(
                                np.asarray(part, np.float32).tobytes())
                    else:
                        px = np.asarray(im, np.float32)
                        if mod == "image" and (
                                px.ndim not in (3, 4)
                                or px.shape[-3] != 3):
                            raise ValueError(
                                "each image must be preprocessed "
                                "pixel_values [3, height, width] (or a "
                                "[n_tiles, 3, h, w] tile stack); got "
                                f"{px.shape}")
                        hash_parts.append(mod.encode() + px.tobytes())
                    if self.runner._multihost:
                        # The tower's params are global-mesh arrays:
                        # every host must join the encode collective.
                        from aphrodite_tpu.parallel import multihost

                        multihost.primary_broadcast_mm_encode(im)
                    queues[mod].append(
                        (im, np.asarray(
                            self.runner.encode_image_item(im),
                            np.float32)))
            tok2mod = {tid: mod for mod, tid in tok_map.items()
                       if mod in queues}
            new_ids: List[int] = []
            mm_spans = []
            ordered_items = []  # prompt order, for M-RoPE grids
            taken = {mod: 0 for mod in queues}
            for t in prompt_token_ids:
                mod = tok2mod.get(t)
                if mod is not None:
                    if taken[mod] >= len(queues[mod]):
                        raise ValueError(
                            f"prompt has more {mod} placeholders "
                            f"(token {t}) than {mod} items "
                            f"({len(queues[mod])})")
                    item, feats = queues[mod][taken[mod]]
                    taken[mod] += 1
                    ordered_items.append(item)
                    base = len(new_ids)
                    if hasattr(model, "expand_image_item"):
                        # Model-defined placeholder layout (Fuyu: rows
                        # of image tokens separated by newline TOKENS,
                        # so the splice spans are per-row).
                        toks, rel_spans = model.expand_image_item(
                            item, feats)
                        new_ids.extend(toks)
                        for rs, fseg in rel_spans:
                            mm_spans.append((base + rs, fseg))
                    else:
                        new_ids.extend([t] * feats.shape[0])
                        mm_spans.append((base, feats))
                else:
                    new_ids.append(t)
            for mod, n in taken.items():
                if n != len(queues[mod]):
                    raise ValueError(
                        f"prompt has {n} {mod} placeholder(s) (token "
                        f"{tok_map[mod]}) but {len(queues[mod])} "
                        f"item(s) given")
            prompt_token_ids = new_ids
            mm_hash = hash(b"".join(hash_parts))
            if mm_target_encoder:
                # Swap back: the expanded stream is the encoder's.
                prompt_token_ids, encoder_token_ids = (
                    encoder_token_ids, prompt_token_ids)
            # M-RoPE models (Qwen2-VL): 3D rope positions for the
            # expanded prompt + the decode position delta (reference
            # MRotaryEmbedding.get_input_positions).
            if hasattr(model, "mrope_input_positions"):
                mrope_table, mrope_delta = model.mrope_input_positions(
                    prompt_token_ids, ordered_items)

        fsm = None
        fsm_future = None
        guided = sampling_params.guided_spec
        if guided is not None:
            if self.tokenizer is None:
                raise ValueError("guided decoding needs a tokenizer")
            from aphrodite_tpu.guided.token_fsm import get_token_fsm_future

            fut = get_token_fsm_future(guided[0], guided[1],
                                       self.tokenizer,
                                       self.model_config.get_vocab_size())
            if fut.done():
                # Cached spec (or a build that failed fast): resolve
                # synchronously so bad specs still raise straight out of
                # add_request (the frontends' 400 path).
                fsm = fut.result()
            else:
                # Compilation runs on the build pool; the request parks
                # until the FSM is ready so in-flight requests' steps are
                # unaffected (reference compiles outlines FSMs
                # asynchronously, guided_decoding/__init__.py:11-40).
                fsm_future = fut

        # Beam search: one seq prefills; beams fork after the first
        # sampling step (joint pruning in _process_beam_group).
        # best_of sampling: sequences run independently from the first
        # token (the reference forks post-prefill; with prefix caching
        # enabled the prompt KV is shared anyway).
        num_initial = 1 if sampling_params.use_beam_search else \
            sampling_params.best_of
        seqs = []
        for sub_idx in range(num_initial):
            seq = Sequence(
                seq_id=self._next_seq_id(),
                prompt_token_ids=prompt_token_ids,
                block_size=self.config.cache_config.block_size,
                eos_token_id=self.eos_token_id,
                prompt=prompt,
            )
            if fsm is not None:
                seq.fsm = fsm
                seq.fsm_state = fsm.initial_state()
            if mm_spans is not None:
                if mm_target_encoder:
                    seq.encoder_mm_spans = mm_spans
                else:
                    seq.mm_spans = mm_spans
                seq.extra_hash = mm_hash
            if mrope_table is not None:
                seq.mrope_table = mrope_table
                seq.mrope_delta = mrope_delta
            if encoder_token_ids is not None:
                seq.encoder_token_ids = encoder_token_ids
                seq.encoder_audio = encoder_audio
            # Distinct PRNG stream per sibling when a seed is set.
            seq.seed_offset = sub_idx
            seqs.append(seq)
        group = SequenceGroup(
            request_id=request_id,
            seqs=seqs,
            sampling_params=sampling_params,
            arrival_time=arrival_time,
            lora_request=lora_request,
        )
        if sampling_params.use_beam_search:
            group.completed_beams = []
        self._groups[request_id] = group
        if len(seqs) == 1:
            to_schedule = [group]
        else:
            # Each sequence is scheduled as its own single-seq group sharing
            # the parent SequenceGroup bookkeeping.
            to_schedule = []
            for seq in seqs:
                sub = SequenceGroup(
                    request_id=request_id,
                    seqs=[seq],
                    sampling_params=sampling_params,
                    arrival_time=arrival_time,
                    lora_request=lora_request,
                )
                sub.metrics = group.metrics
                to_schedule.append(sub)
        if fsm_future is not None:
            self._fsm_parked.append((request_id, group, seqs,
                                     to_schedule, fsm_future))
        else:
            for g in to_schedule:
                self.scheduler.add_seq_group(g)

    def _admit_ready_fsms(self) -> List[str]:
        """Move parked guided requests whose FSM finished compiling into
        the scheduler; fail requests whose compilation errored. Returns
        request_ids that finished WITH an error (they need an output
        emitted this step). Non-blocking unless the engine is otherwise
        idle, in which case we wait briefly instead of busy-spinning."""
        if not self._fsm_parked:
            return []
        if not self.scheduler.has_unfinished_seqs():
            import concurrent.futures as _cf

            _cf.wait([e[4] for e in self._fsm_parked], timeout=0.01)
        errored: List[str] = []
        still_parked = []
        for entry in self._fsm_parked:
            request_id, group, seqs, to_schedule, fut = entry
            if request_id not in self._groups:
                continue  # aborted while parked
            if not fut.done():
                still_parked.append(entry)
                continue
            try:
                fsm = fut.result()
            except Exception as e:  # noqa: BLE001
                logger.error("guided FSM build failed for request %s: %s",
                             request_id, e)
                group.error = f"guided decoding compilation failed: {e}"
                for seq in seqs:
                    seq.status = SequenceStatus.FINISHED_ABORTED
                errored.append(request_id)
                continue
            for seq in seqs:
                seq.fsm = fsm
                seq.fsm_state = fsm.initial_state()
            for g in to_schedule:
                self.scheduler.add_seq_group(g)
        self._fsm_parked = still_parked
        return errored

    # ---- frontend-callable utilities (in-process or over the MP
    # socket protocol — engine/multiproc.py) -----------------------------

    def get_phase_timings(self) -> Dict[str, Any]:
        out = dict(self.phase_timings)
        pp = getattr(self.runner, "pp_stats", None)
        if pp and pp.get("pp_steps"):
            out.update(pp)
        return out

    def warmup(self) -> None:
        """Compile the serving program grid ahead of traffic (reference
        TPU warmup, tpu_model_runner.py:253-290: every (batch, seq)
        bucket compiles before serving). Synthetic request waves walk
        the sequence buckets at full prefill budget and decode through
        two fused windows each, so bucket-variant XLA compiles happen
        ONCE at startup (and persist in the on-disk cache) instead of
        surfacing as multi-second p99 stalls under live load."""
        import numpy as np

        t0 = time.monotonic()
        nss = max(1, self.scheduler_config.num_scheduler_steps)
        vocab = self.model_config.get_vocab_size()
        budget = self.scheduler_config.max_num_batched_tokens
        rng = np.random.default_rng(0)
        waves = [s for s in self.runner.seq_buckets
                 if s <= self.scheduler_config.max_num_seqs]
        sp = SamplingParams(temperature=0.0, max_tokens=2 * nss + 2,
                            ignore_eos=True, detokenize=False)

        def add(tag, n, plen):
            for i in range(n):
                self.add_request(
                    f"__warmup_{tag}_{i}",
                    prompt_token_ids=rng.integers(
                        0, vocab, size=(max(1, plen),)).tolist(),
                    sampling_params=sp)

        for S in waves:
            plen = int(min(budget // S,
                           self.model_config.max_model_len // 2,
                           self.model_config.max_model_len
                           - 2 * nss - 3))
            if plen < 1:
                continue  # context too small for this wave's decode run
            # Two staggered half-waves: the second half's PREFILL chunks
            # schedule alongside the first half's running DECODES, so
            # the MIXED prefill+decode program variants compile too (a
            # sequential wave only ever produces pure-prefill then
            # pure-decode iterations — live traffic is mostly mixed).
            add(f"{S}a", max(1, S // 2), plen)
            self.step()
            self.step()
            add(f"{S}b", S - max(1, S // 2), plen)
            while self.has_unfinished_requests():
                self.step()
        # Warmup traffic is compile-dominated; leaving it in the phase
        # stats would make /stats report it as steady-state throughput.
        for k, v in self.phase_timings.items():
            self.phase_timings[k] = 0 if isinstance(v, int) else 0.0
        logger.info("warmup: bucket grid compiled in %.1fs (%d waves)",
                    time.monotonic() - t0, len(waves))

    def load_soft_prompt(self, name: str, path: str) -> None:
        """Register a prompt-tuning adapter (reference
        /v1/soft_prompt/load, api_server.py:733)."""
        pam = self.runner.prompt_adapter_manager
        if pam is None:
            raise ValueError("prompt adapters are not enabled (start "
                             "with enable_prompt_adapter)")
        from aphrodite_tpu.prompt_adapter.request import (
            PromptAdapterRequest)

        fresh = name not in pam._name_to_slot
        req = PromptAdapterRequest(name, len(pam._name_to_slot) + 1, path)
        self.runner.params = pam.load(req, self.runner.params,
                                      self.runner.model.dtype)
        if fresh and self.runner._multihost:
            from aphrodite_tpu.parallel import multihost

            multihost.primary_broadcast_padapt(
                req.prompt_adapter_name, req.prompt_adapter_id, path)
            if not multihost.agree_adapter_load(True):
                pam.unload(req.prompt_adapter_name)
                raise ValueError(
                    f"soft prompt {name!r} failed to load on one or "
                    "more follower hosts; rolled back pod-wide")

    def unload_soft_prompt(self, name: str) -> bool:
        """Free a soft-prompt slot (reference /v1/soft_prompt/unload)."""
        pam = self.runner.prompt_adapter_manager
        if pam is None:
            return False
        removed = pam.unload(name)
        if removed and self.runner._multihost:
            from aphrodite_tpu.parallel import multihost

            multihost.primary_broadcast_padapt(name, -1, None)
        return removed

    def soft_prompt_slots(self) -> Dict[str, int]:
        pam = self.runner.prompt_adapter_manager
        return {} if pam is None else dict(pam._name_to_slot)

    def profile_start(self, trace_dir: str) -> None:
        import jax

        jax.profiler.start_trace(trace_dir)

    def profile_stop(self) -> None:
        import jax

        jax.profiler.stop_trace()

    # ---- LoRA management (reference /v1/lora endpoints) ---------------

    def add_lora(self, name: str, path: str) -> None:
        if self.runner.lora_manager is None:
            raise ValueError("engine started without enable_lora")
        # Load locally FIRST: if the adapter is bad (missing path, shape
        # mismatch) the error stays on the primary. Broadcasting before
        # validating would kill followers on an exception the primary
        # survives, wedging the next step broadcast.
        self.runner.lora_manager.add_adapter(name, path)
        if self.runner._multihost:
            from aphrodite_tpu.parallel import multihost

            multihost.primary_broadcast_lora("add", name, path)
            if not multihost.agree_adapter_load(True):
                # Some follower couldn't load it (e.g. non-shared
                # storage). Every host rolled back; surface the error
                # instead of serving with diverged adapter state.
                self.runner.lora_manager.remove_adapter(name)
                raise ValueError(
                    f"LoRA {name!r} failed to load on one or more "
                    "follower hosts; rolled back pod-wide (is the "
                    "adapter path readable from every host?)")

    def remove_lora(self, name: str) -> bool:
        if self.runner.lora_manager is None:
            return False
        removed = self.runner.lora_manager.remove_adapter(name)
        if removed and self.runner._multihost:
            from aphrodite_tpu.parallel import multihost

            multihost.primary_broadcast_lora("remove", name)
        return removed

    def list_loras(self) -> List[str]:
        if self.runner.lora_manager is None:
            return []
        return self.runner.lora_manager.list_adapters()

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        ids = [request_id] if isinstance(request_id, str) else \
            list(request_id)
        self.scheduler.abort_seq_group(ids)
        for rid in ids:
            self._groups.pop(rid, None)

    def has_unfinished_requests(self) -> bool:
        return (self.scheduler.has_unfinished_seqs()
                or bool(self._fsm_parked))

    def get_num_unfinished_requests(self) -> int:
        return sum(1 for g in self._groups.values() if not g.is_finished())

    # ------------------------------------------------------------------
    # The hot loop
    # ------------------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        import os

        trace = os.environ.get("APHRODITE_TPU_STEP_TIMING") == "1"
        t0 = time.monotonic()
        fsm_errored = self._admit_ready_fsms()
        scheduler_outputs = self.scheduler.schedule()
        t_sched = time.monotonic()
        now = t_sched
        if scheduler_outputs.is_empty():
            return self._make_outputs(scheduler_outputs.ignored,
                                      set(fsm_errored))

        for ss in scheduler_outputs.scheduled:
            ss.group.maybe_set_first_scheduled_time(now)

        result = self.runner.execute(
            scheduler_outputs,
            num_steps=self.scheduler_config.num_scheduler_steps)
        t_exec = time.monotonic()
        if trace:
            logger.info(
                "step timing: schedule=%.1fms execute=%.1fms "
                "(%d seqs, %d prefill tok)",
                (t_sched - t0) * 1e3, (t_exec - t_sched) * 1e3,
                len(scheduler_outputs.scheduled),
                scheduler_outputs.num_prefill_tokens)
        num_steps_done = result.sampled.shape[0]

        # Advance computed-token counters BEFORE appending new tokens (the
        # appended token's KV is computed by the next step — or, for
        # multi-step, was already computed in-graph).
        self.scheduler.mark_step_computed(scheduler_outputs)

        self._spec_iter = None
        if result.valid_lens is not None and num_steps_done > 1:
            import numpy as _np

            k = num_steps_done - 1
            vl = _np.asarray(result.valid_lens)
            # Actual per-row proposal counts (ngram rows with no lookup
            # match propose 0 and must not deflate the acceptance rate);
            # model drafts report k for every row.
            pl = (_np.asarray(result.proposed_lens)
                  if result.proposed_lens is not None
                  else _np.full(vl.shape, k, _np.int32))
            emitted_rows = _np.minimum(_np.clip(vl, 0, None), pl + 1)
            self._spec_iter = (
                int(pl.sum()),
                int(_np.clip(emitted_rows - 1, 0, None).sum()),
                int(emitted_rows.sum()),
            )
            pt0 = self.phase_timings
            pt0["spec_proposed_tokens"] += self._spec_iter[0]
            pt0["spec_accepted_tokens"] += self._spec_iter[1]
            pt0["spec_emitted_tokens"] += self._spec_iter[2]

        if result.prompt is not None:
            self._process_prompt_logprobs(scheduler_outputs, result)

        touched = set()
        now = time.monotonic()
        beam_groups: Dict[int, List] = {}
        self._tokens_appended_iter = 0
        for i, ss in enumerate(scheduler_outputs.scheduled):
            seq = ss.seq
            group = self._groups.get(ss.group.request_id)
            touched.add(ss.group.request_id)
            if not ss.do_sample:
                continue  # mid-prefill chunk: no token produced
            sp = ss.group.sampling_params
            if sp.use_beam_search:
                beam_groups.setdefault(id(ss.group), []).append((i, ss))
                continue
            # k-invariant; computed up-front so the finish-time decode
            # gate below is well-defined even when the k-loop body never
            # runs (num_steps_done == 0 or valid_lens[i] == 0).
            need_inc = sp.detokenize and self.tokenizer is not None \
                and (bool(sp.stop) or not self.lazy_detokenize)
            if (num_steps_done > 1 and seq.fsm is None
                    and sp.logprobs is None and not need_inc
                    and not sp.logits_processors):
                # Fast path for multi-step windows: one vectorized pass
                # replaces the per-token Python loop below (which was
                # ~half of decode wall time at 32-step x 128-seq windows,
                # tools/profile_step_ablation.py).
                self._append_window_bulk(seq, sp, result, i,
                                         num_steps_done)
            else:
                self._append_window_slow(seq, sp, result, i,
                                         num_steps_done, need_inc)
            if seq.is_finished():
                if (not need_inc and sp.detokenize
                        and self.tokenizer is not None):
                    self._decode_sequence_full(seq, sp)
                self.scheduler.free_seq(seq)
            ss.group.maybe_set_first_token_time(now)
            if group is not None:
                group.maybe_set_first_token_time(now)

        for rows in beam_groups.values():
            self._process_beam_group(rows, result)

        self.scheduler.free_finished_seq_groups()
        self._log_stats(scheduler_outputs, now)
        t_post = time.monotonic()
        pt = self.phase_timings
        pt["iterations"] += 1
        pt["schedule_s"] += t_sched - t0
        pt["execute_s"] += t_exec - t_sched
        pt["postprocess_s"] += t_post - t_exec
        pt["last_schedule_ms"] = (t_sched - t0) * 1e3
        pt["last_execute_ms"] = (t_exec - t_sched) * 1e3
        pt["last_postprocess_ms"] = (t_post - t_exec) * 1e3
        if (scheduler_outputs.num_prefill_tokens == 0
                and scheduler_outputs.scheduled):
            pt["decode_iterations"] += 1
            pt["decode_s"] += t_post - t0
            pt["decode_tokens"] += self._tokens_appended_iter
        if trace:
            logger.info("step timing: process=%.1fms (%d tokens appended)",
                        (t_post - t_exec) * 1e3,
                        self._tokens_appended_iter)
        ignored = scheduler_outputs.ignored
        return self._make_outputs(ignored, touched | set(fsm_errored))

    def _append_window_bulk(self, seq, sp, result, i: int,
                            num_steps_done: int) -> None:
        """Vectorized equivalent of `_append_window_slow` for rows that
        need no per-token host work (no FSM, no requested logprobs, no
        incremental detokenization): numpy computes the stop cutoff, then
        the window's tokens append in one call."""
        import numpy as np

        n = num_steps_done
        if result.valid_lens is not None:
            n = min(n, int(result.valid_lens[i]))
        if n <= 0 or seq.is_finished():
            return
        toks = np.asarray(result.sampled[:n, i])
        out_len = seq.get_output_len()
        counts = out_len + np.arange(1, n + 1)  # output len after token j
        eos = seq.eos_token_id
        check_eos = not sp.ignore_eos and eos is not None
        stop_ids = sp.all_stop_token_ids
        stop_mask = np.zeros((n,), bool)
        if check_eos:
            stop_mask |= toks == eos
        if stop_ids:
            stop_mask |= np.isin(toks, list(stop_ids))
        if sp.min_tokens:
            # Stop tokens are inert until min_tokens outputs exist
            # (StopChecker.maybe_stop_sequence's first gate).
            stop_mask &= counts >= sp.min_tokens
        cut, status, stop_reason = n, None, None
        hits = np.nonzero(stop_mask)[0]
        if hits.size:
            j = int(hits[0])
            cut = j + 1
            status = SequenceStatus.FINISHED_STOPPED
            tok = int(toks[j])
            if not (check_eos and tok == eos):
                stop_reason = tok
        # Length caps; at the same position a stop token wins (the
        # per-token path checks stop conditions before _check_length).
        len_cut = n + 1
        if sp.max_tokens is not None and out_len + n >= sp.max_tokens:
            len_cut = sp.max_tokens - out_len
        mml_cut = (self.stop_checker.max_model_len - seq.get_prompt_len()
                   - out_len)
        if mml_cut < len_cut:
            len_cut = mml_cut
        if len_cut <= n and (len_cut < cut
                             or (len_cut == cut and status is None)):
            cut = max(len_cut, 0)
            status = SequenceStatus.FINISHED_LENGTH_CAPPED
            stop_reason = None
        if cut > 0:
            lp_sum = float(np.asarray(result.sampled_logprob[:cut, i],
                                      np.float64).sum())
            seq.extend_token_ids(toks[:cut].tolist(), lp_sum)
            seq.num_computed_tokens += cut - 1
            self._tokens_appended_iter += cut
        if status is not None:
            seq.status = status
            seq.stop_reason = stop_reason

    def _append_window_slow(self, seq, sp, result, i: int,
                            num_steps_done: int, need_inc: bool) -> None:
        """Per-token append path: rows with FSM advancement, requested
        logprobs, or incremental detokenization (stop strings / streaming)
        need host work per token."""
        for k in range(num_steps_done):
            if seq.is_finished():
                break  # later multi-step tokens are discarded
            if (result.valid_lens is not None
                    and k >= result.valid_lens[i]):
                break  # speculative proposals beyond acceptance
            if k > 0:
                # KV of the token appended at step k-1 was computed
                # on-device during the fused multi-step program.
                seq.num_computed_tokens += 1
            token_id = int(result.sampled[k, i])
            logprob_val = float(result.sampled_logprob[k, i])
            seq.append_token_id(token_id, logprob_val)
            self._tokens_appended_iter += 1
            if seq.fsm is not None:
                seq.fsm_state = seq.fsm.next_state(seq.fsm_state,
                                                   token_id)
                if seq.fsm_state < 0:
                    # Automaton left its language (should only happen
                    # via forced EOS on dead ends): stop here.
                    seq.status = SequenceStatus.FINISHED_STOPPED
            if sp.logprobs is not None:
                entry = {
                    token_id: Logprob(
                        logprob=logprob_val,
                        rank=int(result.sampled_rank[k, i]))
                }
                for j in range(min(sp.logprobs,
                                   result.topk_ids.shape[2])):
                    tid = int(result.topk_ids[k, i, j])
                    entry.setdefault(
                        tid,
                        Logprob(
                            logprob=float(result.topk_logprobs[k, i,
                                                               j]),
                            rank=j + 1))
                seq.output_logprobs.append(entry)

            new_text = ""
            # Lazy mode (offline LLM): per-step incremental
            # detokenization is pure output decoration unless stop
            # STRINGS need the text — skip it on the hot loop and
            # decode once at finish (streaming consumers keep the
            # incremental path).
            if need_inc:
                new_text = self._decode_sequence(seq, sp)
            self.stop_checker.maybe_stop_sequence(seq, new_text, sp)

    def _log_stats(self, scheduler_outputs, now: float) -> None:
        bm = self.scheduler.block_manager
        kv_usage = 1.0 - bm.get_num_free_blocks() / max(bm.num_blocks, 1)
        stats = Stats(
            now=now,
            num_running=len(self.scheduler.running),
            num_waiting=len(self.scheduler.waiting),
            kv_usage=kv_usage,
            prefix_cache_hit_rate=bm.get_prefix_cache_hit_rate(),
            num_preemptions_iter=len(scheduler_outputs.preempted),
            num_prompt_tokens_iter=scheduler_outputs.num_prefill_tokens,
            # Actual appended count (multi-step/spec produce several
            # tokens per scheduled decode row).
            num_generation_tokens_iter=getattr(
                self, "_tokens_appended_iter",
                scheduler_outputs.num_decode_tokens),
            # Phase times lag one iteration: postprocess of the current
            # iteration isn't finished when stats are cut.
            schedule_ms_iter=self.phase_timings["last_schedule_ms"],
            execute_ms_iter=self.phase_timings["last_execute_ms"],
            postprocess_ms_iter=self.phase_timings["last_postprocess_ms"],
        )
        if getattr(self, "_spec_iter", None) is not None:
            (stats.spec_proposed_iter, stats.spec_accepted_iter,
             stats.spec_emitted_iter) = self._spec_iter
        for ss in scheduler_outputs.scheduled:
            m = ss.group.metrics
            if not ss.do_sample:
                continue
            if ss.seq.get_output_len() == 1 and m.first_scheduled_time:
                stats.time_to_first_tokens_iter.append(
                    now - m.arrival_time)
            elif ss.seq.get_output_len() > 1:
                if m.last_token_time:
                    stats.time_per_output_tokens_iter.append(
                        now - m.last_token_time)
            m.last_token_time = now
            if ss.seq.is_finished():
                stats.time_e2e_requests.append(now - m.arrival_time)
                reason = SequenceStatus.get_finished_reason(ss.seq.status)
                if reason:
                    stats.finished_reason_iter.append(reason)
        self.stat_logger.log(stats)

    def _process_prompt_logprobs(self, scheduler_outputs, result) -> None:
        """Attach per-prompt-token logprobs from the full-stream pass
        (reference get_logprobs prompt path; first token is None)."""
        tgt_lp, ranks, pk_ids, pk_lp = result.prompt
        off = 0
        for ss in scheduler_outputs.scheduled:
            sp = ss.group.sampling_params
            seq = ss.seq
            num_plp = sp.prompt_logprobs
            chunk_is_prefill = ss.first_token_idx < seq.get_prompt_len()
            if num_plp is None or not chunk_is_prefill:
                off += ss.num_tokens
                continue
            if seq.prompt_logprobs is None:
                seq.prompt_logprobs = [None]
            ids = seq.get_token_ids()
            for j in range(ss.num_tokens):
                tpos = ss.first_token_idx + j + 1
                if tpos >= seq.get_prompt_len():
                    break
                row = off + j
                entry = {
                    int(ids[tpos]): Logprob(logprob=float(tgt_lp[row]),
                                            rank=int(ranks[row]))
                }
                for k in range(min(num_plp, pk_ids.shape[1])):
                    entry.setdefault(
                        int(pk_ids[row, k]),
                        Logprob(logprob=float(pk_lp[row, k]), rank=k + 1))
                # Chunks may be re-scheduled after preemption; keep the
                # list aligned with positions.
                while len(seq.prompt_logprobs) <= tpos:
                    seq.prompt_logprobs.append(None)
                seq.prompt_logprobs[tpos] = entry
            off += ss.num_tokens

    def _process_beam_group(self, rows: List, result) -> None:
        """Joint beam expansion/pruning for one request (reference beam
        path, sampler.py:1124-1273 + output_processor forking).

        Each live beam contributed a row with 2*width candidate logprobs;
        select the global top `width` continuations, fork sequences where
        one beam spawns several, retire EOS/length-capped hypotheses.
        """
        group = rows[0][1].group
        sp = group.sampling_params
        width = sp.best_of
        completed = group.completed_beams

        # Candidate continuations: (new_cum_logprob, row_i, seq, token).
        candidates = []
        K = result.topk_ids.shape[2]
        for i, ss in rows:
            seq = ss.seq
            for j in range(K):
                tid = int(result.topk_ids[0, i, j])
                lp = float(result.topk_logprobs[0, i, j])
                candidates.append((seq.cumulative_logprob + lp, seq, tid,
                                   lp))
        candidates.sort(key=lambda c: c[0], reverse=True)

        live_seqs = [ss.seq for _, ss in rows]
        selections: List = []  # (seq, token, lp)
        for cum, seq, tid, lp in candidates:
            if len(selections) >= width:
                break
            is_eos = (seq.eos_token_id is not None
                      and tid == seq.eos_token_id
                      and not sp.ignore_eos)
            if is_eos:
                if len(completed) < 2 * width:
                    hyp = seq.fork(self._next_seq_id())
                    hyp.append_token_id(tid, lp)
                    hyp.status = SequenceStatus.FINISHED_STOPPED
                    if sp.detokenize and self.tokenizer is not None:
                        hyp.output_text = self.tokenizer.decode(
                            hyp.output_token_ids,
                            skip_special_tokens=sp.skip_special_tokens)
                    completed.append(hyp)
                continue
            selections.append((seq, tid, lp))

        # Apply: fork parents selected multiple times BEFORE appending.
        by_parent: Dict[int, List] = {}
        for seq, tid, lp in selections:
            by_parent.setdefault(seq.seq_id, []).append((seq, tid, lp))
        new_live: List[Sequence] = []
        for parent_id, sels in by_parent.items():
            parent = sels[0][0]
            forks = [parent]
            for _ in range(len(sels) - 1):
                child = parent.fork(self._next_seq_id())
                self.scheduler.fork_seq(parent, child)
                group.add(child)
                forks.append(child)
            for (target, (_, tid, lp)) in zip(forks, sels):
                target.append_token_id(tid, lp)
                target.num_computed_tokens = target.get_len() - 1
                new_live.append(target)
        # Prune unselected live beams.
        selected_ids = {s.seq_id for s in new_live}
        for seq in live_seqs:
            if seq.seq_id not in selected_ids:
                seq.status = SequenceStatus.FINISHED_ABORTED
                self.scheduler.free_seq(seq)
                group.remove(seq.seq_id)
        # Length cap: live beams reaching max_tokens become hypotheses.
        still_live = []
        for seq in new_live:
            capped = ((sp.max_tokens is not None
                       and seq.get_output_len() >= sp.max_tokens)
                      or seq.get_len() >= self.model_config.max_model_len)
            if capped:
                seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
                if sp.detokenize and self.tokenizer is not None:
                    seq.output_text = self.tokenizer.decode(
                        seq.output_token_ids,
                        skip_special_tokens=sp.skip_special_tokens)
                completed.append(seq)
                self.scheduler.free_seq(seq)
                group.remove(seq.seq_id)
            else:
                still_live.append(seq)

        def score(s: Sequence) -> float:
            return s.cumulative_logprob / max(
                s.get_output_len(), 1)**sp.length_penalty

        done = False
        if not still_live:
            done = True
        elif len(completed) >= width:
            if sp.early_stopping is True:
                done = True
            else:
                best_live = max(score(s) for s in still_live)
                top_completed = sorted((score(s) for s in completed),
                                       reverse=True)[:width]
                done = best_live <= top_completed[-1]
        if done:
            for seq in still_live:
                # Remaining live beams also count as hypotheses.
                seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
                if sp.detokenize and self.tokenizer is not None:
                    seq.output_text = self.tokenizer.decode(
                        seq.output_token_ids,
                        skip_special_tokens=sp.skip_special_tokens)
                completed.append(seq)
                self.scheduler.free_seq(seq)
                group.remove(seq.seq_id)
            best = sorted(completed, key=score, reverse=True)[:sp.n]
            # Replace the group's sequences with the final hypotheses so
            # RequestOutput.from_seq_group reports them.
            group.seqs.clear()
            group._seq_dict.clear()
            for seq in best:
                group.add(seq)

    def encode(self, prompts_token_ids: List[List[int]],
               pooling: str = "last") -> List[Any]:
        """Embedding path (reference embedding_model_runner +
        LLM.encode): prefill-only forwards, pooled + L2-normalized.
        Prompts are packed greedily under the token budget."""
        import numpy as np

        from aphrodite_tpu.common.sampling_params import SamplingParams
        from aphrodite_tpu.common.sequence import (ScheduledSequence,
                                                   SchedulerOutputs)

        budget = self.scheduler_config.max_num_batched_tokens
        results: List[np.ndarray] = [None] * len(prompts_token_ids)
        bm = self.scheduler.block_manager
        i = 0
        while i < len(prompts_token_ids):
            group = []
            used = 0
            while i < len(prompts_token_ids):
                ids = prompts_token_ids[i]
                if len(ids) > budget:
                    raise ValueError(
                        f"prompt of {len(ids)} tokens exceeds the "
                        f"max_num_batched_tokens budget ({budget}) for "
                        "embedding")
                if used + len(ids) > budget or len(
                        group) >= self.scheduler_config.max_num_seqs:
                    break
                group.append((i, ids))
                used += len(ids)
                i += 1
            seqs = []
            scheduled = []
            sp = SamplingParams(max_tokens=1)
            for idx, ids in group:
                seq = Sequence(self._next_seq_id(), ids,
                               self.config.cache_config.block_size)
                bm.allocate(seq)
                seqs.append((idx, seq))
                scheduled.append(
                    ScheduledSequence(
                        seq=seq,
                        group=SequenceGroup(f"emb-{seq.seq_id}", [seq], sp),
                        num_tokens=len(ids),
                        first_token_idx=0,
                        block_ids=bm.get_block_table(seq),
                        do_sample=False,
                    ))
            outs = SchedulerOutputs(scheduled=scheduled,
                                    num_prefill_tokens=used,
                                    num_decode_tokens=0)
            pooled = self.runner.execute_pooling(outs, pooling=pooling)
            for row, (idx, seq) in enumerate(seqs):
                results[idx] = pooled[row]
                bm.free(seq)
        return results

    def _decode_sequence_full(self, seq: Sequence,
                              sp: SamplingParams) -> None:
        """One-shot decode of the whole output at finish (lazy mode):
        a short prompt-tail context pins the first token's leading-space
        handling so the text matches the incremental path."""
        tok = self.tokenizer
        ctx = list(seq.prompt_token_ids[-8:]) if seq.prompt_token_ids \
            else []
        kw = dict(
            skip_special_tokens=sp.skip_special_tokens,
            spaces_between_special_tokens=(
                sp.spaces_between_special_tokens))
        prefix = tok.decode(ctx, **kw) if ctx else ""
        text = tok.decode(ctx + list(seq.output_token_ids),
                          **kw)[len(prefix):]
        # The incremental path defers any text ENDING in U+FFFD
        # (incomplete trailing UTF-8), so its final text never ends
        # with one; match that.
        seq.output_text = text.rstrip("\ufffd") \
            if text.endswith("\ufffd") else text

    def _decode_sequence(self, seq: Sequence,
                         sampling_params: SamplingParams) -> str:
        new_tokens, new_text, prefix_offset, read_offset = \
            detokenize_incrementally(
                self.tokenizer,
                all_token_ids=seq.get_token_ids(),
                prev_tokens=seq.tokens,
                prefix_offset=seq.prefix_offset,
                read_offset=seq.read_offset,
                skip_special_tokens=sampling_params.skip_special_tokens,
                spaces_between_special_tokens=(
                    sampling_params.spaces_between_special_tokens),
            )
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_text
        return new_text

    def _make_outputs(self, ignored_groups, touched_ids
                      ) -> List[RequestOutput]:
        outputs: List[RequestOutput] = []
        now = time.monotonic()
        for g in ignored_groups:
            touched_ids = set(touched_ids) | {g.request_id}
        for rid in sorted(touched_ids):
            group = self._groups.get(rid)
            if group is None:
                continue
            fin = group.is_finished()
            if fin:
                group.set_finished_time(now)
            # Offline (lazy) mode: nothing reads per-step outputs of
            # unfinished requests — skip building them.
            if fin or not self.lazy_detokenize:
                outputs.append(RequestOutput.from_seq_group(group))
            if fin:
                self._groups.pop(rid, None)
        return outputs
