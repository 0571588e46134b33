"""Multi-host (multi-process SPMD) serving support.

TPU-native answer to the reference's multi-host stack — the Ray TPU
executor (`executor/ray_tpu_executor.py:29`), the TPU communicator's
`pjrt.initialize_multiprocess` bootstrap
(`distributed/device_communicators/tpu_communicator.py:28-50`) and the
driver→worker `broadcast_tensor_dict` control plane
(`worker/worker_base.py:240-268`).

Design (multi-controller SPMD, the JAX model):

- Every host runs the same binary. `jax.distributed.initialize()` joins
  the processes into one runtime; `jax.devices()` then spans all hosts
  and one `Mesh` covers the pod slice (model/expert axes ride ICI within
  a host's chips, DCN between hosts via the hybrid mesh in
  ``parallel/mesh.py``).
- Host 0 (the *primary*) runs the full engine: HTTP frontend, scheduler,
  detokenizers. Hosts 1..N-1 run a *follower loop*
  (:func:`run_follower`): they build the identical ModelRunner, then
  replay the primary's per-step metadata. Because batch assembly is a
  deterministic pure function of that metadata, every process issues the
  same XLA programs in the same order with the same dense inputs — the
  SPMD lockstep the reference approximates with Ray +
  `broadcast_tensor_dict` (`APHRODITE_USE_RAY_SPMD_WORKER`).
- The control plane is `multihost_utils.broadcast_one_to_all`: pickled
  step metadata in size-bucketed uint8 buffers (buckets keep the number
  of distinct broadcast shapes — hence compiled programs — small).

Environment contract (mirrors `jax.distributed.initialize` arguments):

- ``APHRODITE_NUM_HOSTS``: total process count (int, default 1).
- ``APHRODITE_HOST_ID``: this process's id (0 = primary).
- ``APHRODITE_COORDINATOR``: ``host:port`` of process 0's coordinator.
- On Cloud TPU pods, ``APHRODITE_MULTIHOST=auto`` instead lets
  ``jax.distributed.initialize()`` autodetect all three from the TPU
  metadata server.

What is and isn't verified without multi-host hardware: the full
lockstep path (init → mesh → cache sizing agreement → step replay →
shutdown) is exercised by ``tests/test_multihost.py`` on TWO CPU
processes with 4 virtual devices each (tp=8 across a process boundary,
collectives over the gloo cross-process backend) and compared
token-exactly against a single-process run. Real DCN latency behavior
and >2-host scaling are NOT measurable in this environment.

Feature gates: requests using guided decoding, prompt adapters,
multimodal inputs or host logits processors are rejected on multi-host
deployments (their host-side state lives only on the primary);
encoder-decoder models are likewise primary-only for now. LoRA IS
served multi-host: adapters are static weights on shared storage, so
followers lazy-load them from the broadcast (name, path) and slot/LRU
state evolves in lockstep; admin add/remove ops broadcast as OP_LORA.
The core text serving paths — dense/MoE prefill+decode, multi-step
decode, speculative decode, beam search — replay deterministically.
"""

import os
import pickle
from typing import Any, List, Optional

import numpy as np

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)

_initialized = False

# Broadcast buffer buckets: each distinct size compiles one broadcast
# program. Step metadata is tiny (KBs); big buckets exist for safety.
_BUCKETS = [1 << 12, 1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 24, 1 << 28]

# Follower-loop opcodes.
OP_EXECUTE = 0
OP_POOLING = 1
OP_STOP = 2
OP_COPIES = 3
OP_LORA = 4  # ("add", name, path) / ("remove", name, None)
OP_MM_ENCODE = 5  # raw multimodal item: followers join the tower SPMD
OP_PADAPT = 6  # (name, adapter_id, path): soft-prompt rows on all hosts


def maybe_initialize() -> None:
    """Join the multi-process runtime if the env contract asks for it.

    Idempotent; a no-op for single-host deployments (the default).
    Must run before first device use (reference tpu_communicator.py:49
    calls pjrt.initialize_multiprocess at the same point).
    """
    global _initialized
    if _initialized:
        return
    mode = os.environ.get("APHRODITE_MULTIHOST", "")
    num_hosts = int(os.environ.get("APHRODITE_NUM_HOSTS", "1"))
    if mode != "auto" and num_hosts <= 1:
        return
    import jax

    if mode == "auto":
        # Cloud TPU pod: coordinator/count/id from the metadata server.
        jax.distributed.initialize()
    else:
        coord = os.environ.get("APHRODITE_COORDINATOR")
        host_id = int(os.environ.get("APHRODITE_HOST_ID", "0"))
        if coord is None:
            raise ValueError(
                "APHRODITE_NUM_HOSTS > 1 requires APHRODITE_COORDINATOR "
                "(host:port of host 0) and APHRODITE_HOST_ID")
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num_hosts,
                                   process_id=host_id)
    _initialized = True
    logger.info("multi-host runtime up: process %d/%d, %d devices visible",
                jax.process_index(), jax.process_count(),
                len(jax.devices()))


def is_active() -> bool:
    import jax

    return _initialized or jax.process_count() > 1


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def _bucket_for(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"step metadata of {n} bytes exceeds the largest "
                     f"broadcast bucket ({_BUCKETS[-1]})")


def broadcast_obj(obj: Any = None) -> Any:
    """One-to-all broadcast of a picklable object (primary sends)."""
    from jax.experimental import multihost_utils

    if is_primary():
        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        n = len(payload)
        hdr = np.array([n, _bucket_for(n)], np.int64)
    else:
        hdr = np.zeros(2, np.int64)
    hdr = np.asarray(multihost_utils.broadcast_one_to_all(hdr))
    n, bucket = int(hdr[0]), int(hdr[1])
    buf = np.zeros(bucket, np.uint8)
    if is_primary():
        buf[:n] = np.frombuffer(payload, np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf[:n].tobytes())


def agree_adapter_load(local_ok: bool) -> bool:
    """All-gather one adapter-load success flag across the pod; returns
    True iff EVERY host loaded. Collective: every process must call it
    exactly once per broadcast adapter-ADD op (primary included) so the
    pod stays in lockstep. This is the follower→primary back-channel
    that makes adapter loads pod-atomic — a host-local failure (e.g.
    non-shared storage) rolls back everywhere instead of leaving one
    host's adapter state silently diverged (advisor r4 finding)."""
    if not is_active():
        return local_ok
    from jax.experimental import multihost_utils

    flags = np.asarray(multihost_utils.process_allgather(
        np.array([1 if local_ok else 0], np.int64)))
    return bool(flags.min() == 1)


def agree_num_pages(local_num_pages: int) -> int:
    """Min-reduce the per-host KV page budget so all processes build
    identically shaped caches (reference DistributedGPUExecutor takes the
    min across workers the same way)."""
    if not is_active():
        return local_num_pages
    from jax.experimental import multihost_utils

    all_pages = np.asarray(multihost_utils.process_allgather(
        np.array([local_num_pages], np.int64)))
    agreed = int(all_pages.min())
    if agreed != local_num_pages:
        logger.info("KV pages: local budget %d, pod-agreed min %d",
                    local_num_pages, agreed)
    return agreed


# ---------------------------------------------------------------------------
# Step-metadata mirror: a picklable, engine-free snapshot of
# SchedulerOutputs that thaws back into real Sequence/SequenceGroup
# objects on the follower (the runner only reads them).
# ---------------------------------------------------------------------------


# Marker standing in for host logits-processor callables in the frozen
# step mirror: truthy (so followers pick the same split program) and
# picklable (the callables themselves are not). Followers never invoke
# it — they receive the primary's edited logits over the broadcast
# instead (ModelRunner._apply_logits_processors).
MIRRORED_PROCS = ["__mirrored_logits_processors__"]


class _MirrorFSM:
    """Follower-side stand-in for a primary-resident guided-decoding
    FSM: exposes the ONE step's packed allow-mask, which rode the step
    mirror. State advancement happens on the primary only (the engine
    owns FSM state); followers just need the identical mask input and
    SamplingFlags, so batch assembly stays a pure function of the
    broadcast metadata. (Reference runs guided logits processors on the
    driver under Ray multi-node the same way.)"""

    def __init__(self, mask) -> None:
        self._mask = mask

    def allowed_mask(self, state):
        return self._mask


def freeze_outputs(outputs) -> dict:
    rows = []
    for ss in outputs.scheduled:
        seq = ss.seq
        sp = ss.group.sampling_params
        if sp.logits_processors:
            # Callables can't pickle; swap in a truthy marker so the
            # follower runs the identical split (logits) program and
            # receives the edited logits from host 0 mid-execute.
            sp = sp.clone()
            sp.logits_processors = MIRRORED_PROCS
        if seq.encoder_token_ids is not None:
            raise ValueError(
                "encoder-decoder requests are primary-only; reject "
                "them at admission on multi-host deployments")
        # Guided decoding: the FSM object lives on the primary; ship
        # this step's packed allow-mask (u32[ceil(V/32)], ~4KB) so the
        # follower builds the identical guided_mask input.
        fsm_mask = None
        has_fsm = seq.fsm is not None
        if has_fsm and ss.do_sample:
            fsm_mask = np.asarray(
                seq.fsm.allowed_mask(seq.fsm_state), np.uint32)
        # Multimodal splice spans ride the mirror only while the
        # sequence still has uncomputed PROMPT positions (the runner
        # builds embeds_override from them during prefill only), so
        # decode steps never re-broadcast image features.
        mm = None
        mrt = None
        if ss.first_token_idx < len(seq.prompt_token_ids):
            if seq.mm_spans:
                mm = [(start, np.asarray(feats, np.float32))
                      for start, feats in seq.mm_spans]
            # The [3, seq_len] mrope table is only read during prefill
            # batch build; decode uses the scalar mrope_delta — don't
            # re-broadcast the table on every decode step.
            if seq.mrope_table is not None:
                mrt = np.asarray(seq.mrope_table)
        lr = ss.group.lora_request
        rows.append(dict(
            request_id=ss.group.request_id,
            seq_id=seq.seq_id,
            prompt_token_ids=seq.prompt_token_ids,
            output_token_ids=seq.output_token_ids,
            block_size=seq.block_size,
            eos_token_id=seq.eos_token_id,
            num_computed_tokens=seq.num_computed_tokens,
            seed_offset=seq.seed_offset,
            sampling_params=sp,
            num_tokens=ss.num_tokens,
            first_token_idx=ss.first_token_idx,
            block_ids=ss.block_ids,
            do_sample=ss.do_sample,
            # LoRA adapters are static weights loadable from the same
            # path on every host (followers already read model weights
            # from shared storage); the follower's manager lazy-loads on
            # first use and evolves slot/LRU state identically because
            # it sees the identical scheduled order.
            lora=(None if lr is None else
                  (lr.lora_name, lr.lora_int_id, lr.lora_path)),
            mm_spans=mm,
            mrope_table=mrt,
            mrope_delta=seq.mrope_delta,
            has_fsm=has_fsm,
            fsm_mask=fsm_mask,
        ))
    return dict(
        rows=rows,
        num_prefill_tokens=outputs.num_prefill_tokens,
        num_decode_tokens=outputs.num_decode_tokens,
        blocks_to_copy=outputs.blocks_to_copy,
    )


def thaw_outputs(payload: dict):
    from aphrodite_tpu.common.sequence import (ScheduledSequence,
                                               SchedulerOutputs, Sequence,
                                               SequenceGroup,
                                               SequenceStatus)

    scheduled: List[ScheduledSequence] = []
    for r in payload["rows"]:
        seq = Sequence(
            seq_id=r["seq_id"],
            prompt_token_ids=r["prompt_token_ids"],
            block_size=r["block_size"],
            eos_token_id=r["eos_token_id"],
        )
        seq.output_token_ids = list(r["output_token_ids"])
        seq.num_computed_tokens = r["num_computed_tokens"]
        seq.seed_offset = r["seed_offset"]
        seq.status = SequenceStatus.RUNNING
        if r.get("mm_spans") is not None:
            seq.mm_spans = [(start, feats)
                            for start, feats in r["mm_spans"]]
        seq.mrope_table = r.get("mrope_table")
        seq.mrope_delta = r.get("mrope_delta", 0)
        if r.get("has_fsm"):
            seq.fsm = _MirrorFSM(r.get("fsm_mask"))
            seq.fsm_state = 0
        group = SequenceGroup(
            request_id=r["request_id"],
            seqs=[seq],
            sampling_params=r["sampling_params"],
        )
        if r.get("lora") is not None:
            from aphrodite_tpu.lora import LoRARequest

            name, int_id, path = r["lora"]
            group.lora_request = LoRARequest(name, int_id, path)
        scheduled.append(ScheduledSequence(
            seq=seq,
            group=group,
            num_tokens=r["num_tokens"],
            first_token_idx=r["first_token_idx"],
            block_ids=r["block_ids"],
            do_sample=r["do_sample"],
        ))
    return SchedulerOutputs(
        scheduled=scheduled,
        num_prefill_tokens=payload["num_prefill_tokens"],
        num_decode_tokens=payload["num_decode_tokens"],
        blocks_to_copy=payload["blocks_to_copy"],
    )


# ---------------------------------------------------------------------------
# Primary-side hooks + follower loop
# ---------------------------------------------------------------------------


def primary_broadcast_execute(outputs, num_steps: int) -> None:
    broadcast_obj((OP_EXECUTE, freeze_outputs(outputs), num_steps))


def primary_broadcast_pooling(outputs, pooling: str) -> None:
    broadcast_obj((OP_POOLING, freeze_outputs(outputs), pooling))


def primary_broadcast_stop() -> None:
    broadcast_obj((OP_STOP, None, None))


def primary_broadcast_mm_encode(item) -> None:
    """Ship one raw multimodal item so every follower joins the vision-
    tower computation (the tower's params are global-mesh arrays: a
    primary-only jit over them would deadlock the pod). The resulting
    features are discarded on followers — the per-step metadata mirror
    carries the primary's spans (the LoRA broadcast pattern applied to
    computed-once-then-static multimodal state; reference serves
    multimodal across Ray workers the same way)."""
    broadcast_obj((OP_MM_ENCODE, item, None))


def primary_broadcast_padapt(name: str, adapter_id: int,
                             path: str) -> None:
    """Mirror a soft-prompt (prompt-adapter) load: the adapter's rows
    extend the embedding table on every host (the table's reserved rows
    are static shapes; identical load order keeps slots in lockstep)."""
    broadcast_obj((OP_PADAPT, (name, adapter_id, path), None))


def primary_broadcast_lora(action: str, name: str,
                           path: Optional[str] = None) -> None:
    """Mirror an admin add/remove-LoRA onto every follower so slot and
    LRU state stays in lockstep (the reference serves LoRA across Ray
    workers by loading on each; adapters are static weights on shared
    storage)."""
    broadcast_obj((OP_LORA, (action, name, path), None))


def run_follower(engine_config) -> None:
    """Hosts 1..N-1: build the identical runner, replay the primary's
    steps until OP_STOP (reference follower loop:
    LocalOrDistributedWorkerBase.execute_model, worker_base.py:269-289,
    where an empty broadcast dict stops the loop)."""
    from aphrodite_tpu.worker.model_runner import ModelRunner

    runner = ModelRunner(engine_config)
    runner.load_model()
    runner.initialize_cache()
    logger.info("follower %d ready; entering replay loop",
                _process_index())
    while True:
        op, payload, extra = broadcast_obj()
        if op == OP_STOP:
            logger.info("follower %d: stop received", _process_index())
            return
        if op == OP_MM_ENCODE:
            # Join the primary's vision-tower SPMD run; the features are
            # discarded here (the step mirror carries the spans).
            try:
                runner.encode_image_item(payload)
            except Exception:
                logger.exception(
                    "follower %d: multimodal encode failed; the pod may "
                    "now be desynced on the tower collective",
                    _process_index())
            continue
        if op == OP_PADAPT:
            name, adapter_id, path = payload
            if path is None:
                # Admin unload: free the slot on every host.
                pam = runner.prompt_adapter_manager
                if pam is not None:
                    pam.unload(name)
                continue
            ok = True
            try:
                from aphrodite_tpu.prompt_adapter.request import (
                    PromptAdapterRequest)

                pam = runner.prompt_adapter_manager
                if pam is None:
                    raise ValueError(
                        "follower built without enable_prompt_adapter")
                req = PromptAdapterRequest(name, adapter_id, path)
                runner.params = pam.load(req, runner.params,
                                         runner.model.dtype)
            except Exception:
                ok = False
                logger.exception(
                    "follower %d: soft-prompt load '%s' failed",
                    _process_index(), name)
            # Pod-atomic load: if ANY host failed, every host unloads
            # and the primary errors the admin call — adapter state
            # never diverges silently.
            if not agree_adapter_load(ok):
                try:
                    if ok and runner.prompt_adapter_manager is not None:
                        runner.prompt_adapter_manager.unload(name)
                except Exception:
                    logger.exception(
                        "follower %d: soft-prompt rollback of '%s' "
                        "failed", _process_index(), name)
                logger.error(
                    "follower %d: soft-prompt '%s' rolled back pod-wide "
                    "(load failed on some host)", _process_index(), name)
            continue
        if op == OP_LORA:
            action, name, path = payload
            # Never let an adapter error kill the follower loop: the
            # primary validated the adapter before broadcasting, but the
            # path may still be unreadable from THIS host (non-shared
            # storage). A dead follower wedges every later step
            # broadcast; instead the pod agrees on the outcome below.
            ok = True
            try:
                if runner.lora_manager is None:
                    raise ValueError("follower built without enable_lora")
                if action == "add":
                    runner.lora_manager.add_adapter(name, path)
                else:
                    runner.lora_manager.remove_adapter(name)
            except Exception:
                ok = False
                logger.exception(
                    "follower %d: LoRA %s '%s' failed", _process_index(),
                    action, name)
            if action == "add" and not agree_adapter_load(ok):
                # Pod-atomic: any host's failure rolls the adapter back
                # on EVERY host (the primary errors the admin call), so
                # slot/LRU state never diverges silently.
                try:
                    if ok and runner.lora_manager is not None:
                        runner.lora_manager.remove_adapter(name)
                except Exception:
                    logger.exception(
                        "follower %d: LoRA rollback of '%s' failed",
                        _process_index(), name)
                logger.error(
                    "follower %d: LoRA '%s' rolled back pod-wide (load "
                    "failed on some host)", _process_index(), name)
            continue
        outputs = thaw_outputs(payload)
        if op == OP_EXECUTE:
            runner.execute(outputs, num_steps=extra)
        elif op == OP_POOLING:
            runner.execute_pooling(outputs, pooling=extra)
        else:
            raise ValueError(f"unknown follower opcode {op}")


def _process_index() -> int:
    import jax

    return jax.process_index()
