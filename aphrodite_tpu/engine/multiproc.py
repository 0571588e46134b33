"""Frontend/engine process isolation.

The reference runs the engine in a separate process behind a ZMQ
protocol (aphrodite/engine/multiprocessing/engine.py:35: MQAphrodite
Engine; endpoints keep serving when the engine dies, server/launch.py:17)
so an engine crash — here, a poisoned XLA runtime — cannot take the HTTP
frontend down with it.

TPU-native equivalent: the engine (and with it the whole JAX/TPU
runtime) lives in a spawned child process; the frontend talks to it over
a unix-domain socket with 4-byte-length-prefixed pickle frames (no zmq
in the image; pickle is within a trust boundary we own end-to-end: both
ends are our own processes on one host).

Protocol (parent -> child):
    ("add_request", kwargs)           fire-and-forget; failures come
                                      back as ("request_failed", rid, e)
    ("abort", request_id)
    ("utility", call_id, name, args, kwargs)
    ("shutdown",)
Child -> parent:
    ("ready",)                        engine built, loop running
    ("outputs", [RequestOutput, ...]) one engine.step()'s outputs
    ("request_failed", rid, exc)      admission error for one request
    ("reply", call_id, ok, value)     utility result (value=tb str if !ok)
    ("fatal", tb_str)                 engine loop died

The client (`MPAsyncEngine`) mirrors AsyncAphrodite's surface —
add_request/generate/abort/check_health/errored plus an `.engine` proxy
providing the frontend-local tokenizer/model_config and awaitable
passthroughs for engine utility methods — so the OpenAI server runs
unmodified against either. If the child dies, open streams fail with
AsyncEngineDeadError, new requests are rejected, /health turns 503, and
the HTTP server keeps serving.
"""

import asyncio
import os
import pickle
import socket
import struct
import sys
import threading
import time
import traceback
from typing import Any, Dict, List, Optional

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.async_engine import (AsyncEngineDeadError,
                                               AsyncStream)

logger = init_logger(__name__)

_LEN = struct.Struct(">I")


def _send_frame(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_LEN.pack(len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _recv_frame(sock: socket.socket) -> Optional[Any]:
    hdr = _recv_exact(sock, _LEN.size)
    if hdr is None:
        return None
    body = _recv_exact(sock, _LEN.unpack(hdr)[0])
    if body is None:
        return None
    return pickle.loads(body)


# ---------------------------------------------------------------------------
# Child process
# ---------------------------------------------------------------------------


def engine_proc_main(socket_path: str, engine_args: EngineArgs,
                     extra_env: Optional[Dict[str, str]] = None) -> None:
    """Child entry: build the engine, serve the socket protocol.

    Mirrors AsyncAphrodite._run_loop's structure synchronously: drain
    inbound commands (non-blocking while work is queued, blocking when
    idle), step, push outputs.

    extra_env: applied before any device use — the hook data-parallel
    replicas use to pin each engine process to its own chips (e.g.
    TPU_VISIBLE_CHIPS / JAX device selection vars).
    """
    if extra_env:
        os.environ.update(extra_env)
    # Honor JAX_PLATFORMS even where a sitecustomize hook pre-registers
    # a hardware backend at interpreter boot (same workaround as
    # tests/conftest.py): the spawned child re-runs sitecustomize, so
    # the env var alone is too late.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        try:
            from jax._src import xla_bridge as _xb

            wanted = set(plat.split(","))
            for name in list(_xb._backend_factories):
                if name not in wanted:
                    _xb._backend_factories.pop(name, None)
        except Exception:  # pragma: no cover - jax internals moved
            pass

    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.connect(socket_path)
    try:
        from aphrodite_tpu.engine.engine import AphroditeEngine

        engine = AphroditeEngine.from_engine_args(engine_args)
        _send_frame(sock, ("ready",))
    except BaseException:
        _send_frame(sock, ("fatal", traceback.format_exc()))
        return

    import select as _select

    def drain(block: bool) -> bool:
        """Process pending commands; returns False on shutdown/EOF.

        Readability is tested with select(); the frame itself is ALWAYS
        read in blocking mode. A non-blocking read could hit EAGAIN
        mid-frame (any pickle larger than the socket buffer arriving
        while the engine steps), and abandoning a half-read frame
        desyncs the length-prefixed protocol permanently. Blocking on
        the remainder is safe: the parent writes whole frames with
        sendall, so once the header bytes exist the body follows.
        """
        while True:
            if not block:
                readable, _, _ = _select.select([sock], [], [], 0)
                if not readable:
                    return True
            try:
                msg = _recv_frame(sock)
            except OSError:
                return False
            if msg is None:
                return False
            op = msg[0]
            if op == "shutdown":
                return False
            if op == "add_request":
                kwargs = msg[1]
                try:
                    engine.add_request(**kwargs)
                except Exception as e:  # admission error: just this req
                    _send_frame(sock, ("request_failed",
                                       kwargs.get("request_id"), e))
            elif op == "abort":
                engine.abort_request(msg[1])
            elif op == "utility":
                _, call_id, name, args, kwargs = msg
                try:
                    value = getattr(engine, name)(*args, **kwargs)
                    _send_frame(sock, ("reply", call_id, True, value))
                except Exception:
                    _send_frame(sock, ("reply", call_id, False,
                                       traceback.format_exc()))
            block = False  # after one blocking read, drain the rest

    try:
        while True:
            if not drain(block=not engine.has_unfinished_requests()):
                break
            if engine.has_unfinished_requests():
                outputs = engine.step()
                if outputs:
                    _send_frame(sock, ("outputs", outputs))
    except Exception:
        try:
            _send_frame(sock, ("fatal", traceback.format_exc()))
        except OSError:
            pass
    finally:
        sock.close()


# ---------------------------------------------------------------------------
# Parent client
# ---------------------------------------------------------------------------


class _EngineProxy:
    """The `.engine` attribute of MPAsyncEngine: frontend-local
    tokenizer/config plus awaitable utility passthroughs.

    Matches the attributes the OpenAI/Kobold servers read off the
    in-process engine (endpoints/openai/api_server.py). Methods that
    reach engine state return AWAITABLES here; the server's _eng()
    helper awaits results from either mode.
    """

    def __init__(self, client: "MPAsyncEngine", model_config,
                 tokenizer) -> None:
        self._client = client
        self.model_config = model_config
        self.tokenizer = tokenizer
        self.eos_token_id = (tokenizer.eos_token_id
                             if tokenizer is not None else None)

    def has_unfinished_requests(self) -> bool:
        return bool(self._client._streams)

    @property
    def runner(self):
        """Metadata-only runner shim: the multimodal routes read
        class/config-level model attributes (is_multimodal,
        image_token_index, num_image_tokens, ...). Our models are pure
        functions whose constructors only derive shapes from configs —
        no weights — so the frontend can instantiate one locally."""
        if not hasattr(self, "_runner_shim"):
            from types import SimpleNamespace

            from aphrodite_tpu.models.registry import get_model_class

            engine_config = self._client.engine_args.create_engine_config()
            model = get_model_class(self.model_config)(
                self.model_config, engine_config.parallel_config)
            self._runner_shim = SimpleNamespace(model=model)
        return self._runner_shim

    def __getattr__(self, name: str):
        # Any engine method becomes an awaitable passthrough.
        if name.startswith("_"):
            raise AttributeError(name)

        def call(*args, **kwargs):
            return self._client.utility(name, *args, **kwargs)

        return call


class MPAsyncEngine:
    """AsyncAphrodite-compatible client for a child-process engine."""

    def __init__(self, engine_args: EngineArgs,
                 start_timeout_s: float = 600.0,
                 extra_env: Optional[Dict[str, str]] = None) -> None:
        self.engine_args = engine_args
        self._streams: Dict[str, AsyncStream] = {}
        self._pending: Dict[int, asyncio.Future] = {}
        self._next_call_id = 0
        self._errored: Optional[BaseException] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._ready = threading.Event()
        self._fatal_at_start: Optional[str] = None

        path = f"/tmp/aphrodite-engine-{os.getpid()}-{id(self)}.sock"
        if os.path.exists(path):
            os.unlink(path)
        listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        listener.bind(path)
        listener.listen(1)

        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self.proc = ctx.Process(target=engine_proc_main,
                                args=(path, engine_args, extra_env),
                                daemon=True)
        self.proc.start()
        listener.settimeout(start_timeout_s)
        self._sock, _ = listener.accept()
        listener.close()
        os.unlink(path)

        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        if not self._ready.wait(start_timeout_s):
            raise RuntimeError("engine process failed to start in time")
        if self._fatal_at_start:
            raise RuntimeError(
                f"engine process failed to start:\n{self._fatal_at_start}")

        # Frontend-local tokenizer + config (the reference MQ frontend
        # does the same: the API process owns tokenization).
        from aphrodite_tpu.engine.engine import AphroditeEngine  # noqa: F401
        engine_config = engine_args.create_engine_config()
        model_config = engine_config.model_config
        tokenizer = None
        if not model_config.skip_tokenizer_init:
            from aphrodite_tpu.transformers_utils.tokenizer import (
                get_tokenizer)
            tokenizer = get_tokenizer(
                model_config.tokenizer,
                trust_remote_code=model_config.trust_remote_code)
        self.engine = _EngineProxy(self, model_config, tokenizer)

    # -- reader ---------------------------------------------------------

    def _read_loop(self) -> None:
        while True:
            try:
                msg = _recv_frame(self._sock)
            except OSError:
                msg = None
            if msg is None:
                self._on_dead("engine process exited")
                return
            op = msg[0]
            if op == "ready":
                self._ready.set()
            elif op == "fatal":
                self._fatal_at_start = msg[1]
                self._ready.set()
                self._on_dead(f"engine process died:\n{msg[1]}")
                return
            else:
                self._post(lambda m=msg: self._handle(m))

    def _post(self, fn) -> None:
        loop = self._loop
        if loop is not None and not loop.is_closed():
            loop.call_soon_threadsafe(fn)

    def _handle(self, msg) -> None:
        op = msg[0]
        if op == "outputs":
            for out in msg[1]:
                stream = self._streams.get(out.request_id)
                if stream is None:
                    continue
                stream.put(out)
                if out.finished:
                    stream.finish()
                    self._streams.pop(out.request_id, None)
        elif op == "request_failed":
            _, rid, exc = msg
            stream = self._streams.pop(rid, None)
            if stream is not None:
                stream.put(exc if isinstance(exc, BaseException)
                           else RuntimeError(str(exc)))
                stream.finish()
        elif op == "reply":
            _, call_id, ok, value = msg
            fut = self._pending.pop(call_id, None)
            if fut is not None and not fut.done():
                if ok:
                    fut.set_result(value)
                else:
                    fut.set_exception(RuntimeError(value))

    def _on_dead(self, reason: str) -> None:
        err = AsyncEngineDeadError(reason)
        self._errored = err
        logger.error("%s", reason)

        def fail_all():
            for stream in self._streams.values():
                stream.put(err)
                stream.finish()
            self._streams.clear()
            for fut in self._pending.values():
                if not fut.done():
                    fut.set_exception(err)
            self._pending.clear()

        self._post(fail_all)

    # -- AsyncAphrodite surface ------------------------------------------

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs) -> "MPAsyncEngine":
        return cls(engine_args)

    @property
    def errored(self) -> bool:
        return self._errored is not None

    async def check_health(self) -> None:
        if self._errored:
            raise AsyncEngineDeadError(
                "engine process has died") from self._errored

    def _send(self, obj) -> None:
        if self._errored:
            raise AsyncEngineDeadError(
                "engine process has died") from self._errored
        try:
            _send_frame(self._sock, obj)
        except OSError as e:
            self._on_dead(f"engine socket write failed: {e}")
            raise AsyncEngineDeadError(str(e)) from e

    async def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
        multi_modal_data=None,
        prompt_adapter_request=None,
    ) -> AsyncStream:
        await self.check_health()
        self._loop = asyncio.get_event_loop()
        stream = AsyncStream(request_id)
        self._streams[request_id] = stream
        self._send(("add_request", dict(
            request_id=request_id, prompt=prompt,
            sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=time.monotonic(),
            lora_request=lora_request,
            multi_modal_data=multi_modal_data,
            prompt_adapter_request=prompt_adapter_request)))
        return stream

    async def generate(self, request_id: str, prompt=None,
                       sampling_params=None, prompt_token_ids=None,
                       multi_modal_data=None):
        stream = await self.add_request(
            request_id, prompt, sampling_params, prompt_token_ids,
            multi_modal_data=multi_modal_data)
        try:
            async for output in stream:
                yield output
        finally:
            if not stream.finished:
                await self.abort(request_id)

    async def abort(self, request_id: str) -> None:
        stream = self._streams.pop(request_id, None)
        if stream is not None:
            stream.finish()
        if not self._errored:
            try:
                self._send(("abort", request_id))
            except AsyncEngineDeadError:
                pass

    # -- utilities --------------------------------------------------------

    def utility(self, name: str, *args, **kwargs) -> "asyncio.Future":
        self._loop = asyncio.get_event_loop()
        fut = self._loop.create_future()
        if self._errored:
            fut.set_exception(AsyncEngineDeadError(
                "engine process has died"))
            return fut
        call_id = self._next_call_id
        self._next_call_id += 1
        self._pending[call_id] = fut
        try:
            self._send(("utility", call_id, name, args, kwargs))
        except AsyncEngineDeadError as e:
            self._pending.pop(call_id, None)
            if not fut.done():
                fut.set_exception(e)
        return fut

    def shutdown(self) -> None:
        try:
            _send_frame(self._sock, ("shutdown",))
        except OSError:
            pass
        self.proc.join(timeout=10)
        if self.proc.is_alive():
            self.proc.terminate()
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Data-parallel engine replicas
# ---------------------------------------------------------------------------


class _DPEngineProxy:
    """Engine facade for the DP router: local tokenizer/config from
    replica 0, utility methods fanned out to every live replica (an
    adapter load must land on all of them)."""

    def __init__(self, dp: "DPAsyncEngine", base: _EngineProxy) -> None:
        self._dp = dp
        self.model_config = base.model_config
        self.tokenizer = base.tokenizer
        self.eos_token_id = base.eos_token_id
        self._base = base

    def has_unfinished_requests(self) -> bool:
        return any(r._streams for r in self._dp.replicas)

    @property
    def runner(self):
        return self._base.runner

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)

        def call(*args, **kwargs):
            return self._dp.utility(name, *args, **kwargs)

        return call


class DPAsyncEngine:
    """Least-loaded router over N independent engine-process replicas.

    Each replica owns its own device(s), KV cache, and scheduler — the
    scale-out shape for single-host multi-chip or multi-process serving
    when one mesh is not wanted. Requests route to the replica with the
    fewest open streams; a dead replica is skipped (partial fault
    tolerance: serving degrades instead of dying). The frontend surface
    matches AsyncAphrodite/MPAsyncEngine, so OpenAIServer runs
    unmodified.

    Per-replica device pinning goes through `env_for_replica` (e.g.
    lambda i: {"TPU_VISIBLE_CHIPS": str(i)}).
    """

    def __init__(self, engine_args: EngineArgs, replicas: int,
                 env_for_replica=None,
                 start_timeout_s: float = 600.0) -> None:
        assert replicas >= 1
        self.engine_args = engine_args
        if env_for_replica is None:
            env_for_replica = self._default_pinning(replicas)
        self.replicas: List[MPAsyncEngine] = []
        for i in range(replicas):
            env = env_for_replica(i) if env_for_replica else None
            self.replicas.append(
                MPAsyncEngine(engine_args, start_timeout_s=start_timeout_s,
                              extra_env=env))
        self.engine = _DPEngineProxy(self, self.replicas[0].engine)
        self._owner: Dict[str, MPAsyncEngine] = {}

    @staticmethod
    def _default_pinning(replicas: int):
        """Per-replica TPU chip pinning: two engine processes on the same
        chip deadlock/contend (one libtpu owner per chip), so each child
        gets TPU_VISIBLE_CHIPS=<i> unless the caller pins explicitly or
        APHRODITE_DP_PIN=0 (CPU runs, tests). Fails fast when the host's
        visible chip count (/dev/accel* when present) is below the
        replica count instead of letting children crash at device init.
        """
        if replicas == 1 or os.environ.get("APHRODITE_DP_PIN") == "0":
            return None
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            return None
        import glob

        accels = glob.glob("/dev/accel*")
        if accels and len(accels) < replicas:
            raise ValueError(
                f"--engine-replicas {replicas} but only {len(accels)} "
                f"TPU chips visible on this host ({sorted(accels)}); "
                "data-parallel replicas need one chip (set) each. Use "
                "env_for_replica for custom multi-chip-per-replica "
                "pinning or APHRODITE_DP_PIN=0 to disable pinning.")

        def env(i: int) -> Dict[str, str]:
            return {
                "TPU_VISIBLE_CHIPS": str(i),
                # One-process-per-chip topology: each child is its own
                # single-process TPU world.
                "TPU_PROCESS_BOUNDS": "1,1,1",
                "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1",
            }

        return env

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs,
                         replicas: int = 1) -> "DPAsyncEngine":
        return cls(engine_args, replicas)

    # -- routing ----------------------------------------------------------

    def _live(self) -> List[MPAsyncEngine]:
        return [r for r in self.replicas if not r.errored]

    def _pick(self) -> MPAsyncEngine:
        live = self._live()
        if not live:
            raise AsyncEngineDeadError("all engine replicas have died")
        return min(live, key=lambda r: len(r._streams))

    @property
    def errored(self) -> bool:
        return not self._live()

    async def check_health(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError("all engine replicas have died")

    async def add_request(self, request_id: str, *args, **kwargs):
        replica = self._pick()
        stream = await replica.add_request(request_id, *args, **kwargs)
        self._owner[request_id] = replica
        return stream

    async def generate(self, request_id: str, prompt=None,
                       sampling_params=None, prompt_token_ids=None,
                       multi_modal_data=None):
        stream = await self.add_request(
            request_id, prompt, sampling_params, prompt_token_ids,
            multi_modal_data=multi_modal_data)
        try:
            async for output in stream:
                yield output
        finally:
            if not stream.finished:
                await self.abort(request_id)
            else:
                # Normal completion never hits abort(): prune ownership
                # or the dict grows without bound in a long server.
                self._owner.pop(request_id, None)

    async def abort(self, request_id: str) -> None:
        replica = self._owner.pop(request_id, None)
        if replica is not None:
            await replica.abort(request_id)

    # -- utilities --------------------------------------------------------

    def utility(self, name: str, *args, **kwargs):
        """Fan out to every live replica (adapter loads must land on
        all); resolves to the first replica's result."""
        futs = [r.utility(name, *args, **kwargs) for r in self._live()]

        async def gather():
            results = await asyncio.gather(*futs)
            return results[0] if results else None

        return gather()

    def shutdown(self) -> None:
        for r in self.replicas:
            r.shutdown()
