"""Async engine wrapper: background step loop + per-request streams.

Re-design of the reference AsyncAphrodite (aphrodite/engine/
async_aphrodite.py:436): an asyncio task drives `engine.step()` whenever
requests are in flight; each request gets an `AsyncStream` that yields
`RequestOutput`s as tokens arrive. The device work runs in a thread
executor so the event loop stays responsive while XLA executes
(single-controller JAX: no worker processes to coordinate).

Engine-dead detection mirrors the reference (async_aphrodite.py:34):
if the loop crashes, every open stream receives the error.
"""

import asyncio
import time
from typing import AsyncIterator, Dict, List, Optional

from aphrodite_tpu.common.config import EngineConfig
from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.outputs import RequestOutput
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.engine import AphroditeEngine

logger = init_logger(__name__)

ENGINE_ITERATION_TIMEOUT_S = 60


class AsyncEngineDeadError(RuntimeError):
    pass


class AsyncStream:
    """Per-request output stream (reference async_aphrodite.py:72)."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._finished = True
        self._queue.put_nowait(StopAsyncIteration())

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        item = await self._queue.get()
        if isinstance(item, StopAsyncIteration):
            raise StopAsyncIteration
        if isinstance(item, BaseException):
            raise item
        return item


class AsyncAphrodite:
    """Asyncio front half over the synchronous engine."""

    def __init__(self, engine: AphroditeEngine) -> None:
        self.engine = engine
        self._streams: Dict[str, AsyncStream] = {}
        self._new_requests: List[tuple] = []
        self._loop_task: Optional[asyncio.Task] = None
        self._wakeup = asyncio.Event()
        self._errored: Optional[BaseException] = None

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs) -> "AsyncAphrodite":
        return cls(AphroditeEngine.from_engine_args(engine_args))

    @property
    def errored(self) -> bool:
        return self._errored is not None

    async def check_health(self) -> None:
        if self._errored:
            raise AsyncEngineDeadError(
                "engine loop has died") from self._errored

    # ------------------------------------------------------------------

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
        stream = AsyncStream(request_id)
        self._streams[request_id] = stream
        self._new_requests.append(
            (request_id, prompt, sampling_params, prompt_token_ids,
             time.monotonic(), lora_request, multi_modal_data,
             prompt_adapter_request))
        self._ensure_loop()
        self._wakeup.set()
        return stream

    async def generate(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        multi_modal_data=None,
    ) -> AsyncIterator[RequestOutput]:
        stream = await self.add_request(request_id, prompt, sampling_params,
                                        prompt_token_ids,
                                        multi_modal_data=multi_modal_data)
        try:
            async for output in stream:
                yield output
        finally:
            if not stream.finished:
                await self.abort(request_id)

    async def abort(self, request_id: str) -> None:
        self.engine.abort_request(request_id)
        stream = self._streams.pop(request_id, None)
        if stream is not None:
            stream.finish()

    # ------------------------------------------------------------------

    def _ensure_loop(self) -> None:
        if self._loop_task is None or self._loop_task.done():
            self._loop_task = asyncio.get_event_loop().create_task(
                self._run_loop())

    def _drain_new_requests(self) -> None:
        new, self._new_requests = self._new_requests, []
        for rid, prompt, sp, ids, arrival, lora, mm, pa in new:
            try:
                self.engine.add_request(rid, prompt=prompt,
                                        sampling_params=sp,
                                        prompt_token_ids=ids,
                                        arrival_time=arrival,
                                        lora_request=lora,
                                        multi_modal_data=mm,
                                        prompt_adapter_request=pa)
            except Exception as e:  # bad request: fail just this stream
                stream = self._streams.pop(rid, None)
                if stream is not None:
                    stream.put(e)
                    stream.finish()

    async def _run_loop(self) -> None:
        loop = asyncio.get_event_loop()
        try:
            while True:
                self._drain_new_requests()
                if not self.engine.has_unfinished_requests():
                    if not self._new_requests:
                        self._wakeup.clear()
                        await self._wakeup.wait()
                    continue
                outputs = await asyncio.wait_for(
                    loop.run_in_executor(None, self.engine.step),
                    timeout=ENGINE_ITERATION_TIMEOUT_S * 10)
                for out in outputs:
                    stream = self._streams.get(out.request_id)
                    if stream is None:
                        continue
                    stream.put(out)
                    if out.finished:
                        stream.finish()
                        self._streams.pop(out.request_id, None)
                await asyncio.sleep(0)
        except Exception as e:  # engine dead: fail all open streams
            logger.error("engine loop died: %s", e)
            self._errored = e
            for stream in self._streams.values():
                stream.put(AsyncEngineDeadError(str(e)))
                stream.finish()
            self._streams.clear()
            raise
