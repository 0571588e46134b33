"""OpenAI-compatible HTTP server.

Re-design of the reference api_server (aphrodite/endpoints/openai/
api_server.py:315-982, default port 2242). Built on aiohttp (this
environment has no fastapi/uvicorn); routes and request/response schemas
match the reference: /health, /v1/models, /v1/completions,
/v1/chat/completions (both with SSE streaming), /v1/tokenize,
/v1/detokenize, /metrics (Prometheus).

The engine runs in-process (single-controller JAX); the reference's
frontend<->engine ZeroMQ split (engine/multiprocessing/) is unnecessary —
the asyncio loop + thread executor fills the same role without IPC.
"""

import asyncio
import json
from typing import AsyncIterator, List, Optional, Union

from aiohttp import web

from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.common.outputs import RequestOutput
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.async_engine import AsyncAphrodite
from aphrodite_tpu.endpoints.openai.protocol import (
    ChatCompletionChoice, ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionResponseMessage, ChatCompletionStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, CompletionChoice,
    CompletionRequest, CompletionResponse, DeltaMessage, DetokenizeRequest,
    DetokenizeResponse, ErrorResponse, LogProbsPart, ModelCard, ModelList,
    TokenizeRequest, TokenizeResponse, UsageInfo, random_uuid)

logger = init_logger(__name__)

DEFAULT_PORT = 2242


def _request_error(e: BaseException) -> web.Response:
    """Map an add_request failure: a dead engine is a 503 (the server
    stays up — reference server/launch.py:17 keep-alive semantics), any
    other admission failure a 400."""
    from aphrodite_tpu.engine.async_engine import AsyncEngineDeadError

    if isinstance(e, AsyncEngineDeadError):
        return _error(f"engine is dead: {e}", status=503,
                      err_type="internal_error")
    return _error(str(e))


def _sse_error(message: str) -> bytes:
    """Mid-stream error event (OpenAI stream error framing)."""
    return (b"data: " + json.dumps({"error": {
        "message": message, "type": "invalid_request_error"}}).encode()
        + b"\n\n")


class RequestFailedError(Exception):
    """A request finished with a request-level error (RequestOutput
    .error, e.g. async guided-FSM compilation failure) — a client
    problem, surfaced as 400 rather than 500."""


def _error(message: str, status: int = 400,
           err_type: str = "invalid_request_error") -> web.Response:
    body = ErrorResponse(message=message, type=err_type,
                         code=status).model_dump()
    return web.json_response({"error": body}, status=status)


class OpenAIServer:
    def __init__(self, async_engine: AsyncAphrodite,
                 served_model_names: Optional[List[str]] = None,
                 api_keys: Optional[List[str]] = None,
                 launch_kobold_api: bool = True,
                 log_requests: bool = True,
                 engine_args=None, admin_key: Optional[str] = None) -> None:
        self.async_engine = async_engine
        self.engine = async_engine.engine
        self.tokenizer = self.engine.tokenizer
        self.model_config = self.engine.model_config
        # True when the engine lives in a child process (MPAsyncEngine):
        # engine methods then return awaitables (see _eng).
        self._mp_engine = hasattr(async_engine, "utility")
        self._engine_cls = type(async_engine)
        names = served_model_names or [self.model_config.model]
        self.served_model_names = names
        self.api_keys = api_keys
        self.launch_kobold_api = launch_kobold_api
        self.log_requests = log_requests
        self.engine_args = engine_args
        self.admin_key = admin_key

    # ------------------------------------------------------------------
    # App wiring
    # ------------------------------------------------------------------

    def build_app(self) -> web.Application:
        app = web.Application(
            middlewares=[self._auth_middleware, self._log_middleware])
        app.router.add_get("/health", self.health)
        app.router.add_get("/v1/models", self.show_models)
        app.router.add_post("/v1/completions", self.create_completion)
        app.router.add_post("/v1/chat/completions",
                            self.create_chat_completion)
        app.router.add_post("/v1/embeddings", self.create_embeddings)
        app.router.add_post("/v1/tokenize", self.tokenize)
        app.router.add_post("/v1/detokenize", self.detokenize)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_get("/version", self.version)
        app.router.add_get("/", self.root)
        app.router.add_get("/.well-known/serviceinfo", self.serviceinfo)
        app.router.add_post("/v1/soft_prompt/load", self.load_soft_prompt)
        app.router.add_post("/v1/soft_prompt/unload",
                            self.unload_soft_prompt)
        app.router.add_post("/v1/lora/load", self.load_lora)
        app.router.add_post("/v1/lora/unload", self.unload_lora)
        app.router.add_post("/v1/model/load", self.load_model)
        app.router.add_post("/v1/model/unload", self.unload_model)
        app.router.add_post("/v1/profile/start", self.profile_start)
        app.router.add_post("/v1/profile/stop", self.profile_stop)
        app.router.add_get("/v1/internal/engine_stats", self.engine_stats)
        if self.launch_kobold_api and self.tokenizer is not None:
            from aphrodite_tpu.endpoints.kobold.api_server import (
                KoboldServer)

            KoboldServer(self.async_engine,
                         self.served_model_names[0]).add_routes(app)
        return app

    @web.middleware
    async def _log_middleware(self, request: web.Request, handler):
        """Request logging (reference api_server request logger
        middleware; disable with log_requests=False)."""
        import time as _time

        t0 = _time.monotonic()
        try:
            response = await handler(request)
            status = getattr(response, "status", "?")
            return response
        except Exception:
            status = 500
            raise
        finally:
            if self.log_requests and request.path != "/health":
                logger.info("%s %s -> %s (%.1f ms)", request.method,
                            request.path, status,
                            (_time.monotonic() - t0) * 1e3)

    @web.middleware
    async def _auth_middleware(self, request: web.Request, handler):
        """API-key gate over both the OpenAI (/v1) and KoboldAI (/api)
        surfaces (the reference middleware covers both; OPTIONS preflight
        is exempt, matching reference api_server auth)."""
        if (self.api_keys and request.method != "OPTIONS"
                and request.path.startswith(("/v1", "/api"))):
            auth = request.headers.get("Authorization", "")
            token = auth.removeprefix("Bearer ").strip()
            if token not in self.api_keys:
                return _error("invalid API key", status=401,
                              err_type="authentication_error")
        return await handler(request)

    # ------------------------------------------------------------------
    # Simple routes
    # ------------------------------------------------------------------

    async def _eng(self, name, *args, **kwargs):
        """Call an engine method in either mode: directly in-process, or
        as a utility RPC against the child-process engine (whose proxy
        methods return awaitables — engine/multiproc.py)."""
        import inspect

        res = getattr(self.engine, name)(*args, **kwargs)
        if inspect.isawaitable(res):
            res = await res
        return res

    async def health(self, request: web.Request) -> web.Response:
        if self.async_engine is None:
            return web.json_response({"status": "no model loaded"},
                                     status=503)
        try:
            await self.async_engine.check_health()
        except Exception as e:
            return web.json_response({"status": "dead", "error": str(e)},
                                     status=500)
        return web.Response(status=200)

    async def version(self, request: web.Request) -> web.Response:
        import aphrodite_tpu

        return web.json_response({"version": aphrodite_tpu.__version__})

    async def show_models(self, request: web.Request) -> web.Response:
        cards = [ModelCard(id=n, root=self.model_config.model)
                 for n in self.served_model_names]
        return web.json_response(ModelList(data=cards).model_dump())

    async def metrics(self, request: web.Request) -> web.Response:
        try:
            import prometheus_client

            data = prometheus_client.generate_latest()
            return web.Response(body=data,
                                content_type="text/plain",
                                charset="utf-8")
        except ImportError:
            return web.Response(text="", content_type="text/plain")

    async def create_embeddings(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return _error("no model loaded", status=503,
                          err_type="service_unavailable")
        try:
            body = await request.json()
            inputs = body.get("input")
            if isinstance(inputs, str):
                inputs = [inputs]
            if not inputs:
                return _error("input is required")
            if isinstance(inputs[0], int):
                inputs = [inputs]
        except Exception as e:
            return _error(str(e))
        loop = asyncio.get_event_loop()
        try:
            token_lists = [
                self.tokenizer.encode(p) if isinstance(p, str) else list(p)
                for p in inputs
            ]
            if self._mp_engine:
                embeddings = await self._eng("encode", token_lists)
            else:
                embeddings = await loop.run_in_executor(
                    None, lambda: self.engine.encode(token_lists))
        except Exception as e:
            return _error(str(e), status=500, err_type="internal_error")
        data = [{
            "object": "embedding",
            "index": i,
            "embedding": [float(x) for x in emb],
        } for i, emb in enumerate(embeddings)]
        total = sum(len(t) for t in token_lists)
        return web.json_response({
            "object": "list",
            "data": data,
            "model": body.get("model") or self.served_model_names[0],
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    def _check_admin(self, request: web.Request) -> Optional[web.Response]:
        """Gate for admin routes (model/lora/soft-prompt load-unload).

        Reference semantics (api_server.py:315): admin routes require the
        admin key; when the server is key-protected but no admin key was
        configured, admin operations are DISABLED rather than open.
        Only a completely unauthenticated dev server (no api_keys, no
        admin_key) allows them without a key.
        """
        if self.admin_key is None:
            if self.api_keys:
                return _error(
                    "admin operations disabled (no --admin-key set)",
                    status=401, err_type="authentication_error")
            return None
        key = request.headers.get("x-admin-key") or \
            request.headers.get("Authorization", "").removeprefix(
                "Bearer ").strip()
        if key != self.admin_key:
            return _error("admin key required", status=401,
                          err_type="authentication_error")
        return None

    async def load_model(self, request: web.Request) -> web.Response:
        """Hot-swap the served model (reference /v1/model/load,
        api_server.py:315: admin-gated engine rebuild)."""
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        if self.engine_args is None:
            return _error("server started without reloadable engine args",
                          status=400)
        try:
            body = await request.json()
        except Exception as e:
            return _error(str(e))
        if (self.engine is not None
                and self.engine.has_unfinished_requests()):
            return _error("requests in flight; drain before reloading",
                          status=409)
        import copy
        import gc

        new_args = copy.deepcopy(self.engine_args)
        for k, v in body.items():
            if hasattr(new_args, k):
                setattr(new_args, k, v)
        loop = asyncio.get_event_loop()
        # Free the old engine's device arrays first.
        if self.async_engine is not None and hasattr(self.async_engine,
                                                     "shutdown"):
            self.async_engine.shutdown()
        self.async_engine = None
        self.engine = None
        gc.collect()
        try:
            new_engine = await loop.run_in_executor(
                None, lambda: self._engine_cls.from_engine_args(new_args))
        except Exception as e:
            return _error(f"model load failed: {e}", status=500,
                          err_type="internal_error")
        self.async_engine = new_engine
        self.engine = new_engine.engine
        self.tokenizer = self.engine.tokenizer
        self.model_config = self.engine.model_config
        self.engine_args = new_args
        self.served_model_names = [body.get("served_model_name")
                                   or new_args.model]
        return web.json_response({"status": "ok",
                                  "model": new_args.model})

    async def unload_model(self, request: web.Request) -> web.Response:
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        import gc

        if self.async_engine is not None and hasattr(self.async_engine,
                                                     "shutdown"):
            self.async_engine.shutdown()
        self.async_engine = None
        self.engine = None
        gc.collect()
        return web.json_response({"status": "ok", "unloaded": True})

    async def profile_start(self, request: web.Request) -> web.Response:
        """Admin route: begin a jax.profiler device trace. Body:
        {"dir": "/tmp/trace"} (optional; defaults to a tmp dir). View
        with tensorboard/xprof. For live capture without routes, set
        APHRODITE_PROFILER_PORT to run the gRPC trace server instead."""
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        import tempfile

        try:
            body = await request.json()
        except Exception:
            body = {}
        trace_dir = body.get("dir") or tempfile.mkdtemp(
            prefix="aphrodite_trace_")
        try:
            await self._eng("profile_start", trace_dir)
        except Exception as e:
            return _error(f"trace start failed: {e}", status=409)
        self._trace_dir = trace_dir
        return web.json_response({"status": "ok", "dir": trace_dir})

    async def profile_stop(self, request: web.Request) -> web.Response:
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        try:
            await self._eng("profile_stop")
        except Exception as e:
            return _error(f"trace stop failed: {e}", status=409)
        return web.json_response({
            "status": "ok", "dir": getattr(self, "_trace_dir", None)})

    async def engine_stats(self, request: web.Request) -> web.Response:
        """Per-phase engine iteration timings (cumulative + last): the
        schedule / execute / postprocess split that identifies host-side
        bottlenecks. Prometheus exposes the same as histograms; this
        route is the zero-dependency JSON view."""
        if self.engine is None:
            return _error("no engine loaded", status=409)
        pt = dict(await self._eng("get_phase_timings"))
        it = max(pt["iterations"], 1)
        pt["avg_schedule_ms"] = pt["schedule_s"] / it * 1e3
        pt["avg_execute_ms"] = pt["execute_s"] / it * 1e3
        pt["avg_postprocess_ms"] = pt["postprocess_s"] / it * 1e3
        if pt.get("spec_proposed_tokens"):
            from aphrodite_tpu.engine.metrics import spec_rates

            pt["spec_acceptance_rate"], pt["spec_efficiency"] = \
                spec_rates(pt["spec_proposed_tokens"],
                           pt["spec_accepted_tokens"],
                           pt["spec_emitted_tokens"])
        return web.json_response(pt)

    async def root(self, request: web.Request) -> web.Response:
        return web.json_response(
            {"name": "aphrodite-tpu", "health": "/health",
             "openai_api": "/v1"})

    async def serviceinfo(self, request: web.Request) -> web.Response:
        """Service discovery document (reference api_server.py:590)."""
        from aphrodite_tpu import __version__

        api = {"openai": {"name": "OpenAI API", "rel_url": "/v1",
                          "version": 1}}
        if self.launch_kobold_api:
            api["koboldai"] = {"name": "KoboldAI API", "rel_url": "/api",
                               "version": 1}
        return web.json_response({
            "version": 0.2,
            "software": {"name": "aphrodite-tpu",
                         "version": __version__},
            "api": api,
        })

    async def load_soft_prompt(self, request: web.Request) -> web.Response:
        """Admin route (reference /v1/soft_prompt/load,
        api_server.py:733): registers a prompt-tuning adapter; requests
        then select it by prompt_adapter_name."""
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        try:
            body = await request.json()
            name = body.get("soft_prompt_name", body.get("name"))
            path = body.get("soft_prompt_path", body.get("path"))
            assert name and path
        except Exception as e:
            return _error(str(e))
        try:
            await self._eng("load_soft_prompt", name, path)
        except ValueError as e:
            return _error(str(e), status=500, err_type="internal_error")
        except Exception as e:
            return _error(str(e), status=500, err_type="internal_error")
        return web.json_response({"status": "ok", "loaded": name})

    async def load_lora(self, request: web.Request) -> web.Response:
        """Admin route (reference /v1/lora/load, api_server.py:315)."""
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        try:
            body = await request.json()
            name = body["lora_name"]
            path = body["lora_path"]
        except Exception as e:
            return _error(str(e))
        try:
            await self._eng("add_lora", name, path)
        except Exception as e:
            return _error(str(e), status=500, err_type="internal_error")
        return web.json_response({"status": "ok", "loaded": name})

    async def unload_soft_prompt(self,
                                 request: web.Request) -> web.Response:
        """Admin route (reference /v1/soft_prompt/unload): frees the
        adapter's slot for reuse; requests naming it then 404."""
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        try:
            body = await request.json()
            name = body.get("soft_prompt_name", body.get("name"))
            assert name
        except Exception as e:
            return _error(str(e))
        removed = await self._eng("unload_soft_prompt", name)
        return web.json_response({"status": "ok", "removed": removed})

    async def unload_lora(self, request: web.Request) -> web.Response:
        denied = self._check_admin(request)
        if denied is not None:
            return denied
        try:
            body = await request.json()
            name = body["lora_name"]
        except Exception as e:
            return _error(str(e))
        removed = await self._eng("remove_lora", name)
        return web.json_response({"status": "ok", "removed": removed})

    async def _soft_prompt_for_model_name(self, model_name):
        """Requests naming a loaded soft prompt route through it
        (reference serves prompt adapters as additional model names)."""
        if not model_name or self.engine is None:
            return None
        slots = await self._eng("soft_prompt_slots")
        if model_name not in slots:
            return None
        from aphrodite_tpu.prompt_adapter.request import (
            PromptAdapterRequest)

        return PromptAdapterRequest(
            model_name, slots[model_name] + 1, model_name)

    async def _lora_for_model_name(self, model_name: Optional[str]):
        """Requests naming a loaded adapter route through it (reference
        serves adapters as additional model names)."""
        if not model_name:
            return None
        loras = await self._eng("list_loras")
        if model_name in loras:
            from aphrodite_tpu.lora import LoRARequest

            return LoRARequest(model_name, loras.index(model_name) + 1,
                               model_name)
        return None

    async def tokenize(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return _error("no model loaded", status=503,
                          err_type="service_unavailable")
        try:
            req = TokenizeRequest(**await request.json())
        except Exception as e:
            return _error(str(e))
        if req.messages is not None:
            text = self._apply_chat_template(req.messages,
                                             req.add_generation_prompt)
            ids = self.tokenizer.encode(text, add_special_tokens=False)
        else:
            ids = self.tokenizer.encode(
                req.prompt or "", add_special_tokens=req.add_special_tokens)
        resp = TokenizeResponse(tokens=ids, count=len(ids),
                                max_model_len=self.model_config.max_model_len)
        return web.json_response(resp.model_dump())

    async def detokenize(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return _error("no model loaded", status=503,
                          err_type="service_unavailable")
        try:
            req = DetokenizeRequest(**await request.json())
        except Exception as e:
            return _error(str(e))
        text = self.tokenizer.decode(req.tokens)
        return web.json_response(DetokenizeResponse(prompt=text).model_dump())

    # ------------------------------------------------------------------
    # Completions
    # ------------------------------------------------------------------

    def _normalize_prompts(self, prompt) -> List[Union[str, List[int]]]:
        if isinstance(prompt, str):
            return [prompt]
        if isinstance(prompt, list):
            if not prompt:
                raise ValueError("empty prompt")
            if isinstance(prompt[0], int):
                return [prompt]
            return list(prompt)
        raise ValueError("invalid prompt type")

    async def create_completion(self, request: web.Request) -> web.Response:
        if self.engine is None:
            return _error("no model loaded", status=503,
                          err_type="service_unavailable")
        try:
            req = CompletionRequest(**await request.json())
            prompts = self._normalize_prompts(req.prompt)
        except Exception as e:
            return _error(str(e))
        model_name = req.model or self.served_model_names[0]

        streams = []
        request_id = f"cmpl-{random_uuid()}"
        try:
            for i, p in enumerate(prompts):
                if isinstance(p, str):
                    prompt_ids = self.tokenizer.encode(p)
                    prompt_text: Optional[str] = p
                else:
                    prompt_ids = list(p)
                    prompt_text = None
                sp = req.to_sampling_params(
                    self.model_config.max_model_len - len(prompt_ids))
                stream = await self.async_engine.add_request(
                    f"{request_id}-{i}", prompt=prompt_text,
                    sampling_params=sp, prompt_token_ids=prompt_ids,
                    lora_request=await self._lora_for_model_name(req.model),
                    prompt_adapter_request=await self._soft_prompt_for_model_name(
                        req.model))
                streams.append((f"{request_id}-{i}", stream, prompt_ids, sp))
        except Exception as e:
            return _request_error(e)

        if req.stream:
            return await self._stream_completion(request, req, request_id,
                                                 model_name, streams)

        try:
            finals = await asyncio.gather(
                *[self._collect(stream) for _, stream, _, _ in streams])
        except RequestFailedError as e:
            return _error(str(e))
        except Exception as e:
            return _error(str(e), status=500, err_type="internal_error")
        choices = []
        usage = UsageInfo()
        for gi, out in enumerate(finals):
            prompt_ids = streams[gi][2]
            usage.prompt_tokens += len(prompt_ids)
            for comp in out.outputs:
                text = comp.text
                if req.echo:
                    prefix = (out.prompt if out.prompt is not None else
                              self.tokenizer.decode(prompt_ids))
                    text = prefix + text
                choices.append(
                    CompletionChoice(
                        index=len(choices),
                        text=text,
                        finish_reason=comp.finish_reason,
                        stop_reason=comp.stop_reason,
                        logprobs=self._format_logprobs(comp, req.logprobs),
                    ))
                usage.completion_tokens += len(comp.token_ids)
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        resp = CompletionResponse(id=request_id, model=model_name,
                                  choices=choices, usage=usage)
        return web.json_response(resp.model_dump())

    def _format_logprobs(self, comp, num_logprobs) -> Optional[LogProbsPart]:
        if num_logprobs is None or comp.logprobs is None:
            return None
        part = LogProbsPart(top_logprobs=[])
        offset = 0
        for tid, entry in zip(comp.token_ids, comp.logprobs):
            tok_text = self.tokenizer.decode([tid])
            part.tokens.append(tok_text)
            lp = entry.get(tid)
            part.token_logprobs.append(lp.logprob if lp else None)
            part.text_offset.append(offset)
            offset += len(tok_text)
            part.top_logprobs.append({
                self.tokenizer.decode([t]): e.logprob
                for t, e in entry.items()
            })
        return part

    async def _collect(self, stream) -> RequestOutput:
        final = None
        async for out in stream:
            final = out
        assert final is not None
        if final.error:
            raise RequestFailedError(final.error)
        return final

    async def _stream_completion(self, request, req, request_id, model_name,
                                 streams) -> web.StreamResponse:
        response = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await response.prepare(request)

        async def pump(gi, rid, stream, prompt_ids):
            sent_len = [0] * (streams[gi][3].n or 1)
            async for out in stream:
                if out.error:
                    await response.write(_sse_error(out.error))
                    return
                for ci, comp in enumerate(out.outputs):
                    delta = comp.text[sent_len[ci]:]
                    sent_len[ci] = len(comp.text)
                    if not delta and not comp.finish_reason:
                        continue
                    chunk = CompletionResponse(
                        id=request_id,
                        model=model_name,
                        choices=[
                            CompletionChoice(
                                index=gi * (streams[gi][3].n or 1) + ci,
                                text=delta,
                                finish_reason=comp.finish_reason,
                                stop_reason=comp.stop_reason,
                            )
                        ],
                    ).model_dump(exclude_unset=False)
                    await response.write(
                        f"data: {json.dumps(chunk)}\n\n".encode())

        try:
            for gi, (rid, stream, prompt_ids, _) in enumerate(streams):
                await pump(gi, rid, stream, prompt_ids)
            await response.write(b"data: [DONE]\n\n")
            await response.write_eof()
        except (ConnectionResetError, asyncio.CancelledError):
            # Client went away: free the engine work (reference aborts
            # on disconnect, api_server request lifecycle).
            for rid, _, _, _ in streams:
                await self.async_engine.abort(rid)
            raise
        return response

    # ------------------------------------------------------------------
    # Chat completions
    # ------------------------------------------------------------------

    def _apply_chat_template(self, messages: List[ChatMessage],
                             add_generation_prompt: bool = True,
                             chat_template: Optional[str] = None,
                             tools: Optional[List[dict]] = None) -> str:
        conversation = []
        for m in messages:
            content = m.content
            if isinstance(content, list):
                # Multimodal-style content parts: concatenate text parts.
                content = "".join(
                    part.get("text", "") for part in content
                    if isinstance(part, dict))
            conversation.append({"role": m.role, "content": content or ""})
        if getattr(self.tokenizer, "chat_template", None) or chat_template:
            return self.tokenizer.apply_chat_template(
                conversation,
                tokenize=False,
                add_generation_prompt=add_generation_prompt,
                chat_template=chat_template,
                tools=tools,
            )
        # Fallback template for tokenizers without one.
        text = ""
        for m in conversation:
            text += f"<|{m['role']}|>\n{m['content']}\n"
        if add_generation_prompt:
            text += "<|assistant|>\n"
        return text

    # NUL bytes never survive a tokenizer; safe split marker for image
    # placeholders inside the templated chat text.
    _MM_SENTINEL = "\x00<aphrodite-image>\x00"

    def _extract_images(self, messages):
        """Replace image_url / input_audio content parts with sentinel
        text parts; return (messages, media payloads)."""
        urls: List[str] = []
        out = []
        for m in messages:
            content = m.content
            if isinstance(content, list):
                parts = []
                for part in content:
                    if (isinstance(part, dict)
                            and part.get("type") == "image_url"):
                        iu = part.get("image_url")
                        urls.append(iu.get("url") if isinstance(iu, dict)
                                    else str(iu))
                        parts.append({"type": "text",
                                      "text": self._MM_SENTINEL})
                    elif (isinstance(part, dict)
                          and part.get("type") == "input_audio"):
                        # OpenAI audio content part: base64 WAV/PCM.
                        ia = part.get("input_audio") or {}
                        urls.append("audio:" + str(ia.get("data", "")))
                        parts.append({"type": "text",
                                      "text": self._MM_SENTINEL})
                    else:
                        parts.append(part)
                m = m.model_copy(update={"content": parts})
            out.append(m)
        return out, urls

    @staticmethod
    def _load_image(url: str, model) -> "np.ndarray":
        """Decode a base64 data URL into CLIP-preprocessed pixel_values
        [3, S, S] (resize shortest edge -> center crop -> normalize with
        the OpenAI-CLIP mean/std — reference multimodal/image.py via HF
        CLIPImageProcessor). Remote http(s) fetch is rejected: the server
        runs with zero egress."""
        import base64
        import io

        import numpy as np
        from PIL import Image

        if url.startswith("audio:"):
            return OpenAIServer._load_audio(url[len("audio:"):], model)
        if not url.startswith("data:"):
            raise ValueError(
                "only data: image URLs are supported (no remote fetch)")
        b64 = url.split(",", 1)[1]
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if hasattr(model, "prepare_server_image"):
            # Model-native preprocessing (Qwen2-VL patch grids, Pixtral
            # native-resolution) -> engine multimodal item.
            return model.prepare_server_image(img)
        s = model.v_image_size
        w, h = img.size
        scale = s / min(w, h)
        img = img.resize((max(s, round(w * scale)),
                          max(s, round(h * scale))), Image.BICUBIC)
        w, h = img.size
        left, top = (w - s) // 2, (h - s) // 2
        img = img.crop((left, top, left + s, top + s))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        arr = (arr - mean) / std
        return arr.transpose(2, 0, 1).astype(np.float32)

    @staticmethod
    def _load_audio(b64: str, model) -> "np.ndarray":
        """Decode a base64 WAV into whisper log-mel features matching
        the model's mel-bin count (audio-modality models: Ultravox,
        Qwen2-Audio). 16 kHz mono is assumed after WAV decoding."""
        import base64
        import io
        import wave

        import numpy as np

        raw = base64.b64decode(b64)
        with wave.open(io.BytesIO(raw)) as w:
            sr = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            ch = w.getnchannels()
            pcm = w.readframes(n)
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
        audio = np.frombuffer(pcm, dtype=dtype).astype(np.float32)
        audio /= float(np.iinfo(dtype).max)
        if ch > 1:
            audio = audio.reshape(-1, ch).mean(axis=1)
        from transformers import WhisperFeatureExtractor

        fe = WhisperFeatureExtractor(
            feature_size=getattr(model, "a_mels", 128), sampling_rate=sr)
        out = fe(audio, sampling_rate=sr, padding=False,
                 return_tensors="np")
        return out["input_features"][0].astype(np.float32)

    async def create_chat_completion(self,
                                     request: web.Request) -> web.Response:
        if self.engine is None:
            return _error("no model loaded", status=503,
                          err_type="service_unavailable")
        try:
            req = ChatCompletionRequest(**await request.json())
            messages, image_urls = self._extract_images(req.messages)
            prompt_text = self._apply_chat_template(
                messages, req.add_generation_prompt or True,
                req.chat_template, tools=req.tools)
        except Exception as e:
            return _error(str(e))
        model_name = req.model or self.served_model_names[0]

        mm_data = None
        if image_urls:
            model = self.async_engine.engine.runner.model
            if not getattr(model, "is_multimodal", False):
                return _error("this model does not accept image input")
            try:
                images = [self._load_image(u, model) for u in image_urls]
            except Exception as e:
                return _error(f"bad image: {e}")
            mm_data = {getattr(model, "modality", "image"): images}
            # Tokenize around the sentinels; each becomes ONE placeholder
            # token (the engine expands it to the per-image feature count).
            segs = prompt_text.split(self._MM_SENTINEL)
            prompt_ids = list(self.tokenizer.encode(segs[0]))
            for seg in segs[1:]:
                prompt_ids.append(model.image_token_index)
                prompt_ids.extend(
                    self.tokenizer.encode(seg, add_special_tokens=False))
            prompt_text = "".join(segs)
        else:
            prompt_ids = self.tokenizer.encode(prompt_text)
        eff_len = len(prompt_ids)
        if mm_data is not None:
            model = self.async_engine.engine.runner.model
            for im in images:
                if hasattr(model, "num_item_tokens"):
                    eff_len += model.num_item_tokens(im) - 1
                else:
                    eff_len += model.num_image_tokens - 1
        sp = req.to_sampling_params(
            self.model_config.max_model_len - eff_len)
        request_id = f"chatcmpl-{random_uuid()}"
        try:
            stream = await self.async_engine.add_request(
                request_id, prompt=prompt_text, sampling_params=sp,
                prompt_token_ids=prompt_ids,
                lora_request=await self._lora_for_model_name(req.model),
                multi_modal_data=mm_data,
                prompt_adapter_request=await self._soft_prompt_for_model_name(
                    req.model))
        except Exception as e:
            return _request_error(e)

        if req.stream:
            return await self._stream_chat(request, request_id, model_name,
                                           stream, sp)

        try:
            final = await self._collect(stream)
        except RequestFailedError as e:
            return _error(str(e))
        except Exception as e:
            return _error(str(e), status=500, err_type="internal_error")
        choices = []
        for i, comp in enumerate(final.outputs):
            content: Optional[str] = comp.text
            tool_calls = None
            finish = comp.finish_reason
            if req.tools:
                from aphrodite_tpu.endpoints.openai.tool_parsers import (
                    parse_tool_calls)

                content, calls = parse_tool_calls(comp.text)
                if calls:
                    tool_calls = calls
                    finish = "tool_calls"
            choices.append(
                ChatCompletionChoice(
                    index=i,
                    message=ChatCompletionResponseMessage(
                        content=content, tool_calls=tool_calls),
                    finish_reason=finish,
                    stop_reason=comp.stop_reason,
                ))
        usage = UsageInfo(
            prompt_tokens=len(prompt_ids),
            completion_tokens=sum(
                len(c.token_ids) for c in final.outputs),
        )
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        resp = ChatCompletionResponse(id=request_id, model=model_name,
                                      choices=choices, usage=usage)
        return web.json_response(resp.model_dump())

    async def _stream_chat(self, request, request_id, model_name, stream,
                           sp) -> web.StreamResponse:
        response = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await response.prepare(request)
        first = ChatCompletionStreamResponse(
            id=request_id, model=model_name,
            choices=[ChatCompletionStreamChoice(
                index=0, delta=DeltaMessage(role="assistant", content=""))])
        await response.write(
            f"data: {json.dumps(first.model_dump())}\n\n".encode())
        sent_len = [0] * (sp.n or 1)
        try:
            async for out in stream:
                if out.error:
                    await response.write(_sse_error(out.error))
                    break
                for ci, comp in enumerate(out.outputs):
                    delta = comp.text[sent_len[ci]:]
                    sent_len[ci] = len(comp.text)
                    if not delta and not comp.finish_reason:
                        continue
                    chunk = ChatCompletionStreamResponse(
                        id=request_id, model=model_name,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=ci,
                                delta=DeltaMessage(content=delta),
                                finish_reason=comp.finish_reason,
                            )
                        ])
                    await response.write(
                        f"data: {json.dumps(chunk.model_dump())}\n\n"
                        .encode())
            await response.write(b"data: [DONE]\n\n")
            await response.write_eof()
        except (ConnectionResetError, asyncio.CancelledError):
            await self.async_engine.abort(request_id)
            raise
        return response


async def run_server(engine_args: EngineArgs, host: str = "0.0.0.0",
                     port: int = DEFAULT_PORT,
                     served_model_names: Optional[List[str]] = None,
                     api_keys: Optional[List[str]] = None,
                     admin_key: Optional[str] = None,
                     engine_in_subprocess: Optional[bool] = None,
                     engine_replicas: int = 1,
                     warmup: bool = False) -> None:
    import os

    if admin_key is None:
        admin_key = os.environ.get("APHRODITE_ADMIN_KEY") or None
    engine_replicas = int(os.environ.get("APHRODITE_ENGINE_REPLICAS",
                                         engine_replicas))
    env_sub = os.environ.get("APHRODITE_ENGINE_SUBPROCESS")
    if env_sub is not None:
        engine_in_subprocess = env_sub == "1"
    if engine_in_subprocess is None:
        # DEFAULT: online serving isolates the engine in a child process
        # like the reference's spawned MQ engine (endpoints/openai/
        # api_server.py:127-190). Multi-host keeps the engine in-process:
        # the primary's step broadcasts ride the jax.distributed world
        # initialized in THIS process.
        from aphrodite_tpu.parallel import multihost

        engine_in_subprocess = not multihost.is_active()
    if engine_replicas > 1:
        # Data-parallel engine replicas: N independent engine processes
        # (own devices/KV/scheduler each) behind a least-loaded router;
        # a dead replica degrades capacity instead of killing serving.
        from aphrodite_tpu.engine.multiproc import DPAsyncEngine

        async_engine = DPAsyncEngine(engine_args, engine_replicas)
    elif engine_in_subprocess:
        # Fault isolation (reference MQAphroditeEngine + server/launch.py
        # keep-alive): the engine/XLA runtime lives in a child process;
        # if it dies the HTTP server stays up serving errors.
        from aphrodite_tpu.engine.multiproc import MPAsyncEngine

        async_engine = MPAsyncEngine.from_engine_args(engine_args)
    else:
        async_engine = AsyncAphrodite.from_engine_args(engine_args)
    if warmup:
        # Compile the bucket grid before opening the port (engine-side
        # via RPC for the subprocess/replica modes).
        if hasattr(async_engine, "utility"):
            await async_engine.utility("warmup")
        else:
            async_engine.engine.warmup()
    server = OpenAIServer(async_engine, served_model_names, api_keys,
                          engine_args=engine_args, admin_key=admin_key)
    app = server.build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    logger.info("aphrodite-tpu API server listening on %s:%d", host, port)
    while True:
        await asyncio.sleep(3600)
