"""aiohttp application: OpenAI + Anthropic compatible API.

Reference: crates/server/src/api/ (router mod.rs:894-952, streaming.rs
SSE writer, middleware.rs request-id/auth, chat.rs/completions.rs
handlers). Round-1 surface: health/version/models/metrics, tokenize/
detokenize, /v1/completions, /v1/chat/completions, /v1/messages
(Anthropic), pause/resume admin — streaming and non-streaming.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import time
import uuid
from typing import Any

from aiohttp import web
from pydantic import ValidationError

from .. import __version__
from ..engine.async_engine import AsyncLLMEngine
from ..request import FinishReason, SamplingParams
from .protocol import (
    AnthropicMessagesRequest,
    ChatCompletionRequest,
    CompletionRequest,
    chat_response,
    completion_response,
    usage_dict,
)

logger = logging.getLogger(__name__)

FINISH_MAP = {
    FinishReason.STOP: "stop",
    FinishReason.LENGTH: "length",
    FinishReason.ABORT: "abort",
    FinishReason.ERROR: "error",
}


def _error(status: int, message: str, err_type: str = "invalid_request_error"):
    return web.json_response(
        {"error": {"message": message, "type": err_type, "code": status}},
        status=status,
    )


class RateLimiter:
    """Global concurrency + requests-per-second limiter (reference
    api/middleware.rs global rate limiter). Token bucket for rate,
    counter for concurrency; 429 on either limit."""

    def __init__(self, max_concurrent: int = 0, rps: float = 0.0,
                 burst: int = 0):
        self.max_concurrent = max_concurrent  # 0 = unlimited
        self.rps = rps  # 0 = unlimited
        self.burst = burst or max(int(rps * 2), 1)
        self.tokens = float(self.burst)
        self.last = time.monotonic()
        self.inflight = 0

    def try_acquire(self) -> bool:
        if self.max_concurrent and self.inflight >= self.max_concurrent:
            return False
        if self.rps:
            now = time.monotonic()
            self.tokens = min(
                self.burst, self.tokens + (now - self.last) * self.rps
            )
            self.last = now
            if self.tokens < 1.0:
                return False
            self.tokens -= 1.0
        self.inflight += 1
        return True

    def release(self) -> None:
        self.inflight = max(0, self.inflight - 1)


@web.middleware
async def request_middleware(request: web.Request, handler):
    """Request-id + API-key auth + rate limit + uniform error envelope
    (reference: api/middleware.rs:27-290)."""
    request["request_id"] = request.headers.get(
        "x-request-id", f"rid-{uuid.uuid4().hex[:16]}"
    )
    cors = request.app.get("cors")
    if cors is not None and request.method == "OPTIONS":
        # CORS preflight (reference config.rs allowed_origins/methods/
        # headers + the axum CorsLayer it feeds)
        return web.Response(status=204, headers=_cors_headers(cors, request))
    if request.app.get("restarting") and not request.path.startswith(
        ("/health", "/ping", "/admin")
    ):
        # engine swap in flight: reject instead of queueing against a
        # dying engine (reference api/middleware.rs:208 restart rejection)
        return _error(503, "server is restarting", "unavailable_error")
    if request.app.get("draining") and not request.path.startswith(
        ("/health", "/ping", "/admin")
    ):
        # graceful shutdown in progress (reference shutdown.rs): stop
        # admitting, let in-flight requests finish
        return _error(503, "server is shutting down", "unavailable_error")
    limiter: RateLimiter | None = request.app.get("rate_limiter")
    limited = False
    if limiter is not None and request.path.startswith("/v1"):
        if not limiter.try_acquire():
            return _error(
                429, "rate limit exceeded, retry later", "rate_limit_error"
            )
        limited = True
    api_key = request.app.get("api_key")
    if api_key and request.path.startswith("/v1"):
        auth = request.headers.get("authorization", "")
        xkey = request.headers.get("x-api-key", "")
        if auth != f"Bearer {api_key}" and xkey != api_key:
            return _error(401, "invalid API key", "authentication_error")
    # one server span per request (reference logging.rs init_with_otlp:
    # the tracing layer wraps every handler; exported OTLP/HTTP JSON)
    from ..tracing import get_tracer

    span = get_tracer().start_span(
        f"{request.method} {request.path}",
        attributes={
            "http.method": request.method,
            "http.target": request.path,
            "request.id": request["request_id"],
        },
    )
    request["span"] = span
    try:
        resp = await handler(request)
    except ValidationError as e:
        get_tracer().finish(span, error=str(e))
        return _error(400, str(e))
    except web.HTTPException:
        get_tracer().finish(span, error="http exception")
        raise
    except (ValueError, FileNotFoundError, NotImplementedError) as e:
        get_tracer().finish(span, error=str(e))
        return _error(400, str(e))
    except Exception:
        logger.exception("handler error [%s]", request["request_id"])
        get_tracer().finish(span, error="internal server error")
        return _error(500, "internal server error", "internal_error")
    finally:
        if limited:
            limiter.release()
    span.attributes["http.status_code"] = resp.status
    get_tracer().finish(span)
    resp.headers.setdefault("x-request-id", request["request_id"])
    if cors is not None:
        resp.headers.update(_cors_headers(cors, request))
    return resp


def _cors_headers(cors: dict, request: web.Request) -> dict:
    origin = request.headers.get("origin", "")
    allowed = cors["origins"]
    allow = (
        "*"
        if allowed == "*"
        else (origin if origin in allowed.split(",") else "")
    )
    h = {
        "Access-Control-Allow-Methods": cors["methods"],
        "Access-Control-Allow-Headers": cors["headers"],
    }
    if allow:
        h["Access-Control-Allow-Origin"] = allow
    return h


class Server:
    def __init__(
        self,
        engine: AsyncLLMEngine,
        tokenizer,
        model_name: str = "model",
        api_key: str | None = None,
        tool_parser: str | None = None,
        reasoning_parser: str | None = None,
        encoder=None,
        response_role: str = "assistant",
        stream_interval: int = 1,
        stream_pacing: bool = True,
        max_logprobs: int = 20,
        return_tokens_as_token_ids: bool = False,
        enable_auto_tool_choice: bool = False,
    ):
        self.engine = engine
        self.encoder = encoder  # EncoderRunner for BERT-family serving
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.api_key = api_key
        self.response_role = response_role
        self.stream_interval = max(1, stream_interval)
        # pace ring-cycle bursts into per-token SSE deltas (engine/pacing.py)
        self.stream_pacing = stream_pacing
        self.max_logprobs = max_logprobs
        self.return_tokens_as_token_ids = return_tokens_as_token_ids
        self.enable_auto_tool_choice = enable_auto_tool_choice
        self.start_time = time.time()
        self.tool_parser = None
        self.reasoning_parser = None
        if tool_parser:
            from ..tool_parser import get_tool_parser

            self.tool_parser = get_tool_parser(tool_parser)
        if reasoning_parser:
            from ..reasoning import get_reasoning_parser

            self.reasoning_parser = get_reasoning_parser(reasoning_parser)

    # -- basic ----------------------------------------------------------------

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def ping(self, request):
        return web.json_response({})

    async def version(self, request):
        return web.json_response({"version": __version__})

    async def models(self, request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_name,
                        "object": "model",
                        "created": int(self.start_time),
                        "owned_by": "vllm_rust_tpu",
                    }
                ],
            }
        )

    async def server_info(self, request):
        return web.json_response(
            {
                "version": __version__,
                "model": self.model_name,
                "uptime_s": time.time() - self.start_time,
                "stats": self.engine.get_stats() if self.engine else {},
            }
        )

    async def metrics(self, request):
        """Prometheus text exposition: full counter/gauge/histogram
        registry (reference api/admin/prometheus.rs:15-196 inventory +
        api/mod.rs:829-897 encoder) plus raw engine stats as vllm_tpu_*
        gauges."""
        from .. import metrics as M

        s = self.engine.get_stats() if self.engine else {}
        M.refresh_engine_gauges(s, start_time=self.start_time)
        M.SERVER_ACCEPTING.set(
            0 if (self.engine and self.engine.is_paused) else 1
        )
        lines = [M.REGISTRY.render().rstrip("\n")]
        for k, v in s.items():
            name = f"vllm_tpu_{k}"
            lines.append(f"# TYPE {name} gauge")
            lines.append(f"{name} {v}")
        return web.Response(
            text="\n".join(lines) + "\n", content_type="text/plain"
        )

    async def tokenize(self, request):
        body = await request.json()
        ids = self.tokenizer.encode(
            body.get("prompt", body.get("text", "")),
            add_special_tokens=body.get("add_special_tokens", True),
        )
        return web.json_response({"tokens": ids, "count": len(ids)})

    async def detokenize(self, request):
        body = await request.json()
        text = self.tokenizer.decode(body.get("tokens", []))
        return web.json_response({"prompt": text, "text": text})

    async def pause(self, request):
        self.engine.pause()
        return web.json_response({"status": "paused"})

    async def resume(self, request):
        self.engine.resume()
        return web.json_response({"status": "running"})

    async def is_paused(self, request):
        return web.json_response({"paused": self.engine.is_paused})

    # -- LoRA hot-load (reference api/mod.rs:934-936) --------------------------

    async def load_lora(self, request):
        body = await request.json()
        name = body.get("lora_name")
        path = body.get("lora_path")
        if not name or not path:
            return _error(400, "lora_name and lora_path are required")
        eng = self.engine.engine
        mgr = eng.enable_lora()
        slot = mgr.load(name, path)
        return web.json_response({"status": "ok", "name": name, "slot": slot})

    async def unload_lora(self, request):
        body = await request.json()
        name = body.get("lora_name")
        eng = self.engine.engine
        if eng.lora is None:
            return _error(400, "LoRA is not enabled")
        eng.lora.unload(name)
        return web.json_response({"status": "ok"})

    async def list_lora(self, request):
        eng = self.engine.engine
        return web.json_response(
            {"adapters": eng.lora.list() if eng.lora else []}
        )

    # -- logprobs payloads -----------------------------------------------------

    def _tok_str(self, tid: int) -> str:
        if self.return_tokens_as_token_ids:
            # --return-tokens-as-token-ids: unambiguous token identity in
            # logprobs payloads (reference config.rs:307)
            return f"token_id:{tid}"
        try:
            return self.tokenizer.decode([tid])
        except Exception:
            return f"<{tid}>"

    def _completion_logprobs(self, seq, out, echo: bool) -> dict | None:
        """Legacy completions logprobs block (reference
        api/completions.rs logprobs payload): tokens / token_logprobs /
        top_logprobs / text_offset, optionally echoing the prompt."""
        if seq is None or seq.params.logprobs is None:
            return None
        tokens: list[str] = []
        token_lps: list[float | None] = []
        tops: list[dict | None] = []
        if echo and seq.prompt_logprobs_acc is not None:
            plps = seq.prompt_logprobs_acc
            for i, tid in enumerate(seq.prompt_token_ids):
                tokens.append(self._tok_str(tid))
                token_lps.append(plps[i] if i < len(plps) else None)
                tops.append(None)
        gen_lps = seq.logprobs_acc or []
        gen_tops = seq.top_logprobs_acc or []
        for i, tid in enumerate(out.token_ids):
            tokens.append(self._tok_str(tid))
            token_lps.append(gen_lps[i] if i < len(gen_lps) else None)
            cand = gen_tops[i] if i < len(gen_tops) else None
            tops.append(
                {self._tok_str(t): lp for t, lp in cand} if cand else None
            )
        offsets = []
        off = 0
        for t in tokens:
            offsets.append(off)
            off += len(t)
        return {
            "tokens": tokens,
            "token_logprobs": token_lps,
            "top_logprobs": tops,
            "text_offset": offsets,
        }

    def _chat_logprobs(self, seq, out) -> dict | None:
        """Chat-style logprobs block: content list of token entries."""
        if seq is None or seq.params.logprobs is None:
            return None
        gen_lps = seq.logprobs_acc or []
        gen_tops = seq.top_logprobs_acc or []
        content = []
        for i, tid in enumerate(out.token_ids):
            text = self._tok_str(tid)
            entry = {
                "token": text,
                "logprob": gen_lps[i] if i < len(gen_lps) else None,
                "bytes": list(text.encode("utf-8")),
            }
            cand = gen_tops[i] if i < len(gen_tops) else None
            entry["top_logprobs"] = [
                {
                    "token": self._tok_str(t),
                    "logprob": lp,
                    "bytes": list(self._tok_str(t).encode("utf-8")),
                }
                for t, lp in (cand or [])
            ]
            content.append(entry)
        return {"content": content}

    # -- completions -----------------------------------------------------------

    async def completions(self, request):
        if self.engine is None:
            return _error(400, "this server is running an encoder model (embeddings/score/rerank only)")
        req = CompletionRequest(**await request.json())
        prompts = req.prompt
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        if len(prompts) != 1 and req.stream:
            return _error(400, "streaming supports a single prompt")
        params = req.sampling_params()
        if params.top_logprobs is not None:
            # --max-logprobs server-side cap (reference config.rs:268)
            params.top_logprobs = min(params.top_logprobs, self.max_logprobs)
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"

        if req.stream:
            return await self._stream_completion(request, rid, prompts[0], req, params)

        choices = []
        prompt_tokens = 0
        completion_tokens = 0
        for i, prompt in enumerate(prompts):
            out = await self.engine.generate(prompt, params, f"{rid}-{i}")
            seq = self.engine.engine.requests.get(f"{rid}-{i}")
            n_prompt = seq.num_prompt_tokens if seq else 0
            text = out.output_text
            if req.echo and isinstance(prompt, str):
                text = prompt + text
            choices.append(
                {
                    "index": i,
                    "text": text,
                    "finish_reason": FINISH_MAP.get(out.finish_reason, "stop"),
                    "logprobs": self._completion_logprobs(seq, out, req.echo),
                }
            )
            prompt_tokens += n_prompt
            completion_tokens += len(out.token_ids)
        return web.json_response(
            completion_response(
                rid,
                req.model or self.model_name,
                choices,
                usage_dict(prompt_tokens, completion_tokens),
            )
        )

    async def _stream_completion(self, request, rid, prompt, req, params):
        resp = await self._sse_response(request)
        n_tokens = 0
        buf = ""  # --stream-interval: coalesce N tokens per SSE chunk
        async for out in self.engine.generate_stream(
            prompt, params, rid, paced=self.stream_pacing
        ):
            n_tokens += 1
            buf += out.new_text
            if not out.finished and n_tokens % self.stream_interval:
                continue
            chunk = {
                "id": rid,
                "object": "text_completion",
                "created": int(time.time()),
                "model": req.model or self.model_name,
                "choices": [
                    {
                        "index": 0,
                        "text": buf,
                        "finish_reason": FINISH_MAP.get(out.finish_reason)
                        if out.finished
                        else None,
                    }
                ],
            }
            buf = ""
            await self._sse_send(resp, chunk)
        if req.stream_options and req.stream_options.get("include_usage"):
            seq = self.engine.engine.requests.get(rid)
            await self._sse_send(
                resp,
                {
                    "id": rid,
                    "object": "text_completion",
                    "choices": [],
                    "usage": usage_dict(
                        seq.num_prompt_tokens if seq else 0, n_tokens
                    ),
                },
            )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # -- chat ------------------------------------------------------------------

    def _extract_images(self, req) -> tuple[list[str], list[list[str]]]:
        """Pull image/video parts out of chat messages (base64 data URLs
        only — zero-egress environment), replacing each with the image
        placeholder so the template/tokenizer sees one image token.
        Videos arrive as {"type": "video", "frames": [data-url, ...]} or
        {"type": "video_url", "video_url": {"frames": [...]}}.
        Reference: multimodal/processor.rs process_content + video.rs."""
        images: list[str] = []
        videos: list[list[str]] = []
        for m in req.messages:
            c = m.content
            if not isinstance(c, list):
                continue
            texts = []
            for part in c:
                t = part.get("type")
                if t in ("video", "video_url", "input_video"):
                    v = (part.get("video_url") or part.get("video")
                         or part)
                    frames = v.get("frames") if isinstance(v, dict) else None
                    if not frames:
                        raise ValueError(
                            "video parts must carry a 'frames' list of "
                            "base64 data-URL images (no codec decoding in "
                            "this zero-egress deployment)"
                        )
                    videos.append(list(frames))
                    texts.append("<image>")
                elif t in ("image_url", "input_image", "image"):
                    url = part.get("image_url") or part.get("image") or part.get("data")
                    if isinstance(url, dict):
                        url = url.get("url")
                    if not isinstance(url, str) or not url.startswith("data:"):
                        raise ValueError(
                            "only base64 data-URL images are supported "
                            "(this deployment has no network egress)"
                        )
                    images.append(url)
                    texts.append("<image>")
                elif t == "text":
                    texts.append(part.get("text", ""))
            m.content = "".join(texts)
        return images, videos

    def _apply_chat_template(self, req: ChatCompletionRequest) -> str:
        messages = [m.model_dump(exclude_none=True) for m in req.messages]
        return self.tokenizer.apply_chat_template(
            messages,
            tools=req.tools,
            add_generation_prompt=True,
            chat_template=req.chat_template,
            **req.chat_template_kwargs,
        )

    async def chat_completions(self, request):
        if self.engine is None:
            return _error(400, "this server is running an encoder model (embeddings/score/rerank only)")
        req = ChatCompletionRequest(**await request.json())
        images, videos = self._extract_images(req)
        if videos and images:
            return _error(400, "mixing image and video parts is unsupported")
        video = videos[0] if videos else None
        prompt = self._apply_chat_template(req)
        params = req.sampling_params()
        if params.top_logprobs is not None:
            # --max-logprobs server-side cap (reference config.rs:268)
            params.top_logprobs = min(params.top_logprobs, self.max_logprobs)
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"

        if req.stream:
            return await self._stream_chat(
                request, rid, prompt, req, params, images=images,
                video=video,
            )

        out = await self.engine.generate(
            prompt, params, rid, images=images, video=video
        )
        seq = self.engine.engine.requests.get(rid)
        content = out.output_text
        message: dict[str, Any] = {"role": self.response_role, "content": content}
        finish = FINISH_MAP.get(out.finish_reason, "stop")
        if self.reasoning_parser is not None:
            reasoning, content = self.reasoning_parser.parse(content)
            message["content"] = content
            if reasoning:
                message["reasoning_content"] = reasoning
        if self.tool_parser is not None and req.tools:
            content2, calls = self.tool_parser(message["content"] or "")
            if calls:
                message["content"] = content2 or None
                message["tool_calls"] = [c.to_openai() for c in calls]
                finish = "tool_calls"
        choices = [
            {
                "index": 0,
                "message": message,
                "finish_reason": finish,
                "logprobs": self._chat_logprobs(seq, out),
            }
        ]
        return web.json_response(
            chat_response(
                rid,
                req.model or self.model_name,
                choices,
                usage_dict(
                    seq.num_prompt_tokens if seq else 0, len(out.token_ids)
                ),
            )
        )

    async def _stream_chat(self, request, rid, prompt, req, params,
                           images=None, video=None):
        resp = await self._sse_response(request)
        created = int(time.time())
        model = req.model or self.model_name
        first = {
            "id": rid,
            "object": "chat.completion.chunk",
            "created": created,
            "model": model,
            "choices": [
                {
                    "index": 0,
                    "delta": {"role": self.response_role, "content": ""},
                    "finish_reason": None,
                }
            ],
        }
        await self._sse_send(resp, first)

        # incremental parsers (reference api/streaming.rs tool-call /
        # reasoning stream deltas): reasoning splits the raw stream;
        # its content channel feeds the tool-call streamer
        reason_stream = tool_stream = None
        if self.reasoning_parser is not None:
            from ..tool_parser.streaming import StreamingReasoningParser

            reason_stream = StreamingReasoningParser(self.reasoning_parser)
        if self.tool_parser is not None and req.tools:
            from ..tool_parser.streaming import StreamingToolParser

            tool_stream = StreamingToolParser(self.tool_parser)

        def process(new_text: str, final: bool) -> list[dict]:
            """raw text delta -> OpenAI chat deltas."""
            if reason_stream is None and tool_stream is None:
                return [{"content": new_text}] if new_text else []
            deltas: list[dict] = []
            if reason_stream is not None:
                parts = (
                    reason_stream.push(new_text)
                    if not final
                    else reason_stream.finish()
                )
            else:
                parts = [{"content": new_text}] if new_text else []
                if final:
                    parts = parts or [{"content": ""}]
            for part in parts:
                if "reasoning_content" in part:
                    deltas.append(part)
                else:
                    c = part.get("content", "")
                    if tool_stream is not None:
                        deltas.extend(tool_stream.push(c))
                    elif c:
                        deltas.append({"content": c})
            if final and tool_stream is not None:
                deltas.extend(tool_stream.finish())
            return deltas

        async def send(delta: dict, finish: str | None):
            await self._sse_send(
                resp,
                {
                    "id": rid,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model,
                    "choices": [
                        {"index": 0, "delta": delta, "finish_reason": finish}
                    ],
                },
            )

        n_tokens = 0
        finish_reason = None
        buf = ""  # --stream-interval: feed the parsers every N tokens
        async for out in self.engine.generate_stream(
            prompt, params, rid, images=images, video=video,
            paced=self.stream_pacing,
        ):
            n_tokens += 1
            buf += out.new_text or ""
            if out.finished:
                finish_reason = FINISH_MAP.get(out.finish_reason)
            elif n_tokens % self.stream_interval:
                continue
            for delta in process(buf, final=False):
                await send(delta, None)
            buf = ""
        if buf:
            for delta in process(buf, final=False):
                await send(delta, None)
        # flush held-back text / trailing call arguments
        for delta in process("", final=True):
            await send(delta, None)
        if tool_stream is not None and tool_stream.has_calls:
            finish_reason = "tool_calls"
        await send({}, finish_reason or "stop")
        if req.stream_options and req.stream_options.get("include_usage"):
            seq = self.engine.engine.requests.get(rid)
            await self._sse_send(
                resp,
                {
                    "id": rid,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model,
                    "choices": [],
                    "usage": usage_dict(
                        seq.num_prompt_tokens if seq else 0, n_tokens
                    ),
                },
            )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    # -- embeddings ------------------------------------------------------------

    async def embeddings(self, request):
        from .protocol import EmbeddingRequest

        req = EmbeddingRequest(**await request.json())
        inputs = req.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        if self.encoder is not None:
            embs = await self._run_encoder(self.encoder.embed, inputs)
        else:
            embs = await self.engine.embed(inputs)
        prompt_tokens = sum(
            len(self.tokenizer.encode(x)) if isinstance(x, str) else len(x)
            for x in inputs
        )
        data = []
        for i, e in enumerate(embs):
            vec = e.tolist()
            if req.dimensions:
                vec = vec[: req.dimensions]
            if req.encoding_format == "base64":
                import base64

                import numpy as np

                vec = base64.b64encode(
                    np.asarray(vec, np.float32).tobytes()
                ).decode()
            data.append({"object": "embedding", "index": i, "embedding": vec})
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": req.model or self.model_name,
                "usage": usage_dict(prompt_tokens, 0),
            }
        )

    # -- score / rerank / classify / pooling ------------------------------------
    # Reference: crates/server/src/api/embeddings.rs score/rerank/pooling/
    # classify routes (api/mod.rs:894-952). Cross-encoder models use the
    # classification head; decoder/embedding models fall back to cosine
    # similarity of pooled embeddings.

    async def _run_encoder(self, fn, *args, **kw):
        loop = asyncio.get_event_loop()
        import functools

        return await loop.run_in_executor(
            None, functools.partial(fn, *args, **kw)
        )

    async def _embed_any(self, inputs):
        if self.encoder is not None:
            return await self._run_encoder(self.encoder.embed, inputs)
        return await self.engine.embed(inputs)

    async def score(self, request):
        import numpy as np

        body = await request.json()
        t1 = body.get("text_1", body.get("query"))
        t2 = body.get("text_2", body.get("texts", body.get("documents")))
        if t1 is None or t2 is None:
            return _error(400, "text_1 and text_2 are required")
        l1 = t1 if isinstance(t1, list) else [t1]
        l2 = t2 if isinstance(t2, list) else [t2]
        if len(l1) == 1 and len(l2) > 1:
            l1 = l1 * len(l2)
        if len(l1) != len(l2):
            return _error(400, "text_1/text_2 length mismatch")
        pairs = list(zip(l1, l2))
        if self.encoder is not None:
            scores = await self._run_encoder(self.encoder.score, pairs)
        else:
            ea = await self._embed_any(l1)
            eb = await self._embed_any(l2)
            scores = (np.asarray(ea) * np.asarray(eb)).sum(-1)
        data = [
            {"index": i, "object": "score", "score": float(s)}
            for i, s in enumerate(scores)
        ]
        return web.json_response(
            {
                "id": f"score-{uuid.uuid4().hex[:16]}",
                "object": "list",
                "model": body.get("model") or self.model_name,
                "data": data,
                "usage": usage_dict(0, 0),
            }
        )

    async def rerank(self, request):
        import numpy as np

        body = await request.json()
        query = body.get("query")
        documents = body.get("documents", [])
        if query is None or not documents:
            return _error(400, "query and documents are required")
        top_n = body.get("top_n", len(documents))
        if self.encoder is not None:
            ranked = await self._run_encoder(
                self.encoder.rerank, query, documents
            )
        else:
            qe = await self._embed_any([query])
            de = await self._embed_any(documents)
            scores = (np.asarray(de) @ np.asarray(qe)[0])
            order = np.argsort(-scores)
            ranked = [
                {"index": int(k), "relevance_score": float(scores[k]),
                 "document": documents[k]}
                for k in order
            ]
        results = [
            {
                "index": r["index"],
                "relevance_score": r["relevance_score"],
                "document": {"text": r["document"]}
                if isinstance(r["document"], str)
                else r["document"],
            }
            for r in ranked[:top_n]
        ]
        return web.json_response(
            {
                "id": f"rerank-{uuid.uuid4().hex[:16]}",
                "model": body.get("model") or self.model_name,
                "results": results,
                "usage": usage_dict(0, 0),
            }
        )

    async def classify(self, request):
        body = await request.json()
        if self.encoder is None:
            return _error(400, "classify requires a classification model")
        inputs = body.get("input", [])
        if isinstance(inputs, str):
            inputs = [inputs]
        probs = await self._run_encoder(self.encoder.classify, inputs)
        id2label = self.encoder.model.config.extra.get("id2label") or {}
        data = []
        for i, row in enumerate(probs):
            best = int(row.argmax())
            data.append(
                {
                    "index": i,
                    "label": id2label.get(str(best), str(best)),
                    "probs": [float(x) for x in row],
                    "num_classes": len(row),
                }
            )
        return web.json_response(
            {
                "id": f"classify-{uuid.uuid4().hex[:16]}",
                "object": "list",
                "model": body.get("model") or self.model_name,
                "data": data,
                "usage": usage_dict(0, 0),
            }
        )

    async def pooling(self, request):
        body = await request.json()
        inputs = body.get("input", [])
        if isinstance(inputs, str):
            inputs = [inputs]
        pooling = body.get("pooling", "mean")
        if self.encoder is not None:
            embs = await self._run_encoder(
                self.encoder.embed, inputs, pooling=pooling, normalize=False
            )
        else:
            embs = await self.engine.embed(
                inputs, pooling=pooling, normalize=False
            )
        data = [
            {"object": "pooling", "index": i, "data": e.tolist()}
            for i, e in enumerate(embs)
        ]
        return web.json_response(
            {
                "id": f"pool-{uuid.uuid4().hex[:16]}",
                "object": "list",
                "model": body.get("model") or self.model_name,
                "data": data,
                "usage": usage_dict(0, 0),
            }
        )

    # -- anthropic -------------------------------------------------------------

    async def anthropic_messages(self, request):
        if self.engine is None:
            return _error(400, "this server is running an encoder model (embeddings/score/rerank only)")
        req = AnthropicMessagesRequest(**await request.json())
        prompt = self.tokenizer.apply_chat_template(
            req.to_chat_messages(), add_generation_prompt=True
        )
        params = req.sampling_params()
        if params.top_logprobs is not None:
            # --max-logprobs server-side cap (reference config.rs:268)
            params.top_logprobs = min(params.top_logprobs, self.max_logprobs)
        rid = f"msg_{uuid.uuid4().hex[:24]}"

        if req.stream:
            return await self._stream_anthropic(request, rid, prompt, req, params)

        out = await self.engine.generate(prompt, params, rid)
        seq = self.engine.engine.requests.get(rid)
        stop_reason = "end_turn"
        if out.finish_reason == FinishReason.LENGTH:
            stop_reason = "max_tokens"
        elif isinstance(out.stop_reason, str):
            stop_reason = "stop_sequence"
        return web.json_response(
            {
                "id": rid,
                "type": "message",
                "role": "assistant",
                "model": req.model or self.model_name,
                "content": [{"type": "text", "text": out.output_text}],
                "stop_reason": stop_reason,
                "stop_sequence": out.stop_reason
                if isinstance(out.stop_reason, str)
                else None,
                "usage": {
                    "input_tokens": seq.num_prompt_tokens if seq else 0,
                    "output_tokens": len(out.token_ids),
                },
            }
        )

    async def _stream_anthropic(self, request, rid, prompt, req, params):
        resp = await self._sse_response(request)

        async def event(name: str, data: dict):
            payload = f"event: {name}\ndata: {json.dumps(data)}\n\n"
            await resp.write(payload.encode())

        await event(
            "message_start",
            {
                "type": "message_start",
                "message": {
                    "id": rid,
                    "type": "message",
                    "role": "assistant",
                    "model": req.model or self.model_name,
                    "content": [],
                    "usage": {"input_tokens": 0, "output_tokens": 0},
                },
            },
        )
        await event(
            "content_block_start",
            {
                "type": "content_block_start",
                "index": 0,
                "content_block": {"type": "text", "text": ""},
            },
        )
        n = 0
        last = None
        async for out in self.engine.generate_stream(
            prompt, params, rid, paced=self.stream_pacing
        ):
            n += 1
            last = out
            if out.new_text:
                await event(
                    "content_block_delta",
                    {
                        "type": "content_block_delta",
                        "index": 0,
                        "delta": {"type": "text_delta", "text": out.new_text},
                    },
                )
        await event("content_block_stop", {"type": "content_block_stop", "index": 0})
        stop_reason = "end_turn"
        if last and last.finish_reason == FinishReason.LENGTH:
            stop_reason = "max_tokens"
        await event(
            "message_delta",
            {
                "type": "message_delta",
                "delta": {"stop_reason": stop_reason, "stop_sequence": None},
                "usage": {"output_tokens": n},
            },
        )
        await event("message_stop", {"type": "message_stop"})
        await resp.write_eof()
        return resp

    # -- sse helpers -----------------------------------------------------------

    async def _sse_response(self, request) -> web.StreamResponse:
        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            },
        )
        await resp.prepare(request)
        return resp

    async def _sse_send(self, resp, data: dict) -> None:
        await resp.write(f"data: {json.dumps(data)}\n\n".encode())


def build_app(
    engine: AsyncLLMEngine,
    tokenizer,
    model_name: str = "model",
    api_key: str | None = None,
    tool_parser: str | None = None,
    reasoning_parser: str | None = None,
    encoder=None,
    engine_factory=None,
    max_concurrent_requests: int = 0,
    requests_per_second: float = 0.0,
    response_role: str = "assistant",
    stream_interval: int = 1,
    stream_pacing: bool = True,
    max_logprobs: int = 20,
    return_tokens_as_token_ids: bool = False,
    enable_auto_tool_choice: bool = False,
    cors_origins: str | None = None,
    cors_methods: str = "GET,POST,OPTIONS",
    cors_headers: str = "*",
) -> web.Application:
    s = Server(
        engine,
        tokenizer,
        model_name,
        api_key,
        tool_parser=tool_parser,
        reasoning_parser=reasoning_parser,
        encoder=encoder,
        response_role=response_role,
        stream_interval=stream_interval,
        stream_pacing=stream_pacing,
        max_logprobs=max_logprobs,
        return_tokens_as_token_ids=return_tokens_as_token_ids,
        enable_auto_tool_choice=enable_auto_tool_choice,
    )
    app = web.Application(middlewares=[request_middleware])
    app["api_key"] = api_key
    if cors_origins:
        app["cors"] = {
            "origins": cors_origins,
            "methods": cors_methods,
            "headers": cors_headers,
        }
    app["server"] = s
    app["engine_factory"] = engine_factory
    app["restarting"] = False
    app["draining"] = False
    if max_concurrent_requests or requests_per_second:
        app["rate_limiter"] = RateLimiter(
            max_concurrent_requests, requests_per_second
        )
    app.add_routes(
        [
            web.get("/health", s.health),
            web.get("/ping", s.ping),
            web.post("/ping", s.ping),
            web.get("/version", s.version),
            web.get("/v1/models", s.models),
            web.get("/server_info", s.server_info),
            web.get("/metrics", s.metrics),
            web.post("/tokenize", s.tokenize),
            web.post("/detokenize", s.detokenize),
            web.post("/pause", s.pause),
            web.post("/sleep", s.pause),
            web.post("/resume", s.resume),
            web.post("/wake_up", s.resume),
            web.get("/is_paused", s.is_paused),
            web.get("/is_sleeping", s.is_paused),
            web.post("/v1/completions", s.completions),
            web.post("/v1/embeddings", s.embeddings),
            web.post("/score", s.score),
            web.post("/v1/score", s.score),
            web.post("/rerank", s.rerank),
            web.post("/v1/rerank", s.rerank),
            web.post("/v2/rerank", s.rerank),
            web.post("/classify", s.classify),
            web.post("/v1/classify", s.classify),
            web.post("/pooling", s.pooling),
            web.post("/v1/pooling", s.pooling),
            web.post("/v1/chat/completions", s.chat_completions),
            web.post("/v1/messages", s.anthropic_messages),
            web.post("/v1/load_lora_adapter", s.load_lora),
            web.post("/v1/unload_lora_adapter", s.unload_lora),
            web.get("/v1/lora_adapters", s.list_lora),
        ]
    )
    from .admin_api import add_admin_routes
    from .audio_api import add_audio_routes
    from .extra_apis import add_extra_routes

    add_extra_routes(app, s)
    add_audio_routes(app)
    add_admin_routes(app)
    from .admin_spa import add_spa_route

    add_spa_route(app)
    return app


def run_server(args=None) -> None:
    """CLI entry: python -m vllm_rust_tpu.server --model <path> [...]"""
    import argparse

    parser = argparse.ArgumentParser(
        description="vllm_rust_tpu OpenAI server",
        # flag inventory mirrors reference crates/server/src/config.rs
        # (model/KV/scheduler/parallel/LoRA/spec/serving/observability)
    )
    g = parser.add_argument_group("network")
    g.add_argument("--host", default="0.0.0.0")
    g.add_argument("--port", type=int, default=8000)
    g.add_argument("--api-key", default=None)
    g.add_argument("--ssl-certfile", default=None)
    g.add_argument("--ssl-keyfile", default=None)
    g.add_argument("--allowed-origins", default=None,
                   help="comma-separated CORS origins (or *)")
    g.add_argument("--allowed-methods", default="GET,POST,OPTIONS")
    g.add_argument("--allowed-headers", default="*")

    g = parser.add_argument_group("model")
    g.add_argument("--model", required=True)
    g.add_argument("--tokenizer", default=None,
                   help="path to tokenizer dir if different from --model")
    g.add_argument("--tokenizer-mode", default="auto",
                   choices=["auto", "slow", "mistral"])
    g.add_argument("--dtype", default="auto",
                   choices=["auto", "bfloat16", "float32", "float16"])
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--quantization", "-q", default=None,
                   help="override checkpoint quant detection "
                        "(awq/gptq/fp8/exl3/experts_int8/moe_wna16/...)")
    g.add_argument("--max-model-len", type=int, default=None)
    g.add_argument("--served-model-name", default=None)
    g.add_argument("--dummy-weights", action="store_true")
    g.add_argument("--load-format", default="auto",
                   choices=["auto", "safetensors", "gguf", "dummy"])
    # accepted for CLI compatibility; no effect in this zero-egress,
    # local-checkpoint deployment (documented no-ops, warned below)
    g.add_argument("--revision", default=None)
    g.add_argument("--tokenizer-revision", default=None)
    g.add_argument("--code-revision", default=None)
    g.add_argument("--trust-remote-code", action="store_true")
    g.add_argument("--download-dir", default=None)
    g.add_argument("--max-parallel-loading-workers", type=int, default=None)

    g = parser.add_argument_group("kv-cache")
    g.add_argument("--block-size", "--page-size", type=int, default=16,
                   dest="block_size")
    g.add_argument("--num-gpu-blocks-override", "--num-pages", type=int,
                   default=None, dest="num_pages")
    g.add_argument("--kv-cache-dtype", default="auto")
    g.add_argument("--gpu-memory-utilization", "--hbm-memory-utilization",
                   type=float, default=None, dest="memory_utilization",
                   help="fraction of HBM for weights+KV (profiled sizing "
                        "scales its budget by this)")
    g.add_argument("--swap-space", type=float, default=4.0,
                   help="CPU offload budget per preempted-KV swap, GiB")
    g.add_argument("--cpu-offload-gb", type=float, default=None,
                   help="alias of --swap-space")
    g.add_argument("--enable-prefix-caching", action="store_true")

    g = parser.add_argument_group("scheduler")
    g.add_argument("--max-num-seqs", "--max-requests", type=int, default=64,
                   dest="max_num_seqs")
    g.add_argument("--max-num-batched-tokens", "--max-tokens-per-step",
                   type=int, default=2048, dest="max_num_batched_tokens")
    g.add_argument("--enable-chunked-prefill", action="store_true",
                   default=True)
    g.add_argument("--no-enable-chunked-prefill", action="store_false",
                   dest="enable_chunked_prefill")
    g.add_argument("--max-num-partial-prefills", type=int, default=1)
    g.add_argument("--scheduling-policy", default="fcfs",
                   choices=["fcfs", "priority"])
    g.add_argument("--preemption-mode", default="recompute",
                   choices=["recompute", "swap"])

    g = parser.add_argument_group("parallel")
    g.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    g.add_argument("--data-parallel-size", "-dp", type=int, default=1)
    g.add_argument("--pipeline-parallel-size", "-pp", type=int, default=1)
    g.add_argument("--decode-context-parallel-size", "-dcp", type=int,
                   default=1,
                   help="KV pages striped over an 'sp' mesh axis with "
                   "per-rank local attention + LSE merge (reference "
                   "context_parallel.rs; long-context decode)")
    g.add_argument("--distributed-coordinator-address", default=None,
                   help="host:port of process 0 for multi-host (DCN) "
                        "serving; all hosts run the same command")
    g.add_argument("--num-hosts", type=int, default=None)
    g.add_argument("--host-rank", type=int, default=None)

    g = parser.add_argument_group("lora")
    g.add_argument("--enable-lora", action="store_true")
    g.add_argument("--max-loras", type=int, default=8)
    g.add_argument("--max-lora-rank", type=int, default=16)
    g.add_argument("--lora-adapter", action="append", default=[],
                   metavar="NAME=PATH", help="pre-load an adapter at boot")

    g = parser.add_argument_group("speculative")
    g.add_argument("--speculative-method", default=None)
    g.add_argument("--draft-model", default=None)
    g.add_argument("--num-speculative-tokens", "--num-draft-tokens",
                   type=int, default=4, dest="num_draft_tokens")
    g.add_argument("--spec-decoding-acceptance-method", default="sample",
                   choices=["sample", "typical"])
    g.add_argument("--ngram-prompt-lookup-min", type=int, default=1)
    g.add_argument("--ngram-prompt-lookup-max", type=int, default=4)

    g = parser.add_argument_group("serving")
    g.add_argument("--tool-call-parser", default=None)
    g.add_argument("--reasoning-parser", default=None)
    g.add_argument("--enable-auto-tool-choice", action="store_true")
    g.add_argument("--chat-template", default=None,
                   help="path to a jinja2 chat template overriding the "
                        "tokenizer's")
    g.add_argument("--response-role", default="assistant")
    g.add_argument("--no-stream-pacing", action="store_true",
                   help="disable per-token pacing of ring-cycle SSE bursts")
    g.add_argument("--stream-interval", type=int, default=1,
                   help="emit one SSE chunk per N generated tokens")
    g.add_argument("--max-logprobs", type=int, default=20)
    g.add_argument("--return-tokens-as-token-ids", action="store_true")
    g.add_argument(
        "--task", default="auto", choices=["auto", "generate", "embed"],
        help="auto sniffs encoder archs (BERT/RoBERTa) and serves the "
             "embeddings/score/rerank/classify surface",
    )
    g.add_argument(
        "--max-concurrent-requests", "--max-queue-depth", type=int,
        default=0, dest="max_concurrent_requests",
        help="global in-flight /v1 request cap (0 = unlimited)",
    )
    g.add_argument(
        "--requests-per-second", "--max-requests-per-second", type=float,
        default=0.0, dest="requests_per_second",
        help="global /v1 request rate limit (0 = unlimited)",
    )
    g.add_argument(
        "--shutdown-timeout", type=float, default=30.0,
        help="graceful-shutdown drain timeout in seconds",
    )

    g = parser.add_argument_group("observability")
    g.add_argument("--otlp-traces-endpoint", default=None,
                   help="OTLP/HTTP collector base URL, e.g. "
                        "http://localhost:4318")
    g.add_argument("--log-level", default="info",
                   choices=["debug", "info", "warning", "error"])
    g.add_argument("--disable-log-stats", action="store_true")
    g.add_argument("--disable-log-requests", action="store_true")

    g = parser.add_argument_group("engine")
    g.add_argument("--fetch-interval", "--multi-step-count", type=int,
                   default=4, dest="fetch_interval",
                   help="steps per token-ring cycle (0 = auto: rotate "
                   "on the itl-budget deadline or any latency signal)")
    g.add_argument("--ring-buffers", type=int, default=0,
                   dest="ring_buffers",
                   help="token-ring pool size (0 = auto): the host may "
                   "lag the device by N-1 unfetched cycles, overlapping "
                   "the D2H round trip with dispatch")
    g.add_argument("--attention-backend", default="auto",
                   choices=["auto", "pallas", "jax", "ref"])
    # CUDA-graph era flags: XLA traces+compiles everything up front, so
    # eager/capture toggles have no TPU meaning (accepted, warned)
    g.add_argument("--enforce-eager", action="store_true")
    g.add_argument("--max-seq-len-to-capture", type=int, default=None)

    ns = parser.parse_args(args)

    logging.basicConfig(level=getattr(logging, ns.log_level.upper()))
    for flag in ("revision", "tokenizer_revision", "code_revision",
                 "download_dir", "max_parallel_loading_workers",
                 "max_seq_len_to_capture"):
        if getattr(ns, flag) not in (None, False):
            logger.warning(
                "--%s has no effect (local checkpoints, zero egress)",
                flag.replace("_", "-"),
            )
    if ns.enforce_eager:
        logger.warning(
            "--enforce-eager has no TPU meaning: XLA compiles the whole "
            "step; there is no graph-capture fallback to disable"
        )
    if ns.trust_remote_code:
        logger.warning(
            "--trust-remote-code has no effect: architectures are "
            "first-party modules, remote code is never executed"
        )

    from ..tracing import init_tracing

    init_tracing(ns.otlp_traces_endpoint)

    # multi-host (DCN) serving: every host runs this same command; the
    # global JAX runtime must form BEFORE any device work (reference
    # distributed_launcher.rs: bootstrap precedes model load)
    rank, world = 0, 1
    if ns.num_hosts or ns.distributed_coordinator_address or int(
        os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", 1))
    ) > 1:
        from ..parallel.multihost import init_multihost

        rank, world = init_multihost(
            ns.distributed_coordinator_address, ns.num_hosts, ns.host_rank
        )

    from ..entrypoints import LLM, Encoder, is_encoder_model

    task = ns.task
    if task == "auto":
        task = "embed" if is_encoder_model(ns.model) else "generate"

    dtype = None
    if ns.dtype != "auto":
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[ns.dtype]

    encoder = None
    tokenizer = None
    engine = None
    if task == "embed":
        enc = Encoder(ns.model, dummy_weights=ns.dummy_weights)
        encoder, tokenizer = enc.runner, enc.tokenizer
    else:
        speculative = None
        if ns.speculative_method:
            speculative = dict(
                method=ns.speculative_method,
                num_draft_tokens=ns.num_draft_tokens,
                draft_model=ns.draft_model,
                acceptance_method=ns.spec_decoding_acceptance_method,
                min_ngram=ns.ngram_prompt_lookup_min,
                max_ngram=ns.ngram_prompt_lookup_max,
            )
        llm = LLM(
            ns.model,
            max_model_len=ns.max_model_len,
            max_num_seqs=ns.max_num_seqs,
            max_tokens_per_step=ns.max_num_batched_tokens,
            num_pages=ns.num_pages,
            page_size=ns.block_size,
            kv_cache_dtype=ns.kv_cache_dtype,
            dtype=dtype,
            dummy_weights=ns.dummy_weights or ns.load_format == "dummy",
            seed=ns.seed,
            fetch_interval=ns.fetch_interval,
            ring_buffers=ns.ring_buffers,
            speculative=speculative,
            tensor_parallel_size=ns.tensor_parallel_size,
            data_parallel_size=ns.data_parallel_size,
            pipeline_parallel_size=ns.pipeline_parallel_size,
            decode_context_parallel_size=ns.decode_context_parallel_size,
            quantization=ns.quantization,
            tokenizer=ns.tokenizer,
            enable_chunked_prefill=ns.enable_chunked_prefill,
            max_num_partial_prefills=ns.max_num_partial_prefills,
            scheduling_policy=ns.scheduling_policy,
            preemption_mode=ns.preemption_mode,
            swap_space_gb=ns.cpu_offload_gb or ns.swap_space,
            enable_prefix_caching=ns.enable_prefix_caching,
            attention_backend=ns.attention_backend,
            enable_lora=ns.enable_lora or bool(ns.lora_adapter),
            max_loras=ns.max_loras,
            max_lora_rank=ns.max_lora_rank,
        )
        engine, tokenizer = llm.engine, llm.tokenizer
        for spec in ns.lora_adapter:
            name, _, path = spec.partition("=")
            if not path:
                parser.error(f"--lora-adapter expects NAME=PATH, got {spec!r}")
            engine.enable_lora(
                max_loras=ns.max_loras, max_rank=ns.max_lora_rank
            ).load(name, path)
        if ns.chat_template:
            with open(ns.chat_template) as f:
                tokenizer.chat_template = f.read()
        if world > 1:
            from ..parallel.multihost import (
                MultihostCoordinator,
                worker_loop,
            )

            if rank != 0:
                # worker host: no HTTP server — lockstep step execution
                # until the coordinator broadcasts shutdown (reference
                # launcher.rs worker ranks)
                logger.info("host %d/%d entering worker loop", rank, world)
                worker_loop(engine)
                return
            MultihostCoordinator(engine)

    async def main():
        loop = asyncio.get_event_loop()
        aeng = AsyncLLMEngine(engine, loop) if engine is not None else None
        app = build_app(
            aeng,
            tokenizer,
            model_name=ns.served_model_name or ns.model,
            api_key=ns.api_key,
            tool_parser=ns.tool_call_parser,
            reasoning_parser=ns.reasoning_parser,
            encoder=encoder,
            max_concurrent_requests=ns.max_concurrent_requests,
            requests_per_second=ns.requests_per_second,
            response_role=ns.response_role,
            stream_interval=ns.stream_interval,
            stream_pacing=not ns.no_stream_pacing,
            max_logprobs=ns.max_logprobs,
            return_tokens_as_token_ids=ns.return_tokens_as_token_ids,
            enable_auto_tool_choice=ns.enable_auto_tool_choice,
            cors_origins=ns.allowed_origins,
            cors_methods=ns.allowed_methods,
            cors_headers=ns.allowed_headers,
        )
        app["log_requests"] = not ns.disable_log_requests
        app["log_stats"] = not ns.disable_log_stats
        runner = web.AppRunner(app)
        await runner.setup()
        ssl_ctx = None
        if ns.ssl_certfile:
            import ssl as _ssl

            ssl_ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
            ssl_ctx.load_cert_chain(ns.ssl_certfile, ns.ssl_keyfile)
        site = web.TCPSite(runner, ns.host, ns.port, ssl_context=ssl_ctx)
        await site.start()
        logger.info("serving on %s:%d", ns.host, ns.port)

        # graceful shutdown (reference shutdown.rs): on SIGTERM/SIGINT
        # stop admitting, drain in-flight work up to the timeout
        import signal

        stop = asyncio.Event()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                loop.add_signal_handler(sig, stop.set)
            except (RuntimeError, NotImplementedError):
                # non-main thread (embedding/tests) or platform without
                # signal support: fall back to Ctrl-C via KeyboardInterrupt
                break
        await stop.wait()
        await graceful_shutdown(app, aeng, runner, ns.shutdown_timeout)

    asyncio.run(main())


async def graceful_shutdown(app, aeng, runner, timeout: float) -> None:
    """Drain: reject new requests, wait for the engine to finish
    in-flight work (bounded), then tear down (reference shutdown.rs)."""
    logger.info("graceful shutdown: draining (timeout %.0fs)", timeout)
    app["draining"] = True
    deadline = time.monotonic() + timeout
    eng = getattr(aeng, "engine", None) if aeng is not None else None
    while time.monotonic() < deadline:
        busy = bool(eng is not None and eng.has_unfinished)
        limiter = app.get("rate_limiter")
        inflight = limiter.inflight if limiter is not None else 0
        if not busy and inflight == 0:
            break
        await asyncio.sleep(0.2)
    if aeng is not None:
        mh = getattr(getattr(aeng, "engine", None), "multihost", None)
        if mh is not None:
            mh.shutdown()  # release worker hosts from their loops
        aeng.shutdown()
    await runner.cleanup()
    logger.info("shutdown complete")
