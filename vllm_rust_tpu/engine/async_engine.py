"""Async engine: thread-hosted engine loop + asyncio streaming facade.

Reference: crates/core/src/engine/handle.rs (EngineHandle over an mpsc
command channel) + engine loop phases (strategy.rs:426). Same shape here:
the engine runs on a dedicated thread (it blocks on device fetches); the
asyncio side talks to it through a command queue and receives per-request
events through asyncio queues bridged with call_soon_threadsafe.
"""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, AsyncIterator

from .. import metrics
from ..request import RequestOutput, SamplingParams
from .engine import LLMEngine

logger = logging.getLogger(__name__)


@dataclass
class _Command:
    kind: str  # add | abort | embed | stop | pause | resume
    request_id: str = ""
    prompt: Any = None
    params: Any = None
    priority: int = 0
    done: threading.Event | None = None
    error: Exception | None = None
    result: Any = None


class AsyncLLMEngine:
    """Streaming facade over LLMEngine.

    Engine thread: drain commands → step → route outputs. Idle-waits on
    the command queue when no work (no busy spin)."""

    def __init__(self, engine: LLMEngine, loop: asyncio.AbstractEventLoop | None = None):
        self.engine = engine
        self._loop = loop or asyncio.get_event_loop()
        self._cmds: queue.Queue[_Command] = queue.Queue()
        self._streams: dict[str, asyncio.Queue] = {}
        self._timers: dict[str, metrics.RequestTimer] = {}
        self._paused = False
        self._stopping = False
        self._thread = threading.Thread(
            target=self._run, name="engine-loop", daemon=True
        )
        self._thread.start()

    # -- public API ----------------------------------------------------------

    async def generate_stream(
        self,
        prompt: str | list[int],
        params: SamplingParams | None = None,
        request_id: str | None = None,
        priority: int = 0,
        images: list | None = None,
        video: list | None = None,
        paced: bool = False,
    ) -> AsyncIterator[RequestOutput]:
        """Yields RequestOutput deltas; the final one has finished=True.

        ``paced``: smooth ring-cycle token bursts into per-token flushes
        (engine/pacing.py) — the SSE endpoints enable this so streaming
        clients see steady deltas instead of one lump per fetch cycle
        (reference api/streaming.rs per-token deltas). Sleeps are cut
        short the moment a newer burst arrives, so completion time is
        unchanged."""
        request_id = request_id or f"req-{uuid.uuid4().hex[:16]}"
        q: asyncio.Queue = asyncio.Queue()
        self._streams[request_id] = q
        ev = threading.Event()
        if video:
            kind, payload = "add_video", (prompt, video)
        elif images:
            kind, payload = "add_mm", (prompt, images)
        else:
            kind, payload = "add", prompt
        cmd = _Command(
            kind=kind,
            request_id=request_id,
            prompt=payload,
            params=params,
            priority=priority,
            done=ev,
        )
        self._cmds.put(cmd)
        await asyncio.get_event_loop().run_in_executor(None, ev.wait)
        if cmd.error is not None:
            self._streams.pop(request_id, None)
            raise cmd.error
        pacer = None
        if paced:
            from .pacing import TokenPacer

            pacer = TokenPacer()
        loop = asyncio.get_event_loop()
        try:
            while True:
                burst = await q.get()
                if isinstance(burst, Exception):
                    raise burst
                offsets = (
                    pacer.schedule(loop.time(), len(burst))
                    if pacer is not None
                    else None
                )
                t0 = loop.time()
                for i, out in enumerate(burst):
                    if offsets is not None and not out.finished:
                        # sleep toward this token's flush slot, but yield
                        # immediately once a newer burst is queued
                        delay = t0 + offsets[i] - loop.time()
                        while delay > 0 and q.empty():
                            await asyncio.sleep(min(delay, 0.005))
                            delay = t0 + offsets[i] - loop.time()
                    yield out
                    if out.finished:
                        return
        finally:
            self._streams.pop(request_id, None)
            if not self._stopping:
                self._cmds.put(_Command(kind="abort", request_id=request_id))

    async def generate(
        self,
        prompt: str | list[int],
        params: SamplingParams | None = None,
        request_id: str | None = None,
        images: list | None = None,
        video: list | None = None,
    ) -> RequestOutput:
        last = None
        async for out in self.generate_stream(
            prompt, params, request_id, images=images, video=video
        ):
            last = out
        assert last is not None
        return last

    async def transcribe_stream(
        self,
        features,
        prompt_ids: list[int],
        params: SamplingParams | None = None,
        request_id: str | None = None,
    ) -> AsyncIterator[RequestOutput]:
        """Audio request: encode once, then stream decoder tokens
        (requires an EncoderDecoderEngine)."""
        request_id = request_id or f"audio-{uuid.uuid4().hex[:16]}"
        q: asyncio.Queue = asyncio.Queue()
        self._streams[request_id] = q
        ev = threading.Event()
        cmd = _Command(
            kind="add_audio",
            request_id=request_id,
            prompt=(features, prompt_ids),
            params=params,
            done=ev,
        )
        self._cmds.put(cmd)
        await asyncio.get_event_loop().run_in_executor(None, ev.wait)
        if cmd.error is not None:
            self._streams.pop(request_id, None)
            raise cmd.error
        try:
            while True:
                burst = await q.get()
                if isinstance(burst, Exception):
                    raise burst
                for out in burst:
                    yield out
                    if out.finished:
                        return
        finally:
            self._streams.pop(request_id, None)
            if not self._stopping:
                self._cmds.put(_Command(kind="abort", request_id=request_id))

    async def transcribe(
        self, features, prompt_ids, params=None, request_id=None
    ) -> RequestOutput:
        last = None
        async for out in self.transcribe_stream(
            features, prompt_ids, params, request_id
        ):
            last = out
        assert last is not None
        return last

    async def embed(
        self,
        inputs: list,
        pooling: str = "mean",
        normalize: bool = True,
    ):
        """Embeddings routed through the engine thread (one-shot, bypasses
        the scheduler — reference EngineCommand::Embed)."""
        ev = threading.Event()
        cmd = _Command(kind="embed", prompt=inputs, done=ev)
        cmd.params = {"pooling": pooling, "normalize": normalize}  # type: ignore
        self._cmds.put(cmd)
        await asyncio.get_event_loop().run_in_executor(None, ev.wait)
        if cmd.error is not None:
            raise cmd.error
        return cmd.result

    def abort(self, request_id: str) -> None:
        self._cmds.put(_Command(kind="abort", request_id=request_id))

    def pause(self) -> None:
        # flag is read by the engine thread each iteration; setting it
        # directly makes pause observable immediately
        self._paused = True
        self._cmds.put(_Command(kind="pause"))

    def resume(self) -> None:
        self._paused = False
        self._cmds.put(_Command(kind="resume"))

    @property
    def is_paused(self) -> bool:
        return self._paused

    def get_stats(self) -> dict:
        s = dict(self.engine.stats)
        s["num_waiting"] = len(self.engine.scheduler.waiting)
        s["num_running"] = len(self.engine.scheduler.running)
        s["free_kv_pages"] = self.engine.kv.num_free_pages
        s["total_kv_pages"] = self.engine.kv.pool.total_usable
        # speculative acceptance stats (reference SpecDecodingStats,
        # engine/types.rs:322-390) — exported via /metrics + /server_info
        if hasattr(self.engine, "acceptance_rate"):
            s["spec_acceptance_rate"] = round(self.engine.acceptance_rate, 4)
            steps = s.get("num_steps", 0)
            if steps:
                s["spec_mean_accepted_length"] = round(
                    1.0 + s.get("accepted_tokens", 0) / steps, 4
                )
            prop = getattr(self.engine, "proposer", None)
            if prop is not None:
                s["spec_proposer"] = type(prop).__name__
        return s

    def shutdown(self) -> None:
        self._stopping = True
        self._cmds.put(_Command(kind="stop"))
        self._thread.join(timeout=10)

    # -- engine thread -------------------------------------------------------

    def _run(self) -> None:
        while True:
            try:
                # block when idle; poll commands when busy
                block = not (self.engine.has_unfinished and not self._paused)
                try:
                    cmd = self._cmds.get(block=block, timeout=None if not block else 1)
                except queue.Empty:
                    cmd = None
                while cmd is not None:
                    if cmd.kind == "stop":
                        return
                    self._handle(cmd)
                    try:
                        cmd = self._cmds.get(block=False)
                    except queue.Empty:
                        cmd = None
                if self.engine.has_unfinished and not self._paused:
                    metrics.BATCH_SIZE.observe(
                        len(self.engine.scheduler.running)
                    )
                    # group one step()'s outputs per request: the stream
                    # consumer receives whole bursts so the pacer
                    # (engine/pacing.py) can spread their flushes
                    bursts: dict[str, list[RequestOutput]] = {}
                    for out in self.engine.step():
                        bursts.setdefault(out.request_id, []).append(out)
                    for outs in bursts.values():
                        self._route(outs)
            except Exception:
                logger.exception("engine loop error")
                # propagate to all open streams, then keep serving
                for rid, q in list(self._streams.items()):
                    self._push(q, RuntimeError("engine error; request aborted"))
                    self.engine.abort_request(rid)

    def _handle(self, cmd: _Command) -> None:
        if cmd.kind in ("add", "add_mm", "add_video", "add_audio"):
            # per-request lifecycle metrics (reference prometheus.rs
            # record_request / TTFT / e2e histograms)
            metrics.REQUESTS_TOTAL.inc()
            self._timers[cmd.request_id] = metrics.RequestTimer()
        if cmd.kind == "add":
            try:
                self.engine.add_request(
                    cmd.request_id, cmd.prompt, cmd.params, cmd.priority
                )
            except Exception as e:  # admission errors surface to the caller
                cmd.error = e
                self._finish_timer(cmd.request_id, error=True)
            finally:
                if cmd.done:
                    cmd.done.set()
        elif cmd.kind == "add_mm":
            try:
                prompt, images = cmd.prompt
                if isinstance(prompt, str):
                    prompt = self.engine.tokenizer.encode(prompt)
                pixel = [self.engine.preprocess(im) for im in images]
                self.engine.add_image_request(
                    cmd.request_id, prompt, pixel, cmd.params
                )
            except Exception as e:
                cmd.error = e
                self._finish_timer(cmd.request_id, error=True)
            finally:
                if cmd.done:
                    cmd.done.set()
        elif cmd.kind == "add_video":
            try:
                prompt, frames = cmd.prompt
                if isinstance(prompt, str):
                    prompt = self.engine.tokenizer.encode(prompt)
                self.engine.add_video_request(
                    cmd.request_id, prompt, frames, cmd.params
                )
            except Exception as e:
                cmd.error = e
                self._finish_timer(cmd.request_id, error=True)
            finally:
                if cmd.done:
                    cmd.done.set()
        elif cmd.kind == "add_audio":
            try:
                features, prompt_ids = cmd.prompt
                self.engine.add_encoded_request(
                    cmd.request_id, features, prompt_ids, cmd.params
                )
            except Exception as e:
                cmd.error = e
                self._finish_timer(cmd.request_id, error=True)
            finally:
                if cmd.done:
                    cmd.done.set()
        elif cmd.kind == "embed":
            try:
                cmd.result = self.engine.embed(cmd.prompt, **cmd.params)
            except Exception as e:
                cmd.error = e
            finally:
                if cmd.done:
                    cmd.done.set()
        elif cmd.kind == "abort":
            self.engine.abort_request(cmd.request_id)
            # reconcile counters for client-side disconnects (the stream
            # finally-block abort): finished requests already popped their
            # timer, so this only fires for genuinely aborted ones
            self._finish_timer(cmd.request_id, error=True)
        elif cmd.kind == "pause":
            self._paused = True
        elif cmd.kind == "resume":
            self._paused = False

    def _route(self, outs: list[RequestOutput]) -> None:
        rid = outs[0].request_id
        finished = outs[-1].finished
        timer = self._timers.get(rid)
        if timer is not None:
            timer.on_output(sum(len(o.new_token_ids) for o in outs))
            if finished:
                self._finish_timer(rid)
        q = self._streams.get(rid)
        if q is not None:
            self._push(q, outs)
        elif not finished:
            # stream receiver gone → abort and reclaim (reference
            # strategy.rs:520-531 reap loop)
            self.engine.abort_request(rid)

    def _finish_timer(self, request_id: str, error: bool = False) -> None:
        timer = self._timers.pop(request_id, None)
        if timer is not None:
            timer.on_finish(error=error)

    def _push(self, q: asyncio.Queue, item) -> None:
        self._loop.call_soon_threadsafe(q.put_nowait, item)
