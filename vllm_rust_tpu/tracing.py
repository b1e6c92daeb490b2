"""Span tracing with OTLP/HTTP JSON export.

Reference: crates/server/src/logging.rs:102-143 init_with_otlp — a batch
OTLP/HTTP JSON exporter targeting e.g. http://localhost:4318, spans
flushed in the background. Same shape here without an opentelemetry-sdk
dependency: first-party spans, a bounded queue, and a daemon flusher
that POSTs the OTLP JSON encoding (resourceSpans/scopeSpans/spans,
hex ids, unix-nano timestamps) to {endpoint}/v1/traces. With no
endpoint configured spans land in a ring buffer inspectable via
/admin/traces — useful airgapped and in tests.
"""

from __future__ import annotations

import json
import os
import secrets
import threading
import time
from collections import deque
from dataclasses import dataclass, field


def _now_ns() -> int:
    return time.time_ns()


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_span_id: str | None = None
    start_ns: int = field(default_factory=_now_ns)
    end_ns: int | None = None
    attributes: dict = field(default_factory=dict)
    status_code: int = 0  # 0 unset, 1 ok, 2 error

    def end(self, error: str | None = None) -> None:
        self.end_ns = _now_ns()
        if error is not None:
            self.status_code = 2
            self.attributes["error.message"] = error
        elif self.status_code == 0:
            self.status_code = 1

    def to_otlp(self) -> dict:
        def attr(k, v):
            if isinstance(v, bool):
                val = {"boolValue": v}
            elif isinstance(v, int):
                val = {"intValue": str(v)}
            elif isinstance(v, float):
                val = {"doubleValue": v}
            else:
                val = {"stringValue": str(v)}
            return {"key": k, "value": val}

        d = {
            "traceId": self.trace_id,
            "spanId": self.span_id,
            "name": self.name,
            "kind": 2,  # SPAN_KIND_SERVER
            "startTimeUnixNano": str(self.start_ns),
            "endTimeUnixNano": str(self.end_ns or _now_ns()),
            "attributes": [attr(k, v) for k, v in self.attributes.items()],
            "status": {"code": self.status_code},
        }
        if self.parent_span_id:
            d["parentSpanId"] = self.parent_span_id
        return d


class Tracer:
    """Bounded-queue span collector with optional OTLP/HTTP export."""

    def __init__(
        self,
        service_name: str = "vllm-tpu-server",
        otlp_endpoint: str | None = None,
        batch_interval_s: float = 2.0,
        max_buffer: int = 4096,
        transport=None,  # injectable POST fn(url, body_bytes) for tests
    ):
        self.service_name = service_name
        self.endpoint = (otlp_endpoint or "").rstrip("/") or None
        self._pending: deque[Span] = deque(maxlen=max_buffer)
        self.recent: deque[Span] = deque(maxlen=256)  # /admin/traces view
        self._lock = threading.Lock()
        self._transport = transport or self._http_post
        self.exported = 0
        self.export_errors = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        if self.endpoint:
            self._thread = threading.Thread(
                target=self._flush_loop,
                args=(batch_interval_s,),
                name="otlp-exporter",
                daemon=True,
            )
            self._thread.start()

    # -- span API ------------------------------------------------------------

    def start_span(
        self,
        name: str,
        parent: Span | None = None,
        attributes: dict | None = None,
    ) -> Span:
        return Span(
            name=name,
            trace_id=parent.trace_id if parent else secrets.token_hex(16),
            span_id=secrets.token_hex(8),
            parent_span_id=parent.span_id if parent else None,
            attributes=dict(attributes or {}),
        )

    def finish(self, span: Span, error: str | None = None) -> None:
        if span.end_ns is None:
            span.end(error)
        with self._lock:
            self._pending.append(span)
            self.recent.append(span)

    class _SpanCtx:
        def __init__(self, tracer, span):
            self.tracer, self.span = tracer, span

        def __enter__(self):
            return self.span

        def __exit__(self, et, ev, tb):
            self.tracer.finish(self.span, error=str(ev) if ev else None)
            return False

    def span(self, name: str, parent: Span | None = None, **attributes):
        return self._SpanCtx(self, self.start_span(name, parent, attributes))

    # -- export --------------------------------------------------------------

    def encode_batch(self, spans: list[Span]) -> bytes:
        body = {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {
                                "key": "service.name",
                                "value": {"stringValue": self.service_name},
                            }
                        ]
                    },
                    "scopeSpans": [
                        {
                            "scope": {"name": "vllm_rust_tpu"},
                            "spans": [s.to_otlp() for s in spans],
                        }
                    ],
                }
            ]
        }
        return json.dumps(body).encode()

    def flush(self) -> int:
        """Export all pending spans now. Returns number exported."""
        with self._lock:
            batch = list(self._pending)
            self._pending.clear()
        if not batch or not self.endpoint:
            return 0
        try:
            self._transport(self.endpoint + "/v1/traces", self.encode_batch(batch))
            self.exported += len(batch)
            return len(batch)
        except Exception:
            self.export_errors += 1
            return 0

    def _flush_loop(self, interval: float) -> None:
        while not self._stop.wait(interval):
            self.flush()
        self.flush()

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    @staticmethod
    def _http_post(url: str, body: bytes) -> None:
        import urllib.request

        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req, timeout=5).read()


_TRACER: Tracer | None = None


def init_tracing(
    otlp_endpoint: str | None = None, service_name: str = "vllm-tpu-server",
    **kw,
) -> Tracer:
    """Install the process-global tracer (reference logging.rs
    init_with_otlp; double-init replaces quietly like its ignored
    SetGlobalDefaultError)."""
    global _TRACER
    if _TRACER is not None:
        _TRACER.shutdown()
    _TRACER = Tracer(
        service_name=service_name,
        otlp_endpoint=otlp_endpoint
        or os.environ.get("VLLM_TPU_OTLP_ENDPOINT"),
        **kw,
    )
    return _TRACER


def get_tracer() -> Tracer:
    global _TRACER
    if _TRACER is None:
        _TRACER = Tracer()
    return _TRACER
