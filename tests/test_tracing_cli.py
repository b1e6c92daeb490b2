"""OTLP tracing (tracing.py) + expanded CLI surface (server/app.py).

Reference: crates/server/src/logging.rs:102-143 (OTLP/HTTP JSON batch
exporter) and crates/server/src/config.rs (the ~75-flag CLI).
"""

import contextlib
import io
import json
import re

from vllm_rust_tpu.tracing import Tracer


def test_span_otlp_encoding_and_flush():
    posts = []
    t = Tracer(
        otlp_endpoint="http://collector:4318",
        transport=lambda url, body: posts.append((url, body)),
        batch_interval_s=3600,  # flush manually
    )
    with t.span("parent", **{"http.method": "POST"}) as parent:
        with t.span("child", parent=parent) as child:
            pass
    n = t.flush()
    t.shutdown()
    assert n == 2
    url, body = posts[0]
    assert url == "http://collector:4318/v1/traces"
    doc = json.loads(body)
    spans = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
    names = {s["name"] for s in spans}
    assert names == {"parent", "child"}
    child_span = next(s for s in spans if s["name"] == "child")
    parent_span = next(s for s in spans if s["name"] == "parent")
    assert child_span["traceId"] == parent_span["traceId"]
    assert child_span["parentSpanId"] == parent_span["spanId"]
    assert int(parent_span["endTimeUnixNano"]) >= int(
        parent_span["startTimeUnixNano"]
    )
    attrs = {a["key"]: a["value"] for a in parent_span["attributes"]}
    assert attrs["http.method"] == {"stringValue": "POST"}


def test_span_error_status():
    t = Tracer()  # no endpoint: ring buffer only
    try:
        with t.span("failing"):
            raise ValueError("boom")
    except ValueError:
        pass
    s = t.recent[-1]
    assert s.status_code == 2
    assert "boom" in s.attributes["error.message"]
    assert t.flush() == 0  # nothing exported without an endpoint


def test_cli_flag_surface():
    from vllm_rust_tpu.server.app import run_server

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            run_server(["--help"])
    except SystemExit:
        pass
    text = buf.getvalue()
    flags = set(re.findall(r"--[a-z][a-z0-9-]+", text))
    # reference config.rs exposes ~75 flags; ours must match that scale
    assert len(flags) >= 75, len(flags)
    for must in (
        "--quantization", "--tensor-parallel-size", "--swap-space",
        "--otlp-traces-endpoint", "--max-logprobs", "--lora-adapter",
        "--scheduling-policy", "--gpu-memory-utilization",
        "--return-tokens-as-token-ids", "--ssl-certfile",
        "--allowed-origins", "--stream-interval", "--response-role",
        "--kv-cache-dtype", "--num-gpu-blocks-override",
        "--max-num-batched-tokens", "--enable-lora",
        "--spec-decoding-acceptance-method", "--enable-chunked-prefill",
    ):
        assert must in flags, must
