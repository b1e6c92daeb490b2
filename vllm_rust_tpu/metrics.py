"""First-party Prometheus metrics: counters, gauges, histograms.

Reference: crates/server/src/api/admin/prometheus.rs:15-196 — the same
metric inventory (request counters, KV-cache gauges, TTFT / e2e /
per-output-token / batch-size histograms, token counters), rendered in
the text exposition format version 0.0.4. No prometheus_client
dependency: the registry renders itself, and recording is lock-free
enough for the engine hot path (a few float adds per event).
"""

from __future__ import annotations

import threading
import time


class Counter:
    __slots__ = ("name", "help", "_v")

    def __init__(self, name: str, help: str):
        self.name, self.help = name, help
        self._v = 0.0

    def inc(self, n: float = 1.0) -> None:
        self._v += n

    @property
    def value(self) -> float:
        return self._v

    def render(self) -> list[str]:
        return [
            f"# HELP {self.name} {self.help}",
            f"# TYPE {self.name} counter",
            f"{self.name} {_fmt(self._v)}",
        ]


class Gauge:
    __slots__ = ("name", "help", "_v")

    def __init__(self, name: str, help: str):
        self.name, self.help = name, help
        self._v = 0.0

    def set(self, v: float) -> None:
        self._v = float(v)

    def inc(self, n: float = 1.0) -> None:
        self._v += n

    def dec(self, n: float = 1.0) -> None:
        self._v -= n

    @property
    def value(self) -> float:
        return self._v

    def render(self) -> list[str]:
        return [
            f"# HELP {self.name} {self.help}",
            f"# TYPE {self.name} gauge",
            f"{self.name} {_fmt(self._v)}",
        ]


class Histogram:
    """Cumulative-bucket histogram (Prometheus semantics: each `le`
    bucket counts observations <= bound, plus +Inf, _sum and _count)."""

    __slots__ = ("name", "help", "buckets", "counts", "inf", "sum", "count")

    def __init__(self, name: str, help: str, buckets: list[float]):
        self.name, self.help = name, help
        self.buckets = list(buckets)
        self.counts = [0] * len(self.buckets)
        self.inf = 0
        self.sum = 0.0
        self.count = 0

    def observe(self, v: float) -> None:
        v = float(v)
        self.sum += v
        self.count += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
        self.inf += 1

    def render(self) -> list[str]:
        out = [
            f"# HELP {self.name} {self.help}",
            f"# TYPE {self.name} histogram",
        ]
        for b, c in zip(self.buckets, self.counts):
            # counts are already cumulative per observe()
            out.append(f'{self.name}_bucket{{le="{_fmt(b)}"}} {c}')
        out.append(f'{self.name}_bucket{{le="+Inf"}} {self.inf}')
        out.append(f"{self.name}_sum {_fmt(self.sum)}")
        out.append(f"{self.name}_count {self.count}")
        return out


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


class Registry:
    def __init__(self):
        self._metrics: list = []
        self._lock = threading.Lock()

    def register(self, m):
        with self._lock:
            self._metrics.append(m)
        return m

    def render(self) -> str:
        lines: list[str] = []
        for m in list(self._metrics):
            lines.extend(m.render())
        return "\n".join(lines) + "\n"

    def counter(self, name, help):
        return self.register(Counter(name, help))

    def gauge(self, name, help):
        return self.register(Gauge(name, help))

    def histogram(self, name, help, buckets):
        return self.register(Histogram(name, help, buckets))


REGISTRY = Registry()

# --- request counters (reference prometheus.rs:16-35) ----------------------
REQUESTS_TOTAL = REGISTRY.counter(
    "vllm_requests_total", "Total number of requests received"
)
REQUESTS_SUCCESS = REGISTRY.counter(
    "vllm_requests_success_total", "Total number of successful requests"
)
REQUESTS_ERROR = REGISTRY.counter(
    "vllm_requests_error_total", "Total number of failed requests"
)

# --- active request / KV gauges (prometheus.rs:38-91) -----------------------
RUNNING_REQUESTS = REGISTRY.gauge(
    "vllm_running_requests", "Number of requests currently being processed"
)
WAITING_REQUESTS = REGISTRY.gauge(
    "vllm_waiting_requests", "Number of requests waiting in queue"
)
KV_CACHE_FREE_BLOCKS = REGISTRY.gauge(
    "vllm_kv_cache_free_blocks", "Number of free KV cache blocks"
)
KV_CACHE_TOTAL_BLOCKS = REGISTRY.gauge(
    "vllm_kv_cache_total_blocks", "Total number of KV cache blocks"
)
KV_CACHE_USAGE_RATIO = REGISTRY.gauge(
    "vllm_kv_cache_usage_ratio", "Ratio of used KV cache blocks (0.0 - 1.0)"
)
PREFIX_CACHE_BLOCKS = REGISTRY.gauge(
    "vllm_prefix_cache_blocks", "Number of cached prefix blocks"
)
PREFIX_CACHE_HIT_RATIO = REGISTRY.gauge(
    "vllm_prefix_cache_hit_ratio", "Prefix cache hit ratio (0.0 - 1.0)"
)

# --- latency histograms (prometheus.rs:93-139) ------------------------------
TIME_TO_FIRST_TOKEN = REGISTRY.histogram(
    "vllm_time_to_first_token_seconds", "Time to first token in seconds",
    [0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0],
)
E2E_LATENCY = REGISTRY.histogram(
    "vllm_e2e_latency_seconds", "End-to-end request latency in seconds",
    [0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0, 120.0],
)
TOKENS_PER_SECOND = REGISTRY.histogram(
    "vllm_tokens_per_second", "Token generation throughput per request",
    [1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 200.0, 500.0, 1000.0],
)
TIME_PER_OUTPUT_TOKEN = REGISTRY.histogram(
    "vllm_time_per_output_token_seconds", "Time per output token in seconds",
    [0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5],
)
QUEUE_TIME = REGISTRY.histogram(
    "vllm_request_queue_time_seconds",
    "Time from arrival to first scheduling in seconds",
    [0.001, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0, 15.0, 60.0],
)

# --- token counters / scheduler (prometheus.rs:141-166) ---------------------
PROMPT_TOKENS_TOTAL = REGISTRY.counter(
    "vllm_prompt_tokens_total", "Total number of prompt tokens processed"
)
GENERATION_TOKENS_TOTAL = REGISTRY.counter(
    "vllm_generation_tokens_total", "Total number of tokens generated"
)
NUM_PREEMPTIONS = REGISTRY.counter(
    "vllm_num_preemptions_total", "Total number of request preemptions"
)
BATCH_SIZE = REGISTRY.histogram(
    "vllm_batch_size", "Number of sequences per forward pass",
    [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0],
)

# --- speculative decoding (reference engine/types.rs:322-390
# SpecDecodingStats exported through get_stats/metrics) ----------------------
SPEC_DRAFT_TOKENS = REGISTRY.counter(
    "vllm_spec_decode_num_draft_tokens_total",
    "Total draft tokens proposed by the speculative proposer",
)
SPEC_ACCEPTED_TOKENS = REGISTRY.counter(
    "vllm_spec_decode_num_accepted_tokens_total",
    "Total draft tokens accepted by verification",
)
SPEC_ACCEPTANCE_RATE = REGISTRY.gauge(
    "vllm_spec_decode_acceptance_rate",
    "Lifetime draft acceptance rate (accepted / drafted)",
)
SPEC_MEAN_ACCEPTED_LEN = REGISTRY.gauge(
    "vllm_spec_decode_mean_accepted_length",
    "Mean tokens emitted per speculative step (1 + accepted drafts)",
)

# --- server health (prometheus.rs:169-196) ----------------------------------
SERVER_ACCEPTING = REGISTRY.gauge(
    "vllm_server_accepting_requests",
    "Whether the server is accepting new requests (1 = yes, 0 = no)",
)
SERVER_UPTIME = REGISTRY.gauge(
    "vllm_server_uptime_seconds", "Server uptime in seconds"
)


class RequestTimer:
    """Per-request lifecycle recorder driven by the async engine's
    output router (reference prometheus.rs record_* helpers)."""

    __slots__ = ("t_arrival", "t_first", "t_last", "n_generated")

    def __init__(self):
        self.t_arrival = time.monotonic()
        self.t_first: float | None = None
        self.t_last: float | None = None
        self.n_generated = 0

    def on_output(self, n_new: int) -> None:
        now = time.monotonic()
        if self.t_first is None:
            self.t_first = now
            TIME_TO_FIRST_TOKEN.observe(now - self.t_arrival)
        elif n_new > 0 and self.t_last is not None:
            TIME_PER_OUTPUT_TOKEN.observe((now - self.t_last) / max(n_new, 1))
        self.t_last = now
        self.n_generated += n_new
        GENERATION_TOKENS_TOTAL.inc(n_new)

    def on_finish(self, error: bool = False) -> None:
        now = time.monotonic()
        e2e = now - self.t_arrival
        E2E_LATENCY.observe(e2e)
        if self.n_generated and e2e > 0:
            TOKENS_PER_SECOND.observe(self.n_generated / e2e)
        (REQUESTS_ERROR if error else REQUESTS_SUCCESS).inc()


def refresh_engine_gauges(stats: dict, start_time: float | None = None) -> None:
    """Map engine.get_stats() onto the gauge set at scrape time."""
    RUNNING_REQUESTS.set(stats.get("num_running", 0))
    WAITING_REQUESTS.set(stats.get("num_waiting", 0))
    free = stats.get("free_kv_pages", 0)
    total = stats.get("total_kv_pages", 0)
    KV_CACHE_FREE_BLOCKS.set(free)
    KV_CACHE_TOTAL_BLOCKS.set(total)
    if total:
        KV_CACHE_USAGE_RATIO.set((total - free) / total)
    if "prefix_cache_pages" in stats:
        PREFIX_CACHE_BLOCKS.set(stats["prefix_cache_pages"])
    hits = stats.get("prefix_cache_hits", 0)
    queries = stats.get("prefix_cache_queries", 0)
    if queries:
        PREFIX_CACHE_HIT_RATIO.set(hits / queries)
    # monotone engine-side totals surface through the counter objects so
    # one exposition covers both event-driven and stat-driven sources
    for counter, key in (
        (NUM_PREEMPTIONS, "num_preemptions"),
        (PROMPT_TOKENS_TOTAL, "prompt_tokens"),
        (GENERATION_TOKENS_TOTAL, "generated_tokens"),
        (SPEC_DRAFT_TOKENS, "draft_tokens"),
        (SPEC_ACCEPTED_TOKENS, "accepted_tokens"),
    ):
        if key in stats:
            counter._v = max(counter._v, float(stats[key]))
    if "spec_acceptance_rate" in stats:
        SPEC_ACCEPTANCE_RATE.set(stats["spec_acceptance_rate"])
    if "spec_mean_accepted_length" in stats:
        SPEC_MEAN_ACCEPTED_LEN.set(stats["spec_mean_accepted_length"])
    if start_time is not None:
        SERVER_UPTIME.set(time.time() - start_time)
