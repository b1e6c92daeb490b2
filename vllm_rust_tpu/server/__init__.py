"""HTTP serving layer.

Reference: crates/server/ (axum router api/mod.rs:894-952, ~50 routes;
OpenAI + Anthropic + admin APIs, SSE streaming, middleware). Rebuilt on
aiohttp over AsyncLLMEngine.
"""

from .app import build_app, run_server

__all__ = ["build_app", "run_server"]
