"""Admin endpoints: device info, roofline estimate, profiling.

Reference: crates/server/src/api/admin/{estimate,metrics,prometheus}.rs
(GPU detect + roofline "will it fit" endpoints) and the /start_profile
/stop_profile routes (api/mod.rs:904-905). Profiling uses jax.profiler
traces (viewable in TensorBoard/XProf) — the TPU-native analogue of the
reference's torch/CUDA profiler hooks.
"""

from __future__ import annotations

import logging
import os

from aiohttp import web

logger = logging.getLogger(__name__)

_PROFILE_DIR = os.environ.get("VLLM_TPU_PROFILE_DIR", "/tmp/vllm_tpu_profile")
_profiling = {"active": False}


async def device_info(request):
    import jax

    devices = []
    try:
        for d in jax.devices():
            devices.append(
                {
                    "id": d.id,
                    "platform": d.platform,
                    "device_kind": d.device_kind,
                    "process_index": d.process_index,
                }
            )
    except Exception as e:  # no device attached
        return web.json_response({"devices": [], "error": str(e)})
    from ..perf_estimate import detect_chip

    return web.json_response(
        {"devices": devices, "chip_profile": detect_chip().__dict__}
    )


async def estimate(request):
    """POST {hf_config | model_path, weight_dtype?, kv_cache_dtype?,
    prompt_tokens?, context_tokens?, batch_size?} -> roofline numbers."""
    from ..config import ModelConfig
    from ..perf_estimate import estimate as run_estimate

    body = await request.json()
    if "hf_config" in body:
        cfg = ModelConfig.from_dict(body["hf_config"])
    elif "model" in body or "model_path" in body:
        from ..loader import resolve_model_path

        cfg = ModelConfig.from_pretrained(
            resolve_model_path(body.get("model") or body["model_path"])
        )
    else:
        return web.json_response(
            {"error": "hf_config or model required"}, status=400
        )
    out = run_estimate(
        cfg,
        weight_dtype=body.get("weight_dtype", "bfloat16"),
        kv_dtype=body.get("kv_cache_dtype", "auto"),
        prompt_tokens=int(body.get("prompt_tokens", 512)),
        context_tokens=int(body.get("context_tokens", 1024)),
        batch_size=int(body.get("batch_size", 1)),
    )
    return web.json_response(out)


async def start_profile(request):
    import jax

    if _profiling["active"]:
        return web.json_response({"error": "profiling already active"}, status=400)
    os.makedirs(_PROFILE_DIR, exist_ok=True)
    jax.profiler.start_trace(_PROFILE_DIR)
    _profiling["active"] = True
    logger.info("profiling started -> %s", _PROFILE_DIR)
    return web.json_response({"status": "started", "dir": _PROFILE_DIR})


async def stop_profile(request):
    import jax

    if not _profiling["active"]:
        return web.json_response({"error": "profiling not active"}, status=400)
    jax.profiler.stop_trace()
    _profiling["active"] = False
    return web.json_response({"status": "stopped", "dir": _PROFILE_DIR})


async def list_models(request):
    """Browse the local HF hub cache (reference admin model browse,
    api/admin/static_files.rs + frontend ModelSelector)."""
    hub = os.path.expanduser(
        os.environ.get("HF_HUB_CACHE",
                       os.path.join(os.environ.get("HF_HOME",
                                    "~/.cache/huggingface"), "hub"))
    )
    hub = os.path.expanduser(hub)
    models = []
    if os.path.isdir(hub):
        for entry in sorted(os.listdir(hub)):
            if not entry.startswith("models--"):
                continue
            repo = entry[len("models--"):].replace("--", "/", 1)
            path = os.path.join(hub, entry)
            size = 0
            for root, _, files in os.walk(os.path.join(path, "blobs")):
                for f in files:
                    try:
                        size += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            models.append({"model": repo, "size_bytes": size, "path": path})
    current = request.app["server"].model_name
    return web.json_response({"models": models, "current": current})


async def restart(request):
    """Atomic engine swap (reference api/admin/restart.rs +
    AtomicEngineHandle main.rs:2570): pause admissions, build the new
    engine via the app's engine_factory, swap, resume. Requests arriving
    during the swap are rejected with 503 by the middleware."""
    factory = request.app.get("engine_factory")
    if factory is None:
        return web.json_response(
            {"error": "no engine_factory configured"}, status=400
        )
    body = {}
    try:
        body = await request.json()
    except Exception:
        pass
    app = request.app
    srv = app["server"]
    app["restarting"] = True
    try:
        import inspect

        # the factory builds the AsyncLLMEngine and must run on the loop
        # thread; admissions are rejected (503) for the duration
        result = factory(body.get("model"))
        if inspect.isawaitable(result):
            result = await result
        new_engine, new_tokenizer, new_name = result
        old = srv.engine
        srv.engine = new_engine
        if new_tokenizer is not None:
            srv.tokenizer = new_tokenizer
        if new_name:
            srv.model_name = new_name
        if old is not None:
            old.shutdown()
    finally:
        app["restarting"] = False
    return web.json_response({"status": "ok", "model": srv.model_name})


async def load(request):
    """Server load snapshot (reference /load endpoint)."""
    s = request.app["server"]
    stats = s.engine.get_stats() if s.engine else {}
    return web.json_response(
        {
            "server_load": stats.get("num_running", 0)
            + stats.get("num_waiting", 0),
            "num_running": stats.get("num_running", 0),
            "num_waiting": stats.get("num_waiting", 0),
        }
    )


def add_admin_routes(app) -> None:
    app.add_routes(
        [
            web.get("/admin/models", list_models),
            web.post("/admin/restart", restart),
            web.get("/load", load),
        ]
    )
    app.add_routes(
        [
            web.get("/admin/device", device_info),
            web.post("/admin/estimate", estimate),
            web.get("/admin/traces", recent_traces),
            web.post("/start_profile", start_profile),
            web.post("/stop_profile", stop_profile),
        ]
    )


async def recent_traces(request):
    """Ring-buffer view of recent spans (OTLP-shaped JSON) — the
    airgapped companion to the OTLP/HTTP exporter (tracing.py;
    reference logging.rs exports the same spans to a collector)."""
    from ..tracing import get_tracer

    t = get_tracer()
    return web.json_response(
        {
            "endpoint": t.endpoint,
            "exported": t.exported,
            "export_errors": t.export_errors,
            "spans": [s.to_otlp() for s in list(t.recent)[-100:]],
        }
    )
