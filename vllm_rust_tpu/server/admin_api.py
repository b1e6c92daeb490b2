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


def add_admin_routes(app) -> None:
    app.add_routes(
        [
            web.get("/admin/device", device_info),
            web.post("/admin/estimate", estimate),
            web.post("/start_profile", start_profile),
            web.post("/stop_profile", stop_profile),
        ]
    )
