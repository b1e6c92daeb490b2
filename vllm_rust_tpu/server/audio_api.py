"""Audio endpoints: /v1/audio/{transcriptions,translations} + /v1/realtime.

Reference: crates/server/src/api/audio.rs (multipart → PCM → Whisper
path) and api/realtime.rs (WebSocket OpenAI-Realtime subset:
session.created/update, input_audio_buffer.append (base64 PCM16 @16 kHz
mono) / commit{final}, transcription.delta per token,
transcription.done).
"""

from __future__ import annotations

import base64
import json
import logging
import uuid

import numpy as np
from aiohttp import WSMsgType, web

from ..request import SamplingParams

logger = logging.getLogger(__name__)


def _encdec_engine(server):
    eng = server.engine.engine if server.engine else None
    if eng is None or not hasattr(eng, "add_encoded_request"):
        return None
    return eng


async def _read_audio_form(request):
    """Multipart form -> (audio bytes, fields dict)."""
    fields: dict = {}
    data = None
    if request.content_type.startswith("multipart/"):
        reader = await request.multipart()
        async for part in reader:
            if part.name == "file":
                data = await part.read(decode=False)
            else:
                fields[part.name] = (await part.text()).strip()
    else:
        data = await request.read()
    return data, fields


def _features_and_prompt(eng, audio_bytes, fields, task):
    from ..multimodal.audio import decode_audio, log_mel_spectrogram

    pcm = decode_audio(audio_bytes)
    features = log_mel_spectrogram(pcm, n_mels=eng.model.n_mels)
    prompt_ids = eng.decoder_prompt(fields.get("language"), task)
    temp = float(fields.get("temperature", 0.0) or 0.0)
    params = SamplingParams(
        max_tokens=eng.model.dec_positions - len(prompt_ids) - 1,
        temperature=temp,
    )
    return features, prompt_ids, params


async def _audio_endpoint(server, request, task):
    from .app import _error

    eng = _encdec_engine(server)
    if eng is None:
        return _error(400, "this server is not running a speech model")
    data, fields = await _read_audio_form(request)
    if not data:
        return _error(400, "missing audio file")
    features, prompt_ids, params = _features_and_prompt(
        eng, data, fields, task
    )
    out = await server.engine.transcribe(features, prompt_ids, params)
    fmt = fields.get("response_format", "json")
    if fmt == "text":
        return web.Response(text=out.output_text, content_type="text/plain")
    body = {"text": out.output_text}
    if fmt == "verbose_json":
        body.update(
            {
                "task": task,
                "language": fields.get("language"),
                "duration": None,
                "segments": [],
            }
        )
    return web.json_response(body)


async def transcriptions(request):
    return await _audio_endpoint(request.app["server"], request, "transcribe")


async def translations(request):
    return await _audio_endpoint(request.app["server"], request, "translate")


async def realtime(request):
    """OpenAI Realtime subset over WebSocket (reference api/realtime.rs)."""
    from ..multimodal.audio import log_mel_spectrogram

    server = request.app["server"]
    eng = _encdec_engine(server)
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    session_id = f"sess_{uuid.uuid4().hex[:16]}"
    await ws.send_json(
        {
            "type": "session.created",
            "session": {"id": session_id, "object": "realtime.session"},
        }
    )
    if eng is None:
        await ws.send_json(
            {"type": "error",
             "error": {"message": "this server is not running a speech model"}}
        )
        await ws.close()
        return ws

    buf = bytearray()
    async for msg in ws:
        if msg.type != WSMsgType.TEXT:
            continue
        try:
            ev = json.loads(msg.data)
        except json.JSONDecodeError:
            await ws.send_json(
                {"type": "error", "error": {"message": "invalid JSON"}}
            )
            continue
        kind = ev.get("type")
        if kind == "session.update":
            await ws.send_json(
                {"type": "session.updated", "session": {"id": session_id}}
            )
        elif kind == "input_audio_buffer.append":
            buf.extend(base64.b64decode(ev.get("audio", "")))
        elif kind == "input_audio_buffer.commit":
            pcm = (
                np.frombuffer(bytes(buf), np.int16).astype(np.float32) / 32768.0
            )
            if ev.get("final", True):
                buf.clear()
            features = log_mel_spectrogram(pcm, n_mels=eng.model.n_mels)
            prompt_ids = eng.decoder_prompt(None, "transcribe")
            params = SamplingParams(
                max_tokens=eng.model.dec_positions - len(prompt_ids) - 1,
                temperature=0.0,
            )
            text = ""
            async for out in server.engine.transcribe_stream(
                features, prompt_ids, params
            ):
                if out.new_text:
                    text += out.new_text
                    await ws.send_json(
                        {"type": "transcription.delta", "delta": out.new_text}
                    )
            await ws.send_json({"type": "transcription.done", "text": text})
        elif kind is not None:
            await ws.send_json(
                {"type": "error",
                 "error": {"message": f"unsupported event {kind}"}}
            )
    return ws


def add_audio_routes(app) -> None:
    app.add_routes(
        [
            web.post("/v1/audio/transcriptions", transcriptions),
            web.post("/v1/audio/translations", translations),
            web.get("/v1/realtime", realtime),
        ]
    )
