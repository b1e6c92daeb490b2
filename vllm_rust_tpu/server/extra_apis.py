"""OpenAI Responses API + Files/Batches (in-memory).

Reference: api/responses.rs (+responses_types.rs) and api/batch.rs
(in-memory async batch-job store: submit → poll → JSONL results).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any

from aiohttp import web


class ResponsesStore:
    """POST /v1/responses (create) + GET/{id} + POST/{id}/cancel."""

    def __init__(self, server):
        self.server = server
        self.items: dict[str, dict] = {}
        self.tasks: dict[str, asyncio.Task] = {}

    async def create(self, request):
        body = await request.json()
        rid = f"resp_{uuid.uuid4().hex[:24]}"
        inp = body.get("input", "")
        if isinstance(inp, str):
            messages = [{"role": "user", "content": inp}]
        else:
            messages = [
                {
                    "role": m.get("role", "user"),
                    "content": m.get("content", "")
                    if isinstance(m.get("content"), str)
                    else "".join(
                        c.get("text", "")
                        for c in m.get("content", [])
                        if isinstance(c, dict)
                    ),
                }
                for m in inp
            ]
        if body.get("instructions"):
            messages.insert(0, {"role": "system", "content": body["instructions"]})
        prompt = self.server.tokenizer.apply_chat_template(
            messages, add_generation_prompt=True
        )
        from ..request import SamplingParams

        params = SamplingParams(
            max_tokens=body.get("max_output_tokens", 1024),
            temperature=body.get("temperature", 1.0),
            top_p=body.get("top_p", 1.0),
        )
        item = {
            "id": rid,
            "object": "response",
            "created_at": int(time.time()),
            "status": "in_progress",
            "model": body.get("model") or self.server.model_name,
            "output": [],
            "usage": None,
            "error": None,
        }
        self.items[rid] = item

        async def run():
            try:
                out = await self.server.engine.generate(prompt, params, rid)
                item["status"] = "completed"
                item["output"] = [
                    {
                        "type": "message",
                        "id": f"msg_{uuid.uuid4().hex[:16]}",
                        "role": "assistant",
                        "status": "completed",
                        "content": [
                            {"type": "output_text", "text": out.output_text,
                             "annotations": []}
                        ],
                    }
                ]
                item["usage"] = {
                    "input_tokens": 0,
                    "output_tokens": len(out.token_ids),
                    "total_tokens": len(out.token_ids),
                }
            except asyncio.CancelledError:
                item["status"] = "cancelled"
            except Exception as e:
                item["status"] = "failed"
                item["error"] = {"message": str(e)}

        if body.get("background"):
            self.tasks[rid] = asyncio.ensure_future(run())
            return web.json_response(item)
        await run()
        return web.json_response(item)

    async def get(self, request):
        rid = request.match_info["rid"]
        item = self.items.get(rid)
        if item is None:
            return web.json_response(
                {"error": {"message": f"response {rid} not found"}}, status=404
            )
        return web.json_response(item)

    async def cancel(self, request):
        rid = request.match_info["rid"]
        item = self.items.get(rid)
        if item is None:
            return web.json_response(
                {"error": {"message": f"response {rid} not found"}}, status=404
            )
        t = self.tasks.get(rid)
        if t and not t.done():
            self.server.engine.abort(rid)
            t.cancel()
        return web.json_response(item)


class BatchStore:
    """Minimal Files + Batches: upload a JSONL of chat/completion requests,
    run them through the engine, poll, download results."""

    def __init__(self, server):
        self.server = server
        self.files: dict[str, bytes] = {}
        self.batches: dict[str, dict] = {}
        self.tasks: dict[str, asyncio.Task] = {}

    async def upload_file(self, request):
        data = await request.post()
        f = data.get("file")
        content = f.file.read() if hasattr(f, "file") else bytes(f or b"")
        fid = f"file-{uuid.uuid4().hex[:24]}"
        self.files[fid] = content
        return web.json_response(
            {
                "id": fid,
                "object": "file",
                "bytes": len(content),
                "created_at": int(time.time()),
                "filename": getattr(f, "filename", "batch.jsonl"),
                "purpose": data.get("purpose", "batch"),
            }
        )

    async def file_content(self, request):
        fid = request.match_info["fid"]
        if fid not in self.files:
            return web.json_response(
                {"error": {"message": f"file {fid} not found"}}, status=404
            )
        return web.Response(
            body=self.files[fid], content_type="application/jsonl"
        )

    async def create_batch(self, request):
        body = await request.json()
        fid = body.get("input_file_id")
        if fid not in self.files:
            return web.json_response(
                {"error": {"message": f"input_file_id {fid} not found"}},
                status=400,
            )
        bid = f"batch_{uuid.uuid4().hex[:24]}"
        batch = {
            "id": bid,
            "object": "batch",
            "endpoint": body.get("endpoint", "/v1/chat/completions"),
            "status": "in_progress",
            "input_file_id": fid,
            "output_file_id": None,
            "created_at": int(time.time()),
            "request_counts": {"total": 0, "completed": 0, "failed": 0},
        }
        self.batches[bid] = batch
        self.tasks[bid] = asyncio.ensure_future(self._run(batch))
        return web.json_response(batch)

    async def _run(self, batch):
        from ..request import SamplingParams

        lines = [
            l for l in self.files[batch["input_file_id"]].decode().splitlines() if l
        ]
        batch["request_counts"]["total"] = len(lines)
        results = []
        for line in lines:
            try:
                req = json.loads(line)
                body = req.get("body", {})
                if "messages" in body:
                    prompt = self.server.tokenizer.apply_chat_template(
                        body["messages"], add_generation_prompt=True
                    )
                else:
                    prompt = body.get("prompt", "")
                params = SamplingParams(
                    max_tokens=body.get("max_tokens", 128),
                    temperature=body.get("temperature", 1.0),
                )
                out = await self.server.engine.generate(prompt, params)
                results.append(
                    {
                        "id": f"batch_req_{uuid.uuid4().hex[:12]}",
                        "custom_id": req.get("custom_id"),
                        "response": {
                            "status_code": 200,
                            "body": {
                                "choices": [
                                    {
                                        "index": 0,
                                        "message": {
                                            "role": "assistant",
                                            "content": out.output_text,
                                        },
                                        "finish_reason": "stop",
                                    }
                                ]
                            },
                        },
                        "error": None,
                    }
                )
                batch["request_counts"]["completed"] += 1
            except Exception as e:
                results.append(
                    {
                        "custom_id": None,
                        "response": None,
                        "error": {"message": str(e)},
                    }
                )
                batch["request_counts"]["failed"] += 1
        out_fid = f"file-{uuid.uuid4().hex[:24]}"
        self.server  # keep ref
        self.files[out_fid] = "\n".join(json.dumps(r) for r in results).encode()
        batch["output_file_id"] = out_fid
        batch["status"] = "completed"

    async def get_batch(self, request):
        bid = request.match_info["bid"]
        b = self.batches.get(bid)
        if b is None:
            return web.json_response(
                {"error": {"message": f"batch {bid} not found"}}, status=404
            )
        return web.json_response(b)

    async def cancel_batch(self, request):
        bid = request.match_info["bid"]
        b = self.batches.get(bid)
        if b is None:
            return web.json_response(
                {"error": {"message": f"batch {bid} not found"}}, status=404
            )
        t = self.tasks.get(bid)
        if t and not t.done():
            t.cancel()
            b["status"] = "cancelled"
        return web.json_response(b)

    async def list_batches(self, request):
        return web.json_response(
            {"object": "list", "data": list(self.batches.values())}
        )


def add_extra_routes(app: web.Application, server) -> None:
    responses = ResponsesStore(server)
    batches = BatchStore(server)
    app["responses_store"] = responses
    app["batch_store"] = batches
    app.add_routes(
        [
            web.post("/v1/responses", responses.create),
            web.get("/v1/responses/{rid}", responses.get),
            web.post("/v1/responses/{rid}/cancel", responses.cancel),
            web.post("/v1/files", batches.upload_file),
            web.get("/v1/files/{fid}/content", batches.file_content),
            web.post("/v1/batches", batches.create_batch),
            web.get("/v1/batches", batches.list_batches),
            web.get("/v1/batches/{bid}", batches.get_batch),
            web.post("/v1/batches/{bid}/cancel", batches.cancel_batch),
        ]
    )
