# SPDX-License-Identifier: Apache-2.0
"""OpenAI-compatible audio endpoints (`/v1/audio/transcriptions`,
`/v1/audio/translations`).

The reference serves STT through vLLM's transcription API backed by a
dedicated ``STTModelRunner`` (``/root/reference/vllm_metal/v1/
stt_model_runner.py``, ``stt/serve.py``); here the transcriber is served
directly.  Transcription runs in a worker thread so the event loop stays
responsive; the JAX device work is already a single dispatch per chunk.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time

import numpy as np
from aiohttp import web

logger = logging.getLogger(__name__)


class STTServer:
    def __init__(self, transcriber, model_name: str = "whisper"):
        self.transcriber = transcriber
        self.model_name = model_name
        self.started = time.time()

    def app(self) -> web.Application:
        app = web.Application(client_max_size=512 * 1024 * 1024)
        app.router.add_get("/health", self.health)
        app.router.add_get("/ping", self.health)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/audio/transcriptions",
                            self.transcriptions)
        app.router.add_post("/v1/audio/translations", self.translations)
        return app

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.started),
                      "owned_by": "vllm-metal-tpu"}]})

    async def transcriptions(self, request: web.Request) -> web.Response:
        return await self._run(request, task="transcribe")

    async def translations(self, request: web.Request) -> web.Response:
        return await self._run(request, task="translate")

    async def _run(self, request: web.Request, task: str) -> web.Response:
        try:
            fields = await self._read_form(request)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        if "file" not in fields:
            return web.json_response(
                {"error": {"message": "missing 'file' form field"}},
                status=400)
        audio = self._decode_audio(fields["file"])
        if audio is None:
            return web.json_response(
                {"error": {"message": "could not decode audio file "
                                      "(PCM WAV expected)"}}, status=400)
        fmt = fields.get("response_format", "json")
        language = fields.get("language") or None
        prompt = fields.get("prompt") or None
        with_ts = fmt == "verbose_json"
        try:
            result = await asyncio.get_running_loop().run_in_executor(
                None, lambda: self.transcriber.transcribe(
                    audio, language=language, task=task, prompt=prompt,
                    with_timestamps=with_ts))
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        if fmt == "text":
            return web.Response(text=result.text,
                                content_type="text/plain")
        if fmt == "verbose_json":
            return web.json_response({
                "task": task, "language": result.language,
                "duration": result.duration, "text": result.text,
                "segments": [{
                    "id": s.id, "seek": s.seek, "start": s.start,
                    "end": s.end, "text": s.text, "tokens": s.tokens,
                } for s in result.segments]})
        return web.json_response({"text": result.text})

    async def _read_form(self, request: web.Request) -> dict:
        """Multipart form (or JSON with base64 'file') -> field dict."""
        ctype = request.content_type or ""
        fields: dict = {}
        if ctype.startswith("multipart/"):
            reader = await request.multipart()
            while True:
                part = await reader.next()
                if part is None:
                    break
                if part.name == "file":
                    fields["file"] = await part.read(decode=False)
                else:
                    fields[part.name] = (await part.text()).strip()
            return fields
        if ctype == "application/json":
            import base64
            try:
                body = json.loads(await request.text())
            except json.JSONDecodeError:
                raise ValueError("request body is not valid JSON")
            if "file" in body:
                fields = dict(body)
                fields["file"] = base64.b64decode(body["file"])
            return fields
        raise ValueError(f"unsupported content type {ctype!r}")

    def _decode_audio(self, data: bytes):
        from ..stt.audio import load_wav_bytes
        try:
            return load_wav_bytes(data)
        except Exception:  # noqa: BLE001 — wave raises varied errors
            # fall back to raw float32 PCM (testing convenience)
            if len(data) % 4 == 0 and len(data) > 0:
                x = np.frombuffer(data, np.float32)
                if np.all(np.isfinite(x)) and np.abs(x).max() <= 64.0:
                    return x.copy()
            return None


def serve_stt(transcriber, host: str = "0.0.0.0", port: int = 8000,
              model_name: str = "whisper") -> None:
    server = STTServer(transcriber, model_name)
    web.run_app(server.app(), host=host, port=port)
