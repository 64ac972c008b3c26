# SPDX-License-Identifier: Apache-2.0
"""OpenAI-compatible HTTP API on aiohttp."""

from __future__ import annotations

import json
import logging
import time
import uuid
from typing import Any, Optional

from aiohttp import web

from ..engine.sampling_params import SamplingParams
from .async_engine import AsyncEngine


@web.middleware
async def _json_errors(request: web.Request, handler):
    """Malformed request bodies get a 400 JSON error, not an aiohttp 500."""
    try:
        return await handler(request)
    except json.JSONDecodeError:
        return web.json_response(
            {"error": {"message": "request body is not valid JSON"}},
            status=400)

logger = logging.getLogger(__name__)


def _params_from_request(body: dict, default_max: int = 256) -> SamplingParams:
    def g(key, default):
        v = body.get(key)
        return default if v is None else v

    return SamplingParams(
        max_tokens=int(g("max_tokens", g("max_completion_tokens",
                                         default_max))),
        temperature=float(g("temperature", 1.0)),
        top_p=float(g("top_p", 1.0)),
        top_k=int(g("top_k", 0)),
        min_p=float(g("min_p", 0.0)),
        repetition_penalty=float(g("repetition_penalty", 1.0)),
        presence_penalty=float(g("presence_penalty", 0.0)),
        frequency_penalty=float(g("frequency_penalty", 0.0)),
        stop=g("stop", []) if isinstance(g("stop", []), list)
        else [g("stop", "")],
        stop_token_ids=g("stop_token_ids", []),
        seed=body.get("seed"),
        logprobs=body.get("logprobs") if isinstance(body.get("logprobs"), int)
        else None,
        include_stop_str_in_output=bool(
            g("include_stop_str_in_output", False)),
        ignore_eos=bool(g("ignore_eos", False)),
    )


def _chat_logprobs_params(body: dict, params: SamplingParams) -> None:
    """Chat convention: ``logprobs`` is a bool, ``top_logprobs`` an int
    (0-20).  Map onto the engine's single ``logprobs=k`` knob."""
    if body.get("logprobs") is True:
        k = body.get("top_logprobs") or 0
        if not isinstance(k, int) or not 0 <= k <= 20:
            raise ValueError("top_logprobs must be an int in [0, 20]")
        params.logprobs = k
    elif isinstance(body.get("logprobs"), int):
        # tolerate the completions-style int form on the chat endpoint
        params.logprobs = body["logprobs"]
    else:
        params.logprobs = None


class OpenAIServer:
    def __init__(self, async_engine: AsyncEngine, tokenizer: Any,
                 model_name: str = "vllm-metal-tpu-model"):
        self.engine = async_engine
        self.tok = tokenizer
        self.model_name = model_name
        self.started = time.time()
        self.vocab_size = async_engine.engine.cfg.model.vocab_size

    def _attach_grammar(self, body: dict, params) -> None:
        """Structured output: guided_choice / guided_regex / guided_json /
        response_format -> token-bitmask grammar on the request params
        (the reference accepts these through vLLM's API and applies
        xgrammar masks, ``/root/reference/vllm_metal/v1/structured_output.py``;
        here the producer is in-repo, ``engine/guided.py``)."""
        from ..engine.guided import grammar_from_request
        grammar = grammar_from_request(
            body, self.tok, self.vocab_size,
            getattr(self.tok, "eos_token_id", None))
        if grammar is not None:
            if getattr(self.engine, "feed", None) is not None:
                raise ValueError(
                    "guided decoding is unsupported in multi-host "
                    "serving (grammar state has no wire format)")
            params.grammar = grammar

    def _check_ids(self, prompt_ids) -> Optional[str]:
        """Token-id prompts come straight off the wire; an out-of-range id
        would silently clamp in the embedding gather (XLA semantics) and
        generate garbage, so reject it at the API edge instead."""
        for t in prompt_ids:
            if not isinstance(t, int) or not 0 <= t < self.vocab_size:
                return (f"prompt token id {t!r} out of range "
                        f"[0, {self.vocab_size})")
        return None

    # ------------------------------------------------------------------
    def app(self) -> web.Application:
        app = web.Application(middlewares=[_json_errors])
        app.router.add_get("/health", self.health)
        app.router.add_get("/ping", self.health)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_post("/v1/rerank", self.rerank)
        app.router.add_post("/rerank", self.rerank)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/tokenize", self.tokenize)
        app.router.add_post("/detokenize", self.detokenize)
        app.router.add_post("/start_profile", self.start_profile)
        app.router.add_post("/stop_profile", self.stop_profile)
        return app

    async def health(self, request: web.Request) -> web.Response:
        status = await self.engine.check_health()
        if not status.get("healthy"):
            return web.json_response(
                {"status": "unhealthy",
                 "reason": status.get("reason", "")}, status=503)
        return web.json_response({"status": "ok"})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.started),
                      "owned_by": "vllm-metal-tpu"}],
        })

    async def metrics(self, request: web.Request) -> web.Response:
        e = self.engine.engine
        lines = [
            "# TYPE vllm_metal_tpu_prompt_tokens_total counter",
            f"vllm_metal_tpu_prompt_tokens_total {e.num_prompt_tokens}",
            "# TYPE vllm_metal_tpu_generation_tokens_total counter",
            f"vllm_metal_tpu_generation_tokens_total {e.num_generated_tokens}",
            "# TYPE vllm_metal_tpu_preemptions_total counter",
            f"vllm_metal_tpu_preemptions_total {e.num_preemptions}",
            "# TYPE vllm_metal_tpu_kv_cache_usage gauge",
            f"vllm_metal_tpu_kv_cache_usage {e.bm.usage():.6f}",
            "# TYPE vllm_metal_tpu_num_waiting gauge",
            f"vllm_metal_tpu_num_waiting {len(e.scheduler.waiting)}",
            "# TYPE vllm_metal_tpu_num_running gauge",
            f"vllm_metal_tpu_num_running {len(e.scheduler.running)}",
            "# TYPE vllm_metal_tpu_window_steps_total counter",
            f"vllm_metal_tpu_window_steps_total {e.num_window_steps}",
            "# TYPE vllm_metal_tpu_single_steps_total counter",
            f"vllm_metal_tpu_single_steps_total {e.num_single_steps}",
            "# TYPE vllm_metal_tpu_overshoot_tokens_total counter",
            f"vllm_metal_tpu_overshoot_tokens_total "
            f"{e.num_overshoot_tokens}",
            "# TYPE vllm_metal_tpu_ttft_seconds histogram",
        ]
        cum = 0
        for bound, cnt in zip(e.ttft_bucket_bounds, e.ttft_bucket_counts):
            cum += cnt
            lines.append(
                f'vllm_metal_tpu_ttft_seconds_bucket{{le="{bound}"}} {cum}')
        lines.append(
            f'vllm_metal_tpu_ttft_seconds_bucket{{le="+Inf"}} '
            f'{e.ttft_count}')
        lines.append(f"vllm_metal_tpu_ttft_seconds_sum {e.ttft_sum:.6f}")
        lines.append(f"vllm_metal_tpu_ttft_seconds_count {e.ttft_count}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def embeddings(self, request: web.Request) -> web.Response:
        body = await request.json()
        inputs = body.get("input", "")
        if isinstance(inputs, str):
            inputs = [inputs]
        data = []
        for i, text in enumerate(inputs):
            ids = text if isinstance(text, list) else self.tok.encode(text)
            vec = await self.engine.embed(ids)
            data.append({"object": "embedding", "index": i,
                         "embedding": [float(x) for x in vec]})
        return web.json_response({
            "object": "list", "data": data, "model": self.model_name,
            "usage": {"prompt_tokens": sum(
                len(t) if isinstance(t, list) else len(self.tok.encode(t))
                for t in inputs), "total_tokens": 0},
        })

    def _yes_no_ids(self) -> Optional[tuple[int, int]]:
        """(no_id, yes_id) resolved from the tokenizer, or None.

        The reference gates classify pooling on the Qwen3-reranker
        ('no', 'yes') single-token pair
        (``/root/reference/vllm_metal/v1/pooling.py:20,208``)."""
        ids = []
        for tok in ("no", "yes"):
            tid = None
            conv = getattr(self.tok, "convert_tokens_to_ids", None)
            if conv is not None:
                t = conv(tok)
                if isinstance(t, int) and t >= 0:
                    tid = t
            if tid is None:
                enc = self.tok.encode(tok)
                if isinstance(enc, list) and len(enc) == 1:
                    tid = int(enc[0])
            if tid is None or not 0 <= tid < self.vocab_size:
                return None
            ids.append(tid)
        return ids[0], ids[1]

    async def rerank(self, request: web.Request) -> web.Response:
        """Cohere-style rerank: score each (query, document) pair with
        the yes/no classify head."""
        body = await request.json()
        query = body.get("query", "")
        documents = body.get("documents", [])
        if not isinstance(documents, list) or not documents:
            return web.json_response(
                {"error": {"message": "documents must be a non-empty "
                                      "list"}}, status=400)
        pair = self._yes_no_ids()
        if pair is None:
            return web.json_response(
                {"error": {"message": "tokenizer has no single-token "
                                      "'no'/'yes' pair; classify head "
                                      "unavailable"}}, status=400)
        no_id, yes_id = pair
        template = body.get(
            "prompt_template",
            "Judge whether the Document meets the requirements based on "
            "the Query. Answer only \"yes\" or \"no\".\n"
            "<Query>: {query}\n<Document>: {document}\nAnswer:")
        results = []
        for i, doc in enumerate(documents):
            ids = self.tok.encode(
                template.format(query=query, document=doc))
            score = await self.engine.classify(ids, no_id, yes_id)
            results.append({"index": i, "relevance_score": score})
        results.sort(key=lambda r: -r["relevance_score"])
        top_n = body.get("top_n")
        if isinstance(top_n, int) and top_n > 0:
            results = results[:top_n]
        return web.json_response({
            "model": self.model_name, "results": results,
            "usage": {"total_tokens": 0}})

    async def tokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        ids = self.tok.encode(body.get("prompt", ""))
        return web.json_response({"tokens": ids, "count": len(ids)})

    async def detokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        return web.json_response(
            {"prompt": self.tok.decode(body.get("tokens", []))})

    async def start_profile(self, request: web.Request) -> web.Response:
        import jax
        trace_dir = "/tmp/vllm_metal_tpu_profile"
        jax.profiler.start_trace(trace_dir)
        return web.json_response({"status": "started", "dir": trace_dir})

    async def stop_profile(self, request: web.Request) -> web.Response:
        import jax
        jax.profiler.stop_trace()
        return web.json_response({"status": "stopped"})

    # ------------------------------------------------------------------
    async def completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list) and prompt \
                and isinstance(prompt[0], int):
            prompt_ids = prompt
            err = self._check_ids(prompt_ids)
            if err:
                return web.json_response({"error": {"message": err}},
                                         status=400)
        elif isinstance(prompt, list):
            return web.json_response(
                {"error": "batch prompts not supported yet"}, status=400)
        else:
            prompt_ids = self.tok.encode(prompt)
        try:
            params = _params_from_request(body)
            self._attach_grammar(body, params)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        lora_name = self._lora_name(body)
        stream = bool(body.get("stream", False))
        if stream:
            return await self._stream(request, rid, prompt_ids, params,
                                      chat=False, lora_name=lora_name)
        try:
            out, text = await self._collect(rid, prompt_ids, params,
                                            lora_name=lora_name)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        lp_obj = None
        if params.logprobs is not None:
            lp_obj = self._completion_logprobs(out, params.logprobs)
        return web.json_response({
            "id": rid, "object": "text_completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{
                "index": 0, "text": text,
                "finish_reason": out.finish_reason,
                "logprobs": lp_obj,
            }],
            "usage": {
                "prompt_tokens": len(prompt_ids),
                "completion_tokens": len(out.token_ids),
                "total_tokens": len(prompt_ids) + len(out.token_ids),
            },
        })

    def _extract_images(self, messages: list) -> tuple[list, list]:
        """Pull image parts out of OpenAI-style content lists.

        Returns (messages-with-placeholder-text, mm_features).  Each
        ``image_url`` part (data: URL base64) is preprocessed for the
        model's vision tower and replaced in the text by its
        placeholder-token run, which ``_admit_mm`` later re-locates.
        """
        model = self.engine.engine.runner.model
        vc = getattr(model, "vision_cfg", None)
        if vc is None:
            return messages, []
        from ..multimodal.mrope import MMFeature
        from ..multimodal.processor import preprocess_image
        image_tok = self.tok.decode([model.image_token_id])
        feats = []
        out_msgs = []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                out_msgs.append(m)
                continue
            parts = []
            for p in content:
                if p.get("type") == "image_url":
                    url = p["image_url"]["url"] \
                        if isinstance(p.get("image_url"), dict) \
                        else p.get("image_url", "")
                    if not url.startswith("data:"):
                        raise ValueError(
                            "only data: image URLs are supported "
                            "(zero-egress deployment)")
                    import base64
                    data = base64.b64decode(url.split(",", 1)[1])
                    patches, grid = preprocess_image(data, vc)
                    f = MMFeature(offset=-1, grid_thw=grid,
                                  pixel_patches=patches)
                    feats.append(f)
                    n = f.num_tokens(vc.spatial_merge_size)
                    parts.append(image_tok * n)
                elif p.get("type") == "text":
                    parts.append(p.get("text", ""))
            out_msgs.append({**m, "content": "".join(parts)})
        return out_msgs, feats

    async def chat_completions(self, request: web.Request
                               ) -> web.StreamResponse:
        body = await request.json()
        messages = body.get("messages", [])
        try:
            messages, mm_features = self._extract_images(messages)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        prompt = self.tok.apply_chat_template(messages)
        prompt_ids = self.tok.encode(prompt, add_special_tokens=False)
        try:
            params = _params_from_request(body)
            _chat_logprobs_params(body, params)
            self._attach_grammar(body, params)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        lora_name = self._lora_name(body)
        if bool(body.get("stream", False)):
            return await self._stream(request, rid, prompt_ids, params,
                                      chat=True, mm_features=mm_features,
                                      lora_name=lora_name)
        try:
            out, text = await self._collect(rid, prompt_ids, params,
                                            mm_features=mm_features,
                                            lora_name=lora_name)
        except ValueError as e:
            return web.json_response({"error": {"message": str(e)}},
                                     status=400)
        lp_obj = None
        if params.logprobs is not None:
            lp_obj = self._chat_logprobs(out, params.logprobs)
        return web.json_response({
            "id": rid, "object": "chat.completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": out.finish_reason,
                "logprobs": lp_obj,
            }],
            "usage": {
                "prompt_tokens": len(prompt_ids),
                "completion_tokens": len(out.token_ids),
                "total_tokens": len(prompt_ids) + len(out.token_ids),
            },
        })

    # ------------------------------------------------------------------
    def _lora_name(self, body: dict) -> Optional[str]:
        """Per-request adapter selection: explicit ``lora_name``, or the
        ``model`` field when it names a loaded adapter (the vLLM
        convention; reference routes per-step token->slot the same way,
        ``/root/reference/vllm_metal/v1/lora/runtime.py``)."""
        mgr = getattr(self.engine.engine.runner, "lora_manager", None)
        if mgr is None:
            return None
        name = body.get("lora_name")
        if name is None and body.get("model") in mgr.name_to_slot:
            name = body["model"]
        return name

    async def _collect(self, rid, prompt_ids, params, mm_features=None,
                       lora_name=None):
        last = None
        async for out in self.engine.generate(prompt_ids, params, rid,
                                              mm_features=mm_features,
                                              lora_name=lora_name):
            last = out
        # the engine's detokenizer owns stop-string-truncated text (and
        # terminated generation at the stop); requests without stop
        # strings decode here
        text = last.text if last.text is not None \
            else self.tok.decode(last.token_ids)
        return last, text

    # ------------------------------------------------------------------
    def _token_str(self, tid: int) -> str:
        return self.tok.decode([int(tid)])

    def _completion_logprobs(self, out, k: int, start: int = 0) -> dict:
        """OpenAI completions ``logprobs`` object for out.token_ids[start:]."""
        toks = out.token_ids[start:]
        lps = (out.logprobs or [])[start:]
        strs = [self._token_str(t) for t in toks]
        # text_offset counts from the start of the completion text
        offsets = []
        off = sum(len(self._token_str(t)) for t in out.token_ids[:start])
        for s in strs:
            offsets.append(off)
            off += len(s)
        top = None
        if out.top_logprobs is not None and k > 0:
            top = [{self._token_str(tid): lp for tid, lp in pairs[:k]}
                   for pairs in out.top_logprobs[start:]]
        return {"tokens": strs,
                "token_logprobs": [float(x) for x in lps],
                "top_logprobs": top,
                "text_offset": offsets}

    def _chat_logprobs(self, out, k: int, start: int = 0) -> dict:
        """OpenAI chat ``logprobs`` object (content entry list)."""
        content = []
        toks = out.token_ids[start:]
        lps = (out.logprobs or [])[start:]
        tops = (out.top_logprobs or [])[start:] \
            if out.top_logprobs is not None else [None] * len(toks)
        for t, lp, pairs in zip(toks, lps, tops):
            s = self._token_str(t)
            entry = {"token": s, "logprob": float(lp),
                     "bytes": list(s.encode("utf-8"))}
            if pairs is not None and k > 0:
                entry["top_logprobs"] = [
                    {"token": self._token_str(tid),
                     "logprob": float(v),
                     "bytes": list(self._token_str(tid).encode("utf-8"))}
                    for tid, v in pairs[:k]]
            else:
                entry["top_logprobs"] = []
            content.append(entry)
        return {"content": content}

    async def _stream(self, request, rid, prompt_ids, params, chat: bool,
                      mm_features=None, lora_name=None
                      ) -> web.StreamResponse:
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        sent_text = ""
        obj = "chat.completion.chunk" if chat else "text_completion"
        try:
            if chat:
                first = {"id": rid, "object": obj,
                         "created": int(time.time()),
                         "model": self.model_name,
                         "choices": [{"index": 0, "delta": {
                             "role": "assistant", "content": ""},
                             "finish_reason": None}]}
                await resp.write(f"data: {json.dumps(first)}\n\n".encode())
            sent_lp = 0
            async for out in self.engine.generate(
                    prompt_ids, params, rid, mm_features=mm_features,
                    lora_name=lora_name):
                # engine detokenizer text (stop-safe prefix while
                # unfinished) when present; plain decode otherwise
                full = out.text if out.text is not None \
                    else self.tok.decode(out.token_ids)
                delta = full[len(sent_text):]
                # hold back partial multi-byte glyphs
                if delta.endswith("�") and not out.finished:
                    continue
                if not delta and not out.finished:
                    continue
                sent_text = full
                lp_obj = None
                if params.logprobs is not None:
                    lp_obj = (self._chat_logprobs if chat
                              else self._completion_logprobs)(
                        out, params.logprobs, start=sent_lp)
                    sent_lp = len(out.token_ids)
                finish = out.finish_reason if out.finished else None
                if chat:
                    choice = {"index": 0, "delta": {"content": delta},
                              "finish_reason": finish}
                else:
                    choice = {"index": 0, "text": delta,
                              "finish_reason": finish}
                if lp_obj is not None:
                    choice["logprobs"] = lp_obj
                payload = {"id": rid, "object": obj,
                           "created": int(time.time()),
                           "model": self.model_name,
                           "choices": [choice]}
                await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
        except ConnectionResetError:
            self.engine.abort(rid)
        return resp


def serve(engine, tokenizer, host: str = "0.0.0.0", port: int = 8000,
          model_name: str = "model", feed=None) -> None:
    import asyncio

    async_engine = AsyncEngine(engine, feed=feed)
    server = OpenAIServer(async_engine, tokenizer, model_name)
    app = server.app()

    async def _main():
        async_engine.start(asyncio.get_running_loop())
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        logger.info("serving on http://%s:%d", host, port)
        while True:
            await asyncio.sleep(3600)

    asyncio.run(_main())
