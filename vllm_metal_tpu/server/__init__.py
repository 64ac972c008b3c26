# SPDX-License-Identifier: Apache-2.0
"""OpenAI-compatible HTTP server (aiohttp).

The reference rides upstream vLLM's API server (SURVEY.md §0); this is the
in-repo equivalent: /v1/completions, /v1/chat/completions, /v1/models with
SSE streaming, plus health, Prometheus-style /metrics, and the profiler
start/stop endpoints (reference: ``/root/reference/vllm_metal/profiler/``,
mapped to ``jax.profiler`` traces per SURVEY.md §5).
"""
