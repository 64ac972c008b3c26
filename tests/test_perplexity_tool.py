# SPDX-License-Identifier: Apache-2.0
"""Smoke test for tools/perplexity.py (the Δppl harness of
docs/validation.md) on a synthetic GGUF."""

import json
import os
import subprocess
import sys

from tests.test_server import gguf_path  # noqa: F401  (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perplexity_smoke(gguf_path, tmp_path):  # noqa: F811
    text = tmp_path / "t.txt"
    # the toy tokenizer knows single chars 0-9a-zA-Z
    text.write_text("0123456789abcdef" * 8)
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "VLLM_METAL_TPU_PALLAS_INTERPRET": "0"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "perplexity.py"),
         gguf_path, "--text", str(text), "--ctx", "64", "--stride", "32"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["tokens_scored"] > 50
    assert 0 < data["nll_per_token"] < 20
    assert data["perplexity"] > 1
