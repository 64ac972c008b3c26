# SPDX-License-Identifier: Apache-2.0
"""Tokenizer integration: HF checkpoints and GGUF-embedded vocabularies.

The reference gets tokenization from upstream vLLM/transformers (plus a
ByteLevel compat patch, ``/root/reference/vllm_metal/compat.py:499``).  Here
tokenizers come from two sources:

* a HF model dir / hub id -> ``transformers.AutoTokenizer``;
* the GGUF metadata itself (``tokenizer.ggml.*``) -> a ``tokenizers`` BPE
  (gpt2-style, exact) or Unigram (SPM-style, score-based) pipeline, so a
  single .gguf file serves end-to-end with no side files.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

logger = logging.getLogger(__name__)


class EngineTokenizer:
    """Minimal surface the engine/server need."""

    def __init__(self, backend: Any, eos_token_id: Optional[int],
                 bos_token_id: Optional[int] = None,
                 chat_template: Optional[str] = None,
                 add_bos: bool = False):
        self._t = backend
        self.eos_token_id = eos_token_id
        self.bos_token_id = bos_token_id
        self.chat_template = chat_template
        self.add_bos = add_bos

    # -- encode/decode --------------------------------------------------
    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        if hasattr(self._t, "encode") and hasattr(self._t, "decode") \
                and not hasattr(self._t, "token_to_id"):
            # transformers tokenizer
            return self._t.encode(text, add_special_tokens=add_special_tokens)
        ids = self._t.encode(text, add_special_tokens=False).ids
        if add_special_tokens and self.add_bos \
                and self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids
        return ids

    def decode(self, ids: list[int], skip_special_tokens: bool = True
               ) -> str:
        if hasattr(self._t, "token_to_id"):
            return self._t.decode(ids, skip_special_tokens=skip_special_tokens)
        return self._t.decode(ids, skip_special_tokens=skip_special_tokens)

    # -- chat -----------------------------------------------------------
    def apply_chat_template(self, messages: list[dict],
                            add_generation_prompt: bool = True) -> str:
        if hasattr(self._t, "apply_chat_template") \
                and getattr(self._t, "chat_template", None):
            return self._t.apply_chat_template(
                messages, tokenize=False,
                add_generation_prompt=add_generation_prompt)
        if self.chat_template:
            import jinja2
            env = jinja2.Environment(keep_trailing_newline=True)
            env.globals["raise_exception"] = _raise_exception
            tmpl = env.from_string(self.chat_template)
            return tmpl.render(messages=messages,
                               add_generation_prompt=add_generation_prompt,
                               bos_token="", eos_token="")
        # fallback: simple role-tagged transcript
        out = []
        for m in messages:
            out.append(f"<|{m['role']}|>\n{m['content']}\n")
        if add_generation_prompt:
            out.append("<|assistant|>\n")
        return "".join(out)


def _raise_exception(msg):
    raise ValueError(msg)


def from_hf(path_or_id: str) -> EngineTokenizer:
    from transformers import AutoTokenizer
    t = AutoTokenizer.from_pretrained(path_or_id)
    return EngineTokenizer(t, eos_token_id=t.eos_token_id,
                           bos_token_id=t.bos_token_id)


def from_gguf(gguf_file) -> EngineTokenizer:
    """Build a tokenizer from GGUF ``tokenizer.ggml.*`` metadata."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    meta = gguf_file.metadata
    model_type = meta.get("tokenizer.ggml.model", "gpt2")
    if "tokenizer.ggml.tokens" not in meta:
        raise ValueError(
            "GGUF file has no embedded tokenizer (tokenizer.ggml.tokens); "
            "pass --tokenizer <hf-dir-or-id>")
    tokens: list[str] = meta["tokenizer.ggml.tokens"]
    eos = meta.get("tokenizer.ggml.eos_token_id")
    bos = meta.get("tokenizer.ggml.bos_token_id")
    add_bos = bool(meta.get("tokenizer.ggml.add_bos_token", False))
    chat_template = meta.get("tokenizer.chat_template")

    if model_type == "gpt2":
        vocab = {tok: i for i, tok in enumerate(tokens)}
        merges_raw = meta.get("tokenizer.ggml.merges", [])
        merges = [tuple(m.split(" ", 1)) for m in merges_raw]
        bpe = models.BPE(vocab=vocab, merges=merges, fuse_unk=False,
                         byte_fallback=False)
        tok = Tokenizer(bpe)
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(
            add_prefix_space=False, use_regex=True)
        tok.decoder = decoders.ByteLevel()
    elif model_type in ("llama", "spm"):
        scores = meta.get("tokenizer.ggml.scores",
                          [0.0] * len(tokens))
        uni = models.Unigram([(t, float(s)) for t, s in zip(tokens, scores)],
                             unk_id=int(meta.get(
                                 "tokenizer.ggml.unknown_token_id", 0)),
                             byte_fallback=True)
        tok = Tokenizer(uni)
        tok.pre_tokenizer = pre_tokenizers.Metaspace(
            replacement="▁", prepend_scheme="first")
        tok.decoder = decoders.Sequence([
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(content=" ", left=1),
        ])
        logger.warning(
            "GGUF SPM tokenizer built via Unigram scores; prefer passing "
            "--tokenizer <hf-dir> for exact parity")
    else:
        raise ValueError(f"unsupported GGUF tokenizer model {model_type!r}")

    return EngineTokenizer(
        tok, eos_token_id=int(eos) if eos is not None else None,
        bos_token_id=int(bos) if bos is not None else None,
        chat_template=chat_template, add_bos=add_bos)
