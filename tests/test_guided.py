# SPDX-License-Identifier: Apache-2.0
"""Guided decoding: regex DFA, JSON PDA, schema->regex, token masks, and
engine e2e conformance (reference role: vLLM's xgrammar producer the
reference plugs into, ``/root/reference/vllm_metal/v1/structured_output.py``
— owned in-repo here)."""

import json

import numpy as np
import pytest

from vllm_metal_tpu.engine.guided import (AcceptorGrammar, CharTrie,
                                          JsonAcceptor, RegexDFA,
                                          grammar_from_request,
                                          json_schema_to_regex)


def accepts(acc, text: str) -> bool:
    state = acc.initial()
    for ch in text:
        state = acc.advance(state, ch)
        if state is None:
            return False
    return acc.is_accepting(state)


class TestRegexDFA:
    def test_literals_and_alternation(self):
        dfa = RegexDFA("(red|green|blue)")
        assert accepts(dfa, "red") and accepts(dfa, "blue")
        assert not accepts(dfa, "re") and not accepts(dfa, "redx")

    def test_star_plus_optional(self):
        dfa = RegexDFA("ab*c+d?")
        assert accepts(dfa, "ac") and accepts(dfa, "abbbccd")
        assert not accepts(dfa, "ad") and not accepts(dfa, "abc" + "x")

    def test_classes_and_escapes(self):
        dfa = RegexDFA(r"[a-c]\d+\.[^x]")
        assert accepts(dfa, "b42.y")
        assert not accepts(dfa, "d1.y") and not accepts(dfa, "a1.x")

    def test_bounded_repeat(self):
        dfa = RegexDFA(r"a{2,4}")
        assert not accepts(dfa, "a")
        assert accepts(dfa, "aa") and accepts(dfa, "aaaa")
        assert not accepts(dfa, "aaaaa")

    def test_exact_repeat_and_groups(self):
        dfa = RegexDFA(r"(ab){2}")
        assert accepts(dfa, "abab")
        assert not accepts(dfa, "ab") and not accepts(dfa, "ababab")


class TestJsonAcceptor:
    @pytest.mark.parametrize("text", [
        '{"a": 1}', '[1, 2.5, -3e2]', '"hi\\nthere"', "true", "null",
        '{"k": {"n": [false, {}]}, "s": "x"}', "0", "-0.5", "[]",
        ' { "a" : [ 1 , 2 ] } ',
    ])
    def test_valid(self, text):
        assert accepts(JsonAcceptor(), text), text

    @pytest.mark.parametrize("text", [
        '{', '{"a" 1}', "[1,]", "tru", "01", "-", '"unterminated',
        '{"a": 1,}', "[1 2]", '{"a": }', "1.", "1e",
    ])
    def test_invalid(self, text):
        assert not accepts(JsonAcceptor(), text), text


class TestSchemaRegex:
    def _ok(self, schema, value) -> bool:
        return accepts(RegexDFA(json_schema_to_regex(schema)),
                       json.dumps(value, separators=(",", ":")))

    def test_object(self):
        schema = {"type": "object",
                  "properties": {"name": {"type": "string"},
                                 "age": {"type": "integer"}},
                  "required": ["name", "age"]}
        assert self._ok(schema, {"name": "bo", "age": 3})
        assert not self._ok(schema, {"name": "bo"})
        assert not self._ok(schema, {"name": "bo", "age": "x"})

    def test_optional_property(self):
        schema = {"type": "object",
                  "properties": {"a": {"type": "integer"},
                                 "b": {"type": "boolean"}},
                  "required": ["a"]}
        assert self._ok(schema, {"a": 1})
        assert self._ok(schema, {"a": 1, "b": True})

    def test_enum_array_anyof(self):
        schema = {"type": "array",
                  "items": {"enum": ["x", "y", 3]},
                  "minItems": 1, "maxItems": 3}
        assert self._ok(schema, ["x", 3])
        assert not self._ok(schema, [])
        assert not self._ok(schema, ["z"])
        schema2 = {"anyOf": [{"type": "integer"}, {"type": "null"}]}
        assert self._ok(schema2, 7) and self._ok(schema2, None)
        assert not self._ok(schema2, "s")


class FakeTok:
    """Greedy-longest-match toy tokenizer over explicit token strings."""

    def __init__(self, strings):
        self.strings = list(strings)
        self.eos_token_id = 0

    def decode(self, ids, skip_special_tokens=False):
        return "".join(self.strings[i] for i in ids)

    def encode(self, text, add_special_tokens=False):
        out = []
        while text:
            best = None
            for i, s in enumerate(self.strings):
                if s and text.startswith(s) and (
                        best is None
                        or len(s) > len(self.strings[best])):
                    best = i
            assert best is not None, text
            out.append(best)
            text = text[len(self.strings[best]):]
        return out


def _unpack(words, vocab):
    return [t for t in range(vocab)
            if words[t // 32] >> np.uint32(t % 32) & 1]


class TestMasks:
    def test_regex_masks_and_eos(self):
        tok = FakeTok(["</s>", "red", "green", "blue", "re", "d", "x"])
        body = {"guided_regex": "(red|green|blue)"}
        g = grammar_from_request(body, tok, 7, 0)
        allowed = _unpack(g.next_allowed([]), 7)
        assert sorted(allowed) == [1, 2, 3, 4]   # red green blue re
        allowed = _unpack(g.next_allowed([4]), 7)   # after "re"
        assert allowed == [5]                    # only "d"
        allowed = _unpack(g.next_allowed([4, 5]), 7)  # "red" complete
        assert allowed == [0]                    # only EOS

    def test_json_object_mode(self):
        tok = FakeTok(["</s>", "{", "}", '"a"', ":", "1", ",", "[", "]"])
        g = grammar_from_request({"response_format": {
            "type": "json_object"}}, tok, 9, 0)
        first = _unpack(g.next_allowed([]), 9)
        assert 1 in first and 7 in first and 5 in first   # { [ 1
        assert 0 not in first                             # not EOS yet
        done = _unpack(g.next_allowed([1, 3, 4, 5, 2]), 9)  # {"a":1}
        assert done == [0]

    def test_schema_via_response_format(self):
        tok = FakeTok(["</s>", "{", "}", '"n"', ":", '"', "ab", '"',
                       "9"])
        schema = {"type": "object", "properties": {"n": {"type": "string"}},
                  "required": ["n"]}
        g = grammar_from_request({"response_format": {
            "type": "json_schema",
            "json_schema": {"schema": schema}}}, tok, 9, 0)
        assert g is not None
        first = _unpack(g.next_allowed([]), 9)
        assert first == [1]                                # only '{'


def test_engine_guided_regex_e2e():
    """Masks enforced in the jitted sampler: greedy output of a RANDOM
    model must conform to the grammar and stop at acceptance."""
    import jax
    from vllm_metal_tpu.config import (CacheConfig, EngineConfig,
                                       ModelConfig, SchedulerConfig)
    from vllm_metal_tpu.engine.engine import LLMEngine
    from vllm_metal_tpu.engine.sampling_params import SamplingParams
    from vllm_metal_tpu.models.llama import LlamaModel

    strings = ["</s>", "red", "green", "blue", "re", "d", "x", "y",
               "z", "q", "w", "t", "u", "v", "m", "n"]
    tok = FakeTok(strings)
    mc = ModelConfig(vocab_size=16, hidden_size=64, intermediate_size=128,
                     num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                     max_model_len=128)
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = LlamaModel(mc)
    import jax.numpy as jnp
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=16, use_pallas=False,
                    eos_token_id=0)
    g = grammar_from_request({"guided_regex": "(red|green|blue)"},
                             tok, 16, 0)
    params = SamplingParams(temperature=0.0, max_tokens=8, grammar=g)
    outs = eng.generate([[3, 7, 2]], params)
    out = list(outs.values())[0]
    text = tok.decode([t for t in out.token_ids if t != 0])
    assert text in ("red", "green", "blue"), (out.token_ids, text)
