# SPDX-License-Identifier: Apache-2.0
"""Guided decoding: regex / JSON-schema / JSON grammars as token bitmasks.

The reference relies on vLLM's xgrammar integration to produce masks and
only APPLIES them (``/root/reference/vllm_metal/v1/structured_output.py``);
this framework owns the producer too.  Design (outlines-style):

* a **character acceptor** — either a lazy-determinized DFA compiled from a
  regex subset, or a hand-written JSON pushdown machine — defines the
  language;
* the tokenizer's vocabulary is indexed once into a **character trie**;
* the allowed-token bitmask for an acceptor state is computed by walking
  the trie against the acceptor (a token is allowed iff the acceptor
  accepts its WHOLE string from the current state) and **memoized per
  state** — after warmup each step is a dict lookup;
* JSON schema support compiles the schema to a regex over canonical
  (compact) JSON, so ``json_schema`` rides the DFA path.

Byte-level caveat: tokens whose decoded text contains U+FFFD (partial
UTF-8 byte tokens) are excluded from masks — conservative but safe.
"""

from __future__ import annotations

import json
import re as _re
from typing import Any, Optional

import numpy as np

# ---------------------------------------------------------------------------
# vocabulary character trie
# ---------------------------------------------------------------------------


class CharTrie:
    """Trie over token strings; node = (children: dict[ch, node],
    token_ids ending at the node)."""

    __slots__ = ("children", "ids")

    def __init__(self):
        self.children: dict[str, CharTrie] = {}
        self.ids: list[int] = []

    def insert(self, s: str, tid: int) -> None:
        node = self
        for ch in s:
            nxt = node.children.get(ch)
            if nxt is None:
                nxt = CharTrie()
                node.children[ch] = nxt
            node = nxt
        node.ids.append(tid)


_TRIE_CACHE: dict[int, tuple[CharTrie, int]] = {}


def vocab_trie(tokenizer, vocab_size: int) -> CharTrie:
    """Build (and cache per tokenizer object) the vocabulary trie."""
    key = id(tokenizer)
    hit = _TRIE_CACHE.get(key)
    if hit is not None and hit[1] == vocab_size:
        return hit[0]
    trie = CharTrie()
    for tid in range(vocab_size):
        try:
            s = tokenizer.decode([tid], skip_special_tokens=False)
        except Exception:
            continue
        if not s or "�" in s:
            continue
        trie.insert(s, tid)
    _TRIE_CACHE[key] = (trie, vocab_size)
    return trie


# ---------------------------------------------------------------------------
# regex subset -> NFA -> lazy DFA
# ---------------------------------------------------------------------------

_EPS = None


class _NFA:
    """Thompson NFA: transitions[i] = list of (charset|None, target)."""

    def __init__(self):
        self.trans: list[list[tuple[Optional[frozenset], int]]] = []

    def state(self) -> int:
        self.trans.append([])
        return len(self.trans) - 1

    def edge(self, a: int, charset, b: int) -> None:
        self.trans[a].append((charset, b))


_CLASS_ESCAPES = {
    "d": frozenset("0123456789"),
    "w": frozenset("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
    "s": frozenset(" \t\n\r\f\v"),
    "n": frozenset("\n"), "t": frozenset("\t"), "r": frozenset("\r"),
}
# '.' matches any char except newline; modeled as complement marker
_DOT = "DOT"
_PRINTABLE = frozenset(chr(c) for c in range(32, 0x110000 if False else 127))


class RegexParser:
    """Recursive-descent parser for the supported regex subset:
    literals, ``.``, ``[...]`` classes (ranges, ``^`` negation), escapes
    (``\\d \\w \\s \\n \\t \\r`` + literal escapes), ``* + ? {m,n}``,
    ``|`` and ``(...)`` groups."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.nfa = _NFA()

    def _peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def _next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self) -> tuple[int, int]:
        s, e = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"regex parse error at {self.i}: {self.p}")
        return s, e

    def _alt(self) -> tuple[int, int]:
        starts = []
        s, e = self._concat()
        starts.append((s, e))
        while self._peek() == "|":
            self._next()
            starts.append(self._concat())
        if len(starts) == 1:
            return starts[0]
        ns, ne = self.nfa.state(), self.nfa.state()
        for s, e in starts:
            self.nfa.edge(ns, _EPS, s)
            self.nfa.edge(e, _EPS, ne)
        return ns, ne

    def _concat(self) -> tuple[int, int]:
        frags = []
        while self._peek() is not None and self._peek() not in "|)":
            frags.append(self._repeat())
        if not frags:
            s = self.nfa.state()
            return s, s
        s, e = frags[0]
        for fs, fe in frags[1:]:
            self.nfa.edge(e, _EPS, fs)
            e = fe
        return s, e

    def _repeat(self) -> tuple[int, int]:
        s, e = self._atom()
        ch = self._peek()
        if ch == "*":
            self._next()
            ns, ne = self.nfa.state(), self.nfa.state()
            self.nfa.edge(ns, _EPS, s)
            self.nfa.edge(e, _EPS, ne)
            self.nfa.edge(ns, _EPS, ne)
            self.nfa.edge(e, _EPS, s)
            return ns, ne
        if ch == "+":
            self._next()
            self.nfa.edge(e, _EPS, s)
            ne = self.nfa.state()
            self.nfa.edge(e, _EPS, ne)
            return s, ne
        if ch == "?":
            self._next()
            self.nfa.edge(s, _EPS, e)
            return s, e
        if ch == "{":
            j = self.p.index("}", self.i)
            spec = self.p[self.i + 1:j]
            self.i = j + 1
            if "," in spec:
                lo_s, hi_s = spec.split(",", 1)
                lo = int(lo_s or 0)
                hi = int(hi_s) if hi_s else lo + 16   # bounded unbounded
            else:
                lo = hi = int(spec)
            # expand by re-parsing the atom pattern? we don't keep it;
            # instead chain copies via subgraph duplication
            return self._dup_range(s, e, lo, hi)
        return s, e

    def _dup_range(self, s: int, e: int, lo: int, hi: int
                   ) -> tuple[int, int]:
        """{lo,hi} by duplicating the fragment's subgraph."""
        assert 0 <= lo <= hi
        frag_states = self._reachable(s, e)

        def copy_frag() -> tuple[int, int]:
            mapping = {}
            for st in frag_states:
                mapping[st] = self.nfa.state()
            for st in frag_states:
                for cs, tgt in list(self.nfa.trans[st]):
                    if tgt in mapping:
                        self.nfa.edge(mapping[st], cs, mapping[tgt])
            return mapping[s], mapping[e]

        ns = self.nfa.state()
        cur = ns
        ends_optional = []
        for k in range(hi):
            fs, fe = copy_frag()
            self.nfa.edge(cur, _EPS, fs)
            if k >= lo:
                ends_optional.append(cur)
            cur = fe
        ne = self.nfa.state()
        self.nfa.edge(cur, _EPS, ne)
        for st in ends_optional:
            self.nfa.edge(st, _EPS, ne)
        if lo == 0:
            self.nfa.edge(ns, _EPS, ne)
        return ns, ne

    def _reachable(self, s: int, e: int) -> list[int]:
        seen = {s}
        stack = [s]
        while stack:
            st = stack.pop()
            for _, tgt in self.nfa.trans[st]:
                if tgt not in seen:
                    seen.add(tgt)
                    stack.append(tgt)
        seen.add(e)
        return sorted(seen)

    def _atom(self) -> tuple[int, int]:
        ch = self._next()
        if ch == "(":
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            s, e = self._alt()
            assert self._next() == ")", "unbalanced group"
            return s, e
        if ch == "[":
            return self._charclass()
        if ch == ".":
            return self._edge_frag(_DOT)
        if ch == "\\":
            esc = self._next()
            cs = _CLASS_ESCAPES.get(esc)
            if cs is None:
                cs = frozenset(esc)
            return self._edge_frag(cs)
        if ch in "*+?{}|)":
            raise ValueError(f"unexpected {ch!r} in regex")
        return self._edge_frag(frozenset(ch))

    def _edge_frag(self, charset) -> tuple[int, int]:
        s, e = self.nfa.state(), self.nfa.state()
        self.nfa.edge(s, charset, e)
        return s, e

    def _charclass(self) -> tuple[int, int]:
        neg = self._peek() == "^"
        if neg:
            self._next()
        chars: set[str] = set()
        prev = None
        while True:
            ch = self._next()
            if ch == "]":
                break
            if ch == "\\":
                esc = self._next()
                cs = _CLASS_ESCAPES.get(esc, frozenset(esc))
                chars |= cs
                prev = None
                continue
            if ch == "-" and prev is not None and self._peek() not in (
                    "]", None):
                hi = self._next()
                for c in range(ord(prev), ord(hi) + 1):
                    chars.add(chr(c))
                prev = None
                continue
            chars.add(ch)
            prev = ch
        if neg:
            return self._edge_frag(("NEG", frozenset(chars)))
        return self._edge_frag(frozenset(chars))


def _charset_match(cs, ch: str) -> bool:
    if cs is _EPS:
        return False
    if cs == _DOT:
        return ch != "\n"
    if isinstance(cs, tuple) and cs[0] == "NEG":
        return ch not in cs[1]
    return ch in cs


class RegexDFA:
    """Lazy subset-construction DFA over the NFA (Acceptor interface)."""

    def __init__(self, pattern: str):
        parser = RegexParser(pattern)
        self.start_nfa, self.accept = parser.parse()
        self.nfa = parser.nfa
        self._closure_cache: dict[frozenset, frozenset] = {}
        self._step_cache: dict[tuple[frozenset, str],
                               Optional[frozenset]] = {}

    def _closure(self, states: frozenset) -> frozenset:
        hit = self._closure_cache.get(states)
        if hit is not None:
            return hit
        seen = set(states)
        stack = list(states)
        while stack:
            st = stack.pop()
            for cs, tgt in self.nfa.trans[st]:
                if cs is _EPS and tgt not in seen:
                    seen.add(tgt)
                    stack.append(tgt)
        out = frozenset(seen)
        self._closure_cache[states] = out
        return out

    # Acceptor interface ---------------------------------------------------
    def initial(self):
        return self._closure(frozenset([self.start_nfa]))

    def advance(self, state, ch: str):
        key = (state, ch)
        hit = self._step_cache.get(key, "MISS")
        if hit != "MISS":
            return hit
        nxt = set()
        for st in state:
            for cs, tgt in self.nfa.trans[st]:
                if _charset_match(cs, ch):
                    nxt.add(tgt)
        out = self._closure(frozenset(nxt)) if nxt else None
        self._step_cache[key] = out
        return out

    def is_accepting(self, state) -> bool:
        return self.accept in state


# ---------------------------------------------------------------------------
# generic JSON pushdown acceptor (response_format: json_object)
# ---------------------------------------------------------------------------

_WS = " \t\n\r"
_DIGITS = "0123456789"


class JsonAcceptor:
    """Character-level acceptor for arbitrary JSON values.

    State: (mode, stack) — immutable tuples so mask memoization works.
    Modes: value, str, str_esc, kw:<rest>, int, frac0, frac, exp0, exp,
    after (value complete, expecting , } ] or end), key0 (expect key or
    ``}``), key (in key string), key_esc, colon.
    Stack entries: 'o' (in object) / 'a' (in array).
    """

    def initial(self):
        return ("value", ())

    def advance(self, state, ch: str):
        mode, stack = state
        # string bodies (value or key)
        if mode in ("str", "key"):
            if ch == "\\":
                return (mode + "_esc", stack)
            if ch == '"':
                if mode == "key":
                    return ("colon", stack)
                return ("after", stack)
            if ch in "\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n":
                return None
            return state
        if mode in ("str_esc", "key_esc"):
            if ch in '"\\/bfnrtu':
                # (\\u without the 4 hex digits is tolerated char-wise)
                return (mode[:-4], stack)
            return None
        if mode.startswith("kw:"):
            rest = mode[3:]
            if rest and ch == rest[0]:
                nrest = rest[1:]
                return ("after", stack) if not nrest \
                    else ("kw:" + nrest, stack)
            return None
        # numbers
        if mode in ("int", "frac", "exp"):
            if ch in _DIGITS:
                return (mode, stack)
            if mode == "int" and ch == ".":
                return ("frac0", stack)
            if mode in ("int", "frac") and ch in "eE":
                return ("exp0", stack)
            return self._end_number(stack, ch)
        if mode == "after_num0":           # leading 0: only . e or end
            if ch == ".":
                return ("frac0", stack)
            if ch in "eE":
                return ("exp0", stack)
            return self._end_number(stack, ch)
        if mode == "frac0":
            return ("frac", stack) if ch in _DIGITS else None
        if mode == "exp0":
            if ch in "+-":
                return ("exp1", stack)
            return ("exp", stack) if ch in _DIGITS else None
        if mode == "exp1":
            return ("exp", stack) if ch in _DIGITS else None
        if mode == "neg":
            if ch == "0":
                return ("after_num0", stack)
            if ch in "123456789":
                return ("int", stack)
            return None

        if mode == "value":
            if ch in _WS:
                return state
            if ch == '"':
                return ("str", stack)
            if ch == "{":
                return ("key0", stack + ("o",))
            if ch == "[":
                return ("value_or_end", stack + ("a",))
            if ch == "-":
                return ("neg", stack)
            if ch == "0":
                return ("after_num0", stack)
            if ch in "123456789":
                return ("int", stack)
            for kw in ("true", "false", "null"):
                if ch == kw[0]:
                    return ("kw:" + kw[1:], stack)
            return None
        if mode == "value_or_end":         # just after '[': value or ']'
            if ch in _WS:
                return state
            if ch == "]":
                return self._pop(stack)
            return self.advance(("value", stack), ch)
        if mode == "key0":                 # after '{': key or '}'
            if ch in _WS:
                return state
            if ch == '"':
                return ("key", stack)
            if ch == "}":
                return self._pop(stack)
            return None
        if mode == "key1":                 # after ',' in object: key only
            if ch in _WS:
                return state
            if ch == '"':
                return ("key", stack)
            return None
        if mode == "colon":
            if ch in _WS:
                return state
            return ("value", stack) if ch == ":" else None
        if mode == "after":
            if ch in _WS:
                return state
            return self._after_value(stack, ch)
        return None

    def _end_number(self, stack, ch: str):
        """A number ends implicitly at , } ] or whitespace."""
        if ch in _WS:
            return ("after", stack)
        return self._after_value(stack, ch)

    def _after_value(self, stack, ch: str):
        if not stack:
            return None
        if ch == ",":
            return ("key1" if stack[-1] == "o" else "value", stack)
        if ch == "}" and stack[-1] == "o":
            return self._pop(stack)
        if ch == "]" and stack[-1] == "a":
            return self._pop(stack)
        return None

    @staticmethod
    def _pop(stack):
        return ("after", stack[:-1])

    def is_accepting(self, state) -> bool:
        mode, stack = state
        if stack:
            return False
        return mode in ("after", "int", "frac", "exp", "after_num0")


# ---------------------------------------------------------------------------
# JSON schema -> regex over canonical compact JSON
# ---------------------------------------------------------------------------

_STR_RE = r'"([^"\\\x00-\x1f]|\\["\\/bfnrtu])*"'
_INT_RE = r"-?(0|[1-9][0-9]*)"
_NUM_RE = r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"
_BOOL_RE = r"(true|false)"
_NULL_RE = r"null"
# bounded: unbounded [ \n\t]* lets a greedy model loop on whitespace
# instead of ever closing the object (same bound xgrammar/outlines use)
_WS_RE = r"[ \n\t]{0,2}"


def _regex_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def json_schema_to_regex(schema: Any, depth: int = 0) -> str:
    """Compile a JSON-schema subset to a regex over compact JSON.

    Supported: type string/integer/number/boolean/null, enum, const,
    object (properties [+required subset], fixed declaration order),
    array (items, minItems/maxItems; unbounded capped at 16), anyOf.
    """
    if depth > 12:
        raise ValueError("schema nesting too deep")
    if schema is True or schema == {}:
        raise ValueError("unconstrained schema: use json_object mode")
    if "enum" in schema:
        opts = [_regex_escape(json.dumps(v, separators=(",", ":")))
                for v in schema["enum"]]
        return "(" + "|".join(opts) + ")"
    if "const" in schema:
        return _regex_escape(json.dumps(schema["const"],
                                        separators=(",", ":")))
    if "anyOf" in schema or "oneOf" in schema:
        subs = schema.get("anyOf") or schema.get("oneOf")
        return "(" + "|".join(json_schema_to_regex(s, depth + 1)
                              for s in subs) + ")"
    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(json_schema_to_regex({**schema, "type": ti},
                                                   depth + 1)
                              for ti in t) + ")"
    if t == "string":
        if "pattern" in schema:
            # inner pattern assumed anchored & quote-free
            return '"' + schema["pattern"] + '"'
        return _STR_RE
    if t == "integer":
        return _INT_RE
    if t == "number":
        return _NUM_RE
    if t == "boolean":
        return _BOOL_RE
    if t == "null":
        return _NULL_RE
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            raise ValueError("object without properties: use json_object")
        required = set(schema.get("required", list(props)))
        parts = []
        first_done = False
        for name, sub in props.items():
            key = _regex_escape(json.dumps(name)) + ":" + _WS_RE
            val = json_schema_to_regex(sub, depth + 1)
            item = key + val
            sep = ("," + _WS_RE) if first_done else ""
            if name in required:
                parts.append(sep + item)
                first_done = True
            else:
                if first_done:
                    parts.append("(" + sep + item + ")?")
                else:
                    # optional leading property: emit with trailing comma
                    parts.append("(" + item + "," + _WS_RE + ")?")
        return r"\{" + _WS_RE + "".join(parts) + _WS_RE + r"\}"
    if t == "array" or "items" in schema:
        item = json_schema_to_regex(schema.get("items", {"type": "string"}),
                                    depth + 1)
        lo = int(schema.get("minItems", 0))
        hi = int(schema.get("maxItems", max(lo, 16)))
        if lo == 0:
            body = "(" + item + "(," + _WS_RE + item + "){0," \
                + str(max(hi - 1, 0)) + "})?"
        else:
            body = item + "(," + _WS_RE + item + "){" + str(lo - 1) \
                + "," + str(hi - 1) + "}"
        return r"\[" + _WS_RE + body + _WS_RE + r"\]"
    raise ValueError(f"unsupported schema: {schema!r}")


# ---------------------------------------------------------------------------
# acceptor -> Grammar (token bitmasks)
# ---------------------------------------------------------------------------


class AcceptorGrammar:
    """Grammar (engine protocol) over any character acceptor.

    Per-request stateful: tracks the acceptor state for the tokens
    generated so far; bitmasks are memoized per acceptor state in a
    SHARED cache keyed by (acceptor identity, state).
    """

    _mask_caches: dict[int, dict] = {}

    def __init__(self, acceptor, trie: CharTrie, id_to_str: dict[int, str],
                 vocab_size: int, eos_token_id: Optional[int]):
        self.acceptor = acceptor
        self.trie = trie
        self.id_to_str = id_to_str
        self.vocab_size = vocab_size
        self.eos = eos_token_id
        self._states: list[Any] = [acceptor.initial()]
        self._cache = self._mask_caches.setdefault(id(acceptor), {})

    def _advance_to(self, output_tokens: list[int]):
        while len(self._states) <= len(output_tokens):
            i = len(self._states) - 1
            state = self._states[-1]
            s = self.id_to_str.get(output_tokens[i])
            if state is not None and s is not None:
                for ch in s:
                    state = self.acceptor.advance(state, ch)
                    if state is None:
                        break
            else:
                state = None
            self._states.append(state)
        return self._states[len(output_tokens)]

    def next_allowed(self, output_tokens: list[int]
                     ) -> Optional[np.ndarray]:
        state = self._advance_to(list(output_tokens))
        if state is None:
            # fell out of the language (shouldn't happen when masks are
            # enforced): allow only EOS to terminate the request
            return self._eos_only()
        key = state if isinstance(state, (tuple, frozenset)) else id(state)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        ids: list[int] = []
        self._walk(self.trie, state, ids)
        words = np.zeros(((self.vocab_size + 31) // 32,), np.uint32)
        if ids:
            arr = np.asarray(ids, np.int64)
            np.bitwise_or.at(words, arr // 32,
                             np.uint32(1) << (arr % 32).astype(np.uint32))
        if self.eos is not None and self.acceptor.is_accepting(state):
            words[self.eos // 32] |= np.uint32(1) << np.uint32(
                self.eos % 32)
        if not words.any():
            # the vocabulary cannot express any continuation (or the
            # grammar is stuck): allow EOS so the request terminates
            # instead of leaving the sampler an all -inf row
            words = self._eos_only()
        self._cache[key] = words
        return words

    def _eos_only(self) -> np.ndarray:
        words = np.zeros(((self.vocab_size + 31) // 32,), np.uint32)
        if self.eos is not None:
            words[self.eos // 32] |= np.uint32(1) << np.uint32(
                self.eos % 32)
        return words

    def _walk(self, node: CharTrie, state, ids: list[int]) -> None:
        stack = [(node, state)]
        advance = self.acceptor.advance
        while stack:
            nd, st = stack.pop()
            for ch, child in nd.children.items():
                nxt = advance(st, ch)
                if nxt is None:
                    continue
                if child.ids:
                    ids.extend(child.ids)
                if child.children:
                    stack.append((child, nxt))


# ---------------------------------------------------------------------------
# request-level entry points
# ---------------------------------------------------------------------------


def _token_strings(tokenizer, vocab_size: int) -> dict[int, str]:
    key = ("strs", id(tokenizer))
    hit = _TRIE_CACHE.get(key)
    if hit is not None:
        return hit
    out: dict[int, str] = {}
    for tid in range(vocab_size):
        try:
            s = tokenizer.decode([tid], skip_special_tokens=False)
        except Exception:
            continue
        if s and "�" not in s:
            out[tid] = s
    _TRIE_CACHE[key] = out
    return out


def grammar_from_request(body: dict, tokenizer, vocab_size: int,
                         eos_token_id: Optional[int]):
    """Build a Grammar from OpenAI/vLLM-style request fields, or None.

    Recognized: ``guided_choice`` (list of strings), ``guided_regex``,
    ``guided_json`` (schema dict or JSON string), ``response_format``
    ({"type": "json_object"} or {"type": "json_schema", "json_schema":
    {"schema": ...}}).
    """
    choice = body.get("guided_choice")
    if choice:
        from .structured_output import TokenTrieGrammar
        seqs = [tokenizer.encode(str(c), add_special_tokens=False)
                for c in choice]
        return TokenTrieGrammar(seqs, vocab_size, eos_token_id)

    regex = body.get("guided_regex")
    schema = body.get("guided_json")
    rf = body.get("response_format") or {}
    json_mode = False
    if rf:
        rtype = rf.get("type")
        if rtype == "json_object":
            json_mode = True
        elif rtype == "json_schema":
            js = rf.get("json_schema") or {}
            schema = js.get("schema", js if "type" in js else None)
            if schema is None:
                json_mode = True
    if regex is None and schema is None and not json_mode:
        return None

    trie = vocab_trie(tokenizer, vocab_size)
    id2s = _token_strings(tokenizer, vocab_size)
    if regex is None and schema is not None:
        if isinstance(schema, str):
            schema = json.loads(schema)
        regex = json_schema_to_regex(schema)
    if regex is not None:
        acceptor = _DFA_CACHE.get(regex)
        if acceptor is None:
            acceptor = RegexDFA(regex)
            if len(_DFA_CACHE) > 256:     # bound the compiled-DFA cache
                _DFA_CACHE.clear()
            _DFA_CACHE[regex] = acceptor
    else:
        acceptor = _JSON_ACCEPTOR
    return AcceptorGrammar(acceptor, trie, id2s, vocab_size, eos_token_id)


# shared across requests so per-state mask caches persist
_DFA_CACHE: dict[str, RegexDFA] = {}
_JSON_ACCEPTOR = JsonAcceptor()
