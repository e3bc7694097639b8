"""GBNF grammar engine + JSON-schema constrained decoding tests.

Mirrors the reference's grammar behavior (llama-grammar + json-schema-to-
grammar; response_format handling in v1_chat_completions.cpp:460-510).
"""
import json

import numpy as np
import pytest

from llamafile_tpu.runtime.grammar import (Grammar, GrammarSampler,
                                           json_schema_to_gbnf)


class FakeTok:
    """Byte-level vocabulary + an EOG token for grammar unit tests."""

    def __init__(self):
        self.n_vocab = 257
        self.eog_ids = {256}

    def decode_token(self, tid):
        return bytes([tid]) if tid < 256 else b""

    def is_eog(self, tid):
        return tid == 256


def _gen(sampler, tok, max_steps=200):
    """Greedy-leftmost generation under the grammar (first allowed byte)."""
    out = b""
    for _ in range(max_steps):
        mask = sampler.allowed_tokens()
        if sampler.done and mask[256]:
            allowed = np.nonzero(mask[:256])[0]
            if len(allowed) == 0:
                break
        allowed = np.nonzero(mask[:256])[0]
        if len(allowed) == 0:
            break
        tid = int(allowed[0])
        sampler.accept(tid)
        out += bytes([tid])
    return out


def test_literal_grammar():
    g = Grammar.from_gbnf('root ::= "hello"')
    s = GrammarSampler(g, FakeTok())
    mask = s.allowed_tokens()
    assert mask[ord("h")] and not mask[ord("x")] and not mask[256]
    for ch in b"hello":
        s.accept(ch)
    assert s.done
    assert s.allowed_tokens()[256]          # EOG allowed once complete


def test_alternates_and_classes():
    g = Grammar.from_gbnf('root ::= ("a" | [0-9]+) "!"')
    s = GrammarSampler(g, FakeTok())
    mask = s.allowed_tokens()
    assert mask[ord("a")] and mask[ord("5")] and not mask[ord("!")]
    s.accept(ord("5"))
    mask = s.allowed_tokens()
    assert mask[ord("7")] and mask[ord("!")]
    s.accept(ord("!"))
    assert s.done


def test_repetition_star():
    g = Grammar.from_gbnf('root ::= "x" [a-c]* "y"')
    s = GrammarSampler(g, FakeTok())
    s.accept(ord("x"))
    for ch in b"abccba":
        assert s.allowed_tokens()[ch]
        s.accept(ch)
    s.accept(ord("y"))
    assert s.done


def test_rule_refs_and_recursion():
    g = Grammar.from_gbnf('''
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
''')
    s = GrammarSampler(g, FakeTok())
    for ch in b"(1+23)+4":
        assert s.allowed_tokens()[ch], chr(ch)
        s.accept(ch)
    assert s.done


def test_violation_raises():
    g = Grammar.from_gbnf('root ::= "ab"')
    s = GrammarSampler(g, FakeTok())
    s.accept(ord("a"))
    with pytest.raises(ValueError):
        s.accept(ord("x"))


def test_json_schema_object():
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name", "age"]}
    g = Grammar.from_json_schema(schema)
    s = GrammarSampler(g, FakeTok())
    text = b'{"name": "bob", "age": 42}'
    for ch in text:
        assert s.allowed_tokens()[ch], chr(ch)
        s.accept(ch)
    assert s.done
    # parseable JSON with the right keys
    obj = json.loads(text)
    assert set(obj) == {"name", "age"}


def test_json_schema_enum_and_array():
    schema = {"type": "object",
              "properties": {"color": {"enum": ["red", "green"]},
                             "nums": {"type": "array",
                                      "items": {"type": "integer"}}},
              "required": ["color", "nums"]}
    g = Grammar.from_json_schema(schema)
    s = GrammarSampler(g, FakeTok())
    for ch in b'{"color": "green", "nums": [1, 2, 3]}':
        assert s.allowed_tokens()[ch], chr(ch)
        s.accept(ch)
    assert s.done


def test_generated_output_is_valid_json():
    schema = {"type": "object", "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    g = Grammar.from_json_schema(schema)
    s = GrammarSampler(g, FakeTok())
    out = _gen(s, FakeTok())
    obj = json.loads(out)
    assert "ok" in obj and isinstance(obj["ok"], bool)
