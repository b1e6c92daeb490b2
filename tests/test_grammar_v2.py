"""Structured output v2: EBNF grammars, recursive JSON schemas,
additionalProperties, compile deadline.

Reference: sampling/grammar/compiler.rs (async + deadline, ADR 0023),
schema_to_ebnf.rs (recursive schemas), xgrammar EBNF surface.
"""

import json

import jax
import jax.numpy as jnp
import pytest

from vllm_rust_tpu.grammar.ebnf import EbnfError, ebnf_to_regex
from vllm_rust_tpu.grammar.json_schema import schema_to_regex
from vllm_rust_tpu.grammar.regex import DFA


def matches(pattern: str, text: str) -> bool:
    return DFA(pattern).fullmatch(text)


# ---------------------------------------------------------------- EBNF

def test_ebnf_simple():
    g = 'root ::= "yes" | "no"'
    p = ebnf_to_regex(g)
    assert matches(p, "yes") and matches(p, "no")
    assert not matches(p, "maybe")


def test_ebnf_sequence_repeat():
    g = '''
    root  ::= digit+ ("." digit+)?
    digit ::= [0-9]
    '''
    p = ebnf_to_regex(g)
    assert matches(p, "42") and matches(p, "3.14")
    assert not matches(p, ".5") and not matches(p, "1.")


def test_ebnf_recursive_grammar():
    # balanced parens — classic non-regular language, bounded unrolling
    g = '''
    root ::= expr
    expr ::= "(" expr ")" | "x"
    '''
    p = ebnf_to_regex(g, max_depth=5)
    assert matches(p, "x")
    assert matches(p, "(x)")
    assert matches(p, "(((x)))")
    assert not matches(p, "((x)")  # unbalanced
    assert not matches(p, "(((((x)))))")  # beyond depth budget -> rejected


def test_ebnf_mutual_recursion_json():
    g = '''
    root   ::= object
    object ::= "{" (pair ("," pair)*)? "}"
    pair   ::= string ":" value
    value  ::= object | array | string | number
    array  ::= "[" (value ("," value)*)? "]"
    string ::= "\\"" [a-z]* "\\""
    number ::= [0-9]+
    '''
    p = ebnf_to_regex(g, max_depth=4)
    assert matches(p, '{}')
    assert matches(p, '{"a":1}')
    assert matches(p, '{"a":{"b":[1,"c"]}}')
    assert not matches(p, '{"a":}')


def test_ebnf_left_recursion_rejected():
    g = 'root ::= root "a"'
    with pytest.raises(EbnfError, match="no derivation"):
        ebnf_to_regex(g)


def test_ebnf_undefined_rule():
    with pytest.raises(EbnfError, match="undefined"):
        ebnf_to_regex('root ::= nope')


def test_ebnf_comments_and_single_rule_start():
    p = ebnf_to_regex('answer ::= "ok" # trailing comment')
    assert matches(p, "ok")


# ------------------------------------------------------- recursive schemas

def test_schema_recursive_ref():
    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"type": "integer"},
                    "kids": {
                        "type": "array",
                        "items": {"$ref": "#/$defs/node"},
                        "maxItems": 2,
                    },
                },
                "required": ["v"],
            }
        },
        "$ref": "#/$defs/node",
    }
    p = schema_to_regex(schema)
    assert matches(p, '{"v":1}')
    assert matches(p, '{"v":1,"kids":[]}')
    assert matches(p, '{"v":1,"kids":[{"v":2},{"v":3,"kids":[{"v":4}]}]}')
    assert not matches(p, '{"kids":[]}')  # missing required v


def test_schema_whole_document_self_ref():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "child": {"$ref": "#"},
        },
        "required": ["name"],
    }
    p = schema_to_regex(schema)
    assert matches(p, '{"name":"a"}')
    assert matches(p, '{"name":"a","child":{"name":"b"}}')


def test_schema_required_recursion_needs_base_case():
    # a required self-reference with no base case has no finite instance
    schema = {
        "$defs": {"n": {"type": "object",
                        "properties": {"next": {"$ref": "#/$defs/n"}},
                        "required": ["next"]}},
        "$ref": "#/$defs/n",
    }
    with pytest.raises(ValueError, match="no finite instance"):
        schema_to_regex(schema)


def test_schema_additional_properties():
    schema = {
        "type": "object",
        "properties": {"id": {"type": "integer"}},
        "required": ["id"],
        "additionalProperties": {"type": "string"},
    }
    p = schema_to_regex(schema)
    assert matches(p, '{"id":7}')
    assert matches(p, '{"id":7,"x":"y"}')
    assert matches(p, '{"id":7,"x":"y","z":"w"}')
    assert not matches(p, '{"id":7,"x":3}')  # additional must be string


def test_schema_additional_properties_false_empty():
    p = schema_to_regex({"type": "object", "properties": {},
                         "additionalProperties": False})
    assert matches(p, "{}")
    assert not matches(p, '{"a":1}')


# ------------------------------------------------------------ engine-level

def test_engine_ebnf_constraint_and_deadline():
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_engine_config, tiny_llama_config

    class ByteTok:
        """1 token per latin-1 byte — tiny vocab friendly."""

        eos_token_id = 0

        def encode(self, s):
            return [min(ord(c), 255) for c in s]

        def decode(self, ids):
            return "".join(chr(i) for i in ids if i != 0)

    cfg = tiny_engine_config(tiny_llama_config())
    model = from_config(cfg.model, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = LLMEngine(model, params, cfg, tokenizer=ByteTok())

    eng.add_request(
        "g1", [65, 66, 67],
        SamplingParams(max_tokens=8, temperature=0.0,
                       constraint={"ebnf": 'root ::= "yes" | "no"'}),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            outs[o.request_id] = o
    assert outs["g1"].output_text in ("yes", "no")

    # deadline: a poisoned spec raises cleanly and is cached as failed
    eng.GRAMMAR_COMPILE_DEADLINE_S = 0.0
    with pytest.raises(ValueError, match="compile"):
        eng.add_request(
            "g2", [65],
            SamplingParams(constraint={"regex": "(a|b)" * 200}),
        )
