"""JSON Schema (practical subset) → regex.

Reference: sampling/grammar/schema_to_ebnf.rs (1412 LoC; compiles to
EBNF for xgrammar). Here schemas compile to the regex subset the
first-party engine supports. Covered: object (properties + required,
fixed order), string (+enum/const), integer, number, boolean, null,
array (items, minItems/maxItems), anyOf, $defs/$ref (non-recursive),
and free-form "json_object" mode with bounded nesting.
"""

from __future__ import annotations

_WS = r"[ \n\t]{0,8}"
_STRING = r'"([^"\\\x00-\x1f]|\\["\\/bfnrt])*"'
_INTEGER = r"-?(0|[1-9][0-9]{0,15})"
_NUMBER = _INTEGER + r"(\.[0-9]{1,16})?([eE][+-]?[0-9]{1,3})?"
_BOOL = r"(true|false)"
_NULL = r"null"


def _escape_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$/-":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append(r"\n")
        elif ch == "\t":
            out.append(r"\t")
        else:
            out.append(ch)
    return "".join(out)


def _json_string_literal(value) -> str:
    import json

    return _escape_literal(json.dumps(value))


def schema_to_regex(schema: dict, defs: dict | None = None, depth: int = 0) -> str:
    if depth > 12:
        raise ValueError("schema nesting too deep")
    if defs is None:
        defs = schema.get("$defs", schema.get("definitions", {}))

    if "$ref" in schema:
        ref = schema["$ref"]
        name = ref.split("/")[-1]
        if name not in defs:
            raise ValueError(f"unresolvable $ref {ref}")
        return schema_to_regex(defs[name], defs, depth + 1)

    if "const" in schema:
        return _json_string_literal(schema["const"])
    if "enum" in schema:
        return "(" + "|".join(_json_string_literal(v) for v in schema["enum"]) + ")"
    if "anyOf" in schema or "oneOf" in schema:
        opts = schema.get("anyOf", schema.get("oneOf"))
        return "(" + "|".join(schema_to_regex(o, defs, depth + 1) for o in opts) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            schema_to_regex({**schema, "type": ti}, defs, depth + 1) for ti in t
        ) + ")"
    if t == "string":
        if "pattern" in schema:
            # embed the user pattern between quotes (must not contain ")
            return '"' + schema["pattern"] + '"'
        return _STRING
    if t == "integer":
        return _INTEGER
    if t == "number":
        return _NUMBER
    if t == "boolean":
        return _BOOL
    if t == "null":
        return _NULL
    if t == "array":
        item = schema_to_regex(schema.get("items", {}), defs, depth + 1)
        min_i = schema.get("minItems", 0)
        max_i = schema.get("maxItems", 8)
        max_i = max(max_i, min_i)
        if max_i == 0:
            return r"\[" + _WS + r"\]"
        body = item + ("(" + _WS + "," + _WS + item + ")" +
                       f"{{{max(min_i - 1, 0)},{max_i - 1}}}")
        if min_i == 0:
            return r"\[" + _WS + "(" + body + ")?" + _WS + r"\]"
        return r"\[" + _WS + body + _WS + r"\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        required = set(schema.get("required", props.keys()))
        parts = []
        for name, sub in props.items():
            piece = (
                _escape_literal(f'"{name}"')
                + _WS + ":" + _WS
                + schema_to_regex(sub, defs, depth + 1)
            )
            parts.append((piece, name in required))
        if not parts:
            return _free_json_value(2)
        body = ""
        emitted = 0
        for piece, req in parts:
            sep = (_WS + "," + _WS) if emitted else ""
            if req:
                body += sep + piece
            else:
                body += "(" + sep + piece + ")?"
            emitted += 1
        return r"\{" + _WS + body + _WS + r"\}"
    # unconstrained value
    return _free_json_value(3)


def _free_json_value(depth: int) -> str:
    """Any JSON value with bounded nesting (for json_object mode)."""
    scalar = f"({_STRING}|{_NUMBER}|{_BOOL}|{_NULL})"
    value = scalar
    for _ in range(depth):
        arr = r"\[" + _WS + "(" + value + "(" + _WS + "," + _WS + value + r"){0,8})?" + _WS + r"\]"
        obj = (r"\{" + _WS + "(" + _STRING + _WS + ":" + _WS + value
               + "(" + _WS + "," + _WS + _STRING + _WS + ":" + _WS + value + r"){0,8})?" + _WS + r"\}")
        value = f"({scalar}|{arr}|{obj})"
    return value


def json_object_regex() -> str:
    """response_format={"type": "json_object"}: any JSON object."""
    v = _free_json_value(2)
    return (r"\{" + _WS + "(" + _STRING + _WS + ":" + _WS + v
            + "(" + _WS + "," + _WS + _STRING + _WS + ":" + _WS + v + r"){0,12})?" + _WS + r"\}")
