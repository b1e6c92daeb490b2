"""JSON Schema → regex (recursive schemas via bounded unrolling).

Reference: sampling/grammar/schema_to_ebnf.rs (1412 LoC; compiles to
EBNF for xgrammar). Here schemas compile to the regex subset the
first-party engine supports. Covered: object (properties + required,
fixed order, additionalProperties), string (+enum/const/pattern),
integer, number, boolean, null, array (items, minItems/maxItems),
anyOf/oneOf, $defs/$ref **including recursive references** — each ref
may expand at most ``max_depth`` times along a derivation path; branches
that exceed the budget are pruned from their enclosing alternation /
optional construct (dead-branch propagation), so the emitted regex
covers every instance up to the nesting budget. Also free-form
"json_object" mode with bounded nesting.
"""

from __future__ import annotations

_WS = r"[ \n\t]{0,8}"
_STRING = r'"([^"\\\x00-\x1f]|\\["\\/bfnrt])*"'
_INTEGER = r"-?(0|[1-9][0-9]{0,15})"
_NUMBER = _INTEGER + r"(\.[0-9]{1,16})?([eE][+-]?[0-9]{1,3})?"
_BOOL = r"(true|false)"
_NULL = r"null"

MAX_REF_DEPTH = 6


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


def schema_to_regex(schema: dict, max_depth: int = MAX_REF_DEPTH) -> str:
    """Public entry: compile a JSON schema to a regex pattern."""
    defs = dict(schema.get("$defs", schema.get("definitions", {})))
    defs["#"] = schema  # whole-document "$ref": "#" self-reference
    out = _compile(schema, defs, {}, max_depth)
    if out is None:
        raise ValueError(
            "schema has no finite instance within the recursion budget "
            f"(max_depth={max_depth})"
        )
    return out


def _compile(
    schema: dict, defs: dict, depths: dict[str, int], max_depth: int
) -> str | None:
    """Regex for ``schema`` or None when this branch exceeds the
    recursion budget (pruned by the caller)."""
    if schema is True or schema == {}:
        return _free_json_value(3)

    if "$ref" in schema:
        ref = schema["$ref"]
        name = "#" if ref in ("#", "#/") else ref.split("/")[-1]
        target = defs.get(name)
        if target is None:
            raise ValueError(f"unresolvable $ref {ref}")
        d = depths.get(name, 0)
        if d >= max_depth:
            return None
        return _compile(target, defs, {**depths, name: d + 1}, max_depth)

    if "const" in schema:
        return _json_string_literal(schema["const"])
    if "enum" in schema:
        return "(" + "|".join(
            _json_string_literal(v) for v in schema["enum"]
        ) + ")"
    if "anyOf" in schema or "oneOf" in schema:
        opts = schema.get("anyOf", schema.get("oneOf"))
        live = []
        for o in opts:
            p = _compile(o, defs, depths, max_depth)
            if p is not None:
                live.append(p)
        if not live:
            return None
        return "(" + "|".join(live) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        live = []
        for ti in t:
            p = _compile({**schema, "type": ti}, defs, depths, max_depth)
            if p is not None:
                live.append(p)
        if not live:
            return None
        return "(" + "|".join(live) + ")"
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
        item = _compile(schema.get("items", {}), defs, depths, max_depth)
        min_i = schema.get("minItems", 0)
        max_i = schema.get("maxItems", 8)
        max_i = max(max_i, min_i)
        if item is None:
            # recursive item beyond budget: only the empty array survives
            if min_i == 0:
                return r"\[" + _WS + r"\]"
            return None
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
            val = _compile(sub, defs, depths, max_depth)
            if val is None:
                if name in required:
                    return None  # required recursive branch beyond budget
                continue  # optional property pruned
            piece = (
                _escape_literal(f'"{name}"')
                + _WS + ":" + _WS + val
            )
            parts.append((piece, name in required))
        addl = schema.get("additionalProperties")
        addl_piece = None
        if addl:
            addl_schema = addl if isinstance(addl, dict) else {}
            addl_val = _compile(addl_schema, defs, depths, max_depth)
            if addl_val is not None:
                addl_piece = _STRING + _WS + ":" + _WS + addl_val
        if not parts and not addl_piece:
            if addl is False or props:
                return r"\{" + _WS + r"\}"
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
        if addl_piece:
            # extra entries after the declared properties
            sep = (_WS + "," + _WS) if emitted else ""
            first = (sep if emitted else "") + addl_piece
            rest = "(" + _WS + "," + _WS + addl_piece + "){0,8}"
            body += "(" + first + rest + ")?"
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
