"""Extended tool-call format parsers.

Reference inventory: crates/core/src/tool_parser/*.rs (29 files). Each
parser here is an independent implementation of the same wire format,
registered into the shared registry in ``__init__``. Formats were
learned from the reference's format documentation (e.g.
tool_parser/kimi_k2.rs:1-12, tool_parser/glm4.rs:1-16); the parsing
logic is written fresh for Python.
"""

from __future__ import annotations

import ast
import json
import re

from . import ParseResult, ToolCall, register_tool_parser, _json_call


def _find_json_objects(text: str) -> list[dict]:
    """Scan for balanced top-level ``{...}`` objects (string-aware)."""
    objs: list[dict] = []
    depth = 0
    start = -1
    in_str = False
    esc = False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            if depth > 0:
                depth -= 1
                if depth == 0 and start >= 0:
                    try:
                        obj = json.loads(text[start : i + 1])
                        if isinstance(obj, dict):
                            objs.append(obj)
                    except json.JSONDecodeError:
                        pass
                    start = -1
    return objs


def _infer_value(s: str):
    """XML-ish formats carry untyped values: JSON literals deserialize,
    everything else stays a string."""
    s = s.strip()
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        pass
    low = {"none": None, "true": True, "false": False, "null": None}
    if s.lower() in low:
        return low[s.lower()]
    return s


def _array_calls(payload: str) -> list[ToolCall]:
    try:
        arr = json.loads(payload)
    except json.JSONDecodeError:
        return []
    if isinstance(arr, dict):
        arr = [arr]
    if not isinstance(arr, list):
        return []
    return [tc for o in arr if isinstance(o, dict) and (tc := _json_call(o))]


_THINK_RE = re.compile(r"(?s)<think>.*?</think>")


# --------------------------------------------------------------------------
# pythonic family
# --------------------------------------------------------------------------


def _parse_pythonic_calls(exprs: list[str]) -> list[ToolCall] | None:
    calls: list[ToolCall] = []
    for src in exprs:
        # normalize JSON literals into python ones for literal_eval
        src = re.sub(r"\bnull\b", "None", src)
        src = re.sub(r"\btrue\b", "True", src)
        src = re.sub(r"\bfalse\b", "False", src)
        try:
            tree = ast.parse(src.strip(), mode="eval")
        except SyntaxError:
            return None
        node = tree.body
        if not isinstance(node, ast.Call) or not isinstance(node.func, ast.Name):
            return None
        args = {}
        for kw in node.keywords:
            try:
                args[kw.arg] = ast.literal_eval(kw.value)
            except ValueError:
                return None
        calls.append(ToolCall(name=node.func.id, arguments=json.dumps(args)))
    return calls


@register_tool_parser("llama4_pythonic")
def parse_llama4_pythonic(text: str) -> ParseResult:
    """``<|python_start|>[fn(a=1)]<|python_end|>`` — strip the python
    tags then parse the bracketed pythonic list
    (reference tool_parser/llama4_pythonic.rs:1-14)."""
    t = text.strip()
    if "<|python_start|>" in t:
        m = re.search(r"<\|python_start\|>(.*?)(?:<\|python_end\|>|$)", t, re.S)
        if m:
            t = m.group(1).strip()
    if not (t.startswith("[") and t.endswith("]")):
        return text, []
    try:
        tree = ast.parse(t, mode="eval")
    except SyntaxError:
        return text, []
    if not isinstance(tree.body, ast.List):
        return text, []
    exprs = []
    for el in tree.body.elts:
        exprs.append(ast.unparse(el))
    calls = _parse_pythonic_calls(exprs)
    if calls is None:
        return text, []
    return "", calls


@register_tool_parser("olmo3")
def parse_olmo3(text: str) -> ParseResult:
    """``<function_calls>`` newline-separated pythonic calls
    (reference tool_parser/olmo3.rs:1-15)."""
    m = re.search(r"(?s)<function_calls>\s*(.*?)\s*(?:</function_calls>|$)", text)
    if not m:
        return text, []
    lines = [ln.strip() for ln in m.group(1).splitlines() if ln.strip()]
    calls = _parse_pythonic_calls(lines)
    if not calls:
        return text, []
    content = text[: m.start()].strip()
    return content, calls


# --------------------------------------------------------------------------
# JSON-payload family
# --------------------------------------------------------------------------


@register_tool_parser("json")
def parse_json(text: str) -> ParseResult:
    """Raw JSON: one object or an array of objects
    (reference tool_parser/json_parser.rs)."""
    t = text.strip()
    calls = _array_calls(t)
    if calls:
        return "", calls
    return text, []


@register_tool_parser("granite")
def parse_granite(text: str) -> ParseResult:
    """``<|tool_call|>[{...}]`` / ``<tool_call>[{...}]`` JSON array after
    a Granite 3.x trigger token (reference tool_parser/granite.rs:5-13)."""
    for marker in ("<|tool_call|>", "<tool_call>"):
        idx = text.find(marker)
        if idx >= 0:
            calls = _array_calls(text[idx + len(marker) :].strip())
            if calls:
                return text[:idx].strip(), calls
    # bare leading JSON array also accepted
    t = text.strip()
    if t.startswith("["):
        calls = _array_calls(t)
        if calls:
            return "", calls
    return text, []


@register_tool_parser("granite-20b-fc", "granite_20b_fc")
def parse_granite_20b_fc(text: str) -> ParseResult:
    """Repeated ``<function_call>{json}`` blocks
    (reference tool_parser/granite.rs Granite20bFCToolParser)."""
    if "<function_call>" not in text:
        return text, []
    content = text[: text.find("<function_call>")].strip()
    calls = []
    for seg in text.split("<function_call>")[1:]:
        for obj in _find_json_objects(seg)[:1]:
            tc = _json_call(obj)
            if tc:
                calls.append(tc)
    return content, calls


@register_tool_parser("internlm2", "internlm")
def parse_internlm2(text: str) -> ParseResult:
    """``<|action_start|><|plugin|>{json}<|action_end|>`` single call
    (reference tool_parser/internlm2.rs:1-10)."""
    m = re.search(
        r"(?s)<\|action_start\|><\|plugin\|>\s*(.*?)\s*(?:<\|action_end\|>|$)", text
    )
    if not m:
        return text, []
    objs = _find_json_objects(m.group(1))
    if not objs:
        return text, []
    tc = _json_call(objs[0])
    if not tc:
        return text, []
    content = text[: m.start()].strip()
    return content, [tc]


@register_tool_parser("jamba")
def parse_jamba(text: str) -> ParseResult:
    """``<tool_calls>[array]</tool_calls>`` (reference tool_parser/jamba.rs)."""
    m = re.search(r"(?s)<tool_calls>\s*(.*?)\s*</tool_calls>", text)
    if not m:
        return text, []
    calls = _array_calls(m.group(1))
    if not calls:
        return text, []
    content = (text[: m.start()] + text[m.end() :]).strip()
    return content, calls


@register_tool_parser("hunyuan", "hunyuan_a13b")
def parse_hunyuan(text: str) -> ParseResult:
    """``<tool_calls>[array]</tool_calls>``, ignoring anything inside
    ``<think>`` blocks (reference tool_parser/hunyuan.rs:1-10)."""
    visible = _THINK_RE.sub("", text)
    m = re.search(r"(?s)<tool_calls>\s*(.*?)\s*</tool_calls>", visible)
    if not m:
        return text, []
    calls = _array_calls(m.group(1))
    if not calls:
        return text, []
    content = (visible[: m.start()] + visible[m.end() :]).strip()
    return content, calls


@register_tool_parser("minimax")
def parse_minimax(text: str) -> ParseResult:
    """``<tool_calls>`` with newline-separated JSON objects; tool calls
    inside think blocks are stripped (reference tool_parser/minimax.rs:1-15)."""
    visible = _THINK_RE.sub("", text)
    m = re.search(r"(?s)<tool_calls>(.*?)(?:</tool_calls>|$)", visible)
    if not m:
        return text, []
    calls = [tc for o in _find_json_objects(m.group(1)) if (tc := _json_call(o))]
    if not calls:
        return text, []
    content = visible[: m.start()].strip()
    return content, calls


@register_tool_parser("phi4mini", "phi4_mini_json")
def parse_phi4mini(text: str) -> ParseResult:
    """``functools[{...}, ...]`` wrapper (reference tool_parser/phi4mini.rs)."""
    idx = text.find("functools[")
    if idx < 0:
        return text, []
    payload = text[idx + len("functools") :]
    # balanced-bracket scan for the array
    depth = 0
    end = -1
    in_str = False
    esc = False
    for i, ch in enumerate(payload):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        return text, []
    calls = _array_calls(payload[: end + 1])
    if not calls:
        return text, []
    return text[:idx].strip(), calls


@register_tool_parser("xlam")
def parse_xlam(text: str) -> ParseResult:
    """Salesforce xLAM: JSON arrays bare / in ```json blocks / after
    [TOOL_CALLS] / in <tool_call> tags / after </think>
    (reference tool_parser/xlam.rs:1-11)."""
    candidates: list[str] = []
    t = text.strip()
    if "</think>" in t:
        t = t.split("</think>", 1)[1].strip()
    for m in re.finditer(r"(?s)```(?:json)?\s*(.*?)```", t):
        candidates.append(m.group(1).strip())
    m = re.search(r"(?s)\[TOOL_CALLS\]\s*(.*)", t)
    if m:
        candidates.append(m.group(1).strip())
    for m in re.finditer(r"(?s)<tool_call>\s*(.*?)\s*</tool_call>", t):
        candidates.append(m.group(1))
    if t.startswith("[") or t.startswith("{"):
        candidates.append(t)
    for cand in candidates:
        calls = _array_calls(cand)
        if calls:
            prefix = text.split(cand)[0] if cand in text else ""
            for marker in ("```json", "```", "[TOOL_CALLS]", "<tool_call>"):
                prefix = prefix.replace(marker, "")
            return prefix.strip(), calls
    return text, []


@register_tool_parser("kimi_k2")
def parse_kimi_k2(text: str) -> ParseResult:
    """``<|tool_call_begin|>functions.name:idx<|tool_call_argument_begin|>{args}<|tool_call_end|>``
    sections; function name is the segment after the last ``.`` and
    before ``:`` (reference tool_parser/kimi_k2.rs:1-11)."""
    start = text.find("<|tool_calls_section_begin|>")
    calls = []
    for m in re.finditer(
        r"(?s)<\|tool_call_begin\|>\s*([^<]+?)\s*<\|tool_call_argument_begin\|>\s*(.*?)\s*<\|tool_call_end\|>",
        text,
    ):
        ident = m.group(1)
        name = ident.rsplit(":", 1)[0].rsplit(".", 1)[-1]
        try:
            args = json.loads(m.group(2))
        except json.JSONDecodeError:
            continue
        calls.append(ToolCall(name=name, arguments=json.dumps(args)))
    if not calls:
        return text, []
    content = text[:start] if start >= 0 else ""
    return content.strip(), calls


@register_tool_parser("longcat")
def parse_longcat(text: str) -> ParseResult:
    """``<longcat_tool_call>{json}</longcat_tool_call>`` (Hermes with
    renamed tags; reference tool_parser/longcat.rs)."""
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(
        r"(?s)<longcat_tool_call>\s*(.*?)\s*(?:</longcat_tool_call>|$)", text
    ):
        content_parts.append(text[pos : m.start()])
        pos = m.end()
        for obj in _find_json_objects(m.group(1)):
            tc = _json_call(obj)
            if tc:
                calls.append(tc)
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


@register_tool_parser("ernie45")
def parse_ernie45(text: str) -> ParseResult:
    """``<tool_call>{json}</tool_call>`` blocks with optional think /
    response wrappers (reference tool_parser/ernie45.rs:1-10)."""
    visible = _THINK_RE.sub("", text)
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(r"(?s)<tool_call>\s*(\{.*?\})\s*</tool_call>", visible):
        content_parts.append(visible[pos : m.start()])
        pos = m.end()
        try:
            tc = _json_call(json.loads(m.group(1)))
            if tc:
                calls.append(tc)
        except json.JSONDecodeError:
            pass
    content_parts.append(visible[pos:])
    if not calls:
        return text, []
    content = "".join(content_parts)
    rm = re.search(r"(?s)<response>\s*(.*?)\s*</response>", content)
    if rm:
        content = rm.group(1)
    return content.strip(), calls


@register_tool_parser("gigachat3")
def parse_gigachat3(text: str) -> ParseResult:
    """``function call{json}`` trigger-phrase format
    (reference tool_parser/gigachat3.rs)."""
    m = re.search(r"function call(?:<\|role_sep\|>\n?)?\s*(\{.*)", text, re.S)
    if not m:
        return text, []
    objs = _find_json_objects(m.group(1))
    if not objs:
        return text, []
    tc = _json_call(objs[0])
    if not tc:
        return text, []
    return text[: m.start()].strip(), [tc]


@register_tool_parser("deepseek_v31")
def parse_deepseek_v31(text: str) -> ParseResult:
    """``<｜tool▁call▁begin｜>name<｜tool▁sep｜>{args}<｜tool▁call▁end｜>``
    (reference tool_parser/deepseek_v31.rs)."""
    begin = "<｜tool▁calls▁begin｜>"
    content = text.split(begin, 1)[0] if begin in text else ""
    calls = []
    for m in re.finditer(
        r"(?s)<｜tool▁call▁begin｜>(.*?)<｜tool▁sep｜>(.*?)<｜tool▁call▁end｜>", text
    ):
        name = m.group(1).strip()
        try:
            args = json.loads(m.group(2).strip())
        except json.JSONDecodeError:
            continue
        calls.append(ToolCall(name=name, arguments=json.dumps(args)))
    if not calls:
        return text, []
    if begin not in text:
        content = text[: text.find("<｜tool▁call▁begin｜>")]
    return content.strip(), calls


@register_tool_parser("deepseek_v32")
def parse_deepseek_v32(text: str) -> ParseResult:
    """DSML format: ``<｜DSML｜invoke name="fn">`` with
    ``<｜DSML｜parameter name="k" ...>v</｜DSML｜parameter>`` children
    (reference tool_parser/deepseek_v32.rs:1-13)."""
    start = text.find("<｜DSML｜function_calls>")
    if start < 0:
        return text, []
    block = text[start:]
    end = block.find("</｜DSML｜function_calls>")
    if end >= 0:
        block = block[:end]
    calls = []
    for im in re.finditer(
        r'(?s)<｜DSML｜invoke name="([^"]+)">(.*?)(?=<｜DSML｜invoke name="|\Z)', block
    ):
        args = {}
        for pm in re.finditer(
            r'(?s)<｜DSML｜parameter name="([^"]+)"([^>]*)>(.*?)</｜DSML｜parameter>',
            im.group(2),
        ):
            key, attrs, val = pm.group(1), pm.group(2), pm.group(3)
            if 'string="true"' in attrs:
                args[key] = val
            else:
                args[key] = _infer_value(val)
        calls.append(ToolCall(name=im.group(1), arguments=json.dumps(args)))
    if not calls:
        return text, []
    return text[:start].strip(), calls


# --------------------------------------------------------------------------
# XML key/value family
# --------------------------------------------------------------------------


@register_tool_parser("glm4", "glm4_moe", "glm45")
def parse_glm4(text: str) -> ParseResult:
    """``<tool_call>name\\n<arg_key>k</arg_key><arg_value>v</arg_value>...``
    (reference tool_parser/glm4.rs:1-16)."""
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(r"(?s)<tool_call>(.*?)</tool_call>", text):
        body = m.group(1).strip()
        if "<arg_key>" not in body and not re.match(r"[\w\-.]+\s*$", body.split("\n")[0]):
            continue
        name = body.split("\n")[0].split("<arg_key>")[0].strip()
        if not name:
            continue
        args = {}
        for km in re.finditer(
            r"(?s)<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", body
        ):
            args[km.group(1).strip()] = _infer_value(km.group(2))
        content_parts.append(text[pos : m.start()])
        pos = m.end()
        calls.append(ToolCall(name=name, arguments=json.dumps(args)))
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


def _parse_function_param_block(body: str) -> list[ToolCall]:
    """``<function=name><parameter=key>value</parameter></function>``"""
    calls = []
    for fm in re.finditer(
        r"(?s)<function=([\w\-.]+)>(.*?)(?:</function>|\Z)", body
    ):
        args = {}
        for pm in re.finditer(
            r"(?s)<parameter=([\w\-.]+)>(.*?)</parameter>", fm.group(2)
        ):
            args[pm.group(1)] = _infer_value(pm.group(2))
        calls.append(ToolCall(name=fm.group(1), arguments=json.dumps(args)))
    return calls


@register_tool_parser("qwen3_coder", "qwen3coder")
def parse_qwen3coder(text: str) -> ParseResult:
    """``<tool_call><function=name><parameter=k>v</parameter></function></tool_call>``
    (reference tool_parser/qwen3coder.rs:1-14)."""
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(r"(?s)<tool_call>(.*?)</tool_call>", text):
        got = _parse_function_param_block(m.group(1))
        if got:
            content_parts.append(text[pos : m.start()])
            pos = m.end()
            calls.extend(got)
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


@register_tool_parser("seed_oss")
def parse_seed_oss(text: str) -> ParseResult:
    """``<seed:tool_call><function=name><parameter=k>v</parameter>...``
    plus ``<seed:think>`` stripping (reference tool_parser/seed_oss.rs:1-13)."""
    visible = re.sub(r"(?s)<seed:think>.*?</seed:think>", "", text)
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(r"(?s)<seed:tool_call>(.*?)(?:</seed:tool_call>|\Z)", visible):
        got = _parse_function_param_block(m.group(1))
        if got:
            content_parts.append(visible[pos : m.start()])
            pos = m.end()
            calls.extend(got)
    content_parts.append(visible[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


@register_tool_parser("minimax_m2")
def parse_minimax_m2(text: str) -> ParseResult:
    """``<minimax:tool_call><invoke name="fn"><parameter name="k">v``
    XML invoke format (reference tool_parser/minimax_m2.rs:1-14)."""
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(r"(?s)<minimax:tool_call>(.*?)(?:</minimax:tool_call>|\Z)", text):
        block_calls = []
        for im in re.finditer(
            r'(?s)<invoke name="([^"]+)">(.*?)(?:</invoke>|\Z)', m.group(1)
        ):
            args = {}
            for pm in re.finditer(
                r'(?s)<parameter name="([^"]+)">(.*?)</parameter>', im.group(2)
            ):
                args[pm.group(1)] = _infer_value(pm.group(2))
            block_calls.append(ToolCall(name=im.group(1), arguments=json.dumps(args)))
        if block_calls:
            content_parts.append(text[pos : m.start()])
            pos = m.end()
            calls.extend(block_calls)
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


@register_tool_parser("step3", "step3p5")
def parse_step3(text: str) -> ParseResult:
    """Fullwidth-pipe delimited steptml invokes
    (reference tool_parser/step3.rs:1-16)."""
    start = text.find("<｜tool_calls_begin｜>")
    if start < 0:
        return text, []
    calls = []
    for im in re.finditer(
        r'(?s)<steptml:invoke name="([^"]+)">(.*?)</steptml:invoke>', text[start:]
    ):
        args = {}
        for pm in re.finditer(
            r'(?s)<steptml:parameter name="([^"]+)">(.*?)</steptml:parameter>',
            im.group(2),
        ):
            args[pm.group(1)] = _infer_value(pm.group(2))
        calls.append(ToolCall(name=im.group(1), arguments=json.dumps(args)))
    if not calls:
        return text, []
    return text[:start].strip(), calls


# --------------------------------------------------------------------------
# Gemma family escape-token formats
# --------------------------------------------------------------------------


def _parse_escaped_params(params: str, escape: str) -> dict:
    """``k:<esc>string<esc>, n:3`` bodies: replacing the escape token with
    a double quote yields JSON object innards."""
    jsonish = "{" + params.replace(escape, '"') + "}"
    # keys are bare identifiers — quote them
    jsonish = re.sub(r"([{,]\s*)([A-Za-z_]\w*)\s*:", r'\1"\2":', jsonish)
    try:
        obj = json.loads(jsonish)
        if isinstance(obj, dict):
            return obj
    except json.JSONDecodeError:
        pass
    # fallback: split on top-level commas, infer values
    args = {}
    for part in params.split(","):
        if ":" not in part:
            continue
        k, _, v = part.partition(":")
        args[k.strip()] = _infer_value(v.replace(escape, ""))
    return args


@register_tool_parser("functiongemma")
def parse_functiongemma(text: str) -> ParseResult:
    """``<start_function_call>call:name{k:<escape>v<escape>}<end_function_call>``
    (reference tool_parser/functiongemma.rs:1-9)."""
    calls = []
    content_parts = []
    pos = 0
    for m in re.finditer(
        r"(?s)<start_function_call>call:(\w+)\{(.*?)\}<end_function_call>", text
    ):
        content_parts.append(text[pos : m.start()])
        pos = m.end()
        args = _parse_escaped_params(m.group(2), "<escape>")
        calls.append(ToolCall(name=m.group(1), arguments=json.dumps(args)))
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls


@register_tool_parser("gemma4", "gemma")
def parse_gemma4(text: str) -> ParseResult:
    """``<|tool_call>call:name{k:<|"|>v<|"|>}<tool_call|>`` with ``<turn|>``
    terminator and bare ``call:name{...}`` fallback
    (reference tool_parser/gemma4.rs:1-19)."""
    calls = []
    content_parts = []
    pos = 0
    pat = re.compile(
        r"(?s)<\|tool_call>\s*call:([\w\-.]+)\{(.*?)\}\s*(?:<tool_call\|>|<turn\|>)"
    )
    for m in pat.finditer(text):
        content_parts.append(text[pos : m.start()])
        pos = m.end()
        args = _parse_escaped_params(m.group(2), '<|"|>')
        calls.append(ToolCall(name=m.group(1), arguments=json.dumps(args)))
    if not calls:
        # non-strict fallback: bare call:name{...}
        for m in re.finditer(r"(?s)(?:<call>|\bcall:)([\w\-.]+)\{(.*?)\}", text):
            content_parts.append(text[pos : m.start()])
            pos = m.end()
            args = _parse_escaped_params(m.group(2), '<|"|>')
            calls.append(ToolCall(name=m.group(1), arguments=json.dumps(args)))
    content_parts.append(text[pos:])
    if not calls:
        return text, []
    return "".join(content_parts).strip(), calls
