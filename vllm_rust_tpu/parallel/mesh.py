"""Device mesh + parameter sharding rules.

TP sharding follows the Megatron layout the reference implements manually
(distributed/parallel_layers.rs Column/RowParallelLinear): attention and
MLP input projections are column-sharded (output dim on "tp"), output
projections row-sharded (input dim on "tp"), so each block needs exactly
one all-reduce — which XLA inserts and schedules automatically. KV pools
shard on the combined-KV-head axis, aligning paged attention with the
same "tp" axis.

Axes: dp = data/replica, tp = tensor parallel. (ep/sp arrive with MoE and
long-context layers.)
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    tp: int | None = None, dp: int = 1, sp: int = 1, devices=None
) -> Mesh:
    """Axes: dp = data, sp = decode context parallel (KV page stripes,
    reference context_parallel.rs), tp = tensor parallel."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * sp)
    need = dp * sp * tp
    assert need <= n, f"mesh {dp}x{sp}x{tp} needs {need} devices, have {n}"
    dev = np.array(devices[:need]).reshape(dp, sp, tp)
    return Mesh(dev, ("dp", "sp", "tp"))


# (regex over the flattened param path) -> PartitionSpec
PARAM_RULES: list[tuple[str, P]] = [
    (r"embed_tokens/weight$", P("tp", None)),  # vocab-parallel embedding
    (r"lm_head/weight$", P(None, "tp")),
    (r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj)/weight$", P(None, "tp")),
    (r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj)/bias$", P("tp")),
    (r"(gate_proj|up_proj)/weight$", P(None, "tp")),
    (r"(gate_proj|up_proj)/bias$", P("tp")),
    (r"(o_proj|down_proj)/weight$", P("tp", None)),
    (r"(o_proj|down_proj)/bias$", P()),
    # MoE expert weights: experts stacked on dim 0 → shard experts on tp
    (r"experts/(gate_proj|up_proj|down_proj)/weight$", P("tp", None, None)),
    # int8-group quant image (ops/int8_group.py): q8g [G, gs, N],
    # sg/zg/scales/zs [G, N]. Column-parallel shards N; row-parallel
    # shards K = G*gs via the group axis (g >= 64 ⇒ G divides evenly
    # for any practical tp).
    (
        r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj|gate_proj|up_proj)"
        r"/aux/(q8g|q4g)$",
        P(None, None, "tp"),
    ),
    (
        r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj|gate_proj|up_proj)"
        r"/aux/(sg|zg|zg4)$",
        P(None, "tp"),
    ),
    (
        r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj|gate_proj|up_proj)"
        r"/(scales|zs)$",
        P(None, "tp"),
    ),
    (r"(o_proj|down_proj)/aux/(q8g|q4g)$", P("tp", None, None)),
    (r"(o_proj|down_proj)/aux/(sg|zg|zg4)$", P("tp", None)),
    (r"(o_proj|down_proj)/(scales|zs)$", P("tp", None)),
    # packed 4-bit qweight [K/2, N] (QuantLinear.qweight): column-parallel
    # shards N, row-parallel shards K (K-half packing keeps K on dim 0)
    (
        r"(q_proj|k_proj|v_proj|qkv_proj|gate_up_proj|gate_proj|up_proj)"
        r"/qweight$",
        P(None, "tp"),
    ),
    (r"(o_proj|down_proj)/qweight$", P("tp", None)),
    # int8 lm_head QuantLinear (compressed_tensors.quantize_lm_head):
    # qweight [H, V] int8, scales [V] — vocab-parallel
    (r"lm_head/qweight$", P(None, "tp")),
    (r"lm_head/scales$", P("tp")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):  # GetAttrKey (dataclass fields, e.g.
            parts.append(str(p.name))  # QuantLinear.qweight) — str(p)
        elif hasattr(p, "key"):  # would render ".qweight"
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path_str: str) -> P:
    for pattern, spec in PARAM_RULES:
        if re.search(pattern, path_str):
            return spec
    return P()  # replicate


def _fitted_spec(leaf, spec: P, mesh: Mesh) -> P:
    """Drop the spec to replicated when a sharded dim doesn't divide
    evenly (e.g. the [1,1] dummy qweight carried by int8-group images)."""
    shape = getattr(leaf, "shape", ())
    if len(shape) < len(spec):
        return P()
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        if shape[dim] % n != 0:
            return P()
    return spec


def shard_params(params, mesh: Mesh):
    """device_put the param tree with per-role NamedShardings."""

    def place(path, leaf):
        spec = _fitted_spec(leaf, param_spec(_path_str(path)), mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def kv_pages_sharding(mesh: Mesh) -> NamedSharding:
    """[num_pages, page_size, 2*kv_heads, head_dim]: combined heads on
    tp; pages striped over sp when decode context parallelism is on
    (ops/dcp.py shard_map consumes the stripes)."""
    sp = "sp" if mesh.shape.get("sp", 1) > 1 else None
    return NamedSharding(mesh, P(sp, None, "tp", None))


# engine-registered mesh, consulted by layers that place explicit
# sharding constraints (EP MoE dispatch)
_GLOBAL_MESH: Mesh | None = None


def set_global_mesh(mesh: Mesh | None) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh | None:
    return _GLOBAL_MESH


def params_shardings(params, mesh: Mesh):
    """Sharding pytree (for jit in_shardings)."""

    def spec_of(path, leaf):
        spec = _fitted_spec(leaf, param_spec(_path_str(path)), mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)
