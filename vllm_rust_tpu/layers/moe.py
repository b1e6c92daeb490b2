"""Mixture-of-Experts layer.

Reference: crates/core/src/moe/ (MoERouter router.rs:83, MoELayer
expert_layer.rs:140, fused CUDA path moe/fused/). TPU-first design: the
fused-MoE CUDA pipeline (align → grouped GEMM → topk softmax) maps to a
sort-by-expert + megablox grouped matmul (`gmm`), the Pallas MoE kernel
that ships with JAX; a dense per-expert fallback serves CPU tests and
tiny models. Expert parallelism shards the stacked expert dimension on
the mesh "tp"/"ep" axis (parallel/mesh.py rules).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils import on_tpu
from .linear import linear
from .mlp import _ACTS, swiglu_mlp


@dataclass(frozen=True)
class MoESpec:
    num_experts: int
    top_k: int
    norm_topk_prob: bool = False
    scoring: str = "softmax"  # softmax | sigmoid | softmax_after_topk
    act: str = "silu"  # silu | gelu | ... | swiglu_oss (clamped, GPT-OSS)
    has_shared_expert: bool = False
    routed_scaling_factor: float | None = None
    act_limit: float = 7.0  # clamp for swiglu_oss
    act_alpha: float = 1.702  # sigmoid sharpness for swiglu_oss


def route(spec: MoESpec, router_logits: jax.Array):
    """Top-k routing (reference router.rs TopKRouter): returns
    (weights [T, k] f32, expert_ids [T, k] i32)."""
    if spec.scoring == "softmax_after_topk":
        # GPT-OSS routing: select top-k on raw logits, THEN softmax over
        # just the selected experts (reference router.rs TopKRouter modes)
        topv, topi = jax.lax.top_k(
            router_logits.astype(jnp.float32), spec.top_k
        )
        topv = jax.nn.softmax(topv, axis=-1)
        return topv, topi.astype(jnp.int32)
    if spec.scoring == "sigmoid":
        scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(scores, spec.top_k)
    if spec.norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-20)
    if spec.routed_scaling_factor:
        topv = topv * spec.routed_scaling_factor
    return topv, topi.astype(jnp.int32)


def _moe_inner(spec: MoESpec, hg, hu):
    """gate/up -> expert hidden. swiglu_oss is GPT-OSS's clamped glu:
    out = (up + 1) * gate * sigmoid(alpha * gate) with gate/up clamps."""
    if spec.act == "swiglu_oss":
        lim = spec.act_limit
        hg = jnp.clip(hg, max=lim)
        hu = jnp.clip(hu, min=-lim, max=lim)
        return (hu + 1.0) * hg * jax.nn.sigmoid(spec.act_alpha * hg)
    return _ACTS[spec.act](hg) * hu


def _expert_bias(params: dict, name: str):
    return params["experts"][name].get("bias")


def _expert_lora(params: dict, name: str):
    """Per-expert LoRA stacks (reference moe/lora.rs MoELoraWeights):
    {"A": [E, in, r], "B": [E, r, out]} under experts/lora/<name>, with a
    shared experts/lora/scale. Returns (A, B, scale) or None."""
    lora = params["experts"].get("lora")
    if not lora or name not in lora:
        return None
    node = lora[name]
    return node["A"], node["B"], lora["scale"]


def _expert_stack(params: dict, name: str):
    """Stacked [E, in, out] expert weights; int8-quantized stacks
    (quantization/formats_extra.py experts_int8) dequantize here — XLA
    fuses the scale multiply into the expert matmul."""
    node = params["experts"][name]
    if "qweight" in node:
        from ..quantization.formats_extra import dequant_expert_int8

        return dequant_expert_int8(node)
    return node["weight"]


def _dense_experts(spec: MoESpec, params: dict, x, topv, topi):
    """Per-expert loop (correctness path; fine for few experts/tests)."""
    t, h = x.shape
    wg = _expert_stack(params, "gate_proj")  # [E, h, I]
    wu = _expert_stack(params, "up_proj")
    wd = _expert_stack(params, "down_proj")  # [E, I, h]
    bg = _expert_bias(params, "gate_proj")  # [E, I] or None
    bu = _expert_bias(params, "up_proj")
    bd = _expert_bias(params, "down_proj")  # [E, h] or None
    # physical table may exceed spec.num_experts under EPLB replication
    num_e = wg.shape[0]
    combine = jnp.zeros((t, num_e), jnp.float32)
    combine = combine.at[jnp.arange(t)[:, None], topi].set(topv)
    lg = _expert_lora(params, "gate_proj")
    lu = _expert_lora(params, "up_proj")
    ld = _expert_lora(params, "down_proj")
    out = jnp.zeros((t, h), jnp.float32)
    for e in range(num_e):
        hg = x @ wg[e] + (bg[e] if bg is not None else 0.0)
        hu = x @ wu[e] + (bu[e] if bu is not None else 0.0)
        if lg is not None:
            hg = hg + lg[2] * ((x @ lg[0][e]) @ lg[1][e])
        if lu is not None:
            hu = hu + lu[2] * ((x @ lu[0][e]) @ lu[1][e])
        inner = _moe_inner(spec, hg, hu)
        y = inner @ wd[e]
        if ld is not None:
            y = y + ld[2] * ((inner @ ld[0][e]) @ ld[1][e])
        if bd is not None:
            y = y + bd[e]
        out = out + combine[:, e : e + 1] * y.astype(jnp.float32)
    return out.astype(x.dtype)


def _gmm_experts(spec: MoESpec, params: dict, x, topv, topi):
    """Sort-by-expert + grouped matmul (the fused path)."""
    import functools

    from jax.experimental.pallas.ops.tpu.megablox import gmm as _gmm

    from ..utils import interpret_kernels

    t, h = x.shape
    k = spec.top_k
    # physical table may exceed spec.num_experts under EPLB replication
    e = _expert_stack(params, "gate_proj").shape[0]

    def _tile(d: int) -> int:
        for c in (128, 64, 32, 16, 8):
            if d % c == 0:
                return c
        return d

    inter = _expert_stack(params, "gate_proj").shape[-1]
    gmm_up = functools.partial(
        _gmm,
        preferred_element_type=jnp.float32,
        interpret=interpret_kernels(),
        tiling=(_tile(t * k), _tile(h), _tile(inter)),
    )
    gmm_down = functools.partial(
        _gmm,
        preferred_element_type=jnp.float32,
        interpret=interpret_kernels(),
        tiling=(_tile(t * k), _tile(inter), _tile(h)),
    )
    flat_expert = topi.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_expert)
    x_rep = jnp.repeat(x, k, axis=0)[order]  # [T*k, h] grouped by expert
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    wg = _expert_stack(params, "gate_proj")
    wu = _expert_stack(params, "up_proj")
    wd = _expert_stack(params, "down_proj")
    hg = gmm_up(x_rep, wg, group_sizes)
    hu = gmm_up(x_rep, wu, group_sizes)
    e_sorted = flat_expert[order]
    bg, bu = _expert_bias(params, "gate_proj"), _expert_bias(params, "up_proj")
    bd = _expert_bias(params, "down_proj")
    if bg is not None:
        hg = hg + bg[e_sorted]
    if bu is not None:
        hu = hu + bu[e_sorted]

    # per-expert LoRA (reference moe/lora.rs apply_expert_lora): the
    # low-rank factors ride the SAME grouped-matmul machinery — two more
    # gmm hops per projection on the already-sorted token stream.
    def _lora_add(h_in, which):
        lo = _expert_lora(params, which)
        if lo is None:
            return 0.0
        a, b, scale = lo
        r = a.shape[-1]
        mid = _gmm(
            h_in, a, group_sizes,
            preferred_element_type=jnp.float32,
            interpret=interpret_kernels(),
            tiling=(_tile(t * k), _tile(h_in.shape[-1]), _tile(r)),
        ).astype(h_in.dtype)
        out_lo = _gmm(
            mid, b, group_sizes,
            preferred_element_type=jnp.float32,
            interpret=interpret_kernels(),
            tiling=(_tile(t * k), _tile(r), _tile(b.shape[-1])),
        )
        return scale * out_lo

    hg = hg + _lora_add(x_rep, "gate_proj")
    hu = hu + _lora_add(x_rep, "up_proj")
    inner = _moe_inner(spec, hg, hu).astype(x.dtype)
    y = gmm_down(inner, wd, group_sizes)
    y = y + _lora_add(inner, "down_proj")
    if bd is not None:
        y = y + bd[e_sorted]

    w_sorted = topv.reshape(-1)[order][:, None]
    token_of = (order // k).astype(jnp.int32)
    out = jnp.zeros((t, h), jnp.float32).at[token_of].add(y * w_sorted)
    return out.astype(x.dtype)


def _ep_experts(
    spec: MoESpec,
    params: dict,
    x: jax.Array,
    topv: jax.Array,
    topi: jax.Array,
    capacity_factor: float = 2.0,
):
    """Expert-parallel dispatch (reference moe/ep_layer.rs EPMoELayer +
    token_dispatch.rs all_to_all): GShard-style capacity-bounded token
    dispatch to an [E, C, D] tensor sharded on the expert axis. With
    experts sharded over the mesh, XLA lowers the scatter/gather to
    all_to_all collectives over ICI — no hand-written NCCL dispatch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import get_global_mesh

    t, h = x.shape
    e, k = spec.num_experts, spec.top_k
    cap = max(8, int(-(-capacity_factor * t * k // e)))

    flat_e = topi.reshape(-1)  # [T*k]
    onehot = jax.nn.one_hot(flat_e, e, dtype=jnp.int32)  # [T*k, E]
    pos = (jnp.cumsum(onehot, axis=0) - 1)[jnp.arange(t * k), flat_e]
    keep = pos < cap
    x_rep = jnp.repeat(x, k, axis=0)  # [T*k, D]
    disp = jnp.zeros((e, cap, h), x.dtype)
    disp = disp.at[flat_e, jnp.minimum(pos, cap - 1)].add(
        jnp.where(keep[:, None], x_rep, 0), mode="drop"
    )
    mesh = get_global_mesh()
    if mesh is not None:
        disp = jax.lax.with_sharding_constraint(
            disp, NamedSharding(mesh, P("tp", None, None))
        )

    wg = _expert_stack(params, "gate_proj")  # [E, D, I]
    wu = _expert_stack(params, "up_proj")
    wd = _expert_stack(params, "down_proj")  # [E, I, D]
    hg = jnp.einsum("ecd,edi->eci", disp.astype(jnp.float32), wg.astype(jnp.float32))
    hu = jnp.einsum("ecd,edi->eci", disp.astype(jnp.float32), wu.astype(jnp.float32))
    bg, bu = _expert_bias(params, "gate_proj"), _expert_bias(params, "up_proj")
    bd = _expert_bias(params, "down_proj")
    if bg is not None:
        hg = hg + bg[:, None, :]
    if bu is not None:
        hu = hu + bu[:, None, :]

    def _lora_add(h_in, which):
        lo = _expert_lora(params, which)
        if lo is None:
            return 0.0
        a, b, scale = lo  # [E, in, r], [E, r, out]
        mid = jnp.einsum("ecd,edr->ecr", h_in.astype(jnp.float32), a.astype(jnp.float32))
        return scale * jnp.einsum("ecr,ero->eco", mid, b.astype(jnp.float32))

    hg = hg + _lora_add(disp, "gate_proj")
    hu = hu + _lora_add(disp, "up_proj")
    inner = _moe_inner(spec, hg, hu)
    y = jnp.einsum("eci,eid->ecd", inner, wd.astype(jnp.float32))
    y = y + _lora_add(inner, "down_proj")
    if bd is not None:
        y = y + bd[:, None, :]
    if mesh is not None:
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, P("tp", None, None))
        )

    gathered = y[flat_e, jnp.minimum(pos, cap - 1)]  # [T*k, D]
    gathered = jnp.where(keep[:, None], gathered, 0.0)
    w = topv.reshape(-1)[:, None]
    out = (gathered * w).reshape(t, k, h).sum(axis=1)
    return out.astype(x.dtype)


# EPLB executor hooks (reference moe/eplb_execute.rs): a tracing-time
# sink collects per-layer routing counts so the jitted step can return
# them without touching every model's forward signature; the optional
# params["eplb_table"]/"eplb_counts" remap logical experts to physical
# replica slots (parallel/eplb.py replica_router).
import contextvars as _cv

_COUNTS_SINK: _cv.ContextVar = _cv.ContextVar("moe_counts_sink", default=None)


def counts_sink():
    """Context manager: collect each moe_layer call's expert counts."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        sink: list = []
        tok = _COUNTS_SINK.set(sink)
        try:
            yield sink
        finally:
            _COUNTS_SINK.reset(tok)

    return cm()


def moe_layer(
    spec: MoESpec, params: dict, x: jax.Array, *, backend: str = "auto"
) -> jax.Array:
    """x [T, hidden] → MoE output. params: {"router": linear,
    "experts": stacked [E, ...] weights, optional "shared_expert" (+gate)}.
    Backends: dense (per-expert loop), gmm (megablox grouped matmul),
    ep (expert-parallel all_to_all dispatch)."""
    router_logits = linear(x, params["router"])
    topv, topi = route(spec, router_logits)

    sink = _COUNTS_SINK.get()
    if sink is not None:
        e_log = params["router"]["weight"].shape[-1]
        sink.append(
            jnp.zeros((e_log,), jnp.int32)
            .at[topi.reshape(-1)]
            .add(1, mode="drop")
        )
    if "eplb_table" in params:
        # map logical expert ids onto physical replica slots, striding
        # replicas by token index for an even split
        table, counts = params["eplb_table"], params["eplb_counts"]
        t = topi.shape[0]
        stride = jnp.arange(t, dtype=jnp.int32).reshape(
            (t,) + (1,) * (topi.ndim - 1)
        )
        rep = jnp.broadcast_to(stride, topi.shape) % jnp.maximum(
            counts[topi], 1
        )
        topi = table[topi, rep]
    if backend == "auto":
        backend = "gmm" if on_tpu() else "dense"
    if backend == "gmm":
        out = _gmm_experts(spec, params, x, topv, topi)
    elif backend == "ep":
        out = _ep_experts(spec, params, x, topv, topi)
    else:
        out = _dense_experts(spec, params, x, topv, topi)
    if spec.has_shared_expert and "shared_expert" in params:
        shared = swiglu_mlp(x, params["shared_expert"], spec.act)
        if "shared_expert_gate" in params:
            g = jax.nn.sigmoid(
                linear(x, params["shared_expert_gate"]).astype(jnp.float32)
            )
            shared = (shared.astype(jnp.float32) * g).astype(x.dtype)
        out = out + shared
    return out
