"""Quantized checkpoint loading.

Reference: loader.rs:308 quant detection → quantization/weight_loader.rs
name remapping. Groups per-linear checkpoint tensors (qweight/qzeros/
scales/bias), converts each format's packing to the TPU kernel layout on
host, and grafts QuantLinear nodes into the model's param tree.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

_AWQ_PARTS = {"qweight", "qzeros", "scales", "bias"}
_GPTQ_PARTS = {"qweight", "qzeros", "scales", "g_idx", "bias"}
_FP8_PARTS = {"weight", "weight_scale", "weight_scale_inv", "input_scale", "bias"}
_EXL3_PARTS = {"trellis", "suh", "svh", "su", "sv", "mcg", "mul1", "bias"}


def load_quantized_weights(
    model,
    method: str,
    hf_config: dict,
    weights: Iterable[tuple[str, np.ndarray]],
):
    """Build the param tree for a quantized checkpoint.

    Non-quantized tensors (norms, embeddings, lm_head) route through the
    model's normal name mapping; linear groups become QuantLinear nodes.
    """
    method = method.replace("-", "_")
    if method == "bitsandbytes":
        return _load_bitsandbytes(model, weights)
    if method == "compressed_tensors":
        return _load_compressed_tensors(model, hf_config, weights)
    from .formats_extra import FP8_ALIASES

    if method in FP8_ALIASES:
        # ModelOpt-FP8 / FBGEMM-FP8 / PTPC-FP8 / Quark-FP8 share the fp8
        # storage path; they differ only in scale granularity, which
        # load_fp8_linear already handles (per-tensor/channel/block)
        method = "fp8"
    if method == "modelopt_fp4":
        return _load_modelopt_fp4(model, weights)
    if method == "fp_quant":
        return _load_fp_quant(model, hf_config, weights)
    if method == "experts_int8":
        # online quantization: dense checkpoint, experts int8-ized after
        # load (reference quantization/experts_int8.rs from_detected)
        return _load_experts_int8(model, weights)
    if method == "moe_wna16":
        # wna16 experts ride the awq/gptq loader below — the ".experts."
        # divert IS the moe_wna16 path (reference quantization/moe_wna16.rs
        # wraps the GPTQ infrastructure the same way)
        qc = hf_config.get("quantization_config") or {}
        method = (
            (qc.get("linear_quant_method") or ("awq" if qc.get("zero_point") else "gptq"))
            .replace("-", "_")
        )
    if method not in ("awq", "gptq", "fp8", "exl3"):
        raise NotImplementedError(f"quant method {method} not yet supported")

    params = model.init_params(rng=None)
    groups: dict[str, dict[str, np.ndarray]] = {}

    def is_quant_leaf(base: str, leaf: str, name: str) -> bool:
        if method in ("awq", "gptq"):
            return leaf in _AWQ_PARTS | _GPTQ_PARTS
        if method == "exl3":
            return leaf in _EXL3_PARTS
        # fp8: linear weights (the transposed mappings) are candidates;
        # groups that turn out to have no scale are placed normally below
        if leaf in ("weight_scale", "weight_scale_inv", "input_scale"):
            return True
        if leaf != "weight":
            return False
        path = model._param_path(name)
        return path is not None and path[1]  # transpose flag == linear

    for name, arr in weights:
        base, _, leaf = name.rpartition(".")
        if base and is_quant_leaf(base, leaf, name):
            groups.setdefault(base, {})[leaf] = np.asarray(arr)
        else:
            path = model._param_path(name)
            if path is None:
                continue
            tree_path, transpose = path
            a = np.asarray(arr)
            if transpose:
                a = a.T
            node = params
            for p in tree_path[:-1]:
                node = node[p]
            import jax.numpy as jnp

            node[tree_path[-1]] = jnp.asarray(a, model.dtype)

    expert_groups: dict[tuple[int, str], dict[int, dict]] = {}
    for base, parts in groups.items():
        if (
            "qweight" not in parts
            and "weight" not in parts
            and "trellis" not in parts
        ):
            continue
        if ".experts." in base and method in ("awq", "gptq"):
            # moe_wna16: per-expert int4 linears collect here; stacked +
            # int8-requantized after the loop (reference moe_wna16.rs
            # create_expert_linear — per-expert GPTQ machinery reused)
            bp = base.split(".")
            li = int(bp[bp.index("layers") + 1])
            ji = int(bp[bp.index("experts") + 1])
            pname = _MIXTRAL_PROJ.get(bp[-1], bp[-1])
            expert_groups.setdefault((li, pname), {})[ji] = parts
            continue
        path = model._param_path(f"{base}.weight")
        if path is None:
            continue
        tree_path, _ = path
        assert tree_path[-1] == "weight"
        if method == "fp8":
            if not ({"weight_scale", "weight_scale_inv"} & parts.keys()):
                # unquantized linear in an fp8 checkpoint: place normally
                import jax.numpy as jnp

                node = params
                for p in tree_path[:-1]:
                    node = node[p]
                node["weight"] = jnp.asarray(parts["weight"].T, model.dtype)
                continue
            from .fp8 import load_fp8_linear

            ql = load_fp8_linear(
                parts["weight"],
                parts.get("weight_scale"),
                parts.get("weight_scale_inv"),
                parts.get("bias"),
            )
        elif method == "exl3":
            # trellis decode + Hadamard fold -> dense bf16 (exl3.py)
            import jax.numpy as jnp

            from .exl3 import (
                exl3_codebook_from_parts,
                exl3_default_codebook,
                exl3_to_dense,
                unpack_sign_bitfield,
            )

            trellis = parts["trellis"]
            kf, nf = trellis.shape[0] * 16, trellis.shape[1] * 16
            suh = parts.get("suh")
            if suh is None:
                suh = unpack_sign_bitfield(parts["su"], kf)
            svh = parts.get("svh")
            if svh is None:
                svh = unpack_sign_bitfield(parts["sv"], nf)
            cb = exl3_codebook_from_parts(
                parts,
                exl3_default_codebook(
                    hf_config.get("quantization_config", {})
                ),
            )
            w = exl3_to_dense(trellis, suh, svh, cb)
            node = params
            for p in tree_path[:-2]:
                node = node[p]
            import os as _os

            if _os.environ.get("VLLM_TPU_EXL3_DENSE"):
                # opt-out: materialize dense bf16 (max throughput, 2 bytes
                # per weight)
                dest = {"weight": jnp.asarray(w, model.dtype)}
                if "bias" in parts:
                    dest["bias"] = jnp.asarray(parts["bias"], model.dtype)
                node[tree_path[-2]] = dest
                continue
            # default: int8 grouped requant — half the HBM of bf16 and
            # near-lossless on top of the 3-bit trellis (the bf16
            # materialization destroyed EXL3's memory win)
            from .exl3 import dense_to_int8_quant_linear

            ql = dense_to_int8_quant_linear(w)
            if "bias" in parts:
                import dataclasses as _dc

                ql = _dc.replace(
                    ql, bias=jnp.asarray(parts["bias"], model.dtype)
                )
            node[tree_path[-2]] = ql
            continue
        elif method == "awq":
            from .awq import load_awq_linear

            ql = load_awq_linear(
                parts["qweight"],
                parts["qzeros"],
                parts["scales"],
                parts.get("bias"),
            )
        else:
            from .gptq import load_gptq_linear

            ql = load_gptq_linear(
                parts["qweight"],
                parts["qzeros"],
                parts["scales"],
                parts.get("g_idx"),
                parts.get("bias"),
            )
        # replace the whole linear dict with the QuantLinear node
        node = params
        for p in tree_path[:-2]:
            node = node[p]
        node[tree_path[-2]] = ql

    if expert_groups:
        _graft_wna16_experts(params, expert_groups, fmt=method)
    return params


_MIXTRAL_PROJ = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}


def _graft_wna16_experts(
    params, expert_groups: dict[tuple[int, str], dict[int, dict]], fmt: str
):
    """Stack per-expert wna16 linears into [E, in, out] and serve them
    int8-grouped — the MoE layer's native quantized-stack format — so a
    4-bit MoE checkpoint keeps a sub-bf16 HBM footprint (reference
    quantization/moe_wna16.rs: experts stay quantized, dense fallback
    only for unsupported shapes)."""
    from .formats_extra import dequant_wna16_expert, quantize_experts_int8

    for (li, pname), by_e in expert_groups.items():
        dense = np.stack(
            [
                dequant_wna16_expert(
                    by_e[j]["qweight"], by_e[j]["qzeros"], by_e[j]["scales"],
                    fmt=fmt,
                )
                for j in range(len(by_e))
            ]
        )  # [E, in, out] f32
        try:
            experts = params["layers"][li]["mlp"]["experts"]
        except (KeyError, TypeError, IndexError):
            continue
        experts[pname] = quantize_experts_int8({pname: {"weight": dense}})[pname]


def _load_experts_int8(model, weights):
    """Dense checkpoint, experts quantized online after load (reference
    quantization/experts_int8.rs ExpertsInt8Config::from_detected)."""
    from .formats_extra import quantize_experts_int8

    params = model.load_weights(weights)

    def walk(node):
        if isinstance(node, dict):
            ex = node.get("experts")
            if isinstance(ex, dict) and any(
                isinstance(v, dict) and getattr(v.get("weight"), "ndim", 0) == 3
                for v in ex.values()
            ):
                node["experts"] = quantize_experts_int8(ex)
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return params


def _place_dense(model, params, name, arr):
    path = model._param_path(name)
    if path is None:
        return
    import jax.numpy as jnp

    tree_path, transpose = path
    a = np.asarray(arr)
    if transpose:
        a = a.T
    node = params
    for p in tree_path[:-1]:
        node = node[p]
    node[tree_path[-1]] = jnp.asarray(a, model.dtype)


def _load_modelopt_fp4(model, weights):
    """ModelOpt NVFP4 groups: `{p}.weight` (packed e2m1 pairs) +
    `{p}.weight_scale` (per-16 block e4m3) + `{p}.weight_scale_2`
    (global). Dequantizes to dense on host (formats_extra.dequant_nvfp4;
    reference quantization/modelopt.rs)."""
    import jax.numpy as jnp

    from .formats_extra import dequant_nvfp4

    params = model.init_params(rng=None)
    groups: dict[str, dict[str, np.ndarray]] = {}
    plain: list[tuple[str, np.ndarray]] = []
    for name, arr in weights:
        base, _, leaf = name.rpartition(".")
        if leaf in ("weight", "weight_scale", "weight_scale_2", "input_scale",
                    "bias") and base:
            groups.setdefault(base, {})[leaf] = np.asarray(arr)
        else:
            plain.append((name, np.asarray(arr)))
    for base, parts in groups.items():
        w = parts.get("weight")
        if w is None:
            continue
        if "weight_scale_2" not in parts or w.dtype != np.uint8:
            # unquantized tensor in an fp4 checkpoint
            _place_dense(model, params, base + ".weight", w)
            if "bias" in parts:
                _place_dense(model, params, base + ".bias", parts["bias"])
            continue
        dense = dequant_nvfp4(w, parts["weight_scale"],
                              parts["weight_scale_2"])  # [N, K]
        path = model._param_path(base + ".weight")
        if path is None:
            continue
        tree_path, transpose = path
        if transpose:
            dense = dense.T
        node = params
        for p in tree_path[:-1]:
            node = node[p]
        node[tree_path[-1]] = jnp.asarray(dense, model.dtype)
        if "bias" in parts:
            _place_dense(model, params, base + ".bias", parts["bias"])
    for name, arr in plain:
        _place_dense(model, params, name, arr)
    return params


def _load_fp_quant(model, hf_config, weights):
    """FP-Quant (QuTLASS): packed FP4 e2m1 nibbles `qweight` [N, K/2] +
    per-group uint8 `scales` [N, K/gs] (E8M0 for mxfp4 / E4M3 for nvfp4)
    + optional `weight_global_scale`. Dequantizes on host and serves the
    result int8-grouped — same memory class as the 4-bit source.
    Activation Hadamard rotation and act quantization are GPU-kernel
    details not applied here, matching the reference CPU path
    (quantization/fp_quant.rs:10-14: weights-only dequant, standard
    matmul). Hadamard matrices in the checkpoint are skipped."""
    import jax.numpy as jnp

    from .exl3 import dense_to_int8_quant_linear
    from .mxfp4 import FP4_VALUES

    qc = hf_config.get("quantization_config") or {}
    fwd = str(qc.get("forward_dtype") or "mxfp4").lower()

    params = model.init_params(rng=None)
    groups: dict[str, dict[str, np.ndarray]] = {}
    plain: list[tuple[str, np.ndarray]] = []
    for name, arr in weights:
        base, _, leaf = name.rpartition(".")
        if "hadamard_matrix" in leaf or leaf == "act_global_scale":
            continue
        if leaf in ("qweight", "scales", "weight_global_scale", "bias") and base:
            groups.setdefault(base, {})[leaf] = np.asarray(arr)
        else:
            plain.append((name, np.asarray(arr)))
    for base, parts in groups.items():
        q = parts.get("qweight")
        if q is None or "scales" not in parts:
            continue
        n, kh = q.shape
        k = kh * 2
        lo = FP4_VALUES[q & 0xF]
        hi = FP4_VALUES[q >> 4]
        vals = np.stack([lo, hi], axis=-1).reshape(n, k)  # lower nibble first
        s = parts["scales"]
        if fwd == "nvfp4":
            s = s.view(np.dtype("float8_e4m3fn")).astype(np.float32)
        else:
            s = np.exp2(s.astype(np.float32) - 127.0)  # E8M0
        gs = k // s.shape[1]
        dense = (vals.reshape(n, k // gs, gs) * s[:, :, None]).reshape(n, k)
        if "weight_global_scale" in parts:
            dense = dense * float(np.asarray(parts["weight_global_scale"]).reshape(-1)[0])
        path = model._param_path(base + ".weight")
        if path is None:
            continue
        tree_path, _ = path
        ql = dense_to_int8_quant_linear(dense.T)  # [K, N] in->out
        if "bias" in parts:
            import dataclasses as _dc

            ql = _dc.replace(ql, bias=jnp.asarray(parts["bias"], model.dtype))
        node = params
        for p in tree_path[:-2]:
            node = node[p]
        node[tree_path[-2]] = ql
    for name, arr in plain:
        _place_dense(model, params, name, arr)
    return params


def _load_bitsandbytes(model, weights):
    """BnB groups: `{p}.weight` + `{p}.weight.<aux>` (+ `{p}.SCB` for
    8-bit). Quantized groups dequantize to dense bf16 (bitsandbytes.py);
    everything else places normally."""
    import jax.numpy as jnp

    from .bitsandbytes import load_bnb_linear

    params = model.init_params(rng=None)
    groups: dict[str, dict[str, np.ndarray]] = {}
    plain: list[tuple[str, np.ndarray]] = []
    for name, arr in weights:
        if ".weight." in name:
            base, _, leaf = name.partition(".weight.")
            groups.setdefault(base, {})["weight." + leaf] = np.asarray(arr)
        elif name.endswith(".SCB"):
            groups.setdefault(name[: -len(".SCB")], {})["SCB"] = np.asarray(
                arr
            )
        elif name.endswith(".weight"):
            groups.setdefault(name[: -len(".weight")], {})["weight"] = (
                np.asarray(arr)
            )
        else:
            plain.append((name, np.asarray(arr)))
    for base, parts in groups.items():
        w = load_bnb_linear(parts)
        if w is None:
            # not quantized after all: place the raw weight normally
            if "weight" in parts:
                _place_dense(model, params, base + ".weight", parts["weight"])
            continue
        path = model._param_path(base + ".weight")
        if path is None:
            continue
        tree_path, transpose = path
        if transpose:
            w = w.T
        node = params
        for p in tree_path[:-1]:
            node = node[p]
        node[tree_path[-1]] = jnp.asarray(w, model.dtype)
    for name, arr in plain:
        _place_dense(model, params, name, arr)
    return params


def _load_compressed_tensors(model, hf_config, weights):
    """compressed-tensors groups: weight_packed/weight_scale/
    weight_zero_point (pack-quantized int4) or weight+weight_scale
    (int-quantized int8)."""
    from .compressed_tensors import load_ct_int8_linear, load_ct_packed_linear

    params = model.init_params(rng=None)
    groups: dict[str, dict[str, np.ndarray]] = {}
    _CT = {
        "weight_packed", "weight_scale", "weight_zero_point",
        "weight_shape", "weight_g_idx", "weight", "bias",
    }
    for name, arr in weights:
        base, _, leaf = name.rpartition(".")
        if base and leaf in _CT:
            groups.setdefault(base, {})[leaf] = np.asarray(arr)
        else:
            _place_dense(model, params, name, arr)
    for base, parts in groups.items():
        path = model._param_path(base + ".weight")
        if path is None:
            continue
        tree_path, _ = path
        if "weight_packed" in parts:
            ql = load_ct_packed_linear(
                parts["weight_packed"],
                parts["weight_scale"],
                parts.get("weight_zero_point"),
                parts.get("bias"),
            )
        elif "weight" in parts and "weight_scale" in parts:
            w = parts["weight"]
            if w.dtype == np.int8:
                ql = load_ct_int8_linear(w, parts["weight_scale"], parts.get("bias"))
            else:
                _place_dense(model, params, base + ".weight", w)
                continue
        else:
            for leaf in ("weight", "bias"):
                if leaf in parts:
                    _place_dense(model, params, f"{base}.{leaf}", parts[leaf])
            continue
        node = params
        for p in tree_path[:-2]:
            node = node[p]
        node[tree_path[-2]] = ql
    return params
