"""Kimi-Linear: hybrid KDA (Kimi Delta Attention) linear attention +
full attention, with DeepSeek-flavoured MoE.

Reference: models/kimi_linear.rs — which documents the architecture but
SUBSTITUTES full attention for every KDA layer ("KDA support would be
added when the linear attention kernel infrastructure is available",
kimi_linear.rs:411-415). Here KDA runs for real (ops/ssm.py kda_scan):
the gated delta rule with per-key-channel diagonal decay, per-slot
recurrent state, and a fused short causal conv over [q|k|v].

Layer structure:
- ``kda_layers`` (reference kimi_linear.rs:147-158) or
  ``full_attn_layers`` select which layers are linear; the rest are
  full GQA attention + RoPE through the paged KV cache.
- KDA layer (weights under ``linear_attn.``):
    q/k/v_proj → per-projection short causal conv (SiLU) → l2-norm q,k
    g = -exp(A_log)_h · softplus(f_b(f_a(x)) + dt_bias)   [T, H, Dk]
    beta = sigmoid(b_proj(x))                             [T, H]
    S_t = Diag(e^{g_t}) S_{t-1};  S_t += β_t k_t (v_t - S_tᵀk_t)ᵀ
    y = S_tᵀ q_t → gated RMSNorm(y)·silu(g_b(g_a(x))) → o_proj
- FFN: dense SwiGLU or MoE under ``block_sparse_moe`` (Mixtral w1/w3/w2
  expert names, softmax router, NO renormalize, routed_scaling_factor,
  plain-sum shared experts) per kimi_linear.rs:419-457.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import moe_layer
from ..layers.norm import rms_norm
from ..ops.ssm import causal_conv1d, kda_scan
from .qwen3_moe import Qwen3MoeForCausalLM


class KimiLinearForCausalLM(Qwen3MoeForCausalLM):
    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        config.qk_norm = False
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
        )
        n = config.num_hidden_layers

        kda = ex.get("kda_layers")
        if kda is None and ex.get("full_attn_layers") is not None:
            full = set(int(i) for i in ex["full_attn_layers"])
            kda = [i for i in range(n) if i not in full]
        kda = set(int(i) for i in (kda or []))
        self.kinds = ["kda" if i in kda else "full" for i in range(n)]

        lac = ex.get("linear_attn_config") or {}
        self.kda_heads = int(
            lac.get("num_heads", config.num_attention_heads)
        )
        self.kda_dim = int(lac.get("head_dim", config.head_dim))
        self.d_conv = int(lac.get("short_conv_kernel_size", 4))
        self.kda_rank = int(lac.get("kda_lora_rank", self.kda_dim))
        self.conv_dim = 3 * self.kda_heads * self.kda_dim

        self.is_moe = bool(ex.get("is_moe", False))
        self.first_k_dense = int(ex.get("first_k_dense_replace", 1))
        self.moe_layer_freq = int(ex.get("moe_layer_freq", 1))
        self.num_shared = int(ex.get("num_shared_experts", 1))
        self.routed_scaling = float(ex.get("routed_scaling_factor", 1.0))
        self.moe_spec = dataclasses.replace(
            self.moe_spec,
            num_experts=int(config.num_experts or ex.get("num_experts", 16)),
            top_k=int(
                ex.get("num_experts_per_token")
                or config.num_experts_per_tok
                or 4
            ),
            norm_topk_prob=False,
            scoring="softmax",
            has_shared_expert=False,
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return (
            self.is_moe
            and layer_idx >= self.first_k_dense
            and layer_idx % max(1, self.moe_layer_freq) == 0
        )

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "full":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            else:
                out.append(
                    {
                        "conv": (self.conv_dim, self.d_conv - 1),
                        "ssm": (self.kda_heads, self.kda_dim, self.kda_dim),
                    }
                )
        return out

    # -- params -----------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size
        hk, dk, r = self.kda_heads, self.kda_dim, self.kda_rank
        inner = hk * dk

        def w(shape):
            return jnp.zeros(shape, d) if rng is None else (
                scale
                * jax.random.normal(
                    jax.random.PRNGKey(hash(str(shape)) % (2**31)), shape
                )
            ).astype(d)

        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        for i, lp in enumerate(params["layers"]):
            if self.kinds[i] == "kda":
                lp["linear_attn"] = {
                    "q_proj": {"weight": w((h, inner))},
                    "k_proj": {"weight": w((h, inner))},
                    "v_proj": {"weight": w((h, inner))},
                    "conv1d": {"weight": w((self.conv_dim, self.d_conv))},
                    "f_a_proj": {"weight": w((h, r))},
                    "f_b_proj": {"weight": w((r, inner))},
                    "dt_bias": jnp.zeros((inner,), jnp.float32),
                    "A_log": jnp.zeros((hk,), jnp.float32),
                    "b_proj": {"weight": w((h, hk))},
                    "g_a_proj": {"weight": w((h, r))},
                    "g_b_proj": {"weight": w((r, inner))},
                    "o_norm": jnp.ones((dk,), d),
                    "o_proj": {"weight": w((inner, h))},
                }
                del lp["self_attn"]
            if self.is_moe_layer(i) and "experts" not in lp["mlp"]:
                lp["mlp"] = {
                    "router": {"weight": w((h, self.moe_spec.num_experts))},
                    "experts": {
                        "gate_proj": {
                            "weight": w((self.moe_spec.num_experts, h, inter))
                        },
                        "up_proj": {
                            "weight": w((self.moe_spec.num_experts, h, inter))
                        },
                        "down_proj": {
                            "weight": w((self.moe_spec.num_experts, inter, h))
                        },
                    },
                }
            if self.is_moe_layer(i) and self.num_shared > 0:
                si = inter * self.num_shared
                lp["mlp"]["shared_experts"] = {
                    "gate_proj": {"weight": w((h, si))},
                    "up_proj": {"weight": w((h, si))},
                    "down_proj": {"weight": w((si, h))},
                }
            elif not self.is_moe_layer(i) and "experts" in lp["mlp"]:
                lp["mlp"] = {
                    "gate_proj": {"weight": w((h, cfg.intermediate_size))},
                    "up_proj": {"weight": w((h, cfg.intermediate_size))},
                    "down_proj": {"weight": w((cfg.intermediate_size, h))},
                }
        return params

    # -- KDA layer ----------------------------------------------------------

    def _kda(self, mp, x, md, state):
        t = x.shape[0]
        hk, dk = self.kda_heads, self.kda_dim
        q = linear(x, mp["q_proj"])
        k = linear(x, mp["k_proj"])
        v = linear(x, mp["v_proj"])
        qkv, conv_state = causal_conv1d(
            jnp.concatenate([q, k, v], axis=-1),
            mp["conv1d"]["weight"],
            mp["conv1d"].get("bias"),
            state["conv"],
            md,
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(t, hk, dk)
        k = k.reshape(t, hk, dk)
        v = v.reshape(t, hk, dk)
        # l2-normalized q/k heads (delta-rule stability, as GDN)
        q = q * jax.lax.rsqrt(
            jnp.sum(q.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
        ).astype(q.dtype)
        k = k * jax.lax.rsqrt(
            jnp.sum(k.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
        ).astype(k.dtype)

        a = linear(linear(x, mp["f_a_proj"]), mp["f_b_proj"]).astype(
            jnp.float32
        )  # [T, H*Dk]
        log_g = (
            -jnp.exp(mp["A_log"])[None, :, None]
            * jax.nn.softplus(a + mp["dt_bias"][None, :]).reshape(t, hk, dk)
        )
        beta = jax.nn.sigmoid(linear(x, mp["b_proj"]).astype(jnp.float32))

        y, ssm_state = kda_scan(q, k, v, log_g, beta, state["ssm"], md)
        gate = linear(linear(x, mp["g_a_proj"]), mp["g_b_proj"])
        y = rms_norm(y, mp["o_norm"], self.config.rms_norm_eps)
        y = y * jax.nn.silu(
            gate.reshape(t, hk, dk).astype(jnp.float32)
        ).astype(y.dtype)
        out = linear(y.reshape(t, hk * dk), mp["o_proj"])
        return out, {"conv": conv_state, "ssm": ssm_state}

    # -- forward --------------------------------------------------------------

    def _moe_ffn(self, lp_mlp, h):
        routed = moe_layer(self.moe_spec, lp_mlp, h, backend=self.moe_backend)
        out = routed.astype(jnp.float32) * self.routed_scaling
        if "shared_experts" in lp_mlp:
            out = out + swiglu_mlp(
                h, lp_mlp["shared_experts"], self.config.hidden_act
            ).astype(jnp.float32)
        return out.astype(h.dtype)

    def __call__(self, params, input_ids, md, kv_pages):
        from ..layers.attention import attention_block

        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            if self.kinds[i] == "full":
                out, st = attention_block(
                    self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                    (params["rope_cos"], params["rope_sin"]),
                    attention_backend=self.attention_backend,
                )
            else:
                out, st = self._kda(lp["linear_attn"], h, md, kv_pages[i])
            new_kv.append(st)
            x = residual + out

            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn
        return self._norm(x, params["norm"]), new_kv

    # -- weights ----------------------------------------------------------------

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        parts = n.split(".")
        if len(parts) >= 3 and parts[0] == "layers":
            idx = int(parts[1])
            if parts[2] == "linear_attn":
                rest = parts[3:]
                if rest[0].endswith("conv1d"):
                    return None  # HF [C, 1, K] layout; fixed in load_weights
                if rest[0] in ("A_log", "dt_bias", "o_norm"):
                    return ["layers", idx, "linear_attn", rest[0]], False
                if rest[-1] in ("weight", "bias"):
                    return (
                        ["layers", idx, "linear_attn", *rest[:-1], rest[-1]],
                        rest[-1] == "weight",
                    )
            if parts[2] == "block_sparse_moe" and parts[3] == "shared_experts":
                return (
                    ["layers", idx, "mlp", "shared_experts", parts[4], parts[5]],
                    parts[5] == "weight",
                )
        return super()._param_path(name)

    def load_weights(self, weights):
        """Separate q/k/v short convs in the checkpoint are packed into
        one depthwise conv over the concatenated [q|k|v] channel axis
        (causal depthwise conv is per-channel, so packing is exact)."""
        conv_fixups = []
        inner = self.kda_heads * self.kda_dim
        offsets = {"q_conv1d": 0, "k_conv1d": inner, "v_conv1d": 2 * inner}

        def conv(stream):
            for name, arr in stream:
                if ".linear_attn." in name and "conv1d" in name:
                    parts = name.split(".")
                    li = int(parts[2])
                    which = parts[4]
                    a = np.asarray(arr)
                    if name.endswith("weight") and a.ndim == 3:
                        a = a[:, 0, :]
                    conv_fixups.append(
                        (li, which, name.endswith("bias"), a)
                    )
                    continue
                yield name, arr

        params = super().load_weights(conv(weights))
        for li, which, is_bias, a in conv_fixups:
            node = params["layers"][li]["linear_attn"]["conv1d"]
            if which == "conv1d":  # already fused
                key = "bias" if is_bias else "weight"
                node[key] = jnp.asarray(a, self.dtype)
                continue
            off = offsets[which]
            if is_bias:
                if "bias" not in node:
                    node["bias"] = jnp.zeros((self.conv_dim,), self.dtype)
                node["bias"] = (
                    node["bias"].at[off : off + inner].set(
                        jnp.asarray(a, self.dtype)
                    )
                )
            else:
                node["weight"] = (
                    node["weight"].at[off : off + inner, :].set(
                        jnp.asarray(a, self.dtype)
                    )
                )
        return params
