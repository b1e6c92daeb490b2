"""Qwen3-Next: hybrid gated-delta-net linear attention + full attention
with sparse MoE.

Reference: models/qwen3_next.rs — which documents the architecture but
SUBSTITUTES full attention for the GDN layers ("GDN layer support would
be a future extension"). Here the gated delta rule runs for real
(ops/ssm.py gated_delta_scan): a lax.scan recurrence over position,
vectorized across the step's sequences, with per-slot recurrent state —
the same serving shape as the Mamba family.

Layer structure (HF Qwen3NextForCausalLM):
- layer_types: "linear_attention" | "full_attention" (default 3:1).
- Full attention: Qwen3-style with Gemma-offset per-head QK norms,
  partial rotary, optional sigmoid output gate (q_proj doubled).
- Linear attention (GatedDeltaNet): in_proj_qkvz + in_proj_ba,
  causal conv1d over [q,k,v], l2-normalized q/k heads,
  alpha = exp(-exp(A_log) * softplus(a + dt_bias)), beta = sigmoid(b),
  delta-rule state update, gated RMSNorm(y) * silu(z), out_proj.
- FFN: Qwen3-MoE sparse experts + gated shared expert.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import MoESpec, moe_layer
from ..layers.norm import rms_norm
from ..ops.ssm import causal_conv1d, gated_delta_scan
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


class Qwen3NextForCausalLM(Qwen3MoeForCausalLM):
    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = True
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                ex.get("partial_rotary_factor", 0.25)
            )
        super().__init__(config, dtype)
        # Gemma-style (1+w) offset on the q/k norms only
        self.attn_specs = tuple(
            dataclasses.replace(s, norm_offset=1.0) for s in self.attn_specs
        )
        self.attn_output_gate = bool(ex.get("attn_output_gate", True))
        n = config.num_hidden_layers
        if config.layer_types:
            self.kinds = ["full" if t == "full_attention" else "linear"
                          for t in config.layer_types]
        else:
            interval = int(ex.get("full_attention_interval", 4))
            self.kinds = ["full" if (i + 1) % interval == 0 else "linear"
                          for i in range(n)]
        # GDN geometry
        self.h_v = int(ex.get("linear_num_value_heads", 8))
        self.h_k = int(ex.get("linear_num_key_heads", 4))
        self.d_k = int(ex.get("linear_key_head_dim", 64))
        self.d_v = int(ex.get("linear_value_head_dim", 64))
        self.d_conv = int(ex.get("linear_conv_kernel_dim", 4))
        self.conv_dim = self.h_k * self.d_k * 2 + self.h_v * self.d_v
        self.moe_spec = dataclasses.replace(
            self.moe_spec,
            has_shared_expert=bool(config.shared_expert_intermediate_size),
        )

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "full":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            else:
                out.append({"conv": (self.conv_dim, self.d_conv - 1),
                            "ssm": (self.h_v, self.d_k, self.d_v)})
        return out

    # -- params -----------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh = cfg.num_attention_heads

        def w(shape):
            return jnp.zeros(shape, d) if rng is None else (
                scale * jax.random.normal(
                    jax.random.PRNGKey(hash(str(shape)) % (2**31)), shape
                )
            ).astype(d)

        qkvz = self.h_k * self.d_k * 2 + self.h_v * self.d_v * 2
        for i, lp in enumerate(params["layers"]):
            if self.kinds[i] == "full":
                if self.attn_output_gate:
                    lp["self_attn"]["g_proj"] = {"weight": w((h, nh * hd))}
                continue
            # linear-attention layer replaces self_attn entirely
            lp["linear_attn"] = {
                "in_proj_qkvz": {"weight": w((h, qkvz))},
                "in_proj_ba": {"weight": w((h, 2 * self.h_v))},
                "conv1d": {"weight": w((self.conv_dim, self.d_conv))},
                "A_log": jnp.zeros((self.h_v,), jnp.float32),
                "dt_bias": jnp.zeros((self.h_v,), jnp.float32),
                "norm": jnp.ones((self.d_v,), d),
                "out_proj": {"weight": w((self.h_v * self.d_v, h))},
            }
            del lp["self_attn"]
        return params

    # -- GDN layer ----------------------------------------------------------

    def _gdn(self, mp, x, md, state):
        t = x.shape[0]
        hk, hv, dk, dv = self.h_k, self.h_v, self.d_k, self.d_v
        qkvz = linear(x, mp["in_proj_qkvz"])
        qkv, z = jnp.split(qkvz, [hk * dk * 2 + hv * dv], axis=-1)
        ba = linear(x, mp["in_proj_ba"]).astype(jnp.float32)
        b, a = jnp.split(ba, 2, axis=-1)  # [T, Hv] each

        qkv, conv_state = causal_conv1d(
            qkv, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md,
        )
        q, k, v = jnp.split(qkv, [hk * dk, hk * dk * 2], axis=-1)
        q = q.reshape(t, hk, dk)
        k = k.reshape(t, hk, dk)
        v = v.reshape(t, hv, dv)
        # l2-normalized q/k heads (delta rule stability)
        q = q * jax.lax.rsqrt(
            jnp.sum(q.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
        ).astype(q.dtype)
        k = k * jax.lax.rsqrt(
            jnp.sum(k.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
        ).astype(k.dtype)
        # repeat key heads onto value heads
        rep = hv // hk
        q = jnp.repeat(q, rep, axis=1)
        k = jnp.repeat(k, rep, axis=1)

        alpha = jnp.exp(
            -jnp.exp(mp["A_log"])[None, :]
            * jax.nn.softplus(a + mp["dt_bias"][None, :])
        )  # [T, Hv]
        beta = jax.nn.sigmoid(b)

        y, ssm_state = gated_delta_scan(q, k, v, alpha, beta, state["ssm"], md)
        # gated RMSNorm: norm(y) * silu(z) per value head
        y = rms_norm(y, mp["norm"], self.config.rms_norm_eps)
        zf = z.reshape(t, hv, dv)
        y = y * jax.nn.silu(zf.astype(jnp.float32)).astype(y.dtype)
        out = linear(y.reshape(t, hv * dv), mp["out_proj"])
        return out, {"conv": conv_state, "ssm": ssm_state}

    # -- forward --------------------------------------------------------------

    def __call__(self, params, input_ids, md, kv_pages):
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
                out, st = self._gdn(lp["linear_attn"], h, md, kv_pages[i])
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
        parts = name.removeprefix("model.").split(".")
        if len(parts) >= 3 and parts[0] == "layers" and parts[2] == "linear_attn":
            idx = int(parts[1])
            rest = parts[3:]
            if rest[0] in ("in_proj_qkvz", "in_proj_ba", "out_proj"):
                return (["layers", idx, "linear_attn", rest[0], rest[1]],
                        rest[1] == "weight")
            if rest[0] == "conv1d":
                return None  # handled in load_weights (HF [C,1,K] layout)
            if rest[0] in ("A_log", "dt_bias"):
                return ["layers", idx, "linear_attn", rest[0]], False
            if rest[0] == "norm":
                return ["layers", idx, "linear_attn", "norm"], False
        return super()._param_path(name)

    def load_weights(self, weights):
        conv_fixups = []

        def conv(stream):
            for name, arr in stream:
                if ".linear_attn.conv1d.weight" in name:
                    li = int(name.split(".")[2])
                    conv_fixups.append((li, np.asarray(arr)[:, 0, :]))
                    continue
                if ".linear_attn.conv1d.bias" in name:
                    li = int(name.split(".")[2])
                    conv_fixups.append((li, ("bias", np.asarray(arr))))
                    continue
                yield name, arr

        params = super().load_weights(conv(weights))
        for li, a in conv_fixups:
            node = params["layers"][li]["linear_attn"]["conv1d"]
            if isinstance(a, tuple):
                node["bias"] = jnp.asarray(a[1], self.dtype)
            else:
                node["weight"] = jnp.asarray(a, self.dtype)
        return params
