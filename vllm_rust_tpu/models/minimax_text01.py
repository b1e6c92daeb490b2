"""MiniMax-Text-01 / MiniMax-M1: hybrid lightning (linear) attention +
full attention, with per-layer MoE and softmax/sigmoid shared-expert
mixing.

Reference: models/minimax_text01.rs — lightning attention there runs as a
per-token host loop with a Mutex<HashMap> state table, and prefill state
is NOT persisted into decode (minimax_text01.rs:497-500 "each prefill
starts from zero"). Here the recurrence runs as the chunked parallel form
on the MXU (ops/ssm.py lightning_scan) with per-slot persistent state —
the prefill state carries into decode exactly, and chunked prefill /
preemption-recompute heal for free like the Mamba family.

Layer structure (HF MiniMaxText01ForCausalLM):
- attn_type_list / decoder_attention_types: 0 = lightning, 1 = full GQA.
- Lightning: qkv_proj (+SiLU), per-head ALiBi-slope decay scaled by the
  layer's position among linear layers, state [H, D, D];
  out = RMSNorm_{H*D}(y) * sigmoid(output_gate(x)), then out_proj.
- Full attention: vanilla GQA + RoPE through the paged KV cache.
- Residual algebra per layer: alpha * residual + beta * sublayer_out,
  with separate (alpha, beta) for linear-attn, full-attn and MLP
  sublayers; optional postnorm (residual taken after the norm).
- FFN: dense fused-SwiGLU or Mixtral-style MoE (block_sparse_moe,
  w1/w3/w2 experts, softmax router, renormalized top-k) + optional
  shared expert mixed via a scalar coefficient head (softmax/sigmoid).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..layers.attention import alibi_slopes, attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.norm import rms_norm
from ..ops.ssm import lightning_scan
from .qwen3_moe import Qwen3MoeForCausalLM


def _per_layer(val, n, default):
    """Config values that may be a scalar or a per-layer list."""
    if val is None:
        return [default] * n
    if isinstance(val, (int, float)):
        return [val] * n
    return [v for v in val][:n] + [default] * max(0, n - len(val))


class MiniMaxText01ForCausalLM(Qwen3MoeForCausalLM):
    supports_pp = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        config.qk_norm = False
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
        )
        n = config.num_hidden_layers

        types = ex.get("attn_type_list") or ex.get("decoder_attention_types")
        if types is None and config.layer_types:
            types = [
                0 if t == "linear_attention" else 1 for t in config.layer_types
            ]
        if types is None:
            # MiniMax-01 default: every 8th layer is full attention
            types = [1 if (i + 1) % 8 == 0 else 0 for i in range(n)]
        self.kinds = ["full" if t == 1 else "linear" for t in types]
        self.n_linear = sum(k == "linear" for k in self.kinds)

        # num_local_experts is normalized to config.num_experts by
        # ModelConfig.from_dict; it may be a scalar or a per-layer list
        counts = ex.get("num_local_experts")
        if counts is None:
            counts = config.num_experts
        self.expert_counts = [int(v) for v in _per_layer(counts, n, 1)]
        self.moe_spec = dataclasses.replace(
            self.moe_spec,
            num_experts=max(self.expert_counts),
            top_k=int(ex.get("num_experts_per_tok", 2)),
            norm_topk_prob=True,
            scoring="softmax",
            has_shared_expert=False,
        )
        self.shared_sizes = [
            int(v)
            for v in _per_layer(ex.get("shared_intermediate_size"), n, 0)
        ]
        self.shared_moe_mode = str(ex.get("shared_moe_mode", "softmax"))

        def fget(*names, default=1.0):
            for nm in names:
                if nm in ex:
                    return float(ex[nm])
            return default

        self.lin_alpha = fget(
            "layernorm_linear_attention_alpha", "linear_attn_alpha_factor"
        )
        self.lin_beta = fget(
            "layernorm_linear_attention_beta", "linear_attn_beta_factor"
        )
        self.full_alpha = fget(
            "layernorm_full_attention_alpha", "full_attn_alpha_factor"
        )
        self.full_beta = fget(
            "layernorm_full_attention_beta", "full_attn_beta_factor"
        )
        self.mlp_alpha = fget("layernorm_mlp_alpha", "mlp_alpha_factor")
        self.mlp_beta = fget("layernorm_mlp_beta", "mlp_beta_factor")
        self.postnorm = bool(ex.get("postnorm", False))

        # per-head decay for each linear layer: ALiBi slopes scaled by
        # (1 - idx/(n_lin-1) + 1e-5) (reference minimax_text01.rs:428-435)
        slopes = jnp.asarray(
            alibi_slopes(config.num_attention_heads), jnp.float32
        )
        self.decays = {}
        lin_idx = 0
        for i, kind in enumerate(self.kinds):
            if kind != "linear":
                continue
            if self.n_linear <= 1:
                scale = 1.0 + 1e-5
            else:
                scale = 1.0 - lin_idx / (self.n_linear - 1.0) + 1e-5
            self.decays[i] = jnp.exp(-slopes * scale)
            lin_idx += 1

    def is_moe_layer(self, layer_idx: int) -> bool:
        return self.expert_counts[layer_idx] > 1

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "full":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            else:
                out.append(
                    {"ssm": (cfg.num_attention_heads, cfg.head_dim, cfg.head_dim)}
                )
        return out

    # -- params -----------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        # build against a uniform expert count first, then fix per layer
        saved_moe = self.moe_spec
        self.moe_spec = dataclasses.replace(saved_moe, num_experts=1)
        params = super().init_params(rng, scale)
        self.moe_spec = saved_moe
        cfg, d = self.config, self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh = cfg.num_attention_heads
        inner = nh * hd

        def w(shape):
            return jnp.zeros(shape, d) if rng is None else (
                scale
                * jax.random.normal(
                    jax.random.PRNGKey(hash(str(shape)) % (2**31)), shape
                )
            ).astype(d)

        for i, lp in enumerate(params["layers"]):
            if self.kinds[i] == "linear":
                lp["self_attn"] = {
                    "qkv_proj": {"weight": w((h, 3 * inner))},
                    "output_gate": {"weight": w((h, inner))},
                    "out_proj": {"weight": w((inner, h))},
                    "norm": jnp.ones((inner,), d),
                }
            e = self.expert_counts[i]
            if e > 1:
                inter = cfg.moe_intermediate_size or cfg.intermediate_size
                lp["mlp"] = {
                    "router": {"weight": w((h, e))},
                    "experts": {
                        "gate_proj": {"weight": w((e, h, inter))},
                        "up_proj": {"weight": w((e, h, inter))},
                        "down_proj": {"weight": w((e, inter, h))},
                    },
                }
            else:
                lp["mlp"] = {
                    "gate_up_proj": {
                        "weight": w((h, 2 * cfg.intermediate_size))
                    },
                    "down_proj": {"weight": w((cfg.intermediate_size, h))},
                }
            if self.shared_sizes[i] > 0:
                si = self.shared_sizes[i]
                lp["shared_mlp"] = {
                    "gate_up_proj": {"weight": w((h, 2 * si))},
                    "down_proj": {"weight": w((si, h))},
                }
                lp["coefficient"] = {"weight": w((h, 1))}
        return params

    # -- lightning attention ------------------------------------------------

    def _lightning(self, mp, x, md, state, layer_idx: int):
        t = x.shape[0]
        cfg = self.config
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        inner = nh * hd
        qkv = jax.nn.silu(linear(x, mp["qkv_proj"]).astype(jnp.float32))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(t, nh, hd)
        k = k.reshape(t, nh, hd)
        v = v.reshape(t, nh, hd)
        y, new_state = lightning_scan(
            q, k, v, self.decays[layer_idx], state["ssm"], md
        )
        y = rms_norm(y.reshape(t, inner), mp["norm"], 1e-5)
        gate = jax.nn.sigmoid(linear(x, mp["output_gate"]).astype(jnp.float32))
        mixed = (y.astype(jnp.float32) * gate).astype(x.dtype)
        return linear(mixed, mp["out_proj"]), {"ssm": new_state}

    # -- forward ------------------------------------------------------------

    def _ffn_with_shared(self, lp, h):
        if "experts" in lp["mlp"]:
            # per-layer expert counts: size the spec from the actual stack
            e = lp["mlp"]["experts"]["gate_proj"]["weight"].shape[0]
            spec = (
                self.moe_spec
                if e == self.moe_spec.num_experts
                else dataclasses.replace(self.moe_spec, num_experts=e)
            )
            from ..layers.moe import moe_layer

            ffn = moe_layer(spec, lp["mlp"], h, backend=self.moe_backend)
        else:
            ffn = swiglu_mlp(h, lp["mlp"], self.config.hidden_act)
        if "shared_mlp" not in lp:
            return ffn
        shared = swiglu_mlp(h, lp["shared_mlp"], self.config.hidden_act)
        coef = linear(h.astype(jnp.float32), lp["coefficient"])  # [T, 1]
        if self.shared_moe_mode == "sigmoid":
            coef = jax.nn.sigmoid(coef)
        else:
            coef = jax.nn.softmax(coef, axis=-1)  # [T, 1] → all-ones
        out = ffn.astype(jnp.float32) * (1.0 - coef) + shared.astype(
            jnp.float32
        ) * coef
        return out.astype(h.dtype)

    def __call__(self, params, input_ids, md, kv_pages):
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            norm_out = self._norm(x, lp["input_layernorm"])
            residual = norm_out if self.postnorm else x
            if self.kinds[i] == "full":
                out, st = attention_block(
                    self.attn_specs[i], lp["self_attn"], norm_out, md,
                    kv_pages[i], (params["rope_cos"], params["rope_sin"]),
                    attention_backend=self.attention_backend,
                )
                alpha, beta = self.full_alpha, self.full_beta
            else:
                out, st = self._lightning(
                    lp["self_attn"], norm_out, md, kv_pages[i], i
                )
                alpha, beta = self.lin_alpha, self.lin_beta
            new_kv.append(st)
            x = residual * alpha + out * beta

            norm_out = self._norm(x, lp["post_attention_layernorm"])
            residual = norm_out if self.postnorm else x
            ffn = self._ffn_with_shared(lp, norm_out)
            x = residual * self.mlp_alpha + ffn * self.mlp_beta
        return self._norm(x, params["norm"]), new_kv

    # -- weights --------------------------------------------------------------

    def _param_path(self, name: str):
        n = name.removeprefix("model.")
        parts = n.split(".")
        if len(parts) >= 4 and parts[0] == "layers":
            idx = int(parts[1])
            if parts[2] == "self_attn" and parts[3] == "output_gate":
                return ["layers", idx, "self_attn", "output_gate", parts[4]], (
                    parts[4] == "weight"
                )
            if parts[2] == "coefficient":
                return ["layers", idx, "coefficient", "weight"], True
            if parts[2] == "shared_mlp":
                return ["layers", idx, "shared_mlp", parts[3], parts[4]], (
                    parts[4] == "weight"
                )
        return super()._param_path(name)
