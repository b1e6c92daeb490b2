"""SSM model family: Mamba, Mamba2, FalconMamba, Jamba (hybrid).

Reference: crates/core/src/ssm/ (causal conv1d, selective_scan, SSD
chunked scan, SSMStateManager) + models/{mamba,mamba2,falcon_mamba,
jamba}.rs. TPU design: recurrences run as segmented associative scans
over the flattened mixed batch (ops/ssm.py); recurrent state lives in
per-slot pools threaded through the jitted step like KV pages. Hybrid
models mix paged-attention layers and SSM layers in one step — the KV
manager allocates each layer's state kind from `kv_head_info`.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.moe import MoESpec, moe_layer
from ..layers.norm import rms_norm
from ..ops.attn_metadata import AttentionMetadata
from ..ops.ssm import causal_conv1d, selective_scan, ssd_scan


def _weightless_rms(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf**2, -1, keepdims=True) + eps)).astype(
        x.dtype
    )


class Mamba2ForCausalLM:
    """Mamba2 (state-space duality) causal LM.

    Reference: models/mamba2.rs + ssm/ssd_scan.cu — here the SSD
    recurrence is ops/ssm.py ssd_scan (segmented associative scan)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.d_state = int(ex.get("state_size", 128))
        self.d_conv = int(ex.get("conv_kernel", 4))
        self.expand = int(ex.get("expand", 2))
        self.d_inner = self.expand * config.hidden_size
        self.n_groups = int(ex.get("n_groups", 1))
        self.num_heads = int(ex.get("num_heads", self.d_inner // 64))
        self.head_dim = self.d_inner // self.num_heads
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.eps = float(ex.get("layer_norm_epsilon", 1e-5))
        self.use_conv_bias = bool(ex.get("use_conv_bias", True))
        self.use_bias = bool(ex.get("use_bias", False))
        self.kv_scales = None

    @property
    def num_layers(self) -> int:
        return self.config.num_hidden_layers

    @property
    def kv_head_info(self) -> list:
        return [
            {
                "conv": (self.conv_dim, self.d_conv - 1),
                "ssm": (self.num_heads, self.head_dim, self.d_state),
            }
            for _ in range(self.config.num_hidden_layers)
        ]

    # -- params ---------------------------------------------------------------

    def _mixer_params(self, w, keys):
        h = self.config.hidden_size
        proj_dim = 2 * self.d_inner + 2 * self.n_groups * self.d_state + self.num_heads
        p = {
            "in_proj": {"weight": w(next(keys), (h, proj_dim))},
            "conv1d": {"weight": w(next(keys), (self.conv_dim, self.d_conv))},
            "A_log": jnp.zeros((self.num_heads,), jnp.float32),
            "D": jnp.ones((self.num_heads,), jnp.float32),
            "dt_bias": jnp.zeros((self.num_heads,), jnp.float32),
            "norm": jnp.ones((self.d_inner,), self.dtype),
            "out_proj": {"weight": w(next(keys), (self.d_inner, h))},
        }
        if self.use_conv_bias:
            p["conv1d"]["bias"] = jnp.zeros((self.conv_dim,), self.dtype)
        if self.use_bias:
            p["in_proj"]["bias"] = jnp.zeros(
                (p["in_proj"]["weight"].shape[1],), self.dtype
            )
            p["out_proj"]["bias"] = jnp.zeros((h,), self.dtype)
        return p

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 8 + 2
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )
        layers = []
        for _ in range(cfg.num_hidden_layers):
            layers.append(
                {"norm": jnp.ones((cfg.hidden_size,), d),
                 "mixer": self._mixer_params(w, keys)}
            )
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, cfg.hidden_size))},
            "layers": layers,
            "norm_f": jnp.ones((cfg.hidden_size,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w(next(keys), (cfg.hidden_size, cfg.vocab_size))}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("backbone.").removeprefix("model.")
            a = np.asarray(arr)
            if name == "embeddings.weight" or name == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif name == "norm_f.weight":
                params["norm_f"] = jnp.asarray(a, self.dtype)
            elif name == "lm_head.weight":
                if not self.config.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                lp = params["layers"][int(parts[1])]
                rest = parts[2:]
                if rest == ["norm", "weight"]:
                    lp["norm"] = jnp.asarray(a, self.dtype)
                    continue
                assert rest[0] == "mixer", name
                m = lp["mixer"]
                key = rest[1]
                if key in ("in_proj", "out_proj"):
                    leaf = rest[2]
                    m[key][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif key == "conv1d":
                    if rest[2] == "weight":  # HF: [C, 1, K]
                        m["conv1d"]["weight"] = jnp.asarray(a[:, 0, :], self.dtype)
                    else:
                        m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
                elif key in ("A_log", "D", "dt_bias"):
                    m[key] = jnp.asarray(a, jnp.float32)
                elif key == "norm":
                    m["norm"] = jnp.asarray(a, self.dtype)
        return params

    # -- forward ---------------------------------------------------------------

    def _mixer(self, mp, x, md, state):
        t = x.shape[0]
        di, g, n, nh = self.d_inner, self.n_groups, self.d_state, self.num_heads
        proj = linear(x, mp["in_proj"])
        z, xbc, dt = jnp.split(proj, [di, di + self.conv_dim], axis=-1)
        xbc, conv_state = causal_conv1d(
            xbc, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md,
        )
        xs, b, c = jnp.split(xbc, [di, di + g * n], axis=-1)
        dtf = jax.nn.softplus(dt.astype(jnp.float32) + mp["dt_bias"][None, :])
        y, ssm_state = ssd_scan(
            xs.reshape(t, nh, self.head_dim),
            dtf,
            mp["A_log"],
            b.reshape(t, g, n),
            c.reshape(t, g, n),
            mp["D"],
            state["ssm"],
            md,
        )
        y = y.reshape(t, di)
        y = rms_norm(y * jax.nn.silu(z.astype(jnp.float32)).astype(y.dtype),
                     mp["norm"], self.eps)
        return linear(y, mp["out_proj"]), {"conv": conv_state, "ssm": ssm_state}

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        x = params["embed_tokens"]["weight"][input_ids]
        new_states = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = rms_norm(x, lp["norm"], self.eps)
            out, st = self._mixer(lp["mixer"], h, md, states[i])
            new_states.append(st)
            x = residual + out
        x = rms_norm(x, params["norm_f"], self.eps)
        return x, new_states

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            logits = hidden @ params["embed_tokens"]["weight"].T
        else:
            logits = linear(hidden, params["lm_head"])
        return logits.astype(jnp.float32)


class MambaForCausalLM(Mamba2ForCausalLM):
    """Mamba1 (selective scan) causal LM (reference models/mamba.rs)."""

    # FalconMamba applies weightless RMSNorm to B/C/dt (models/falcon_mamba.rs)
    bcdt_rms = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.d_state = int(ex.get("state_size", 16))
        self.conv_dim = self.d_inner  # mamba1 convolves x only
        self.dt_rank = int(
            ex.get("time_step_rank", -(-config.hidden_size // 16))
        )
        self.mixer_rms_eps = float(ex.get("mixer_rms_eps", 1e-6))

    @property
    def kv_head_info(self) -> list:
        return [
            {"conv": (self.d_inner, self.d_conv - 1),
             "ssm": (self.d_inner, self.d_state)}
            for _ in range(self.config.num_hidden_layers)
        ]

    def _mixer_params(self, w, keys):
        h = self.config.hidden_size
        di, n = self.d_inner, self.d_state
        p = {
            "in_proj": {"weight": w(next(keys), (h, 2 * di))},
            "conv1d": {"weight": w(next(keys), (di, self.d_conv))},
            "x_proj": {"weight": w(next(keys), (di, self.dt_rank + 2 * n))},
            "dt_proj": {
                "weight": w(next(keys), (self.dt_rank, di)),
                "bias": jnp.zeros((di,), self.dtype),
            },
            "A_log": jnp.zeros((di, n), jnp.float32),
            "D": jnp.ones((di,), jnp.float32),
            "out_proj": {"weight": w(next(keys), (di, h))},
        }
        if self.use_conv_bias:
            p["conv1d"]["bias"] = jnp.zeros((di,), self.dtype)
        return p

    def _mixer(self, mp, x, md, state):
        di, n = self.d_inner, self.d_state
        proj = linear(x, mp["in_proj"])
        xs, z = jnp.split(proj, 2, axis=-1)
        xs, conv_state = causal_conv1d(
            xs, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md,
        )
        xdbc = linear(xs, mp["x_proj"])
        dt_r, b, c = jnp.split(xdbc, [self.dt_rank, self.dt_rank + n], axis=-1)
        if self.bcdt_rms:
            dt_r = _weightless_rms(dt_r, self.mixer_rms_eps)
            b = _weightless_rms(b, self.mixer_rms_eps)
            c = _weightless_rms(c, self.mixer_rms_eps)
        dt = jax.nn.softplus(linear(dt_r, mp["dt_proj"]).astype(jnp.float32))
        y, ssm_state = selective_scan(
            xs, dt, mp["A_log"], b, c, mp["D"], state["ssm"], md
        )
        y = y * jax.nn.silu(z.astype(jnp.float32)).astype(y.dtype)
        return linear(y, mp["out_proj"]), {"conv": conv_state, "ssm": ssm_state}

    def load_weights(self, weights):
        # same tree/naming as Mamba2 plus x_proj/dt_proj (handled generically)
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("backbone.").removeprefix("model.")
            a = np.asarray(arr)
            if name in ("embeddings.weight", "embed_tokens.weight"):
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif name == "norm_f.weight":
                params["norm_f"] = jnp.asarray(a, self.dtype)
            elif name == "lm_head.weight":
                if not self.config.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                lp = params["layers"][int(parts[1])]
                rest = parts[2:]
                if rest == ["norm", "weight"]:
                    lp["norm"] = jnp.asarray(a, self.dtype)
                    continue
                m = lp["mixer"]
                key = rest[1]
                if key in ("in_proj", "out_proj", "x_proj", "dt_proj"):
                    leaf = rest[2]
                    m[key][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif key == "conv1d":
                    if rest[2] == "weight":
                        m["conv1d"]["weight"] = jnp.asarray(a[:, 0, :], self.dtype)
                    else:
                        m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
                elif key in ("A_log", "D"):
                    m[key] = jnp.asarray(a, jnp.float32)
        return params


class FalconMambaForCausalLM(MambaForCausalLM):
    bcdt_rms = True


class JambaForCausalLM(MambaForCausalLM):
    """Jamba: interleaved attention + Mamba1 layers with optional MoE FFN
    (reference models/jamba.rs). Attention layers are rope-free; mamba
    layers RMS-normalize dt/B/C with learned weights."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.d_state = int(ex.get("mamba_d_state", 16))
        self.d_conv = int(ex.get("mamba_d_conv", 4))
        self.expand = int(ex.get("mamba_expand", 2))
        self.d_inner = self.expand * config.hidden_size
        self.conv_dim = self.d_inner
        self.dt_rank = int(ex.get("mamba_dt_rank", -(-config.hidden_size // 16)))
        self.use_conv_bias = bool(ex.get("mamba_conv_bias", True))
        self.eps = config.rms_norm_eps
        ap = int(ex.get("attn_layer_period", 8))
        ao = int(ex.get("attn_layer_offset", 4))
        self.is_attn = [
            ap > 0 and (i % ap) == ao for i in range(config.num_hidden_layers)
        ]
        ep = int(ex.get("expert_layer_period", 0))
        eo = int(ex.get("expert_layer_offset", 0))
        ne = config.num_experts or 0
        self.is_moe = [
            ne > 1 and ep > 0 and (i % ep) == eo
            for i in range(config.num_hidden_layers)
        ]
        self.moe_spec = (
            MoESpec(
                num_experts=ne,
                top_k=config.num_experts_per_tok or 1,
                norm_topk_prob=False,
            )
            if ne > 1
            else None
        )
        # rope-free attention (Jamba has no positional embedding)
        self.attn_spec = AttentionSpec(
            num_heads=config.num_attention_heads,
            num_kv_heads=config.num_key_value_heads,
            head_dim=config.head_dim,
            rotary=None,
            sm_scale=config.head_dim**-0.5,
            rms_eps=config.rms_norm_eps,
        )
        self.attention_backend = "auto"

    @property
    def kv_head_info(self) -> list:
        out = []
        for i in range(self.config.num_hidden_layers):
            if self.is_attn[i]:
                out.append((self.config.num_key_value_heads, self.config.head_dim))
            else:
                out.append(
                    {"conv": (self.d_inner, self.d_conv - 1),
                     "ssm": (self.d_inner, self.d_state)}
                )
        return out

    def _mixer_params(self, w, keys):
        p = super()._mixer_params(w, keys)
        p["dt_layernorm"] = jnp.ones((self.dt_rank,), self.dtype)
        p["b_layernorm"] = jnp.ones((self.d_state,), self.dtype)
        p["c_layernorm"] = jnp.ones((self.d_state,), self.dtype)
        return p

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        inter = cfg.intermediate_size

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 16 + 2
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )
        layers = []
        for i in range(cfg.num_hidden_layers):
            lp: dict = {"input_layernorm": jnp.ones((h,), d),
                        "pre_ff_layernorm": jnp.ones((h,), d)}
            if self.is_attn[i]:
                lp["self_attn"] = {
                    "q_proj": {"weight": w(next(keys), (h, nh * hd))},
                    "k_proj": {"weight": w(next(keys), (h, nkv * hd))},
                    "v_proj": {"weight": w(next(keys), (h, nkv * hd))},
                    "o_proj": {"weight": w(next(keys), (nh * hd, h))},
                }
            else:
                lp["mamba"] = self._mixer_params(w, keys)
            if self.is_moe[i]:
                ne = self.moe_spec.num_experts
                lp["feed_forward"] = {
                    "router": {"weight": w(next(keys), (h, ne))},
                    "experts": {
                        "gate_proj": {"weight": w(next(keys), (ne, h, inter))},
                        "up_proj": {"weight": w(next(keys), (ne, h, inter))},
                        "down_proj": {"weight": w(next(keys), (ne, inter, h))},
                    },
                }
            else:
                lp["feed_forward"] = {
                    "gate_proj": {"weight": w(next(keys), (h, inter))},
                    "up_proj": {"weight": w(next(keys), (h, inter))},
                    "down_proj": {"weight": w(next(keys), (inter, h))},
                }
            layers.append(lp)
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm_f": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w(next(keys), (h, cfg.vocab_size))}
        return params

    def _mixer(self, mp, x, md, state):
        n = self.d_state
        proj = linear(x, mp["in_proj"])
        xs, z = jnp.split(proj, 2, axis=-1)
        xs, conv_state = causal_conv1d(
            xs, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md,
        )
        xdbc = linear(xs, mp["x_proj"])
        dt_r, b, c = jnp.split(xdbc, [self.dt_rank, self.dt_rank + n], axis=-1)
        dt_r = rms_norm(dt_r, mp["dt_layernorm"], self.eps)
        b = rms_norm(b, mp["b_layernorm"], self.eps)
        c = rms_norm(c, mp["c_layernorm"], self.eps)
        dt = jax.nn.softplus(linear(dt_r, mp["dt_proj"]).astype(jnp.float32))
        y, ssm_state = selective_scan(
            xs, dt, mp["A_log"], b, c, mp["D"], state["ssm"], md
        )
        y = y * jax.nn.silu(z.astype(jnp.float32)).astype(y.dtype)
        return linear(y, mp["out_proj"]), {"conv": conv_state, "ssm": ssm_state}

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        x = params["embed_tokens"]["weight"][input_ids]
        new_states = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = rms_norm(x, lp["input_layernorm"], self.eps)
            if self.is_attn[i]:
                out, st = attention_block(
                    self.attn_spec, lp["self_attn"], h, md, states[i], None,
                    attention_backend=self.attention_backend,
                )
            else:
                out, st = self._mixer(lp["mamba"], h, md, states[i])
            new_states.append(st)
            x = residual + out

            residual = x
            h = rms_norm(x, lp["pre_ff_layernorm"], self.eps)
            if self.is_moe[i]:
                ffn = moe_layer(self.moe_spec, lp["feed_forward"], h)
            else:
                ffn = swiglu_mlp(h, lp["feed_forward"], self.config.hidden_act)
            x = residual + ffn
        x = rms_norm(x, params["norm_f"], self.eps)
        return x, new_states

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        experts_tmp: dict = {}
        for name, arr in weights:
            name = name.removeprefix("model.")
            a = np.asarray(arr)
            if name == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif name in ("final_layernorm.weight", "norm_f.weight", "norm.weight"):
                params["norm_f"] = jnp.asarray(a, self.dtype)
            elif name == "lm_head.weight":
                if not self.config.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                idx = int(parts[1])
                lp = params["layers"][idx]
                rest = parts[2:]
                if rest[-1] == "weight" and rest[0] in (
                    "input_layernorm", "pre_ff_layernorm",
                ):
                    lp[rest[0]] = jnp.asarray(a, self.dtype)
                elif rest[0] == "self_attn":
                    lp["self_attn"][rest[1]]["weight"] = jnp.asarray(
                        a.T, self.dtype
                    )
                elif rest[0] == "mamba":
                    m = lp["mamba"]
                    key = rest[1]
                    if key in ("in_proj", "out_proj", "x_proj", "dt_proj"):
                        m[key][rest[2]] = jnp.asarray(
                            a.T if rest[2] == "weight" else a, self.dtype
                        )
                    elif key == "conv1d":
                        if rest[2] == "weight":
                            m["conv1d"]["weight"] = jnp.asarray(
                                a[:, 0, :], self.dtype
                            )
                        else:
                            m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
                    elif key in ("A_log", "D"):
                        m[key] = jnp.asarray(a, jnp.float32)
                    elif key in ("dt_layernorm", "b_layernorm", "c_layernorm"):
                        m[key] = jnp.asarray(a, self.dtype)
                elif rest[0] == "feed_forward":
                    ff = lp["feed_forward"]
                    if rest[1] == "router":
                        ff["router"]["weight"] = jnp.asarray(a.T, self.dtype)
                    elif rest[1] == "experts":
                        # experts.{e}.{gate,up,down}_proj.weight — stack
                        e = int(rest[2])
                        experts_tmp.setdefault((idx, rest[3]), {})[e] = a.T
                    elif rest[1].endswith("_proj"):
                        ff[rest[1]]["weight"] = jnp.asarray(a.T, self.dtype)
        for (idx, proj), by_e in experts_tmp.items():
            stacked = np.stack([by_e[e] for e in sorted(by_e)], axis=0)
            params["layers"][idx]["feed_forward"]["experts"][proj]["weight"] = (
                jnp.asarray(stacked, self.dtype)
            )
        return params
