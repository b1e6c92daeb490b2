"""Phi family (Phi-3, Phi-4, Phi-3.5-MoE share the llama skeleton).

Reference: models/phi3.rs / phi.rs. Phi-3 quirks: fused qkv_proj and
gate_up_proj checkpoint tensors, partial rotary on some variants,
longrope scaling (approximated by its long-factor branch at engine
max length).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    """Phi-3/3.5/4 mini & medium: fused qkv / gate_up weights."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        s = config.rope_scaling
        if s is not None and s.rope_type == "longrope":
            # longrope stores per-dim factor lists in extra; approximate
            # with the long factor as a linear scale (exact longrope later)
            config.rope_scaling = None
        super().__init__(config, dtype)

    # fused qkv_proj / gate_up_proj checkpoint tensors are split by the
    # base class (LlamaForCausalLM._split_fused)


class GPT2LMHeadModel(LlamaForCausalLM):
    supports_pp = False  # custom __call__ (LayerNorm transformer)
    """GPT-2 (reference models/gpt2.rs): learned positions, LayerNorm,
    fused c_attn/c_proj conv1d weights, gelu MLP without gating.

    Implemented as a distinct forward (absolute position embeddings +
    non-gated MLP) sharing the paged-attention plumbing."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        # map GPT-2 config names
        c = config
        c.hidden_act = "gelu_new"
        if "n_embd" in c.extra:
            c.hidden_size = c.extra["n_embd"]
        if "n_layer" in c.extra:
            c.num_hidden_layers = c.extra["n_layer"]
        if "n_head" in c.extra:
            c.num_attention_heads = c.extra["n_head"]
            c.num_key_value_heads = c.extra["n_head"]
        if "n_positions" in c.extra:
            c.max_position_embeddings = c.extra["n_positions"]
        c.head_dim = c.hidden_size // c.num_attention_heads
        c.intermediate_size = c.extra.get("n_inner") or 4 * c.hidden_size
        c.tie_word_embeddings = True
        super().__init__(config, dtype)

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size

        def w(shape, key=None):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 6 + 4
        if rng is not None:
            _k = jax.random.split(rng, n_keys)
            keys = iter([_k[i] for i in range(n_keys)])
        else:
            keys = iter([None] * n_keys)
        layers = []
        for i in range(cfg.num_hidden_layers):
            layers.append(
                {
                    "ln_1": {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)},
                    "ln_2": {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)},
                    "attn": {
                        "c_attn": {
                            "weight": w((h, 3 * h), next(keys)),
                            "bias": jnp.zeros((3 * h,), d),
                        },
                        "c_proj": {
                            "weight": w((h, h), next(keys)),
                            "bias": jnp.zeros((h,), d),
                        },
                    },
                    "mlp": {
                        "c_fc": {
                            "weight": w((h, cfg.intermediate_size), next(keys)),
                            "bias": jnp.zeros((cfg.intermediate_size,), d),
                        },
                        "c_proj": {
                            "weight": w((cfg.intermediate_size, h), next(keys)),
                            "bias": jnp.zeros((h,), d),
                        },
                    },
                }
            )
        return {
            "wte": {"weight": w((cfg.vocab_size, h), next(keys))},
            "wpe": {"weight": w((cfg.max_position_embeddings, h), next(keys))},
            "layers": layers,
            "ln_f": {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)},
        }

    def load_weights(self, weights):
        params = self.init_params(rng=None)
        for name, arr in weights:
            a = np.asarray(arr)
            n = name.removeprefix("transformer.")
            if n == "wte.weight":
                params["wte"]["weight"] = jnp.asarray(a, self.dtype)
            elif n == "wpe.weight":
                params["wpe"]["weight"] = jnp.asarray(a, self.dtype)
            elif n.startswith("h."):
                parts = n.split(".")
                li = int(parts[1])
                rest = parts[2:]
                node = params["layers"][li]
                for pth in rest[:-1]:
                    node = node[pth]
                leaf = rest[-1]
                # GPT-2 Conv1D weights are already [in, out] — no transpose
                node[leaf] = jnp.asarray(a, self.dtype)
            elif n in ("ln_f.weight", "ln_f.bias"):
                params["ln_f"][n.split(".")[1]] = jnp.asarray(a, self.dtype)
        return params

    def _layer_norm(self, x, p, eps=1e-5):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (
            y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        ).astype(x.dtype)

    def __call__(self, params, input_ids, md, kv_pages):
        from ..layers.linear import linear
        from ..ops.kv_write import write_kv_pages
        from ..ops.paged_attention import ragged_paged_attention_op

        cfg = self.config
        h = cfg.num_attention_heads
        hd = cfg.head_dim
        x = (
            params["wte"]["weight"][input_ids]
            + params["wpe"]["weight"][md.positions]
        )
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            t = x.shape[0]
            res = x
            y = self._layer_norm(x, lp["ln_1"])
            qkv = linear(y, lp["attn"]["c_attn"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, h, hd)
            k = k.reshape(t, h, hd)
            v = v.reshape(t, h, hd)
            kv = write_kv_pages(kv_pages[i], k, v, md.slot_mapping)
            new_kv.append(kv)
            o = ragged_paged_attention_op(
                q, kv, md, sm_scale=hd**-0.5,
                backend=self.attention_backend,
            ).reshape(t, h * hd)
            x = res + linear(o, lp["attn"]["c_proj"])

            res = x
            y = self._layer_norm(x, lp["ln_2"])
            y = jax.nn.gelu(linear(y, lp["mlp"]["c_fc"]), approximate=True)
            x = res + linear(y, lp["mlp"]["c_proj"])
        return self._layer_norm(x, params["ln_f"]), new_kv

    def compute_logits(self, params, hidden):
        logits = hidden @ params["wte"]["weight"].T
        return logits.astype(jnp.float32)


class JAISLMHeadModel(GPT2LMHeadModel):
    """JAIS / Jais-2 (reference models/jais.rs): GPT-2 skeleton with
    ALiBi positions (no wpe), SwiGLU MLP (c_fc gate + c_fc2 up), and muP
    scales (embeddings_scale on the embedding, width_scale on logits)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        self.embeddings_scale = float(
            ex.get("embeddings_scale", ex.get("mup_embeddings_scale", 1.0))
        )
        self.width_scale = float(
            ex.get("width_scale",
                   ex.get("mup_output_alpha", 1.0)
                   * ex.get("mup_width_scale", 1.0))
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        del params["wpe"]  # ALiBi: no learned positions
        for lp in params["layers"]:
            lp["mlp"]["c_fc2"] = {
                "weight": jnp.zeros((h, inter), d),
                "bias": jnp.zeros((inter,), d),
            }
        return params

    def __call__(self, params, input_ids, md, kv_pages):
        from ..layers.attention import alibi_slopes
        from ..layers.linear import linear
        from ..ops.kv_write import write_kv_pages
        from ..ops.paged_attention import ragged_paged_attention_op

        cfg = self.config
        h, hd = cfg.num_attention_heads, cfg.head_dim
        x = params["wte"]["weight"][input_ids]
        x = (x.astype(jnp.float32) * self.embeddings_scale).astype(self.dtype)
        slopes = jnp.asarray(alibi_slopes(h), jnp.float32)
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            t = x.shape[0]
            res = x
            y = self._layer_norm(x, lp["ln_1"])
            qkv = linear(y, lp["attn"]["c_attn"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, h, hd)
            k = k.reshape(t, h, hd)
            v = v.reshape(t, h, hd)
            kv = write_kv_pages(kv_pages[i], k, v, md.slot_mapping)
            new_kv.append(kv)
            o = ragged_paged_attention_op(
                q, kv, md, None, slopes, sm_scale=hd**-0.5,
                backend=self.attention_backend,
            ).reshape(t, h * hd)
            x = res + linear(o, lp["attn"]["c_proj"])

            res = x
            y = self._layer_norm(x, lp["ln_2"])
            gate = jax.nn.silu(linear(y, lp["mlp"]["c_fc"]))
            y = gate * linear(y, lp["mlp"]["c_fc2"])
            x = res + linear(y, lp["mlp"]["c_proj"])
        return self._layer_norm(x, params["ln_f"]), new_kv

    def compute_logits(self, params, hidden):
        return (hidden @ params["wte"]["weight"].T).astype(
            jnp.float32
        ) * self.width_scale
