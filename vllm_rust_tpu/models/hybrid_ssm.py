"""Hybrid SSM/attention architectures: Bamba, NemotronH, FalconH1,
GraniteMoeHybrid.

Reference: crates/core/src/models/{bamba,nemotron_h,falcon_h1,
granitemoehybrid}.rs + ssm/. All four mix Mamba2 (SSD) mixers with
attention layers; they differ in layer interleaving and FFN:

- Bamba (IBM): sequential layers, kind by ``layer_types`` /
  ``attn_layer_indices``; every layer has a SwiGLU FFN; rope attention.
- NemotronH (NVIDIA): ``hybrid_override_pattern`` string
  (M = mamba2, * = attention, - = MLP); ONE block per layer, no
  separate FFN; MLP uses relu² activation; rope-free attention.
- FalconH1: PARALLEL hybrid — every layer runs attention and mamba2 on
  the same normed input and sums the branches (scalar multipliers from
  the muP config); per-layer SwiGLU FFN.
- GraniteMoeHybrid: Bamba-style interleaving with GraniteMoeShared FFN
  (stacked experts + gateless shared MLP) and Granite multipliers.

TPU notes: mamba2 layers run through the shared segmented SSD scan
(ops/ssm.py); attention layers use the paged KV pools. Per-layer state
kinds mix freely (kv_cache/manager.py handles tuple vs dict entries;
FalconH1 layers carry both a paged pool and recurrent state).
"""

from __future__ import annotations

import dataclasses
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
from ..layers.rotary import RotarySpec, compute_rope_tables
from ..ops.attn_metadata import AttentionMetadata
from .mamba import Mamba2ForCausalLM


class HybridMamba2Base(Mamba2ForCausalLM):
    """Sequential hybrid: per-layer kind in self.kinds
    ('mamba' | 'attention' | 'mlp'), optional per-layer FFN."""

    has_per_layer_ffn = True
    attn_uses_rope = True
    mlp_act = "silu"

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        # hybrid models namespace the mamba geometry with a mamba_ prefix
        self.d_state = int(ex.get("mamba_d_state", ex.get("state_size", 128)))
        self.d_conv = int(ex.get("mamba_d_conv", ex.get("conv_kernel", 4)))
        self.expand = int(ex.get("mamba_expand", ex.get("expand", 2)))
        self.d_inner = int(ex.get("mamba_d_ssm", 0)) or self.expand * config.hidden_size
        self.n_groups = int(ex.get("mamba_n_groups", ex.get("n_groups", 1)))
        self.num_heads = int(
            ex.get("mamba_n_heads", ex.get("mamba_num_heads",
                                           self.d_inner // 64))
        )
        self.head_dim = int(ex.get("mamba_d_head",
                                   self.d_inner // self.num_heads))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.use_conv_bias = bool(ex.get("mamba_conv_bias",
                                         ex.get("use_conv_bias", True)))
        self.use_bias = bool(ex.get("mamba_proj_bias", False))
        self.eps = config.rms_norm_eps
        self.kinds = self._layer_kinds()
        self.attn_spec = AttentionSpec(
            num_heads=config.num_attention_heads,
            num_kv_heads=config.num_key_value_heads,
            head_dim=config.head_dim,
            rotary=RotarySpec.from_model_config(config)
            if self.attn_uses_rope else None,
            sm_scale=config.head_dim**-0.5,
            rms_eps=config.rms_norm_eps,
        )
        self.attention_backend = "auto"

    def _layer_kinds(self) -> list[str]:
        cfg = self.config
        ex = cfg.extra
        if cfg.layer_types:
            return ["attention" if t == "attention" else "mamba"
                    for t in cfg.layer_types]
        attn_idx = set(ex.get("attn_layer_indices", []))
        return ["attention" if i in attn_idx else "mamba"
                for i in range(cfg.num_hidden_layers)]

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "attention":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            elif kind == "mamba":
                out.append({"conv": (self.conv_dim, self.d_conv - 1),
                            "ssm": (self.num_heads, self.head_dim,
                                    self.d_state)})
            else:  # stateless mlp layer: placeholder recurrent state
                out.append({"conv": (1, 1), "ssm": (1, 1, 1)})
        return out

    # -- params ---------------------------------------------------------------

    def _attn_params(self, w, keys):
        cfg = self.config
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        return {
            "q_proj": {"weight": w(next(keys), (h, nh * hd))},
            "k_proj": {"weight": w(next(keys), (h, nkv * hd))},
            "v_proj": {"weight": w(next(keys), (h, nkv * hd))},
            "o_proj": {"weight": w(next(keys), (nh * hd, h))},
        }

    def _mlp_params(self, w, keys):
        cfg = self.config
        h, inter = cfg.hidden_size, cfg.intermediate_size
        return {
            "gate_proj": {"weight": w(next(keys), (h, inter))},
            "up_proj": {"weight": w(next(keys), (h, inter))},
            "down_proj": {"weight": w(next(keys), (inter, h))},
        }

    def _ffn_params(self, w, keys, layer_idx: int):
        return self._mlp_params(w, keys)

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 24 + 2
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)
        layers = []
        for i, kind in enumerate(self.kinds):
            lp: dict = {"input_layernorm": jnp.ones((h,), d)}
            if kind == "attention":
                lp["self_attn"] = self._attn_params(w, keys)
            elif kind != "mlp":  # mamba / conv / other recurrent mixers
                lp["mamba"] = self._mixer_params(w, keys)
            else:
                lp["block_mlp"] = {
                    "up_proj": {"weight": w(next(keys),
                                            (h, cfg.intermediate_size))},
                    "down_proj": {"weight": w(next(keys),
                                              (cfg.intermediate_size, h))},
                }
            if self.has_per_layer_ffn:
                lp["pre_ff_layernorm"] = jnp.ones((h,), d)
                lp["feed_forward"] = self._ffn_params(w, keys, i)
            layers.append(lp)
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm_f": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w(next(keys), (h, cfg.vocab_size))}
        if self.attn_uses_rope and "attention" in self.kinds:
            cos, sin = compute_rope_tables(
                self.attn_spec.rotary, cfg.max_position_embeddings
            )
            params["rope_cos"] = cos
            params["rope_sin"] = sin
        return params

    # -- forward ----------------------------------------------------------------

    def _ffn(self, lp, h, layer_idx: int):
        return swiglu_mlp(h, lp["feed_forward"], self.config.hidden_act)

    def _block_out(self, lp, kind, h, md, state, rope_tables):
        if kind == "attention":
            return attention_block(
                self.attn_spec, lp["self_attn"], h, md, state, rope_tables,
                attention_backend=self.attention_backend,
            )
        if kind == "mamba":
            return self._mixer(lp["mamba"], h, md, state)
        # stateless MLP block (NemotronH '-' layers): relu² MLP
        x = linear(h, lp["block_mlp"]["up_proj"])
        x = jnp.square(jax.nn.relu(x.astype(jnp.float32))).astype(h.dtype)
        return linear(x, lp["block_mlp"]["down_proj"]), state

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        x = params["embed_tokens"]["weight"][input_ids]
        rope_tables = (
            (params["rope_cos"], params["rope_sin"])
            if "rope_cos" in params else None
        )
        new_states = []
        for i, lp in enumerate(params["layers"]):
            kind = self.kinds[i]
            residual = x
            h = rms_norm(x, lp["input_layernorm"], self.eps)
            out, st = self._block_out(lp, kind, h, md, states[i], rope_tables)
            new_states.append(st)
            x = residual + out
            if self.has_per_layer_ffn:
                residual = x
                h = rms_norm(x, lp["pre_ff_layernorm"], self.eps)
                x = residual + self._ffn(lp, h, i)
        x = rms_norm(x, params["norm_f"], self.eps)
        return x, new_states

    # -- weights ------------------------------------------------------------------

    _ln_names = {
        "input_layernorm": "input_layernorm",
        "pre_ff_layernorm": "pre_ff_layernorm",
        "post_attention_layernorm": "pre_ff_layernorm",
        "norm": "input_layernorm",
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("model.").removeprefix("backbone.")
            a = np.asarray(arr)
            if name == "embed_tokens.weight" or name == "embeddings.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif name in ("final_layernorm.weight", "norm_f.weight",
                          "norm.weight"):
                params["norm_f"] = jnp.asarray(a, self.dtype)
            elif name == "lm_head.weight":
                if not self.config.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                idx = int(parts[1])
                self._load_layer(params["layers"][idx], parts[2:], a, idx)
        return params

    def _load_layer(self, lp, rest, a, layer_idx):
        kind = self.kinds[layer_idx]
        if rest[-1] == "weight" and rest[0] in self._ln_names and len(rest) == 2:
            lp[self._ln_names[rest[0]]] = jnp.asarray(a, self.dtype)
        elif rest[0] == "self_attn":
            lp["self_attn"][rest[1]][rest[2]] = jnp.asarray(
                a.T if rest[2] == "weight" else a, self.dtype
            )
        elif rest[0] == "mamba":
            self._load_mamba_leaf(lp["mamba"], rest[1:], a)
        elif rest[0] == "mixer" and kind == "mamba":
            self._load_mamba_leaf(lp["mamba"], rest[1:], a)
        elif rest[0] == "mixer" and kind == "attention":
            lp["self_attn"][rest[1]][rest[2]] = jnp.asarray(
                a.T if rest[2] == "weight" else a, self.dtype
            )
        elif rest[0] == "mixer" and kind == "mlp":
            lp["block_mlp"][rest[1]][rest[2]] = jnp.asarray(
                a.T if rest[2] == "weight" else a, self.dtype
            )
        elif rest[0] == "feed_forward":
            node = lp["feed_forward"]
            if rest[1].endswith("_proj"):
                node[rest[1]][rest[2]] = jnp.asarray(
                    a.T if rest[2] == "weight" else a, self.dtype
                )

    def _load_mamba_leaf(self, m, rest, a):
        key = rest[0]
        if key in ("in_proj", "out_proj"):
            m[key][rest[1]] = jnp.asarray(
                a.T if rest[1] == "weight" else a, self.dtype
            )
        elif key == "conv1d":
            if rest[1] == "weight":
                m["conv1d"]["weight"] = jnp.asarray(a[:, 0, :], self.dtype)
            else:
                m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
        elif key in ("A_log", "D", "dt_bias"):
            m[key] = jnp.asarray(a, jnp.float32)
        elif key == "norm":
            m["norm"] = jnp.asarray(a, self.dtype)


class BambaForCausalLM(HybridMamba2Base):
    """IBM Bamba 9B (reference models/bamba.rs)."""


class NemotronHForCausalLM(HybridMamba2Base):
    """NVIDIA Nemotron-H (reference models/nemotron_h.rs): one block per
    layer chosen by hybrid_override_pattern; relu² MLP blocks; rope-free
    attention."""

    has_per_layer_ffn = False
    attn_uses_rope = False

    def _layer_kinds(self) -> list[str]:
        pattern = self.config.extra.get("hybrid_override_pattern", "")
        kinds = []
        for i in range(self.config.num_hidden_layers):
            ch = pattern[i] if i < len(pattern) else "M"
            kinds.append({"M": "mamba", "*": "attention", "-": "mlp"}[ch])
        return kinds


class FalconH1ForCausalLM(HybridMamba2Base):
    """FalconH1 parallel hybrid (reference models/falcon_h1.rs): every
    layer computes attention AND mamba2 on the same normed input; branch
    outputs scale by the muP multipliers and sum into the residual."""

    def _layer_kinds(self) -> list[str]:
        return ["parallel"] * self.config.num_hidden_layers

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.attn_in_mult = float(ex.get("attention_in_multiplier", 1.0))
        self.attn_out_mult = float(ex.get("attention_out_multiplier", 1.0))
        self.ssm_in_mult = float(ex.get("ssm_in_multiplier", 1.0))
        self.ssm_out_mult = float(ex.get("ssm_out_multiplier", 1.0))
        self.key_mult = float(ex.get("key_multiplier", 1.0))
        self.emb_mult = float(ex.get("embedding_multiplier", 1.0))
        self.lm_head_mult = float(ex.get("lm_head_multiplier", 1.0))
        mlp_m = ex.get("mlp_multipliers") or [1.0, 1.0]
        self.mlp_in_mult, self.mlp_out_mult = float(mlp_m[0]), float(mlp_m[1])
        # key scaling folds into the softmax scale
        self.attn_spec = dataclasses.replace(
            self.attn_spec, sm_scale=self.attn_spec.sm_scale * self.key_mult
        )

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        return [
            {"kv": (cfg.num_key_value_heads, cfg.head_dim),
             "conv": (self.conv_dim, self.d_conv - 1),
             "ssm": (self.num_heads, self.head_dim, self.d_state)}
            for _ in range(cfg.num_hidden_layers)
        ]

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config

        def w(shape):
            return jnp.zeros(shape, self.dtype)

        # parallel layers need BOTH branches (base built neither for
        # the 'parallel' kind)
        keys = iter([None] * (cfg.num_hidden_layers * 16))
        for lp in params["layers"]:
            if "self_attn" not in lp:
                lp["self_attn"] = self._attn_params(lambda k, s: w(s), keys)
            if "mamba" not in lp:
                lp["mamba"] = self._mixer_params(lambda k, s: w(s), keys)
        if "rope_cos" not in params:
            cos, sin = compute_rope_tables(
                self.attn_spec.rotary, cfg.max_position_embeddings
            )
            params["rope_cos"] = cos
            params["rope_sin"] = sin
        return params

    def _block_out(self, lp, kind, h, md, state, rope_tables):
        attn_out, new_kv = attention_block(
            self.attn_spec, lp["self_attn"], h * self.attn_in_mult, md,
            state["kv"], rope_tables,
            attention_backend=self.attention_backend,
        )
        ssm_out, new_rec = self._mixer(lp["mamba"], h * self.ssm_in_mult,
                                       md, state)
        out = attn_out * self.attn_out_mult + ssm_out * self.ssm_out_mult
        return out, {"kv": new_kv, **new_rec}

    def _ffn(self, lp, h, layer_idx):
        return super()._ffn(lp, h * self.mlp_in_mult, layer_idx) * self.mlp_out_mult

    def __call__(self, params, input_ids, md, states):
        p2 = dict(params)
        p2["embed_tokens"] = {
            "weight": params["embed_tokens"]["weight"] * self.emb_mult
        }
        return super().__call__(p2, input_ids, md, states)

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) * self.lm_head_mult


class GraniteMoeHybridForCausalLM(HybridMamba2Base):
    """GraniteMoeHybrid (reference models/granitemoehybrid.rs): Bamba
    interleaving, GraniteMoeShared FFN (stacked fused experts + gateless
    shared MLP), Granite scalar multipliers."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        ex = config.extra
        self.emb_mult = float(ex.get("embedding_multiplier", 1.0))
        self.residual_mult = float(ex.get("residual_multiplier", 1.0))
        self.logits_scale = float(ex.get("logits_scaling", 1.0))
        att_mult = ex.get("attention_multiplier")
        if att_mult:
            self.attn_spec = dataclasses.replace(
                self.attn_spec, sm_scale=float(att_mult)
            )
        ne = config.num_experts or 0
        self.moe_spec = (
            MoESpec(num_experts=ne, top_k=config.num_experts_per_tok or 2,
                    norm_topk_prob=True)
            if ne > 1 else None
        )

    def _ffn_params(self, w, keys, layer_idx):
        cfg = self.config
        h = cfg.hidden_size
        if self.moe_spec is None:
            return self._mlp_params(w, keys)
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        si = cfg.shared_expert_intermediate_size or cfg.intermediate_size
        e = self.moe_spec.num_experts
        return {
            "router": {"weight": w(next(keys), (h, e))},
            "experts": {
                "gate_proj": {"weight": w(next(keys), (e, h, inter))},
                "up_proj": {"weight": w(next(keys), (e, h, inter))},
                "down_proj": {"weight": w(next(keys), (e, inter, h))},
            },
            "shared_expert": {
                "gate_proj": {"weight": w(next(keys), (h, si))},
                "up_proj": {"weight": w(next(keys), (h, si))},
                "down_proj": {"weight": w(next(keys), (si, h))},
            },
        }

    def _ffn(self, lp, h, layer_idx):
        ff = lp["feed_forward"]
        if "experts" not in ff:
            return swiglu_mlp(h, ff, self.config.hidden_act)
        out = moe_layer(
            self.moe_spec,
            {k: v for k, v in ff.items() if k != "shared_expert"}, h,
        )
        return out + swiglu_mlp(h, ff["shared_expert"], "silu")

    def __call__(self, params, input_ids, md, states):
        # granite multipliers: scale embeds and each residual add
        x = params["embed_tokens"]["weight"][input_ids] * self.emb_mult
        rope_tables = (
            (params["rope_cos"], params["rope_sin"])
            if "rope_cos" in params else None
        )
        new_states = []
        for i, lp in enumerate(params["layers"]):
            kind = self.kinds[i]
            residual = x
            h = rms_norm(x, lp["input_layernorm"], self.eps)
            out, st = self._block_out(lp, kind, h, md, states[i], rope_tables)
            new_states.append(st)
            x = residual + out * self.residual_mult
            residual = x
            h = rms_norm(x, lp["pre_ff_layernorm"], self.eps)
            x = residual + self._ffn(lp, h, i) * self.residual_mult
        x = rms_norm(x, params["norm_f"], self.eps)
        return x, new_states

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.logits_scale

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """Translate GraniteMoe fused expert tensors, then defer to the
        hybrid loader (same convention as moe_breadth.GraniteMoeForCausalLM)."""
        cfg = self.config
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        stacked: list[tuple[int, str, np.ndarray]] = []
        regular: list[tuple[str, np.ndarray]] = []
        for name, arr in weights:
            a = np.asarray(arr)
            if ".block_sparse_moe.input_linear.weight" in name:
                li = int(name.split(".")[2])
                stacked.append((li, "gate_proj",
                                a[:, :inter, :].transpose(0, 2, 1)))
                stacked.append((li, "up_proj",
                                a[:, inter:, :].transpose(0, 2, 1)))
            elif ".block_sparse_moe.output_linear.weight" in name:
                li = int(name.split(".")[2])
                stacked.append((li, "down_proj", a.transpose(0, 2, 1)))
            elif ".block_sparse_moe.router.layer.weight" in name:
                li = int(name.split(".")[2])
                regular.append(
                    (f"model.layers.{li}.feed_forward.router.weight", a)
                )
            elif ".shared_mlp.input_linear.weight" in name:
                li = int(name.split(".")[2])
                si = a.shape[0] // 2
                pre = f"model.layers.{li}.feed_forward.shared_expert."
                regular.append((pre + "gate_proj.weight", a[:si]))
                regular.append((pre + "up_proj.weight", a[si:]))
            elif ".shared_mlp.output_linear.weight" in name:
                li = int(name.split(".")[2])
                regular.append(
                    (f"model.layers.{li}.feed_forward.shared_expert."
                     f"down_proj.weight", a)
                )
            else:
                regular.append((name, a))
        params = super().load_weights(iter(regular))
        for li, pname, a in stacked:
            params["layers"][li]["feed_forward"]["experts"][pname] = {
                "weight": jnp.asarray(a, self.dtype)
            }
        return params

    def _load_layer(self, lp, rest, a, layer_idx):
        if rest[0] == "feed_forward" and rest[1] in ("router", "shared_expert"):
            node = lp["feed_forward"][rest[1]]
            if rest[1] == "router":
                node["weight"] = jnp.asarray(a.T, self.dtype)
            else:
                node[rest[2]][rest[3]] = jnp.asarray(a.T, self.dtype)
            return
        super()._load_layer(lp, rest, a, layer_idx)


class Zamba2ForCausalLM(HybridMamba2Base):
    """Zamba2 (reference models/zamba2.rs): a Mamba2 backbone where
    "hybrid" layers run a transformer block over concat(hidden,
    original_embeds) and inject its projected output into the mamba
    input (xs = hidden + transformer_out; residual stays pre-injection).
    Like the reference, the shared-block weights are materialized per
    hybrid layer (per-layer LoRA specialization folds into them)."""

    def _layer_kinds(self) -> list[str]:
        blocks = self.config.extra.get("layers_block_type")
        if blocks:
            return ["hybrid" if b == "hybrid" else "mamba" for b in blocks]
        return ["mamba"] * self.config.num_hidden_layers

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        super().__init__(config, dtype)
        self.has_per_layer_ffn = False
        self.num_heads = int(ex.get("n_mamba_heads", self.num_heads))
        self.head_dim = self.d_inner // self.num_heads
        self.n_groups = int(ex.get("mamba_ngroups", self.n_groups))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        h = config.hidden_size
        self.attn_hidden = int(ex.get("attention_hidden_size", 2 * h))
        attn_hd = int(ex.get("attention_head_dim",
                             self.attn_hidden // config.num_attention_heads))
        nh = config.num_attention_heads
        self.attn_spec = AttentionSpec(
            num_heads=nh,
            num_kv_heads=nh,  # Zamba2 shared attention is MHA
            head_dim=attn_hd,
            rotary=RotarySpec.from_model_config(config),
            sm_scale=attn_hd**-0.5,
            rms_eps=config.rms_norm_eps,
        )

    @property
    def kv_head_info(self) -> list:
        spec = self.attn_spec
        rec = {"conv": (self.conv_dim, self.d_conv - 1),
               "ssm": (self.num_heads, self.head_dim, self.d_state)}
        out = []
        for kind in self.kinds:
            if kind == "hybrid":
                out.append({"kv": (spec.num_kv_heads, spec.head_dim), **rec})
            else:
                out.append(dict(rec))
        return out

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size
        nh, hd = self.attn_spec.num_heads, self.attn_spec.head_dim

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = cfg.num_hidden_layers * 24 + 2
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)
        layers = []
        for kind in self.kinds:
            lp: dict = {
                "input_layernorm": jnp.ones((h,), d),  # mamba pre-norm
                "mamba": self._mixer_params(w, keys),
            }
            if kind == "hybrid":
                lp["shared_transformer"] = {
                    "input_layernorm": jnp.ones((self.attn_hidden,), d),
                    "self_attn": {
                        "q_proj": {"weight": w(next(keys),
                                               (self.attn_hidden, nh * hd))},
                        "k_proj": {"weight": w(next(keys),
                                               (self.attn_hidden, nh * hd))},
                        "v_proj": {"weight": w(next(keys),
                                               (self.attn_hidden, nh * hd))},
                        "o_proj": {"weight": w(next(keys), (nh * hd, h))},
                    },
                    "pre_ff_layernorm": jnp.ones((h,), d),
                    "feed_forward": self._mlp_params(w, keys),
                }
                lp["linear"] = {"weight": w(next(keys), (h, h))}
            layers.append(lp)
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm_f": jnp.ones((h,), d),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w(next(keys), (h, cfg.vocab_size))}
        cos, sin = compute_rope_tables(self.attn_spec.rotary,
                                       cfg.max_position_embeddings)
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        return params

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        x = params["embed_tokens"]["weight"][input_ids]
        x0 = x  # original embeddings, re-fed to every hybrid block
        rope_tables = (params["rope_cos"], params["rope_sin"])
        new_states = []
        for i, lp in enumerate(params["layers"]):
            if self.kinds[i] == "hybrid":
                st = lp["shared_transformer"]
                concat = jnp.concatenate([x, x0], axis=-1)
                hcat = rms_norm(concat, st["input_layernorm"], self.eps)
                attn_out, new_kv = attention_block(
                    self.attn_spec, st["self_attn"], hcat, md,
                    states[i]["kv"], rope_tables,
                    attention_backend=self.attention_backend,
                )
                ff_in = rms_norm(attn_out, st["pre_ff_layernorm"], self.eps)
                ff = swiglu_mlp(ff_in, st["feed_forward"],
                                self.config.hidden_act)
                th = linear(ff, lp["linear"])
                xs = x + th
            else:
                new_kv = None
                xs = x
            residual = x
            h = rms_norm(xs, lp["input_layernorm"], self.eps)
            out, rec = self._mixer(lp["mamba"], h, md, states[i])
            x = residual + out
            new_states.append(rec if new_kv is None else {"kv": new_kv, **rec})
        x = rms_norm(x, params["norm_f"], self.eps)
        return x, new_states

    def _load_layer(self, lp, rest, a, layer_idx):
        if rest[0] == "shared_transformer":
            st = lp["shared_transformer"]
            if rest[1] == "self_attn":
                st["self_attn"][rest[2]][rest[3]] = jnp.asarray(
                    a.T, self.dtype
                )
            elif rest[1] in ("input_layernorm", "pre_ff_layernorm"):
                st[rest[1]] = jnp.asarray(a, self.dtype)
            elif rest[1] == "feed_forward":
                st["feed_forward"][rest[2]][rest[3]] = jnp.asarray(
                    a.T, self.dtype
                )
            return
        if rest[0] == "linear":
            lp["linear"]["weight"] = jnp.asarray(a.T, self.dtype)
            return
        super()._load_layer(lp, rest, a, layer_idx)


class Lfm2ForCausalLM(HybridMamba2Base):
    """LiquidAI LFM2 (reference models/lfm2.rs): attention layers with
    per-head qk norms (before rope) + short-convolution layers
    (in_proj → B·x → causal conv (no activation) → gate by C →
    out_proj); per-layer SwiGLU MLP with merged w1 = [gate; up]."""

    def _layer_kinds(self) -> list[str]:
        lt = self.config.layer_types or []
        n = self.config.num_hidden_layers
        if lt:
            return ["attention" if t == "full_attention" else "conv"
                    for t in lt]
        return ["conv"] * n

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = True
        super().__init__(config, dtype)
        self.l_cache = int(ex.get("conv_L_cache", 4))
        self.conv_bias = bool(ex.get("conv_bias", False))
        if "block_ff_dim" in ex:
            config.intermediate_size = int(ex["block_ff_dim"])
        if "norm_eps" in ex:
            self.eps = float(ex["norm_eps"])
        self.attn_spec = dataclasses.replace(
            self.attn_spec, qk_norm=True, rms_eps=self.eps
        )

    @property
    def kv_head_info(self) -> list:
        cfg = self.config
        out = []
        for kind in self.kinds:
            if kind == "attention":
                out.append((cfg.num_key_value_heads, cfg.head_dim))
            else:
                out.append({"conv": (cfg.hidden_size, self.l_cache - 1),
                            "ssm": (1, 1, 1)})  # conv-only state
        return out

    def _attn_params(self, w, keys):
        p = super()._attn_params(w, keys)
        hd = self.config.head_dim
        p["q_norm"] = jnp.ones((hd,), self.dtype)
        p["k_norm"] = jnp.ones((hd,), self.dtype)
        return p

    def _mixer_params(self, w, keys):
        h = self.config.hidden_size
        p = {
            "in_proj": {"weight": w(next(keys), (h, 3 * h))},
            "conv1d": {"weight": w(next(keys), (h, self.l_cache))},
            "out_proj": {"weight": w(next(keys), (h, h))},
        }
        if self.conv_bias:
            p["conv1d"]["bias"] = jnp.zeros((h,), self.dtype)
        return p

    def _block_out(self, lp, kind, h, md, state, rope_tables):
        if kind == "attention":
            return attention_block(
                self.attn_spec, lp["self_attn"], h, md, state, rope_tables,
                attention_backend=self.attention_backend,
            )
        mp = lp["mamba"]
        proj = linear(h, mp["in_proj"])
        b, c, x = jnp.split(proj, 3, axis=-1)
        bx = b * x
        from ..ops.ssm import causal_conv1d as _cc

        conv_out, conv_state = _cc(
            bx, mp["conv1d"]["weight"], mp["conv1d"].get("bias"),
            state["conv"], md, activation="none",
        )
        y = c * conv_out
        return linear(y, mp["out_proj"]), {"conv": conv_state,
                                           "ssm": state["ssm"]}

    def _ffn(self, lp, h, layer_idx):
        ff = lp["feed_forward"]
        if "w1" in ff:
            gate_up = linear(h, ff["w1"])
            g, u = jnp.split(gate_up, 2, axis=-1)
            return linear(
                jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u,
                ff["w2"],
            )
        return super()._ffn(lp, h, layer_idx)

    def _ffn_params(self, w, keys, layer_idx):
        h, inter = self.config.hidden_size, self.config.intermediate_size
        return {
            "w1": {"weight": w(next(keys), (h, 2 * inter))},
            "w2": {"weight": w(next(keys), (inter, h))},
        }

    _ln_names = {
        "input_layernorm": "input_layernorm",
        "operator_norm": "input_layernorm",
        "ffn_norm": "pre_ff_layernorm",
        "pre_ff_layernorm": "pre_ff_layernorm",
        "post_attention_layernorm": "pre_ff_layernorm",
        "norm": "input_layernorm",
    }

    def _load_layer(self, lp, rest, a, layer_idx):
        kind = self.kinds[layer_idx]
        name_map = {"out_proj": "o_proj"}
        if rest[0] == "self_attn" and kind == "attention":
            key = name_map.get(rest[1], rest[1])
            if key in ("q_norm", "k_norm") or rest[1].endswith("layernorm"):
                leaf = "q_norm" if rest[1][0] == "q" else "k_norm"
                lp["self_attn"][leaf] = jnp.asarray(a, self.dtype)
            else:
                lp["self_attn"][key][rest[2]] = jnp.asarray(
                    a.T if rest[2] == "weight" else a, self.dtype
                )
            return
        if rest[0] == "conv" and kind == "conv":
            m = lp["mamba"]
            if rest[1] in ("in_proj", "out_proj"):
                m[rest[1]][rest[2]] = jnp.asarray(
                    a.T if rest[2] == "weight" else a, self.dtype
                )
            elif rest[1] == "conv":
                if rest[2] == "weight":
                    # HF stores [hidden, L] (or [hidden, 1, L])
                    w = a[:, 0, :] if a.ndim == 3 else a
                    m["conv1d"]["weight"] = jnp.asarray(w, self.dtype)
                else:
                    m["conv1d"]["bias"] = jnp.asarray(a, self.dtype)
            return
        if rest[0] == "feed_forward" and rest[1] in ("w1", "w2"):
            lp["feed_forward"][rest[1]][rest[2]] = jnp.asarray(
                a.T, self.dtype
            )
            return
        super()._load_layer(lp, rest, a, layer_idx)


def register_hybrid_ssm(registry: dict) -> None:
    registry.update(
        {
            "Lfm2ForCausalLM": Lfm2ForCausalLM,
            "BambaForCausalLM": BambaForCausalLM,
            "NemotronHForCausalLM": NemotronHForCausalLM,
            "FalconH1ForCausalLM": FalconH1ForCausalLM,
            "GraniteMoeHybridForCausalLM": GraniteMoeHybridForCausalLM,
            "Zamba2ForCausalLM": Zamba2ForCausalLM,
        }
    )
