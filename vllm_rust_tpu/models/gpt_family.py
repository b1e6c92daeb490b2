"""Classic GPT-style decoder families (LayerNorm transformers).

One configurable base class covers the pre-Llama decoder landscape the
reference implements as separate factory files (reference models/
{gpt_neox,gptj,opt,bloom,mpt,falcon,gpt_bigcode,starcoder2,persimmon,
phi,stablelm,nemotron}.rs): LayerNorm (vs RMSNorm), learned/ALiBi/rope
positions, parallel vs sequential residuals, fused-QKV checkpoint
layouts, and non-gated MLPs.

TPU-first: the same paged-attention plumbing as the Llama family
(layers/attention.py attention_block) — only the surrounding block
wiring differs, so every arch here inherits the in-house decode kernel,
quantized KV, and the unified mixed prefill+decode step.
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
from ..layers.mlp import _ACTS, swiglu_mlp
from ..layers.norm import layer_norm, rms_norm
from ..layers.rotary import RotarySpec, compute_rope_tables

_LINEAR_MODULES = {
    "q_proj", "k_proj", "v_proj", "o_proj",
    "fc_in", "fc_out", "gate_proj", "up_proj", "down_proj", "lm_head",
}


class LNTransformer:
    """Configurable GPT-style decoder.

    Class-attribute knobs (mirrors the reference AttentionBlock/arch-
    factory knob tables, docs/architecture.md):
      parallel_residual  x + attn(ln1(x)) + mlp(ln2(x))  [NeoX/GPT-J/Falcon]
      single_ln          parallel form with one shared ln [GPT-J/Phi-2]
      position           "rope" | "learned" | "alibi" | "none"
      norm_kind          "layernorm" | "layernorm1p" | "rms"
      mlp_gated          SwiGLU-style gate/up/down [StableLM]
    """

    parallel_residual: bool = False
    single_ln: bool = False
    position: str = "rope"
    learned_pos_offset: int = 0  # OPT stores positions offset by +2
    norm_kind: str = "layernorm"
    norm_has_bias: bool = True
    norm_affine: bool = True  # False: non-parametric LayerNorm (OLMo-1)
    embed_ln: bool = False  # Bloom: LayerNorm right after embedding
    qk_layernorm: bool = False  # Persimmon: per-head q/k LayerNorm
    attn_bias: bool = True
    o_bias: bool = True
    mlp_bias: bool = True
    mlp_gated: bool = False
    lm_head_bias: bool = False
    interleaved_rope: bool = False  # GPT-J rotate-every-two

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        self.attention_backend = "auto"
        self.kv_scales: tuple | None = None
        rotary = (
            RotarySpec.from_model_config(config)
            if self.position == "rope"
            else None
        )
        if rotary is not None and self.interleaved_rope:
            pass  # interleave handled by the spec flag below
        self.attn_specs = tuple(
            dataclasses.replace(
                AttentionSpec.from_model_config(config, i),
                rotary=rotary,
                use_alibi=self.position == "alibi",
                qk_norm=self.qk_layernorm,
                qk_norm_layernorm=self.qk_layernorm,
                interleaved_rope=self.interleaved_rope,
                rms_eps=self.norm_eps,
            )
            for i in range(config.num_hidden_layers)
        )
        self.rotary = rotary

    # -- knob helpers -------------------------------------------------------

    @property
    def norm_eps(self) -> float:
        x = self.config.extra
        # non-RMS families default to torch nn.LayerNorm eps (1e-5) when the
        # HF config carries no eps key (OPT, OLMo-1) — verified vs HF numerics
        default = 1e-5 if self.norm_kind != "rms" else self.config.rms_norm_eps
        return float(
            x.get("layer_norm_eps")
            or x.get("layer_norm_epsilon")
            or x.get("norm_epsilon")
            or x.get("norm_eps")
            or default
        )

    def _norm(self, x, p):
        if self.norm_kind == "rms":
            return rms_norm(x, p["weight"], self.norm_eps)
        off = 1.0 if self.norm_kind == "layernorm1p" else 0.0
        return layer_norm(
            x, p.get("weight"), p.get("bias"), self.norm_eps, weight_offset=off
        )

    @property
    def num_layers(self) -> int:
        return self.config.num_hidden_layers

    @property
    def kv_head_info(self) -> list[tuple[int, int]]:
        return [(s.num_kv_heads, s.head_dim) for s in self.attn_specs]

    # -- params -------------------------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        inter = cfg.intermediate_size

        counter = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            counter[0] += 1
            key = jax.random.fold_in(rng, counter[0])
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def lin(din, dout, bias):
            p = {"weight": w((din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def norm_p(dim=None):
            if not self.norm_affine:
                return {}
            dim = dim or h
            p = {"weight": jnp.ones((dim,), d)}
            if self.norm_kind == "layernorm1p":
                p["weight"] = jnp.zeros((dim,), d)
            if self.norm_has_bias and self.norm_kind != "rms":
                p["bias"] = jnp.zeros((dim,), d)
            return p

        layers = []
        for _ in range(cfg.num_hidden_layers):
            attn = {
                "q_proj": lin(h, nh * hd, self.attn_bias),
                "k_proj": lin(h, nkv * hd, self.attn_bias),
                "v_proj": lin(h, nkv * hd, self.attn_bias),
                "o_proj": lin(nh * hd, h, self.o_bias),
            }
            if self.qk_layernorm:
                attn["q_norm"] = norm_p(hd)
                attn["k_norm"] = norm_p(hd)
            if self.mlp_gated:
                mlp = {
                    "gate_proj": lin(h, inter, self.mlp_bias),
                    "up_proj": lin(h, inter, self.mlp_bias),
                    "down_proj": lin(inter, h, self.mlp_bias),
                }
            else:
                mlp = {
                    "fc_in": lin(h, inter, self.mlp_bias),
                    "fc_out": lin(inter, h, self.mlp_bias),
                }
            lp = {"ln_1": norm_p(), "self_attn": attn, "mlp": mlp}
            if not self.single_ln:
                lp["ln_2"] = norm_p()
            layers.append(lp)

        params: dict = {
            "embed_tokens": {"weight": w((cfg.vocab_size, h))},
            "layers": layers,
            "ln_f": norm_p(),
        }
        if self.position == "learned":
            params["pos_embed"] = {
                "weight": w(
                    (cfg.max_position_embeddings + self.learned_pos_offset, h)
                )
            }
        if self.embed_ln:
            params["embed_ln"] = norm_p()
        if not cfg.tie_word_embeddings:
            params["lm_head"] = lin(h, cfg.vocab_size, self.lm_head_bias)
        if self.rotary is not None:
            cos, sin = compute_rope_tables(
                self.rotary, cfg.max_position_embeddings
            )
            params["rope_cos"] = cos
            params["rope_sin"] = sin
        return params

    # -- loading ------------------------------------------------------------

    # subclasses: ordered substring renames to the canonical tree names
    _RENAMES: tuple[tuple[str, str], ...] = ()

    def _canonical(self, name: str) -> str | None:
        for old, new in self._RENAMES:
            name = name.replace(old, new)
        return name

    def _preprocess(self, weights):
        """Hook: split fused checkpoint tensors (qkv packs etc.)."""
        return weights

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in self._preprocess(weights):
            canon = self._canonical(name)
            if canon is None:
                continue
            parts = canon.split(".")
            node = params
            ok = True
            for p in parts[:-1]:
                p2: Any = int(p) if p.isdigit() else p
                if not (isinstance(node, list) or p2 in node):
                    ok = False
                    break
                node = node[p2]
            if not ok:
                continue
            leaf = parts[-1]
            if leaf not in node:
                continue
            a = np.asarray(arr)
            if leaf == "weight" and parts[-2] in _LINEAR_MODULES:
                a = a.T  # torch [out, in] -> [in, out]
            expected = node[leaf]
            if expected.shape != a.shape:
                raise ValueError(
                    f"shape mismatch for {name} -> {canon}: "
                    f"checkpoint {a.shape} vs model {expected.shape}"
                )
            node[leaf] = jnp.asarray(a, self.dtype)
        return params

    # -- forward ------------------------------------------------------------

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        if embeds is not None:
            # multimodal injection (mask [T], override [T, H]) — same
            # convention as llama.embed (engine/vlm.py)
            mask, override = embeds
            x = jnp.where(mask[:, None], override.astype(x.dtype), x)
        if self.position == "learned":
            x = x + params["pos_embed"]["weight"][
                md.positions + self.learned_pos_offset
            ]
        if self.embed_ln:
            x = self._norm(x, params["embed_ln"])

        rope_tables = (
            (params["rope_cos"], params["rope_sin"])
            if self.rotary is not None
            else None
        )
        act = _ACTS[cfg.hidden_act]
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            ks, vs = self.kv_scales if self.kv_scales else (None, None)
            if self.parallel_residual:
                h1 = self._norm(x, lp["ln_1"])
                attn_out, kv = attention_block(
                    self.attn_specs[i], lp["self_attn"], h1, md, kv_pages[i],
                    rope_tables, attention_backend=self.attention_backend,
                    k_scale=ks, v_scale=vs,
                )
                h2 = h1 if self.single_ln else self._norm(x, lp["ln_2"])
                mlp_out = self._mlp(h2, lp["mlp"], act)
                x = x + attn_out + mlp_out
            else:
                residual = x
                h1 = self._norm(x, lp["ln_1"])
                attn_out, kv = attention_block(
                    self.attn_specs[i], lp["self_attn"], h1, md, kv_pages[i],
                    rope_tables, attention_backend=self.attention_backend,
                    k_scale=ks, v_scale=vs,
                )
                x = residual + attn_out
                residual = x
                h2 = self._norm(x, lp["ln_2"])
                x = residual + self._mlp(h2, lp["mlp"], act)
            new_kv.append(kv)

        x = self._norm(x, params["ln_f"])
        return x, new_kv

    def _mlp(self, x, p, act):
        if self.mlp_gated:
            return swiglu_mlp(x, p, self.config.hidden_act)
        return linear(act(linear(x, p["fc_in"])), p["fc_out"])

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            logits = hidden @ params["embed_tokens"]["weight"].T
        else:
            logits = linear(hidden, params["lm_head"])
        return logits.astype(jnp.float32)


# -- fused-QKV split helpers ------------------------------------------------


def split_qkv_interleaved(a: np.ndarray, nh: int, nkv: int, hd: int):
    """NeoX/Bloom/Persimmon layout: rows are [head, (q,k,v), head_dim]
    interleaved per head (requires nh == nkv)."""
    lead = a.reshape(nh, 3, hd, *a.shape[1:])
    q = lead[:, 0].reshape(nh * hd, *a.shape[1:])
    k = lead[:, 1].reshape(nh * hd, *a.shape[1:])
    v = lead[:, 2].reshape(nh * hd, *a.shape[1:])
    return q, k, v


def split_qkv_sequential(a: np.ndarray, nh: int, nkv: int, hd: int):
    """MPT/StableLM-fused layout: [q rows | k rows | v rows]."""
    return np.split(a, [nh * hd, (nh + nkv) * hd], axis=0)


def split_qkv_falcon(
    a: np.ndarray, nh: int, nkv: int, hd: int, new_arch: bool
):
    if new_arch:
        # [nkv groups, (g q-heads, 1 k, 1 v), head_dim]
        g = nh // nkv
        lead = a.reshape(nkv, g + 2, hd, *a.shape[1:])
        q = lead[:, :g].reshape(nh * hd, *a.shape[1:])
        k = lead[:, g].reshape(nkv * hd, *a.shape[1:])
        v = lead[:, g + 1].reshape(nkv * hd, *a.shape[1:])
        return q, k, v
    # classic multi-query: [all q | one k | one v]
    return np.split(a, [nh * hd, nh * hd + nkv * hd], axis=0)


def _qkv_splitter(model, marker: str, splitter):
    """Build a _preprocess that splits `marker`-named fused tensors."""
    cfg = model.config
    nh, nkv, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )

    def pre(weights):
        for name, arr in weights:
            if marker in name and (
                name.endswith(".weight") or name.endswith(".bias")
            ):
                a = np.asarray(arr)
                q, k, v = splitter(a, nh, nkv, hd)
                leaf = name.rsplit(".", 1)[1]
                base = name[: name.index(marker)]
                yield f"{base}q_proj.{leaf}", q
                yield f"{base}k_proj.{leaf}", k
                yield f"{base}v_proj.{leaf}", v
            else:
                yield name, arr

    return pre


# -- architectures ----------------------------------------------------------


class GPTNeoXForCausalLM(LNTransformer):
    """EleutherAI GPT-NeoX / Pythia (reference models/gpt_neox.rs):
    fused interleaved QKV, optional parallel residual, partial rotary."""

    position = "rope"

    _RENAMES = (
        ("gpt_neox.embed_in", "embed_tokens"),
        ("gpt_neox.final_layer_norm", "ln_f"),
        ("gpt_neox.layers.", "layers."),
        ("embed_out", "lm_head"),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".attention.dense.", ".self_attn.o_proj."),
        (".attention.", ".self_attn."),
        (".mlp.dense_h_to_4h.", ".mlp.fc_in."),
        (".mlp.dense_4h_to_h.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        config.partial_rotary_factor = float(x.get("rotary_pct", 1.0))
        if "rotary_emb_base" in x:
            config.rope_theta = float(x["rotary_emb_base"])
        if config.hidden_act not in _ACTS:
            config.hidden_act = "gelu"
        self.parallel_residual = bool(x.get("use_parallel_residual", True))
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        return _qkv_splitter(
            self, "query_key_value.", split_qkv_interleaved
        )(weights)


class GPTJForCausalLM(LNTransformer):
    """GPT-J 6B (reference models/gptj.rs): parallel residual with a
    single shared LayerNorm, interleaved (rotate-every-two) partial rope."""

    parallel_residual = True
    single_ln = True
    attn_bias = False
    o_bias = False
    lm_head_bias = True
    interleaved_rope = True

    _RENAMES = (
        ("transformer.wte", "embed_tokens"),
        ("transformer.ln_f", "ln_f"),
        ("transformer.h.", "layers."),
        (".attn.out_proj.", ".self_attn.o_proj."),
        (".attn.q_proj.", ".self_attn.q_proj."),
        (".attn.k_proj.", ".self_attn.k_proj."),
        (".attn.v_proj.", ".self_attn.v_proj."),
        (".mlp.fc_in.", ".mlp.fc_in."),
        (".mlp.fc_out.", ".mlp.fc_out."),
        (".ln_1.", ".ln_1."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "n_embd" in x:
            config.hidden_size = x["n_embd"]
        if "n_layer" in x:
            config.num_hidden_layers = x["n_layer"]
        if "n_head" in x:
            config.num_attention_heads = x["n_head"]
            config.num_key_value_heads = x["n_head"]
        if "n_positions" in x:
            config.max_position_embeddings = x["n_positions"]
        config.head_dim = config.hidden_size // config.num_attention_heads
        config.intermediate_size = x.get("n_inner") or 4 * config.hidden_size
        rotary_dim = x.get("rotary_dim", config.head_dim)
        config.partial_rotary_factor = rotary_dim / config.head_dim
        config.hidden_act = "gelu_new"
        super().__init__(config, dtype)


class OPTForCausalLM(LNTransformer):
    """Meta OPT (reference models/opt.rs): learned positions offset by 2,
    ReLU MLP, pre-LN."""

    position = "learned"
    learned_pos_offset = 2

    _RENAMES = (
        ("model.decoder.embed_tokens", "embed_tokens"),
        ("model.decoder.embed_positions", "pos_embed"),
        ("model.decoder.final_layer_norm", "ln_f"),
        ("model.decoder.layers.", "layers."),
        ("decoder.embed_tokens", "embed_tokens"),
        ("decoder.embed_positions", "pos_embed"),
        ("decoder.final_layer_norm", "ln_f"),
        ("decoder.layers.", "layers."),
        (".self_attn.out_proj.", ".self_attn.o_proj."),
        (".self_attn_layer_norm.", ".ln_1."),
        (".final_layer_norm.", ".ln_2."),
        (".fc1.", ".mlp.fc_in."),
        (".fc2.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        config.intermediate_size = x.get("ffn_dim", config.intermediate_size)
        config.hidden_act = x.get("activation_function", "relu")
        if config.hidden_act not in _ACTS:
            config.hidden_act = "relu"
        if x.get("word_embed_proj_dim", config.hidden_size) != config.hidden_size:
            raise NotImplementedError("OPT word_embed projections (350m)")
        config.tie_word_embeddings = True
        super().__init__(config, dtype)

    def _canonical(self, name):
        if name == "lm_head.weight":
            return None  # tied
        # learned positions: keep the raw table (offset applied at lookup)
        return super()._canonical(name)


class BloomForCausalLM(LNTransformer):
    """BigScience BLOOM (reference models/bloom.rs): ALiBi positions,
    post-embedding LayerNorm, fused per-head QKV."""

    position = "alibi"
    embed_ln = True

    _RENAMES = (
        ("transformer.word_embeddings_layernorm", "embed_ln"),
        ("transformer.word_embeddings", "embed_tokens"),
        ("transformer.ln_f", "ln_f"),
        ("transformer.h.", "layers."),
        ("word_embeddings_layernorm", "embed_ln"),
        ("word_embeddings", "embed_tokens"),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".self_attention.dense.", ".self_attn.o_proj."),
        (".self_attention.", ".self_attn."),
        (".mlp.dense_h_to_4h.", ".mlp.fc_in."),
        (".mlp.dense_4h_to_h.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "n_layer" in x:
            config.num_hidden_layers = x["n_layer"]
        if "n_head" in x:
            config.num_attention_heads = x["n_head"]
            config.num_key_value_heads = x["n_head"]
        config.head_dim = config.hidden_size // config.num_attention_heads
        config.intermediate_size = 4 * config.hidden_size
        config.hidden_act = "gelu"
        config.tie_word_embeddings = True
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        return _qkv_splitter(
            self, "query_key_value.", split_qkv_interleaved
        )(weights)


class MPTForCausalLM(LNTransformer):
    """MosaicML MPT (reference models/mpt.rs): ALiBi, bias-free linears,
    LayerNorm without bias, sequential-fused Wqkv."""

    position = "alibi"
    norm_has_bias = False
    attn_bias = False
    o_bias = False
    mlp_bias = False

    _RENAMES = (
        ("transformer.wte", "embed_tokens"),
        ("transformer.norm_f", "ln_f"),
        ("transformer.blocks.", "layers."),
        (".norm_1.", ".ln_1."),
        (".norm_2.", ".ln_2."),
        (".attn.out_proj.", ".self_attn.o_proj."),
        (".attn.", ".self_attn."),
        (".ffn.up_proj.", ".mlp.fc_in."),
        (".ffn.down_proj.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "d_model" in x:
            config.hidden_size = x["d_model"]
        if "n_heads" in x:
            config.num_attention_heads = x["n_heads"]
        if "n_layers" in x:
            config.num_hidden_layers = x["n_layers"]
        if "max_seq_len" in x:
            config.max_position_embeddings = x["max_seq_len"]
        attn_cfg = x.get("attn_config") or {}
        config.num_key_value_heads = attn_cfg.get(
            "kv_n_heads", config.num_attention_heads
        )
        if not attn_cfg.get("alibi", True):
            self.position = "rope"
        config.head_dim = config.hidden_size // config.num_attention_heads
        config.intermediate_size = int(
            x.get("expansion_ratio", 4) * config.hidden_size
        )
        config.hidden_act = "gelu"
        config.tie_word_embeddings = True
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        return _qkv_splitter(self, "Wqkv.", split_qkv_sequential)(weights)


class FalconForCausalLM(LNTransformer):
    """TII Falcon / RW (reference models/falcon.rs): parallel residual,
    MQA (7B) or grouped interleaved QKV (new arch), rope or ALiBi."""

    parallel_residual = True
    attn_bias = False
    o_bias = False
    mlp_bias = False

    _RENAMES = (
        ("transformer.word_embeddings", "embed_tokens"),
        ("transformer.ln_f", "ln_f"),
        ("transformer.h.", "layers."),
        ("word_embeddings", "embed_tokens"),
        (".self_attention.dense.", ".self_attn.o_proj."),
        (".self_attention.", ".self_attn."),
        (".mlp.dense_h_to_4h.", ".mlp.fc_in."),
        (".mlp.dense_4h_to_h.", ".mlp.fc_out."),
        (".ln_attn.", ".ln_1."),
        (".ln_mlp.", ".ln_2."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        self._new_arch = bool(x.get("new_decoder_architecture", False))
        if "n_head" in x:
            config.num_attention_heads = x["n_head"]
        if "n_layer" in x:
            config.num_hidden_layers = x["n_layer"]
        if self._new_arch:
            nkv = x.get("num_kv_heads", x.get("n_head_kv", 8))
            config.num_key_value_heads = nkv
            self.single_ln = not bool(x.get("num_ln_in_parallel_attn", 2) == 2)
        elif bool(x.get("multi_query", True)):
            config.num_key_value_heads = 1
            self.single_ln = True
        else:
            config.num_key_value_heads = x.get(
                "n_head_kv", config.num_attention_heads
            )
            self.single_ln = True
        if not bool(x.get("parallel_attn", True)):
            self.parallel_residual = False
            self.single_ln = False
        if bool(x.get("alibi", False)):
            self.position = "alibi"
        config.head_dim = config.hidden_size // config.num_attention_heads
        config.intermediate_size = x.get(
            "ffn_hidden_size", 4 * config.hidden_size
        )
        config.hidden_act = "gelu"
        config.tie_word_embeddings = True
        if bool(x.get("bias", False)):
            self.attn_bias = self.o_bias = self.mlp_bias = True
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        def split(a, nh, nkv, hd):
            return split_qkv_falcon(a, nh, nkv, hd, self._new_arch)

        return _qkv_splitter(self, "query_key_value.", split)(weights)


class GPTBigCodeForCausalLM(LNTransformer):
    """StarCoder-1 / SantaCoder (reference models/gpt_bigcode.rs):
    GPT-2 skeleton with multi-query attention, learned positions."""

    position = "learned"

    _RENAMES = (
        ("transformer.wte", "embed_tokens"),
        ("transformer.wpe", "pos_embed"),
        ("transformer.ln_f", "ln_f"),
        ("transformer.h.", "layers."),
        (".ln_1.", ".ln_1."),
        (".ln_2.", ".ln_2."),
        (".attn.c_proj.", ".self_attn.o_proj."),
        (".mlp.c_fc.", ".mlp.fc_in."),
        (".mlp.c_proj.", ".mlp.fc_out."),
        # split c_attn outputs arrive as ".attn.{q,k,v}_proj." — must come
        # after the specific .attn.* renames above
        (".attn.", ".self_attn."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if "n_embd" in x:
            config.hidden_size = x["n_embd"]
        if "n_layer" in x:
            config.num_hidden_layers = x["n_layer"]
        if "n_head" in x:
            config.num_attention_heads = x["n_head"]
        if "n_positions" in x:
            config.max_position_embeddings = x["n_positions"]
        config.num_key_value_heads = (
            1 if x.get("multi_query", True) else config.num_attention_heads
        )
        config.head_dim = config.hidden_size // config.num_attention_heads
        config.intermediate_size = x.get("n_inner") or 4 * config.hidden_size
        config.hidden_act = "gelu_pytorch_tanh"
        config.tie_word_embeddings = True
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        return _qkv_splitter(self, "c_attn.", split_qkv_sequential)(
            weights
        )


class Starcoder2ForCausalLM(LNTransformer):
    """StarCoder-2 (reference models/starcoder2.rs): rope, LayerNorm,
    biased split projections, non-gated gelu MLP."""

    position = "rope"

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".mlp.c_fc.", ".mlp.fc_in."),
        (".mlp.c_proj.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        use_bias = bool(x.get("use_bias", True))
        self.attn_bias = self.o_bias = self.mlp_bias = use_bias
        if config.hidden_act not in _ACTS:
            config.hidden_act = "gelu_pytorch_tanh"
        config.tie_word_embeddings = bool(
            x.get("tie_word_embeddings", config.tie_word_embeddings)
        )
        super().__init__(config, dtype)


class PersimmonForCausalLM(LNTransformer):
    """Adept Persimmon / Fuyu text stack (reference models/persimmon.rs):
    fused interleaved QKV, per-head q/k LayerNorm, partial rotary,
    squared-ReLU MLP."""

    position = "rope"
    qk_layernorm = True

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.final_layernorm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".self_attn.dense.", ".self_attn.o_proj."),
        (".self_attn.q_layernorm.", ".self_attn.q_norm."),
        (".self_attn.k_layernorm.", ".self_attn.k_norm."),
        (".mlp.dense_h_to_4h.", ".mlp.fc_in."),
        (".mlp.dense_4h_to_h.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                config.extra.get("partial_rotary_factor", 0.5)
            )
        if config.hidden_act not in _ACTS:
            config.hidden_act = "relu2"
        super().__init__(config, dtype)

    def _preprocess(self, weights):
        return _qkv_splitter(
            self, "query_key_value.", split_qkv_interleaved
        )(weights)


class PhiForCausalLM(LNTransformer):
    """Microsoft Phi-1/1.5/2 (reference models/phi.rs): parallel residual
    with one LayerNorm, partial rotary, biased linears."""

    parallel_residual = True
    single_ln = True
    lm_head_bias = True

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.final_layernorm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".self_attn.dense.", ".self_attn.o_proj."),
        (".mlp.fc1.", ".mlp.fc_in."),
        (".mlp.fc2.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                config.extra.get("partial_rotary_factor", 0.5)
            )
        if config.hidden_act not in _ACTS:
            config.hidden_act = "gelu_new"
        super().__init__(config, dtype)


class StablelmForCausalLM(LNTransformer):
    """StabilityAI StableLM 1/2/zephyr (reference models/stablelm.rs):
    Llama skeleton with LayerNorm instead of RMSNorm, partial rotary,
    gated SiLU MLP."""

    position = "rope"
    mlp_gated = True
    mlp_bias = False
    o_bias = False

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                x.get("rope_pct", x.get("partial_rotary_factor", 0.25))
            )
        self.attn_bias = bool(
            x.get("use_qkv_bias", config.attention_bias)
        )
        config.hidden_act = "silu"
        super().__init__(config, dtype)


class NemotronForCausalLM(LNTransformer):
    """NVIDIA Nemotron (reference models/nemotron.rs): LayerNorm1p
    ((1+w) scaling), squared-ReLU non-gated MLP, partial rotary."""

    position = "rope"
    norm_kind = "layernorm1p"
    attn_bias = False
    o_bias = False
    mlp_bias = False

    _RENAMES = (
        ("model.embed_tokens", "embed_tokens"),
        ("model.norm", "ln_f"),
        ("model.layers.", "layers."),
        (".input_layernorm.", ".ln_1."),
        (".post_attention_layernorm.", ".ln_2."),
        (".mlp.up_proj.", ".mlp.fc_in."),
        (".mlp.down_proj.", ".mlp.fc_out."),
    )

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        x = config.extra
        if config.partial_rotary_factor == 1.0:
            config.partial_rotary_factor = float(
                x.get("partial_rotary_factor", 0.5)
            )
        if config.hidden_act not in _ACTS:
            config.hidden_act = "relu2"
        super().__init__(config, dtype)
