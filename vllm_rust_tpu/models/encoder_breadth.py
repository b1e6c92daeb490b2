"""Encoder breadth: GTE-new/Nomic/Jina (BertWithRope), ModernBERT,
ColBERT, SPLADE sparse embeddings.

Reference: models/{gte.rs, modernbert.rs, colbert.rs, bert_splade.rs}.
All classes follow the EncoderRunner contract (engine/encoder.py):
``encode(params, ids, type_ids, cu)``, ``pool``, ``classify_logits``;
no KV cache (kv_head_info = []).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.rotary import RotarySpec, apply_rope, compute_rope_tables
from .bert import BertModel, _dense, _layer_norm


def _segments(cu_lens, t):
    s = cu_lens.shape[0] - 1
    tok_idx = jnp.arange(t, dtype=jnp.int32)
    seq_of = jnp.clip(
        jnp.searchsorted(cu_lens, tok_idx, side="right") - 1, 0, s - 1
    )
    local = tok_idx - cu_lens[seq_of]
    real = tok_idx < cu_lens[s]
    return seq_of, local, real


class GteNewModel(BertModel):
    """GTE-new / BertWithRope (reference models/gte.rs): BERT encoder
    with RoPE instead of absolute positions, fused qkv, gated (GEGLU /
    SiLU) MLP, post-LN residuals (attn_ln(x + attn(x))), optional
    token-type embeddings. Covers GteNewModel / SnowflakeGteNewModel."""

    gate_bias = False  # GteNew: gate_up_proj has no bias (gte.rs:455)

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        super().__init__(config, dtype)
        ex = config.extra
        self.act = ex.get("hidden_act", "geglu")
        self.type_vocab_size = int(ex.get("type_vocab_size", 0))
        hd = config.hidden_size // config.num_attention_heads
        rk = ex.get("rotary_kwargs") or {}
        self.rotary = RotarySpec(
            head_dim=hd,
            rotary_dim=int(ex.get("rotary_emb_dim", rk.get("dim", hd))),
            max_position=config.max_position_embeddings,
            base=float(rk.get("base", config.rope_theta)),
        )
        self.bias = bool(ex.get("bias", True))

    @property
    def _gated(self) -> bool:
        return self.act in ("silu", "geglu")

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        n_keys = cfg.num_hidden_layers * 5 + 4
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(cfg.num_hidden_layers):
            lp = {
                "qkv_proj": dense(next(keys), h, 3 * h),
                "out_proj": dense(next(keys), h, h, self.bias),
                "attn_ln": ln(),
                "mlp_ln": ln(),
                "down_proj": dense(next(keys), inter, h, self.bias),
            }
            if self._gated:
                lp["gate_up_proj"] = dense(next(keys), h, 2 * inter,
                                           self.gate_bias)
            else:
                lp["up_proj"] = dense(next(keys), h, inter, self.bias)
            layers.append(lp)
        params = {
            "word_embeddings": w(next(keys), (cfg.vocab_size, h)),
            "emb_ln": ln(),
            "layers": layers,
            "pooler": dense(next(keys), h, h),
        }
        if self.type_vocab_size > 0:
            params["token_type_embeddings"] = w(
                next(keys), (self.type_vocab_size, h))
        if self.num_labels:
            params["classifier"] = dense(next(keys), h, self.num_labels)
        cos, sin = compute_rope_tables(self.rotary,
                                       cfg.max_position_embeddings)
        params["rope_cos"], params["rope_sin"] = cos, sin
        return params

    def encode(self, params, input_ids, token_type_ids, cu_lens):
        cfg = self.config
        t = input_ids.shape[0]
        seq_of, local, real = _segments(cu_lens, t)
        x = params["word_embeddings"][input_ids]
        if "token_type_embeddings" in params:
            x = x + params["token_type_embeddings"][token_type_ids]
        x = _layer_norm(x, params["emb_ln"], self.eps)

        nh = cfg.num_attention_heads
        hd = cfg.hidden_size // nh
        mask = (seq_of[:, None] == seq_of[None, :]) & real[:, None] \
            & real[None, :]
        bias = jnp.where(mask, 0.0, -1e10)
        cos, sin = params["rope_cos"], params["rope_sin"]
        use_silu = self.act == "silu"
        for lp in params["layers"]:
            qkv = _dense(x, lp["qkv_proj"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, nh, hd)
            k = k.reshape(t, nh, hd)
            v = v.reshape(t, nh, hd)
            q, k = apply_rope(q, k, local, cos, sin,
                              rotary_dim=self.rotary.rotary_dim)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores + bias[None], axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = _layer_norm(x + _dense(ctx, lp["out_proj"]),
                            lp["attn_ln"], self.eps)
            if self._gated:
                gu = _dense(x, lp["gate_up_proj"])
                g, u = jnp.split(gu, 2, axis=-1)
                act = jax.nn.silu(g) if use_silu else jax.nn.gelu(
                    g, approximate=False)
                inner = act * u
            else:
                inner = jax.nn.gelu(_dense(x, lp["up_proj"]),
                                    approximate=False)
            x = _layer_norm(x + _dense(inner, lp["down_proj"]),
                            lp["mlp_ln"], self.eps)
        return x

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        has_classifier = False
        for name, arr in weights:
            # classification checkpoints prefix the encoder with `new.`
            # (gte.rs:604)
            n = (name.removeprefix("new.").removeprefix("model.")
                 .removeprefix("roberta."))
            a = np.asarray(arr)
            parts = n.split(".")
            if n.startswith("embeddings."):
                if parts[1] == "word_embeddings":
                    params["word_embeddings"] = jnp.asarray(a, self.dtype)
                elif parts[1] == "token_type_embeddings":
                    params["token_type_embeddings"] = jnp.asarray(
                        a, self.dtype)
                elif parts[1] in ("LayerNorm", "layer_norm", "norm"):
                    params["emb_ln"][parts[-1]] = jnp.asarray(a, self.dtype)
            elif n.startswith("encoder.layers.") or n.startswith("encoder.layer."):
                lp = params["layers"][int(parts[2])]
                rest = parts[3:]
                if rest[0] == "attention":
                    tgt = lp[rest[1]]  # qkv_proj / out_proj
                    tgt[rest[-1]] = jnp.asarray(
                        a.T if rest[-1] == "weight" else a, self.dtype)
                elif rest[0] == "mlp":
                    tgt = lp[rest[1]]
                    tgt[rest[-1]] = jnp.asarray(
                        a.T if rest[-1] == "weight" else a, self.dtype)
                elif rest[0] in ("attn_ln", "mlp_ln"):
                    lp[rest[0]][rest[-1]] = jnp.asarray(a, self.dtype)
            elif n.startswith("pooler.dense."):
                params["pooler"][parts[-1]] = jnp.asarray(
                    a.T if parts[-1] == "weight" else a, self.dtype)
            elif n.startswith("classifier."):
                has_classifier = True
                params.setdefault("classifier", {})[parts[-1]] = jnp.asarray(
                    a.T if parts[-1] == "weight" else a, self.dtype)
        if not has_classifier and self.num_labels <= 1:
            params.pop("classifier", None)
        return params

    def classify_logits(self, params, hidden, cu_lens):
        # GTE classification pools CLS through the tanh pooler when
        # present (gte.rs GtePooler), like BERT
        return super().classify_logits(params, hidden, cu_lens)


class NomicBertModel(GteNewModel):
    """NomicBERT (reference gte.rs:471-495): GTE-new with a biased
    gate_up projection."""

    gate_bias = True


class JinaRobertaModel(GteNewModel):
    """Jina-v3 XLM-Roberta with RoPE (reference gte.rs:497-521):
    ungated GELU MLP, mean pooling, expects LoRA-merged weights."""

    gate_bias = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        super().__init__(config, dtype)
        if "hidden_act" not in config.extra:
            self.act = "gelu"


class GteNewForSequenceClassification(GteNewModel):
    """GTE-new cross-encoder / classifier (reference gte.rs:588-630)."""


# -- ModernBERT -----------------------------------------------------------------


class ModernBertModel(BertModel):
    """ModernBERT (reference models/modernbert.rs): pre-norm BERT with
    RoPE, alternating global/local (bidirectional sliding window)
    attention, gated-GELU `Wi`/`Wo` MLP, layer 0 without attn_norm, no
    position/token-type embeddings."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        super().__init__(config, dtype)
        ex = config.extra
        self.eps = float(ex.get("norm_eps", ex.get("layer_norm_eps", 1e-5)))
        self.attn_bias = bool(ex.get("attention_bias", False))
        self.mlp_bias = bool(ex.get("mlp_bias", False))
        self.global_every = int(ex.get("global_attn_every_n_layers", 3))
        self.local_window = int(ex.get("local_attention", 128)) // 2
        g_theta = float(ex.get("global_rope_theta", config.rope_theta))
        l_theta = float(ex.get("local_rope_theta") or g_theta)
        hd = config.hidden_size // config.num_attention_heads
        mp = config.max_position_embeddings
        self.rotary_global = RotarySpec(head_dim=hd, rotary_dim=hd,
                                        max_position=mp, base=g_theta)
        self.rotary_local = RotarySpec(head_dim=hd, rotary_dim=hd,
                                       max_position=mp, base=l_theta)
        self.pooling_default = str(ex.get("classifier_pooling", "cls"))

    def _is_global(self, i: int) -> bool:
        return i % self.global_every == 0

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, inter = cfg.hidden_size, cfg.intermediate_size
        n_keys = cfg.num_hidden_layers * 4 + 4
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout, bias):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for i in range(cfg.num_hidden_layers):
            lp = {
                "Wqkv": dense(next(keys), h, 3 * h, self.attn_bias),
                "Wo": dense(next(keys), h, h, self.attn_bias),
                "mlp_norm": ln(),
                "Wi": dense(next(keys), h, 2 * inter, self.mlp_bias),
                "Wo_mlp": dense(next(keys), inter, h, self.mlp_bias),
            }
            if i > 0:
                lp["attn_norm"] = ln()
            layers.append(lp)
        params = {
            "tok_embeddings": w(next(keys), (cfg.vocab_size, h)),
            "emb_norm": ln(),
            "layers": layers,
            "final_norm": ln(),
        }
        if self.num_labels:
            params["head"] = dense(next(keys), h, h, False)
            params["head_norm"] = ln()
            params["classifier"] = dense(next(keys), h, self.num_labels,
                                         True)
        for tag, rs in (("", self.rotary_global), ("_local",
                                                   self.rotary_local)):
            cos, sin = compute_rope_tables(rs, cfg.max_position_embeddings)
            params["rope_cos" + tag], params["rope_sin" + tag] = cos, sin
        return params

    def encode(self, params, input_ids, token_type_ids, cu_lens):
        cfg = self.config
        t = input_ids.shape[0]
        seq_of, local, real = _segments(cu_lens, t)
        x = _layer_norm(params["tok_embeddings"][input_ids],
                        params["emb_norm"], self.eps)
        nh = cfg.num_attention_heads
        hd = cfg.hidden_size // nh
        same = (seq_of[:, None] == seq_of[None, :]) & real[:, None] \
            & real[None, :]
        dist = jnp.abs(local[:, None] - local[None, :])
        for i, lp in enumerate(params["layers"]):
            is_global = self._is_global(i)
            mask = same if is_global else (
                same & (dist <= self.local_window))
            bias = jnp.where(mask, 0.0, -1e10)
            h_in = (_layer_norm(x, lp["attn_norm"], self.eps)
                    if "attn_norm" in lp else x)
            qkv = _dense(h_in, lp["Wqkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, nh, hd)
            k = k.reshape(t, nh, hd)
            v = v.reshape(t, nh, hd)
            tag = "" if is_global else "_local"
            q, k = apply_rope(q, k, local, params["rope_cos" + tag],
                              params["rope_sin" + tag], rotary_dim=hd)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores + bias[None], axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = x + _dense(ctx, lp["Wo"])
            inner = _dense(_layer_norm(x, lp["mlp_norm"], self.eps),
                           lp["Wi"])
            gate_in, gate = jnp.split(inner, 2, axis=-1)
            x = x + _dense(
                jax.nn.gelu(gate_in, approximate=False) * gate,
                lp["Wo_mlp"])
        return _layer_norm(x, params["final_norm"], self.eps)

    def classify_logits(self, params, hidden, cu_lens):
        """head dense → gelu → norm → classifier over pooled position
        (HF ModernBertForSequenceClassification)."""
        if self.pooling_default == "mean":
            pooled = self.pool(params, hidden, cu_lens, pooling="mean")
        else:
            pooled = hidden[cu_lens[:-1]]
        x = jax.nn.gelu(_dense(pooled.astype(hidden.dtype), params["head"]),
                        approximate=False)
        x = _layer_norm(x, params["head_norm"], self.eps)
        return _dense(x, params["classifier"]).astype(jnp.float32)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            n = name.removeprefix("model.")
            a = np.asarray(arr)
            parts = n.split(".")

            def put(node, leaf, transpose=False):
                node[leaf] = jnp.asarray(
                    a.T if transpose and leaf == "weight" else a, self.dtype)

            if n.startswith("embeddings.tok_embeddings"):
                params["tok_embeddings"] = jnp.asarray(a, self.dtype)
            elif n.startswith("embeddings.norm."):
                put(params["emb_norm"], parts[-1])
            elif n.startswith("final_norm."):
                put(params["final_norm"], parts[-1])
            elif n.startswith("layers."):
                lp = params["layers"][int(parts[1])]
                rest = parts[2:]
                if rest[0] == "attn" and rest[1] == "Wqkv":
                    put(lp["Wqkv"], rest[-1], True)
                elif rest[0] == "attn" and rest[1] == "Wo":
                    put(lp["Wo"], rest[-1], True)
                elif rest[0] == "mlp" and rest[1] == "Wi":
                    put(lp["Wi"], rest[-1], True)
                elif rest[0] == "mlp" and rest[1] == "Wo":
                    put(lp["Wo_mlp"], rest[-1], True)
                elif rest[0] in ("attn_norm", "mlp_norm"):
                    if rest[0] in lp:
                        put(lp[rest[0]], rest[-1])
            elif n.startswith("head.dense."):
                put(params["head"], parts[-1], True)
            elif n.startswith("head.norm."):
                put(params["head_norm"], parts[-1])
            elif n.startswith("classifier."):
                put(params["classifier"], parts[-1], True)
        return params


class ModernBertForSequenceClassification(ModernBertModel):
    pass


# -- ColBERT --------------------------------------------------------------------


class ColBERTModel(BertModel):
    """ColBERT late interaction (reference models/colbert.rs): BERT
    encoder + `colbert_linear` (hidden → colbert_dim, no bias) producing
    per-token L2-normalized embeddings for MaxSim scoring.
    ``colbert_embeddings`` gives the per-token matrix; ``pool`` returns
    the projected CLS vector so the standard /v1/embeddings endpoint
    still works."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        super().__init__(config, dtype)
        ex = config.extra
        self.colbert_dim = int(
            ex.get("colbert_dim", ex.get("dim",
                                         ex.get("projection_dim", 128)))
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        h = self.config.hidden_size
        if rng is None:
            w = jnp.zeros((h, self.colbert_dim), self.dtype)
        else:
            w = (scale * jax.random.normal(jax.random.PRNGKey(17),
                                           (h, self.colbert_dim))
                 ).astype(self.dtype)
        params["colbert_linear"] = {"weight": w}
        return params

    def load_weights(self, weights):
        saved = []
        rest = []
        for name, arr in weights:
            if name.startswith(("colbert_linear.", "linear.")):
                saved.append((name, arr))
            else:
                rest.append((name, arr))
        params = super().load_weights(rest)
        h = self.config.hidden_size
        params["colbert_linear"] = {
            "weight": jnp.zeros((h, self.colbert_dim), self.dtype)
        }
        for name, arr in saved:
            if name.endswith("weight"):
                params["colbert_linear"]["weight"] = jnp.asarray(
                    np.asarray(arr).T, self.dtype)
        return params

    def colbert_embeddings(self, params, hidden):
        """[T, H] -> [T, colbert_dim] L2-normalized per-token."""
        x = hidden @ params["colbert_linear"]["weight"]
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    def pool(self, params, hidden, cu_lens, pooling: str = "cls"):
        emb = self.colbert_embeddings(params, hidden)
        return super().pool({**params}, emb, cu_lens, pooling="cls") \
            if pooling == "cls" else super().pool(params, emb, cu_lens,
                                                  pooling=pooling)


# -- SPLADE ---------------------------------------------------------------------


class BertSpladeSparseEmbeddingModel(BertModel):
    """SPLADE sparse lexical embeddings (reference models/bert_splade.rs):
    BERT encoder → MLM head (dense → gelu → LayerNorm → decoder) →
    log1p(relu(logits)) → max over sequence → [vocab_size] sparse
    vector. ``pool`` returns the sparse vectors regardless of the
    requested strategy (bert_splade.rs pipeline)."""

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h, v = cfg.hidden_size, cfg.vocab_size
        d = self.dtype

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(jax.random.PRNGKey(19), shape)
                    ).astype(d)

        params["mlm"] = {
            "dense": {"weight": w((h, h)), "bias": jnp.zeros((h,), d)},
            "ln": {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)},
            "decoder": {"weight": w((h, v)), "bias": jnp.zeros((v,), d)},
        }
        return params

    def load_weights(self, weights):
        mlm_raw, rest = [], []
        for name, arr in weights:
            if name.startswith("cls.predictions."):
                mlm_raw.append((name, arr))
            else:
                rest.append((name, arr))
        params = super().load_weights(rest)
        params.setdefault("mlm", self.init_params(rng=None)["mlm"])
        for name, arr in mlm_raw:
            a = np.asarray(arr)
            leaf = name.rsplit(".", 1)[1]
            if ".transform.dense." in name:
                params["mlm"]["dense"][leaf] = jnp.asarray(
                    a.T if leaf == "weight" else a, self.dtype)
            elif ".transform.LayerNorm." in name:
                params["mlm"]["ln"][leaf] = jnp.asarray(a, self.dtype)
            elif ".decoder." in name or name.endswith("predictions.bias"):
                params["mlm"]["decoder"][leaf if ".decoder." in name
                                         else "bias"] = jnp.asarray(
                    a.T if leaf == "weight" and ".decoder." in name else a,
                    self.dtype)
        return params

    def pool(self, params, hidden, cu_lens, pooling: str = "cls"):
        mlm = params["mlm"]
        x = jax.nn.gelu(_dense(hidden, mlm["dense"]), approximate=False)
        x = _layer_norm(x, mlm["ln"], self.eps)
        logits = _dense(x, mlm["decoder"]).astype(jnp.float32)
        sparse = jnp.log1p(jax.nn.relu(logits))  # [T, V]
        t = hidden.shape[0]
        s = cu_lens.shape[0] - 1
        seq_of, _, real = _segments(cu_lens, t)
        sparse = jnp.where(real[:, None], sparse, -jnp.inf)
        out = jnp.full((s, sparse.shape[1]), -jnp.inf, jnp.float32)
        out = out.at[seq_of].max(sparse)
        return jnp.maximum(out, 0.0)


# -- Bidirectional decoder embedders ---------------------------------------------


class LlamaBidirectionalModel:
    """Llama decoder run WITHOUT causal masking as an embedding encoder
    (reference models/llama_bidirectional.rs): standard llama checkpoint
    layout, pooling from config `pooling` (mean default). Follows the
    EncoderRunner contract — no KV cache."""

    qk_norm = False
    default_pooling = "mean"

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.eps = config.rms_norm_eps
        self.num_labels = int(ex.get("num_labels",
                                     len(ex.get("id2label", {})) or 1))
        self.pooling_default = str(ex.get("pooling", self.default_pooling))
        self.rotary = RotarySpec.from_model_config(config)

    @property
    def kv_head_info(self) -> list:
        return []

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        inter = cfg.intermediate_size
        n_keys = cfg.num_hidden_layers * 7 + 3
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        layers = []
        for _ in range(cfg.num_hidden_layers):
            lp = {
                "input_layernorm": jnp.ones((h,), d),
                "post_attention_layernorm": jnp.ones((h,), d),
                "self_attn": {
                    "q_proj": {"weight": w(next(keys), (h, nh * hd))},
                    "k_proj": {"weight": w(next(keys), (h, nkv * hd))},
                    "v_proj": {"weight": w(next(keys), (h, nkv * hd))},
                    "o_proj": {"weight": w(next(keys), (nh * hd, h))},
                },
                "mlp": {
                    "gate_proj": {"weight": w(next(keys), (h, inter))},
                    "up_proj": {"weight": w(next(keys), (h, inter))},
                    "down_proj": {"weight": w(next(keys), (inter, h))},
                },
            }
            if self.qk_norm:
                lp["self_attn"]["q_norm"] = jnp.ones((hd,), d)
                lp["self_attn"]["k_norm"] = jnp.ones((hd,), d)
            layers.append(lp)
        params = {
            "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, h))},
            "layers": layers,
            "norm": jnp.ones((h,), d),
        }
        if self.num_labels:
            params["classifier"] = {
                "weight": w(next(keys), (h, self.num_labels))
            }
        cos, sin = compute_rope_tables(self.rotary,
                                       cfg.max_position_embeddings)
        params["rope_cos"], params["rope_sin"] = cos, sin
        return params

    def encode(self, params, input_ids, token_type_ids, cu_lens):
        from ..layers.norm import rms_norm
        from ..layers.mlp import swiglu_mlp
        from ..layers.linear import linear

        cfg = self.config
        t = input_ids.shape[0]
        seq_of, local, real = _segments(cu_lens, t)
        x = params["embed_tokens"]["weight"][input_ids]
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        g = nh // nkv
        mask = (seq_of[:, None] == seq_of[None, :]) & real[:, None] \
            & real[None, :]
        bias = jnp.where(mask, 0.0, -1e10)
        cos, sin = params["rope_cos"], params["rope_sin"]
        for lp in params["layers"]:
            sa = lp["self_attn"]
            h_in = rms_norm(x, lp["input_layernorm"], self.eps)
            q = linear(h_in, sa["q_proj"]).reshape(t, nh, hd)
            k = linear(h_in, sa["k_proj"]).reshape(t, nkv, hd)
            v = linear(h_in, sa["v_proj"]).reshape(t, nkv, hd)
            if self.qk_norm:
                q = rms_norm(q, sa["q_norm"], self.eps)
                k = rms_norm(k, sa["k_norm"], self.eps)
            q, k = apply_rope(q, k, local, cos, sin,
                              rotary_dim=self.rotary.rotary_dim)
            k = jnp.repeat(k, g, axis=1)
            v = jnp.repeat(v, g, axis=1)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores + bias[None], axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = x + linear(ctx, sa["o_proj"])
            h_in = rms_norm(x, lp["post_attention_layernorm"], self.eps)
            x = x + swiglu_mlp(h_in, lp["mlp"], cfg.hidden_act)
        return rms_norm(x, params["norm"], self.eps)

    # pooling helpers shared with the BERT family
    pool = BertModel.pool

    def classify_logits(self, params, hidden, cu_lens):
        pooled = self.pool(params, hidden, cu_lens,
                           pooling=self.pooling_default)
        return (pooled @ params["classifier"]["weight"]).astype(jnp.float32)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            n = name.removeprefix("model.")
            a = np.asarray(arr)
            parts = n.split(".")
            if n == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif n == "norm.weight":
                params["norm"] = jnp.asarray(a, self.dtype)
            elif parts[0] in ("score", "classifier"):
                params["classifier"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif parts[0] == "layers":
                lp = params["layers"][int(parts[1])]
                rest = parts[2:]
                if rest[0] in ("input_layernorm",
                               "post_attention_layernorm"):
                    lp[rest[0]] = jnp.asarray(a, self.dtype)
                elif rest[0] in ("self_attn", "mlp"):
                    tgt = lp[rest[0]]
                    if rest[1] in ("q_norm", "k_norm"):
                        tgt[rest[1]] = jnp.asarray(a, self.dtype)
                    else:
                        tgt[rest[1]][rest[2]] = jnp.asarray(
                            a.T if rest[2] == "weight" else a, self.dtype)
        return params


class VoyageQwen3BidirectionalEmbedModel(LlamaBidirectionalModel):
    """Voyage embedding model (reference models/voyage.rs): Qwen3
    decoder (per-head QK RMSNorm) run bidirectionally, mean pooling."""

    qk_norm = True


# -- CLIP / SigLIP dual encoders --------------------------------------------------


class CLIPEmbeddingModel:
    """CLIP dual-encoder embeddings (reference models/clip.rs): pre-norm
    bidirectional text transformer (token + learned position embeddings,
    erf-GELU MLP) pooled at the last token and projected by
    `text_projection`; `encode_images` runs the CLIP vision tower and
    projects the CLS token by `visual_projection`. Text and image
    embeddings share the projection space."""

    siglip = False

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        from .vision import CLIPVisionTower, SiglipVisionTower

        self.config = config
        self.dtype = dtype
        ex = config.extra
        tc = dict(ex.get("text_config") or {})
        vc = dict(ex.get("vision_config") or {})
        self.vocab_size = int(tc.get("vocab_size", 32000 if self.siglip
                                     else 49408))
        self.hidden = int(tc.get("hidden_size", 768))
        self.num_heads = int(tc.get("num_attention_heads",
                                    12 if self.siglip else 8))
        self.num_layers = int(tc.get("num_hidden_layers", 12))
        self.inter = int(tc.get("intermediate_size", 3072))
        self.max_pos = int(tc.get("max_position_embeddings",
                                  64 if self.siglip else 77))
        self.eps = float(tc.get("layer_norm_eps", 1e-6))
        self.proj = int(tc.get("projection_size" if self.siglip
                               else "projection_dim", self.hidden))
        self.num_labels = 0
        tower_cls = SiglipVisionTower if self.siglip else CLIPVisionTower
        self.vision = tower_cls(vc, dtype=dtype)

    @property
    def kv_head_info(self) -> list:
        return []

    def init_params(self, rng=None, scale: float = 0.02):
        d = self.dtype
        h = self.hidden
        n_keys = self.num_layers * 6 + 6
        keys = iter(jax.random.split(rng, n_keys) if rng is not None
                    else [None] * n_keys)

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "q_proj": dense(next(keys), h, h),
                "k_proj": dense(next(keys), h, h),
                "v_proj": dense(next(keys), h, h),
                "out_proj": dense(next(keys), h, h),
                "layer_norm1": ln(),
                "layer_norm2": ln(),
                "fc1": dense(next(keys), h, self.inter),
                "fc2": dense(next(keys), self.inter, h),
            })
        params = {
            "token_embedding": w(next(keys), (self.vocab_size, h)),
            "position_embedding": w(next(keys), (self.max_pos, h)),
            "layers": layers,
            "final_layer_norm": ln(),
            "vision_tower": self.vision.init_params(rng, scale),
        }
        if self.siglip:
            params["head"] = dense(next(keys), h, self.proj)  # with bias
        else:
            params["text_projection"] = dense(next(keys), h, self.proj,
                                              bias=False)
            params["visual_projection"] = dense(
                next(keys), self.vision.hidden_size, self.proj, bias=False)
        return params

    def encode(self, params, input_ids, token_type_ids, cu_lens):
        t = input_ids.shape[0]
        seq_of, local, real = _segments(cu_lens, t)
        x = (params["token_embedding"][input_ids]
             + params["position_embedding"][
                 jnp.clip(local, 0, self.max_pos - 1)])
        nh = self.num_heads
        hd = self.hidden // nh
        mask = (seq_of[:, None] == seq_of[None, :]) & real[:, None] \
            & real[None, :]
        bias = jnp.where(mask, 0.0, -1e10)
        for lp in params["layers"]:
            h_in = _layer_norm(x, lp["layer_norm1"], self.eps)
            q = _dense(h_in, lp["q_proj"]).reshape(t, nh, hd)
            k = _dense(h_in, lp["k_proj"]).reshape(t, nh, hd)
            v = _dense(h_in, lp["v_proj"]).reshape(t, nh, hd)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores + bias[None], axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = x + _dense(ctx, lp["out_proj"])
            h_in = _layer_norm(x, lp["layer_norm2"], self.eps)
            x = x + _dense(
                jax.nn.gelu(_dense(h_in, lp["fc1"]), approximate=False),
                lp["fc2"])
        return _layer_norm(x, params["final_layer_norm"], self.eps)

    def pool(self, params, hidden, cu_lens, pooling: str = "last"):
        # last-token (EOS) pool, then project into the shared space
        # (clip.rs:14, siglip.rs head projection)
        pooled = hidden[jnp.maximum(cu_lens[1:] - 1, 0)]
        proj = params["head"] if self.siglip else params["text_projection"]
        return _dense(pooled, proj).astype(jnp.float32)

    def classify_logits(self, params, hidden, cu_lens):
        raise NotImplementedError("CLIP/SigLIP have no classifier head")

    def encode_images(self, params, pixel_values):
        feats = self.vision(params["vision_tower"], pixel_values)
        if self.siglip:
            return feats.mean(axis=1).astype(jnp.float32)  # [B, H_v]
        cls = feats[:, 0]
        return _dense(cls, params["visual_projection"]).astype(jnp.float32)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        vis_stream = []
        for name, arr in weights:
            a = np.asarray(arr)
            if name.startswith("vision_model."):
                vis_stream.append((name, arr))
                continue
            if name == "text_projection.weight":
                params["text_projection"]["weight"] = jnp.asarray(
                    a.T, self.dtype)
                continue
            if name == "visual_projection.weight":
                params["visual_projection"]["weight"] = jnp.asarray(
                    a.T, self.dtype)
                continue
            n = name.removeprefix("text_model.")
            parts = n.split(".")
            if n.startswith("embeddings.token_embedding"):
                params["token_embedding"] = jnp.asarray(a, self.dtype)
            elif n.startswith("embeddings.position_embedding"):
                params["position_embedding"] = jnp.asarray(a, self.dtype)
            elif n.startswith("final_layer_norm."):
                params["final_layer_norm"][parts[-1]] = jnp.asarray(
                    a, self.dtype)
            elif n.startswith("head."):
                params["head"][parts[-1]] = jnp.asarray(
                    a.T if parts[-1] == "weight" else a, self.dtype)
            elif n.startswith("encoder.layers."):
                lp = params["layers"][int(parts[2])]
                sub = parts[3]
                if sub in ("self_attn", "mlp"):
                    leaf = parts[5]
                    lp[parts[4]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype)
                else:
                    lp[sub][parts[4]] = jnp.asarray(a, self.dtype)
        if vis_stream:
            params["vision_tower"] = self.vision.load_weights(vis_stream)
        return params


class SiglipEmbeddingModel(CLIPEmbeddingModel):
    """SigLIP dual encoder (reference models/siglip.rs): same layout
    with a biased `head` text projection and mean-pooled vision
    features."""

    siglip = True


def register_encoder_breadth(registry: dict) -> None:
    registry.update({
        "GteNewModel": GteNewModel,
        "SnowflakeGteNewModel": GteNewModel,
        "GteNewForSequenceClassification": GteNewForSequenceClassification,
        "NomicBertModel": NomicBertModel,
        "JinaRobertaModel": JinaRobertaModel,
        "ModernBertModel": ModernBertModel,
        "ModernBertForSequenceClassification":
            ModernBertForSequenceClassification,
        "ColBERTModel": ColBERTModel,
        "BertSpladeSparseEmbeddingModel": BertSpladeSparseEmbeddingModel,
        "LlamaBidirectionalModel": LlamaBidirectionalModel,
        "LlamaBidirectionalForSequenceClassification":
            LlamaBidirectionalModel,
        "VoyageQwen3BidirectionalEmbedModel":
            VoyageQwen3BidirectionalEmbedModel,
        "CLIPModel": CLIPEmbeddingModel,
        "CLIPEmbeddingModel": CLIPEmbeddingModel,
        "SiglipModel": SiglipEmbeddingModel,
        "SiglipEmbeddingModel": SiglipEmbeddingModel,
    })
