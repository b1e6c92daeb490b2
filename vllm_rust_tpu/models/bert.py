"""BERT-family encoders: embeddings, cross-encoder scoring, classification.

Reference: crates/core/src/models/{bert,roberta,bert_embedding,
reranker}.rs — encoder-only models used by the embeddings/score/rerank/
classify endpoints. TPU design: one-shot bidirectional encode over a
flattened, bucketed token batch (no KV cache, no scheduler entry —
mirrors the reference's embed bypass path, strategy.rs run_embed_
blocking); segment masking keeps multiple inputs independent inside one
jitted call.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


class BertModel:
    """Bidirectional encoder (reference models/bert.rs). Works for BERT
    and RoBERTa (``position_offset`` knob)."""

    position_offset = 0  # RoBERTa: padding_idx + 1 = 2

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.num_labels = int(ex.get("num_labels", len(ex.get("id2label", {})) or 1))
        self.type_vocab_size = int(ex.get("type_vocab_size", 2))
        self.eps = float(ex.get("layer_norm_eps", 1e-12))
        self.act = ex.get("hidden_act", "gelu")

    # encoder models have no KV cache
    @property
    def kv_head_info(self) -> list:
        return []

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size
        inter = cfg.intermediate_size

        n_keys = cfg.num_hidden_layers * 6 + 5
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout):
            return {"weight": w(key, (din, dout)), "bias": jnp.zeros((dout,), d)}

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        layers = []
        for _ in range(cfg.num_hidden_layers):
            layers.append(
                {
                    "query": dense(next(keys), h, h),
                    "key": dense(next(keys), h, h),
                    "value": dense(next(keys), h, h),
                    "attn_out": dense(next(keys), h, h),
                    "attn_ln": ln(),
                    "intermediate": dense(next(keys), h, inter),
                    "output": dense(next(keys), inter, h),
                    "out_ln": ln(),
                }
            )
        params = {
            "word_embeddings": w(next(keys), (cfg.vocab_size, h)),
            "position_embeddings": w(
                next(keys), (cfg.max_position_embeddings, h)
            ),
            "token_type_embeddings": w(next(keys), (self.type_vocab_size, h)),
            "emb_ln": ln(),
            "layers": layers,
            "pooler": dense(next(keys), h, h),
        }
        if self.num_labels:
            params["classifier"] = dense(next(keys), h, self.num_labels)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        has_classifier = False
        for name, arr in weights:
            name = name.removeprefix("bert.").removeprefix("roberta.")
            a = np.asarray(arr)

            def put(node, leaf, transpose=False):
                node[leaf] = jnp.asarray(a.T if transpose else a, self.dtype)

            if name.startswith("embeddings."):
                rest = name.split(".", 1)[1]
                if rest == "word_embeddings.weight":
                    params["word_embeddings"] = jnp.asarray(a, self.dtype)
                elif rest == "position_embeddings.weight":
                    params["position_embeddings"] = jnp.asarray(a, self.dtype)
                elif rest == "token_type_embeddings.weight":
                    params["token_type_embeddings"] = jnp.asarray(a, self.dtype)
                elif rest.startswith("LayerNorm."):
                    put(params["emb_ln"], rest.split(".")[1])
            elif name.startswith("encoder.layer."):
                parts = name.split(".")
                lp = params["layers"][int(parts[2])]
                sub = ".".join(parts[3:])
                leaf = parts[-1]  # weight | bias
                if sub.startswith("attention.self."):
                    put(lp[parts[5]], leaf, transpose=leaf == "weight")
                elif sub.startswith("attention.output.dense"):
                    put(lp["attn_out"], leaf, transpose=leaf == "weight")
                elif sub.startswith("attention.output.LayerNorm"):
                    put(lp["attn_ln"], leaf)
                elif sub.startswith("intermediate.dense"):
                    put(lp["intermediate"], leaf, transpose=leaf == "weight")
                elif sub.startswith("output.dense"):
                    put(lp["output"], leaf, transpose=leaf == "weight")
                elif sub.startswith("output.LayerNorm"):
                    put(lp["out_ln"], leaf)
            elif name.startswith("pooler.dense."):
                put(params["pooler"], name.split(".")[-1],
                    transpose=name.endswith("weight"))
            elif name.startswith("classifier."):
                # cross-encoder / classification head. RoBERTa's head
                # (classifier.dense -> tanh -> classifier.out_proj) has the
                # same structure as BERT's pooler -> classifier, so map
                # dense->pooler and out_proj->classifier.
                has_classifier = True
                parts = name.split(".")
                leaf = parts[-1]
                if parts[1] == "dense":
                    put(params["pooler"], leaf, transpose=leaf == "weight")
                elif parts[1] == "out_proj":
                    put(params["classifier"], leaf, transpose=leaf == "weight")
                else:
                    put(params["classifier"], leaf, transpose=leaf == "weight")
        if not has_classifier:
            params.pop("classifier", None)
        return params

    # -- forward ---------------------------------------------------------------

    def encode(
        self,
        params,
        input_ids: jax.Array,  # [T]
        token_type_ids: jax.Array,  # [T]
        cu_lens: jax.Array,  # [S+1]
    ) -> jax.Array:
        """Bidirectional encode of a flattened segment batch -> [T, H]."""
        cfg = self.config
        t = input_ids.shape[0]
        s = cu_lens.shape[0] - 1
        tok_idx = jnp.arange(t, dtype=jnp.int32)
        seq_of = jnp.clip(
            jnp.searchsorted(cu_lens, tok_idx, side="right") - 1, 0, s - 1
        )
        local = tok_idx - cu_lens[seq_of]
        real = tok_idx < cu_lens[s]

        x = (
            params["word_embeddings"][input_ids]
            + params["position_embeddings"][local + self.position_offset]
            + params["token_type_embeddings"][token_type_ids]
        )
        x = _layer_norm(x, params["emb_ln"], self.eps)

        nh = cfg.num_attention_heads
        hd = cfg.hidden_size // nh
        # same-segment bidirectional mask
        mask = (seq_of[:, None] == seq_of[None, :]) & real[:, None] & real[None, :]
        bias = jnp.where(mask, 0.0, -1e10)

        act = jax.nn.gelu if self.act.startswith("gelu") else jax.nn.relu
        for lp in params["layers"]:
            q = _dense(x, lp["query"]).reshape(t, nh, hd)
            k = _dense(x, lp["key"]).reshape(t, nh, hd)
            v = _dense(x, lp["value"]).reshape(t, nh, hd)
            scores = jnp.einsum("ihd,jhd->hij", q, k) * (hd**-0.5)
            probs = jax.nn.softmax(scores + bias[None], axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v).reshape(t, -1)
            x = _layer_norm(
                x + _dense(ctx, lp["attn_out"]), lp["attn_ln"], self.eps
            )
            inner = act(_dense(x, lp["intermediate"]))
            x = _layer_norm(
                x + _dense(inner, lp["output"]), lp["out_ln"], self.eps
            )
        return x

    def pool(self, params, hidden, cu_lens, pooling: str = "cls"):
        """[T, H] -> [S, H] pooled."""
        s = cu_lens.shape[0] - 1
        if pooling == "cls":
            emb = hidden[cu_lens[:-1]]
        elif pooling == "pooler":
            emb = jnp.tanh(_dense(hidden[cu_lens[:-1]], params["pooler"]))
        elif pooling == "mean":
            t = hidden.shape[0]
            tok_idx = jnp.arange(t, dtype=jnp.int32)
            seq_of = jnp.clip(
                jnp.searchsorted(cu_lens, tok_idx, side="right") - 1, 0, s - 1
            )
            valid = tok_idx < cu_lens[s]
            hsum = jnp.zeros((s, hidden.shape[1]), jnp.float32).at[seq_of].add(
                jnp.where(valid[:, None], hidden.astype(jnp.float32), 0.0)
            )
            lens = jnp.maximum(cu_lens[1:] - cu_lens[:-1], 1).astype(jnp.float32)
            emb = hsum / lens[:, None]
        elif pooling == "last":
            emb = hidden[jnp.maximum(cu_lens[1:] - 1, 0)]
        else:
            raise ValueError(f"unknown pooling {pooling}")
        return emb.astype(jnp.float32)

    def classify_logits(self, params, hidden, cu_lens):
        """Sequence-classification head over the CLS position -> [S, L]
        (cross-encoder scoring / classify endpoints)."""
        pooled = jnp.tanh(_dense(hidden[cu_lens[:-1]], params["pooler"]))
        return _dense(pooled, params["classifier"]).astype(jnp.float32)


class RobertaModel(BertModel):
    position_offset = 2  # padding_idx (1) + 1


class BertForSequenceClassification(BertModel):
    """Cross-encoder (reranker) / classifier (reference reranker.rs)."""


class RobertaForSequenceClassification(RobertaModel):
    pass
