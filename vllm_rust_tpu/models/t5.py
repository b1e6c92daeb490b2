"""T5 text-to-text encoder-decoder.

Reference: crates/core/src/models/t5.rs (the /v1 encoder-decoder text
family alongside Whisper, engine/encoder_decoder.rs). Runs through the
same EncoderDecoderEngine: ``encode`` consumes the encoder prompt's
token ids once per request (relative-position-bias bidirectional
encoder) and returns per-decoder-layer cross K/V; the decoder flows
through the batched step with a bias-aware paged self-attention (the
relative bias is a function of query/key positions, computed in-step —
no bias tensors stored in the cache).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.linear import linear
from ..layers.norm import rms_norm
from ..ops.attn_metadata import AttentionMetadata
from ..ops.kv_write import write_kv_pages
from .whisper import cross_attention


def relative_bucket(
    rel: jax.Array, *, bidirectional: bool, num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """T5 relative-position bucketing (rel = key_pos - query_pos)."""
    n = num_buckets
    base = jnp.zeros_like(rel)
    if bidirectional:
        n = n // 2
        base = (rel > 0).astype(jnp.int32) * n
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return base + jnp.where(is_small, rel, large)


class T5ForConditionalGeneration:
    is_encoder_decoder = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.d_model = int(ex.get("d_model", config.hidden_size))
        self.d_kv = int(ex.get("d_kv", 64))
        self.d_ff = int(ex.get("d_ff", 4 * self.d_model))
        self.enc_layers = int(ex.get("num_layers", config.num_hidden_layers))
        self.dec_layers = int(ex.get("num_decoder_layers", self.enc_layers))
        self.num_heads = int(ex.get("num_heads", config.num_attention_heads))
        self.num_buckets = int(ex.get("relative_attention_num_buckets", 32))
        self.max_distance = int(ex.get("relative_attention_max_distance", 128))
        self.eps = float(ex.get("layer_norm_epsilon", 1e-6))
        proj = ex.get("feed_forward_proj", "relu")
        self.gated = proj.startswith("gated")
        self.act = (
            jax.nn.gelu if "gelu" in proj else jax.nn.relu
        )
        self.tie = bool(ex.get("tie_word_embeddings", config.tie_word_embeddings))
        self.enc_positions = int(ex.get("n_positions", 512))
        self.dec_positions = int(ex.get("n_positions", 512))
        self.kv_scales = None
        self.attention_backend = "auto"

    @property
    def num_layers(self) -> int:
        return self.dec_layers

    @property
    def kv_head_info(self) -> list:
        return [
            {
                "kv": (self.num_heads, self.d_kv),
                "cross": (self.enc_positions, 2 * self.num_heads, self.d_kv),
            }
            for _ in range(self.dec_layers)
        ]

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        dm, inner = self.d_model, self.num_heads * self.d_kv

        n_keys = (self.enc_layers + self.dec_layers) * 12 + 6
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def attn(keys):
            return {
                "q": {"weight": w(next(keys), (dm, inner))},
                "k": {"weight": w(next(keys), (dm, inner))},
                "v": {"weight": w(next(keys), (dm, inner))},
                "o": {"weight": w(next(keys), (inner, dm))},
            }

        def ffn(keys):
            if self.gated:
                return {
                    "wi_0": {"weight": w(next(keys), (dm, self.d_ff))},
                    "wi_1": {"weight": w(next(keys), (dm, self.d_ff))},
                    "wo": {"weight": w(next(keys), (self.d_ff, dm))},
                }
            return {
                "wi": {"weight": w(next(keys), (dm, self.d_ff))},
                "wo": {"weight": w(next(keys), (self.d_ff, dm))},
            }

        def enc_block(keys, first):
            p = {
                "self_attn": attn(keys),
                "norm_sa": jnp.ones((dm,), d),
                "ffn": ffn(keys),
                "norm_ff": jnp.ones((dm,), d),
            }
            if first:
                p["rel_bias"] = w(next(keys), (self.num_buckets, self.num_heads))
            return p

        def dec_block(keys, first):
            p = enc_block(keys, first)
            p["cross_attn"] = attn(keys)
            p["norm_ca"] = jnp.ones((dm,), d)
            return p

        params = {
            "shared": {"weight": w(next(keys), (cfg.vocab_size, dm))},
            "encoder": {
                "layers": [
                    enc_block(keys, i == 0) for i in range(self.enc_layers)
                ],
                "final_norm": jnp.ones((dm,), d),
            },
            "decoder": {
                "layers": [
                    dec_block(keys, i == 0) for i in range(self.dec_layers)
                ],
                "final_norm": jnp.ones((dm,), d),
            },
        }
        if not self.tie:
            params["lm_head"] = {"weight": w(next(keys), (dm, cfg.vocab_size))}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        # HF layer sub-module order: encoder [SelfAttention, FF];
        # decoder [SelfAttention, EncDecAttention, FF]
        for name, arr in weights:
            a = np.asarray(arr)
            if name == "shared.weight" or name.endswith("embed_tokens.weight"):
                params["shared"]["weight"] = jnp.asarray(a, self.dtype)
                continue
            if name == "lm_head.weight":
                if not self.tie:
                    params["lm_head"] = {"weight": jnp.asarray(a.T, self.dtype)}
                continue
            parts = name.split(".")
            side = parts[0]
            if side not in ("encoder", "decoder"):
                continue
            node = params[side]
            if parts[1] == "final_layer_norm":
                node["final_norm"] = jnp.asarray(a, self.dtype)
                continue
            if parts[1] != "block":
                continue
            lp = node["layers"][int(parts[2])]
            sub_i = int(parts[4])  # layer.N
            mod = parts[5]
            is_dec = side == "decoder"
            if mod == "SelfAttention":
                if parts[6] == "relative_attention_bias":
                    lp["rel_bias"] = jnp.asarray(a, self.dtype)
                else:
                    lp["self_attn"][parts[6]] = {
                        "weight": jnp.asarray(a.T, self.dtype)
                    }
            elif mod == "EncDecAttention":
                lp["cross_attn"][parts[6]] = {
                    "weight": jnp.asarray(a.T, self.dtype)
                }
            elif mod == "DenseReluDense":
                lp["ffn"][parts[6]] = {"weight": jnp.asarray(a.T, self.dtype)}
            elif mod == "layer_norm":
                key = ("norm_sa", "norm_ca" if is_dec else "norm_ff", "norm_ff")[
                    sub_i
                ]
                lp[key] = jnp.asarray(a, self.dtype)
        return params

    # -- shared pieces ------------------------------------------------------------

    def _ffn(self, lp, x):
        f = lp["ffn"]
        if self.gated:
            inner = self.act(linear(x, f["wi_0"])) * linear(x, f["wi_1"])
        else:
            inner = self.act(linear(x, f["wi"]))
        return linear(inner, f["wo"])

    def _bias(self, q_pos, k_pos, table, bidirectional):
        """[Tq], [Tk] -> bias [Tq, Tk, H] from the bucket table."""
        rel = k_pos[None, :] - q_pos[:, None]
        bucket = relative_bucket(
            rel,
            bidirectional=bidirectional,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        return table[bucket].astype(jnp.float32)

    # -- encoder -------------------------------------------------------------------

    def encode(self, params, input_ids: jax.Array) -> list[jax.Array]:
        """Encoder prompt ids [T] -> per-decoder-layer cross K/V."""
        enc = params["encoder"]
        ids = jnp.asarray(input_ids, jnp.int32)
        t = ids.shape[0]
        x = params["shared"]["weight"][ids]
        nh, dk = self.num_heads, self.d_kv
        pos = jnp.arange(t, dtype=jnp.int32)
        bias = self._bias(pos, pos, enc["layers"][0]["rel_bias"], True)
        bias = bias.transpose(2, 0, 1)  # [H, T, T]
        for lp in enc["layers"]:
            res = x
            h = rms_norm(x, lp["norm_sa"], self.eps)
            q = linear(h, lp["self_attn"]["q"]).reshape(t, nh, dk)  # scale=1
            k = linear(h, lp["self_attn"]["k"]).reshape(t, nh, dk)
            v = linear(h, lp["self_attn"]["v"]).reshape(t, nh, dk)
            scores = jnp.einsum("ihd,jhd->hij", q.astype(jnp.float32),
                                k.astype(jnp.float32)) + bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v.astype(jnp.float32))
            x = res + linear(ctx.reshape(t, -1).astype(x.dtype),
                             lp["self_attn"]["o"])
            res = x
            h = rms_norm(x, lp["norm_ff"], self.eps)
            x = res + self._ffn(lp, h)
        x = rms_norm(x, enc["final_norm"], self.eps)

        out = []
        for lp in params["decoder"]["layers"]:
            k = linear(x, lp["cross_attn"]["k"]).reshape(t, nh, dk)
            v = linear(x, lp["cross_attn"]["v"]).reshape(t, nh, dk)
            out.append(jnp.concatenate([k, v], axis=1))  # [T, 2nh, dk]
        return out

    # -- decoder self-attention over paged KV with relative bias --------------------

    def _paged_self_attn(self, lp, x, md, kv_page, rel_table):
        t = x.shape[0]
        nh, dk = self.num_heads, self.d_kv
        q = linear(x, lp["self_attn"]["q"]).reshape(t, nh, dk)
        k = linear(x, lp["self_attn"]["k"]).reshape(t, nh, dk)
        v = linear(x, lp["self_attn"]["v"]).reshape(t, nh, dk)
        kv_page = write_kv_pages(kv_page, k, v, md.slot_mapping)

        s, p = md.page_indices.shape
        ps = kv_page.shape[1]
        kv = kv_page[md.page_indices].reshape(s, p * ps, 2 * nh, dk)
        # pool layout interleaves K/V per head (ops/kv_write.py)
        ks = kv[:, :, 0::2].astype(jnp.float32)  # [S, L, H, D]
        vs = kv[:, :, 1::2].astype(jnp.float32)

        tok_idx = jnp.arange(t, dtype=jnp.int32)
        seq_of = jnp.clip(
            jnp.searchsorted(md.cu_q_lens, tok_idx, side="right") - 1, 0, s - 1
        )
        scores = jnp.einsum(
            "thd,tlhd->thl", q.astype(jnp.float32), ks[seq_of]
        )  # [T, H, L]
        key_pos = jnp.arange(p * ps, dtype=jnp.int32)
        rel = key_pos[None, :] - md.positions[:, None]  # [T, L]
        bucket = relative_bucket(
            rel, bidirectional=False, num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        bias = rel_table[bucket].astype(jnp.float32)  # [T, L, H]
        scores = scores + bias.transpose(0, 2, 1)
        mask = (key_pos[None, :] <= md.positions[:, None]) & (
            key_pos[None, :] < md.kv_lens[seq_of][:, None]
        )
        scores = jnp.where(mask[:, None, :], scores, -1e10)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("thl,tlhd->thd", probs, vs[seq_of])
        out = linear(
            ctx.reshape(t, nh * dk).astype(x.dtype), lp["self_attn"]["o"]
        )
        return out, kv_page

    # -- ModelForward ----------------------------------------------------------------

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        dec = params["decoder"]
        x = params["shared"]["weight"][input_ids]
        rel_table = dec["layers"][0]["rel_bias"]
        new_states = []
        for lp in dec["layers"]:
            st = states[len(new_states)]
            res = x
            h = rms_norm(x, lp["norm_sa"], self.eps)
            attn_out, kv = self._paged_self_attn(lp, h, md, st["kv"], rel_table)
            x = res + attn_out
            res = x
            h = rms_norm(x, lp["norm_ca"], self.eps)
            x = res + cross_attention(
                {"q_proj": lp["cross_attn"]["q"], "out_proj": lp["cross_attn"]["o"]},
                h,
                md,
                st["cross"],
                self.num_heads,
                st["enc_len"],
                scale=1.0,
            )
            res = x
            h = rms_norm(x, lp["norm_ff"], self.eps)
            x = res + self._ffn(lp, h)
            new_states.append(
                {"kv": kv, "cross": st["cross"], "enc_len": st["enc_len"]}
            )
        x = rms_norm(x, dec["final_norm"], self.eps)
        return x, new_states

    def compute_logits(self, params, hidden):
        if self.tie:
            # tied head scales hidden by d_model^-0.5 (HF T5)
            h = hidden * (self.d_model**-0.5)
            return (h @ params["shared"]["weight"].T).astype(jnp.float32)
        return linear(hidden, params["lm_head"]).astype(jnp.float32)
