"""Whisper: speech-to-text encoder-decoder.

Reference: crates/core/src/models/whisper.rs + engine/encoder_decoder.rs
(the /v1/audio endpoints' model). TPU design: the audio encoder runs
ONCE per request as a standalone jitted call whose per-decoder-layer
cross K/V projections are scattered into a per-slot device buffer; the
decoder then runs through the ordinary continuous-batching step —
causal self-attention over paged KV plus cross-attention reads from the
slot-indexed buffer (no re-encoding, no per-step host transfer of
encoder state).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..ops.attn_metadata import AttentionMetadata

def _gelu_exact(x):
    """HF ACT2FN["gelu"] (erf form) — Whisper's activation; jax.nn.gelu
    defaults to the tanh approximation, which breaks exact parity."""
    import jax.nn
    return jax.nn.gelu(x, approximate=False)



def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]).astype(
        x.dtype
    )


def cross_attention(
    params: dict,
    x: jax.Array,  # [T, H]
    md: AttentionMetadata,
    cross_buf: jax.Array,  # [num_slots+1, enc_len, 2*nh, hd]
    num_heads: int,
    enc_lens: jax.Array | None = None,  # [num_slots+1] valid encoder length
    *,
    scale: float | None = None,
    out_key: str = "out_proj",
) -> jax.Array:
    """Slot-indexed encoder-decoder attention. Encoder K/V were projected
    at encode time; every decoder token gathers its slot's buffer."""
    t, hdim = x.shape
    nh = num_heads
    hd = cross_buf.shape[-1]
    num_slots = cross_buf.shape[0] - 1
    s = md.kv_lens.shape[0]
    tok_idx = jnp.arange(t, dtype=jnp.int32)
    seq_of = jnp.clip(
        jnp.searchsorted(md.cu_q_lens, tok_idx, side="right") - 1, 0, s - 1
    )
    real = tok_idx < md.cu_q_lens[s]
    slot = jnp.where(real, md.slot_ids[seq_of], num_slots)

    if scale is None:
        scale = hd**-0.5
    q = linear(x, params["q_proj"]).reshape(t, nh, hd) * scale
    kv = cross_buf[slot]  # [T, enc, 2*nh, hd]
    k = kv[:, :, :nh, :]
    v = kv[:, :, nh:, :]
    scores = jnp.einsum("thd,tehd->the", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if enc_lens is not None:
        e_idx = jnp.arange(kv.shape[1], dtype=jnp.int32)
        mask = e_idx[None, None, :] < enc_lens[slot][:, None, None]
        scores = jnp.where(mask, scores, -1e10)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("the,tehd->thd", probs, v.astype(jnp.float32))
    return linear(ctx.reshape(t, nh * hd).astype(x.dtype), params[out_key])


class WhisperForConditionalGeneration:
    is_encoder_decoder = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        ex = config.extra
        self.d_model = int(ex.get("d_model", config.hidden_size))
        self.enc_layers = int(ex.get("encoder_layers", 4))
        self.dec_layers = int(
            ex.get("decoder_layers", config.num_hidden_layers)
        )
        self.enc_heads = int(ex.get("encoder_attention_heads", 4))
        self.dec_heads = int(ex.get("decoder_attention_heads", 4))
        self.n_mels = int(ex.get("num_mel_bins", 80))
        self.enc_positions = int(ex.get("max_source_positions", 1500))
        self.dec_positions = int(ex.get("max_target_positions", 448))
        self.ffn_dim = int(
            ex.get("decoder_ffn_dim", ex.get("encoder_ffn_dim", 4 * self.d_model))
        )
        self.head_dim = self.d_model // self.dec_heads
        self.attn_spec = AttentionSpec(
            num_heads=self.dec_heads,
            num_kv_heads=self.dec_heads,
            head_dim=self.head_dim,
            rotary=None,
            sm_scale=self.head_dim**-0.5,
        )
        self.kv_scales = None
        self.attention_backend = "auto"

    @property
    def num_layers(self) -> int:
        return self.dec_layers

    @property
    def kv_head_info(self) -> list:
        return [
            {
                "kv": (self.dec_heads, self.head_dim),
                "cross": (self.enc_positions, 2 * self.dec_heads, self.head_dim),
            }
            for _ in range(self.dec_layers)
        ]

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        dm, ffn = self.d_model, self.ffn_dim

        n_keys = (self.enc_layers + self.dec_layers) * 12 + 8
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def dense(key, din, dout, bias=True):
            p = {"weight": w(key, (din, dout))}
            if bias:
                p["bias"] = jnp.zeros((dout,), d)
            return p

        def ln():
            return {"weight": jnp.ones((dm,), d), "bias": jnp.zeros((dm,), d)}

        def attn(keys):
            return {
                "q_proj": dense(next(keys), dm, dm),
                "k_proj": dense(next(keys), dm, dm, bias=False),
                "v_proj": dense(next(keys), dm, dm),
                "out_proj": dense(next(keys), dm, dm),
            }

        def block(keys, cross):
            p = {
                "self_attn": attn(keys),
                "self_attn_layer_norm": ln(),
                "fc1": dense(next(keys), dm, ffn),
                "fc2": dense(next(keys), ffn, dm),
                "final_layer_norm": ln(),
            }
            if cross:
                p["encoder_attn"] = attn(keys)
                p["encoder_attn_layer_norm"] = ln()
            return p

        params = {
            "encoder": {
                "conv1": {"weight": w(next(keys), (3, self.n_mels, dm)),
                          "bias": jnp.zeros((dm,), d)},
                "conv2": {"weight": w(next(keys), (3, dm, dm)),
                          "bias": jnp.zeros((dm,), d)},
                "embed_positions": _sinusoids(self.enc_positions, dm).astype(d),
                "layers": [block(keys, False) for _ in range(self.enc_layers)],
                "layer_norm": ln(),
            },
            "decoder": {
                "embed_tokens": {"weight": w(next(keys), (cfg.vocab_size, dm))},
                "embed_positions": w(next(keys), (self.dec_positions, dm)),
                "layers": [block(keys, True) for _ in range(self.dec_layers)],
                "layer_norm": ln(),
            },
        }
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("model.")
            if name.startswith("proj_out"):
                continue  # tied to decoder embed_tokens
            a = np.asarray(arr)
            parts = name.split(".")
            side = parts[0]  # encoder | decoder
            if side not in ("encoder", "decoder"):
                continue
            node = params[side]
            rest = parts[1:]
            if rest[0] in ("conv1", "conv2"):
                if rest[1] == "weight":  # HF conv1d [out, in, k] -> [k, in, out]
                    node[rest[0]]["weight"] = jnp.asarray(
                        a.transpose(2, 1, 0), self.dtype
                    )
                else:
                    node[rest[0]]["bias"] = jnp.asarray(a, self.dtype)
            elif rest[0] == "embed_positions":
                node["embed_positions"] = jnp.asarray(a, self.dtype)
            elif rest[0] == "embed_tokens":
                node["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif rest[0] == "layer_norm":
                node["layer_norm"][rest[1]] = jnp.asarray(a, self.dtype)
            elif rest[0] == "layers":
                lp = node["layers"][int(rest[1])]
                sub = rest[2]
                if sub in ("self_attn", "encoder_attn"):
                    leaf = rest[4]
                    lp[sub][rest[3]][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                elif sub in ("fc1", "fc2"):
                    leaf = rest[3]
                    lp[sub][leaf] = jnp.asarray(
                        a.T if leaf == "weight" else a, self.dtype
                    )
                else:  # layer norms
                    lp[sub][rest[3]] = jnp.asarray(a, self.dtype)
        return params

    # -- encoder ---------------------------------------------------------------

    def encode(self, params, mel: jax.Array) -> list[jax.Array]:
        """mel [n_mels, 3000] -> per-decoder-layer cross K/V
        [enc_len, 2*nh, hd] ready to scatter into the slot buffer."""
        return self.cross_kv(params, self.encode_hidden(params, mel))

    def encode_hidden(self, params, mel: jax.Array) -> jax.Array:
        """Audio encoder: mel [n_mels, 3000] -> hidden [enc_len, d]."""
        enc = params["encoder"]
        x = mel.T.astype(self.dtype)  # [T, n_mels]
        x = _gelu_exact(_conv1d(x, enc["conv1"], stride=1))
        x = _gelu_exact(_conv1d(x, enc["conv2"], stride=2))  # [1500, dm]
        x = x + enc["embed_positions"][: x.shape[0]]
        nh, hd = self.enc_heads, self.d_model // self.enc_heads
        t = x.shape[0]
        for lp in enc["layers"]:
            res = x
            h = _layer_norm(x, lp["self_attn_layer_norm"])
            q = linear(h, lp["self_attn"]["q_proj"]).reshape(t, nh, hd) * (
                hd**-0.5
            )
            k = linear(h, lp["self_attn"]["k_proj"]).reshape(t, nh, hd)
            v = linear(h, lp["self_attn"]["v_proj"]).reshape(t, nh, hd)
            scores = jnp.einsum("ihd,jhd->hij", q.astype(jnp.float32),
                                k.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hij,jhd->ihd", probs, v.astype(jnp.float32))
            x = res + linear(
                ctx.reshape(t, -1).astype(x.dtype), lp["self_attn"]["out_proj"]
            )
            res = x
            h = _layer_norm(x, lp["final_layer_norm"])
            x = res + linear(_gelu_exact(linear(h, lp["fc1"])), lp["fc2"])
        return _layer_norm(x, params["encoder"]["layer_norm"])

    def cross_kv(self, params, enc_hidden: jax.Array) -> list[jax.Array]:
        t = enc_hidden.shape[0]
        out = []
        nh_d, hd_d = self.dec_heads, self.head_dim
        for lp in params["decoder"]["layers"]:
            k = linear(enc_hidden, lp["encoder_attn"]["k_proj"]).reshape(
                t, nh_d, hd_d
            )
            v = linear(enc_hidden, lp["encoder_attn"]["v_proj"]).reshape(
                t, nh_d, hd_d
            )
            out.append(jnp.concatenate([k, v], axis=1))  # [T, 2nh, hd]
        return out

    # -- decoder (ModelForward interface) ---------------------------------------

    def __call__(self, params, input_ids, md: AttentionMetadata, states):
        dec = params["decoder"]
        x = dec["embed_tokens"]["weight"][input_ids]
        pos = jnp.clip(md.positions, 0, self.dec_positions - 1)
        x = x + dec["embed_positions"][pos]
        new_states = []
        for i, lp in enumerate(dec["layers"]):
            st = states[i]
            res = x
            h = _layer_norm(x, lp["self_attn_layer_norm"])
            attn_out, kv = attention_block(
                self.attn_spec,
                {
                    "q_proj": lp["self_attn"]["q_proj"],
                    "k_proj": lp["self_attn"]["k_proj"],
                    "v_proj": lp["self_attn"]["v_proj"],
                    "o_proj": lp["self_attn"]["out_proj"],
                },
                h,
                md,
                st["kv"],
                None,
                attention_backend=self.attention_backend,
            )
            x = res + attn_out
            res = x
            h = _layer_norm(x, lp["encoder_attn_layer_norm"])
            x = res + cross_attention(
                lp["encoder_attn"], h, md, st["cross"], self.dec_heads,
                st["enc_len"],
            )
            res = x
            h = _layer_norm(x, lp["final_layer_norm"])
            x = res + linear(_gelu_exact(linear(h, lp["fc1"])), lp["fc2"])
            new_states.append(
                {"kv": kv, "cross": st["cross"], "enc_len": st["enc_len"]}
            )
        x = _layer_norm(x, dec["layer_norm"])
        return x, new_states

    def compute_logits(self, params, hidden):
        return (
            hidden @ params["decoder"]["embed_tokens"]["weight"].T
        ).astype(jnp.float32)


def _conv1d(x: jax.Array, p: dict, stride: int) -> jax.Array:
    """x [T, Cin], weight [K, Cin, Cout], 'same' padding.

    Implemented as shifted-view matmuls rather than lax.conv: on CPU the
    XLA conv routes through oneDNN with ~3e-4 f32 noise (breaks
    HF-parity anchors), and on TPU a K=3 conv is just 3 MXU matmuls
    anyway."""
    w = p["weight"]
    k, cin, cout = w.shape
    pad = k // 2
    t = x.shape[0]
    xp = jnp.pad(x, ((pad, pad), (0, 0)))
    out_t = (t + 2 * pad - k) // stride + 1
    y = jnp.zeros((out_t, cout), jnp.float32)
    for j in range(k):
        xs = jax.lax.slice(xp, (j, 0), (j + (out_t - 1) * stride + 1, cin),
                           (stride, 1))
        # HIGHEST: the CPU backend's default-precision dot takes the
        # avx512-bf16 fast path (~4e-4 error) — enough to flip greedy
        # HF-parity anchors
        y = y + jnp.dot(
            xs.astype(jnp.float32), w[j].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    return (y + p["bias"]).astype(x.dtype)


def _sinusoids(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1), jnp.float32
    )
