"""EAGLE / MTP proposers: hidden-conditioned autoregressive draft modules.

Reference: spec_decode/eagle.rs (407) + eagle1_proposer.rs (350) and
mtp_proposer.rs (535) — a small decoder stack that consumes (target
hidden state at position t, token t+1) and predicts the token at t+2,
chaining on its OWN output feature for subsequent draft positions.
EAGLE-1 combines inputs with a single fc over the concatenation; MTP
(DeepSeek-style) RMS-norms each half before the projection.

TPU design — fully in-step, self-healing KV:
- The draft module runs INSIDE the jitted verification step
  (SpecStepFunction): a "window pass" re-encodes this step's window from
  the target's just-computed hidden states (writing the draft KV through
  the target's OWN slot mapping), then K-1 unrolled single-token rounds
  chain the draft forward. Next-step drafts ride the packed fetch.
- Because every window is re-encoded from real target hiddens, draft KV
  entries poisoned by rejected speculation are overwritten the moment
  the target advances past them — no rollback accounting, and
  preemption/recompute heals automatically (the re-prefill windows
  rewrite everything).
- The draft shares the target's embedding (and lm_head unless the
  checkpoint carries its own), exactly as EAGLE-1/MTP checkpoints do.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..kv_cache.manager import KVCacheManager
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..layers.mlp import swiglu_mlp
from ..layers.norm import rms_norm
from ..layers.rotary import compute_rope_tables
from ..request import Sequence


class EagleProposer:
    """EAGLE-1 style proposer (style="eagle"); MtpProposer subclasses with
    the DeepSeek MTP input conditioning (style="mtp")."""

    style = "eagle"
    # EAGLE-1 skips the first decoder layer's input_layernorm (the fc
    # output is already a projection of normed target features)
    first_input_norm = False
    final_norm = False

    def __init__(
        self,
        config: ModelConfig,
        num_draft_tokens: int = 4,
        dtype: Any = jnp.bfloat16,
    ):
        self.config = config
        self.dtype = dtype
        self.max_draft_tokens = num_draft_tokens
        self.attn_specs = tuple(
            AttentionSpec.from_model_config(config, i)
            for i in range(config.num_hidden_layers)
        )
        self.device_params: dict | None = None
        self._pending: dict[str, list[int]] = {}
        self.page_size: int | None = None
        self.kv_pages: list[jax.Array] | None = None

    # engine integration markers
    @property
    def device_aux(self):
        return self

    @property
    def kv_head_info(self) -> list[tuple[int, int]]:
        return [(s.num_kv_heads, s.head_dim) for s in self.attn_specs]

    def bind(self, engine) -> None:
        kvm = KVCacheManager(engine.config.cache, self.kv_head_info)
        self.kv_pages = kvm.create_device_pools(self.dtype)
        self.page_size = engine.config.cache.page_size

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h, hd = cfg.hidden_size, cfg.head_dim
        nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        inter = cfg.intermediate_size

        n_keys = cfg.num_hidden_layers * 7 + 2
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        def lin(key, din, dout):
            return {"weight": w(key, (din, dout))}

        layers = []
        for _ in range(cfg.num_hidden_layers):
            layers.append(
                {
                    "input_layernorm": jnp.ones((h,), d),
                    "post_attention_layernorm": jnp.ones((h,), d),
                    "self_attn": {
                        "q_proj": lin(next(keys), h, nh * hd),
                        "k_proj": lin(next(keys), h, nkv * hd),
                        "v_proj": lin(next(keys), h, nkv * hd),
                        "o_proj": lin(next(keys), nh * hd, h),
                    },
                    "mlp": {
                        "gate_proj": lin(next(keys), h, inter),
                        "up_proj": lin(next(keys), h, inter),
                        "down_proj": lin(next(keys), inter, h),
                    },
                }
            )
        params: dict = {"layers": layers}
        if self.style == "mtp":
            params["enorm"] = jnp.ones((h,), d)
            params["hnorm"] = jnp.ones((h,), d)
            params["eh_proj"] = lin(next(keys), 2 * h, h)
        else:
            params["fc"] = lin(next(keys), 2 * h, h)
        if self.final_norm:
            params["norm"] = jnp.ones((h,), d)
        cos, sin = compute_rope_tables(
            self.attn_specs[0].rotary, cfg.max_position_embeddings
        )
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        self.device_params = params
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """EAGLE-1 checkpoints: fc.weight, layers.{i}.*, optional
        embed_tokens/lm_head. MTP: enorm/hnorm/eh_proj + one decoder layer
        (names stripped of any `model.`/`model.layers.{N}.` prefix)."""
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("model.")
            parts = name.split(".")
            # MTP checkpoints nest under the layer index past the backbone
            if parts[0] == "layers" and len(parts) > 2 and parts[2] in (
                "enorm", "hnorm", "eh_proj", "shared_head"
            ):
                parts = parts[2:]
            a = np.asarray(arr)
            key = ".".join(parts)
            if key in ("fc.weight", "eh_proj.weight"):
                params[parts[0]] = {"weight": jnp.asarray(a.T, self.dtype)}
            elif key == "fc.bias":
                params["fc"]["bias"] = jnp.asarray(a, self.dtype)
            elif key in ("enorm.weight", "hnorm.weight", "norm.weight",
                         "shared_head.norm.weight"):
                params[parts[0] if parts[0] != "shared_head" else "norm"] = (
                    jnp.asarray(a, self.dtype)
                )
            elif key in ("lm_head.weight", "shared_head.head.weight"):
                params["lm_head"] = {"weight": jnp.asarray(a.T, self.dtype)}
            elif parts[0] == "layers":
                idx = int(parts[1])
                if idx >= len(params["layers"]):
                    continue
                lp = params["layers"][idx]
                rest = parts[2:]
                node = lp
                for p in rest[:-2]:
                    node = node[p]
                if rest[-1] == "weight" and rest[-2].endswith("_proj"):
                    node[rest[-2]]["weight"] = jnp.asarray(a.T, self.dtype)
                elif rest[-1] == "weight":
                    lp[".".join(rest[:-1])] = jnp.asarray(a, self.dtype)
        self.device_params = params
        return params

    # -- device-side draft module ----------------------------------------------

    def _combine(self, params, target_params, ids, feats):
        emb = target_params["embed_tokens"]["weight"][ids]
        feats = feats.astype(emb.dtype)
        if self.style == "mtp":
            e = rms_norm(emb, params["enorm"], self.config.rms_norm_eps)
            f = rms_norm(feats, params["hnorm"], self.config.rms_norm_eps)
            return linear(jnp.concatenate([e, f], axis=-1), params["eh_proj"])
        return linear(jnp.concatenate([emb, feats], axis=-1), params["fc"])

    def _backbone(self, params, x, md, kv_pages):
        eps = self.config.rms_norm_eps
        rope = (params["rope_cos"], params["rope_sin"])
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = (
                x
                if (i == 0 and not self.first_input_norm)
                else rms_norm(x, lp["input_layernorm"], eps)
            )
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i], rope
            )
            new_kv.append(kv)
            x = residual + attn_out
            residual = x
            h = rms_norm(x, lp["post_attention_layernorm"], eps)
            x = residual + swiglu_mlp(h, lp["mlp"], self.config.hidden_act)
        return x, new_kv

    def _predict(self, params, target_params, h):
        if self.final_norm:
            h = rms_norm(h, params["norm"], self.config.rms_norm_eps)
        if "lm_head" in params:
            logits = linear(h, params["lm_head"])
        elif "lm_head" in target_params:
            logits = linear(h, target_params["lm_head"])
        else:
            logits = h @ target_params["embed_tokens"]["weight"].T
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), h

    def device_run(
        self,
        params,
        target_params,
        kv_pages,
        hidden: jax.Array,  # [T, H] target hiddens for this window
        input_ids: jax.Array,  # [T]
        md,  # AttentionMetadata (the target step's)
        last_emitted: jax.Array,  # [S] last emitted token per row
        acc_idx: jax.Array,  # [S] window index of the last emitted position
        gather_idx: jax.Array,  # [S, K1]
    ) -> tuple[list, jax.Array]:
        """Window pass + K-round propose chain. Returns (kv_pages,
        next-step drafts [S, K])."""
        from ..ops.attn_metadata import AttentionMetadata

        t = input_ids.shape[0]
        s = acc_idx.shape[0]
        ps = self.page_size
        k = self.max_draft_tokens

        # -- window pass: entry at position p consumes (h_p, token_{p+1});
        # the next-token stream is the inputs shifted left, with each
        # row's LAST EMITTED position taking the freshly emitted token
        # (on early rejection that is the correction sample, not the last
        # window slot — entries past it are garbage and get rewritten by
        # the propose chain below / the next step's window)
        rows = jnp.arange(s)
        sel = gather_idx[rows, acc_idx]  # flat index of last emitted pos
        tok_idx = jnp.arange(t, dtype=jnp.int32)
        seq_of = jnp.clip(
            jnp.searchsorted(md.cu_q_lens, tok_idx, side="right") - 1, 0, s - 1
        )
        shifted = jnp.concatenate([input_ids[1:], input_ids[:1]])
        is_last = tok_idx == sel[seq_of]
        tok_next = jnp.where(is_last, last_emitted[seq_of], shifted)

        x = self._combine(params, target_params, tok_next, hidden)
        h_e, kv_pages = self._backbone(params, x, md, kv_pages)

        h_cur = h_e[sel]  # [S, H] predicted feature of the emitted token
        pos_last = md.positions[sel]  # absolute position of the last entry
        real = md.kv_lens > 0

        draft, h_cur = self._predict(params, target_params, h_cur)
        drafts = [draft]
        p_width = md.page_indices.shape[1]
        cu = jnp.minimum(jnp.arange(s + 1, dtype=jnp.int32), md.num_seqs[0])
        for r in range(1, k):
            pos = pos_last + r  # entry index this round
            page = pos // ps
            slot = jnp.where(
                real & (page < p_width),
                md.page_indices[rows, jnp.minimum(page, p_width - 1)] * ps
                + pos % ps,
                0,
            )
            step_md = AttentionMetadata(
                slot_mapping=slot,
                kv_lens=jnp.where(real, pos_last + r + 1, 0),
                page_indices=md.page_indices,
                cu_q_lens=cu,
                num_seqs=md.num_seqs,
                positions=jnp.where(real, pos, 0),
                logits_indices=jnp.arange(s, dtype=jnp.int32),
            )
            x = self._combine(params, target_params, draft, h_cur)
            h_e, kv_pages = self._backbone(params, x, step_md, kv_pages)
            draft, h_cur = self._predict(params, target_params, h_e)
            drafts.append(draft)
        return kv_pages, jnp.stack(drafts, axis=1)  # [S, K]

    # -- host-side proposer protocol -------------------------------------------

    def propose(self, seq: Sequence) -> list[int]:
        return self._pending.get(seq.request_id, [])

    def store(self, seq: Sequence, drafts: list[int]) -> None:
        self._pending[seq.request_id] = drafts

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass

    def on_preempt(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)

    def on_request_complete(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)


class MtpProposer(EagleProposer):
    """DeepSeek multi-token-prediction module (reference mtp_proposer.rs +
    gemma4_mtp.rs execution strategy): RMS-normed embed/feature halves,
    eh_proj combine, shared lm_head, final norm before the head."""

    style = "mtp"
    first_input_norm = True
    final_norm = True


class Eagle3Proposer(EagleProposer):
    """EAGLE-3 (reference eagle3_proposer.rs + models/eagle3.rs): the
    draft conditions on MULTI-LAYER target features — residual-stream
    captures from 3 target layers, concatenated [T, 3H] and projected by
    fc — and its single decoder layer attends over the CONCAT of the
    normed token embedding and the normed feature ([T, 2H] qkv input).
    The draft may use a reduced vocabulary with a d2t offset table
    (target_id = draft_id + d2t[draft_id]). Chaining uses the pre-final-
    norm hidden state (reference: "chains the prenorm hidden states").
    """

    style = "eagle3"
    final_norm = True
    wants_aux_hiddens = True

    def __init__(
        self,
        config: ModelConfig,
        num_draft_tokens: int = 4,
        dtype: Any = jnp.bfloat16,
        draft_vocab_size: int | None = None,
    ):
        config.num_hidden_layers = 1
        super().__init__(config, num_draft_tokens, dtype)
        self.draft_vocab_size = draft_vocab_size or config.vocab_size
        # the single layer's qkv projections read the [emb, feat] concat
        self._qkv_in = 2 * config.hidden_size

    def aux_layer_ids(self, num_target_layers: int) -> tuple[int, ...]:
        """Default capture points (low / mid / high residual stream).
        Always exactly 3 (repeats for tiny targets) — the fc is 3H wide."""
        n = num_target_layers
        return (
            min(1, n - 1),
            max(0, n // 2 - 1),
            max(0, n - 4),
        )

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        cfg = self.config
        d = self.dtype
        h = cfg.hidden_size
        params = super().init_params(rng, scale)

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            return (
                scale * jax.random.normal(jax.random.PRNGKey(3), shape)
            ).astype(d)

        # fc projects the 3-layer target feature concat; the layer's qkv
        # reads 2H (embedding ++ feature)
        params["fc"] = {"weight": w((3 * h, h))}
        lp = params["layers"][0]
        lp["hidden_norm"] = jnp.ones((h,), d)
        nh, nkv, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )
        lp["self_attn"]["q_proj"] = {"weight": w((2 * h, nh * hd))}
        lp["self_attn"]["k_proj"] = {"weight": w((2 * h, nkv * hd))}
        lp["self_attn"]["v_proj"] = {"weight": w((2 * h, nkv * hd))}
        params["embed_tokens"] = {"weight": w((cfg.vocab_size, h))}
        params["lm_head"] = {"weight": w((h, self.draft_vocab_size))}
        # d2t: draft-vocab -> target-vocab id offset (zeros = identity)
        params["d2t"] = jnp.zeros((self.draft_vocab_size,), jnp.int32)
        self.device_params = params
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """EAGLE-3 checkpoints: fc.weight [H, 3H], midlayer.* (one decoder
        layer, hidden_norm + input_layernorm), norm, lm_head over the
        draft vocab, d2t/t2d mapping tables, own embed_tokens."""
        params = self.init_params(rng=None)
        lp = params["layers"][0]
        for name, arr in weights:
            name = name.removeprefix("model.")
            name = name.replace("midlayer.", "layers.0.").replace(
                "layers.0.0.", "layers.0."
            )
            a = np.asarray(arr)
            if name == "fc.weight":
                params["fc"] = {"weight": jnp.asarray(a.T, self.dtype)}
            elif name == "d2t":
                params["d2t"] = jnp.asarray(a, jnp.int32)
            elif name == "t2d":
                continue  # only needed for training-time target mapping
            elif name == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, self.dtype)
            elif name == "lm_head.weight":
                params["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(a, self.dtype)
            elif name.startswith("layers.0."):
                rest = name.split(".")[2:]
                if rest[-1] == "weight" and rest[-2].endswith("_proj"):
                    node = lp
                    for p in rest[:-2]:
                        node = node[p]
                    node[rest[-2]]["weight"] = jnp.asarray(a.T, self.dtype)
                elif rest[-1] == "weight":
                    lp[".".join(rest[:-1])] = jnp.asarray(a, self.dtype)
        self.device_params = params
        return params

    def _combine(self, params, target_params, ids, feats):
        feats = feats.astype(self.dtype)
        if feats.shape[-1] == 3 * self.config.hidden_size:
            feats = linear(feats, params["fc"])  # window pass: project aux
        emb = params["embed_tokens"]["weight"][ids]
        # backbone layer 0 consumes the (embedding, feature) pair
        return (emb, feats)

    def _backbone(self, params, x, md, kv_pages):
        emb, hid = x
        eps = self.config.rms_norm_eps
        rope = (params["rope_cos"], params["rope_sin"])
        lp = params["layers"][0]
        residual = hid
        e = rms_norm(emb, lp["input_layernorm"], eps)
        hn = rms_norm(hid, lp["hidden_norm"], eps)
        attn_in = jnp.concatenate([e, hn], axis=-1)  # [T, 2H]
        attn_out, kv = attention_block(
            self.attn_specs[0], lp["self_attn"], attn_in, md, kv_pages[0], rope
        )
        h2 = residual + attn_out
        residual = h2
        h3 = rms_norm(h2, lp["post_attention_layernorm"], eps)
        out = residual + swiglu_mlp(h3, lp["mlp"], self.config.hidden_act)
        # prenorm output is both the chain state and the predict input
        return out, [kv]

    def _predict(self, params, target_params, h):
        hn = rms_norm(h, params["norm"], self.config.rms_norm_eps)
        logits = linear(hn, params["lm_head"])
        draft_local = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # draft vocab -> target vocab
        draft = draft_local + params["d2t"][draft_local]
        return draft, h  # chain on the PRENORM feature
