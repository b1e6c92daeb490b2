"""Gemma-4: MoE + PLE + sliding/global attention + KV-cache sharing.

Reference: crates/core/src/models/gemma4.rs (2512 LoC) — the family
quirks, each mirrored here:
  - Standard (plain ``w*x``) RMSNorm, NOT the Gemma-2/3 (1+w) variant
    (gemma4.rs:40-56).
  - Attention scale = 1.0 — the per-head Q/K RMSNorms carry the
    magnitude (gemma4.rs:10, finalize_attention "scaling=1.0").
  - Per-head weighted q_norm/k_norm + UNWEIGHTED v_norm
    (gemma4.rs:1015-1030).
  - Sliding/full layer pattern: ``layer_types`` from the config, else
    ``i % sliding_window_pattern == 0`` → sliding (gemma4.rs:251-265,
    459-467 — note the reference's modulo convention differs from
    Gemma-3's ``(i+1) % p == 0 → full``).
  - Dual RoPE: sliding layers use a plain table at
    ``rope_parameters.sliding_attention.rope_theta`` (fallback
    ``rope_local_base_freq``); full layers use the "proportional"
    rope — inv_freq exponent denominator is the FULL head_dim while
    only ``head_dim * partial_rotary_factor`` dims rotate
    (layers/rotary.rs:110-175 new_gemma4_proportional).
  - Heterogeneous geometry: full-attention layers may use
    ``global_head_dim`` / ``num_global_key_value_heads`` distinct from
    the sliding layers' (gemma4.rs:473-500). On TPU each layer owns its
    own KV pool array, so no pad-to-shared-stride dance
    (gemma4.rs pad_last_dim/pad_kv_heads) is needed.
  - KV sharing: the last ``num_kv_shared_layers`` layers have NO
    k/v_proj — they compute Q only and read K/V from the most recent
    non-shared layer of the same attention type (gemma4.rs:423-457,
    920-1100). Shared layers may carry a double-wide MLP
    (``use_double_wide_mlp``, gemma4.rs:511-521).
  - 4-norm residual pattern: input_ln → attn → post_attention_ln →
    +residual; pre_ff_ln → GeGLU MLP (gelu_erf) → post_ff_ln →
    +residual (gemma4.rs:1595-1645).
  - Optional MoE block PARALLEL to the dense MLP:
    ffn = pf_ln1(mlp(h)) + pf_ln2(moe(pre_ff2(residual))), router
    input is the raw residual (gemma4.rs:1567-1591). Router =
    unweighted RMSNorm → *hidden^-0.5 → *learned scale vector → gate
    proj; routing = top-k on raw logits, softmax over ALL experts,
    renormalize over the selected, fold ``per_expert_scale``
    (gemma4.rs:587-795). Experts are GeGLU (gelu_erf).
  - PLE (per-layer embeddings): model-level
    ``embed_tokens_per_layer`` [vocab_pl, L*P] * sqrt(P) +
    per-layer-normed projection of the embedding stream * H^-0.5,
    summed and scaled by 1/sqrt(2) (gemma4.rs:1860-1915); per layer,
    gate = gelu_tanh(per_layer_input_gate(h)), h +=
    post_per_layer_input_norm(per_layer_projection(gate * pli))
    (gemma4.rs:1545-1565).
  - Per-layer ``layer_scalar`` multiplier buffer (default 1.0)
    (gemma4.rs:1524-1528).
  - Embedding * sqrt(hidden); attn/final logit softcaps; untied
    lm_head lives at the checkpoint root (gemma4.rs:1802-1836).
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.attention import AttentionSpec, attention_block
from ..layers.linear import linear
from ..layers.norm import rms_norm
from ..layers.rotary import RotarySpec, apply_rope, compute_rope_tables
from ..ops.paged_attention import ragged_paged_attention_op
from .llama import LlamaForCausalLM


def _unweighted_rms(x, eps):
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    ).astype(x.dtype)


class _Gemma4Extra:
    """Parsed ``extra`` knobs (reference Gemma4ExtraConfig,
    gemma4.rs:150-370)."""

    def __init__(self, cfg: ModelConfig):
        ex = cfg.extra
        self.sliding_window_pattern = int(ex.get("sliding_window_pattern", 2) or 0)
        rp = ex.get("rope_parameters") or {}
        rp_full = rp.get("full_attention") or {}
        rp_sliding = rp.get("sliding_attention") or {}
        self.rope_theta_local = float(
            rp_sliding.get("rope_theta")
            or ex.get("rope_local_base_freq")
            or cfg.rope_theta
        )
        self.rope_theta_full = float(rp_full.get("rope_theta") or cfg.rope_theta)
        self.partial_rotary_factor_full = float(
            rp_full.get("partial_rotary_factor", 1.0)
        )
        self.rope_type_full = str(rp_full.get("rope_type", "proportional"))
        lt = cfg.layer_types
        if lt is None:
            p = self.sliding_window_pattern
            lt = [
                "sliding_attention" if (p > 0 and i % p == 0) else "full_attention"
                for i in range(cfg.num_hidden_layers)
            ]
        self.layer_types = list(lt)
        self.global_head_dim = ex.get("global_head_dim")
        self.num_global_key_value_heads = ex.get("num_global_key_value_heads")
        self.num_kv_shared_layers = int(ex.get("num_kv_shared_layers", 0) or 0)
        self.use_double_wide_mlp = bool(ex.get("use_double_wide_mlp", False))
        self.attn_logit_softcap = ex.get("attn_logit_softcapping")
        self.final_logit_softcap = ex.get("final_logit_softcapping")
        # MoE
        self.enable_moe_block = bool(ex.get("enable_moe_block", False))
        self.num_experts = int(ex.get("num_experts", 0) or 0)
        self.top_k_experts = int(ex.get("top_k_experts", 1) or 1)
        self.moe_intermediate_size = int(
            ex.get("moe_intermediate_size")
            or ex.get("expert_intermediate_size")
            or cfg.intermediate_size
        )
        # PLE
        self.ple_dim = int(ex.get("hidden_size_per_layer_input", 0) or 0)
        self.ple_vocab = int(
            ex.get("vocab_size_per_layer_input", 0) or cfg.vocab_size
        )
        self._n = cfg.num_hidden_layers

    def is_sliding(self, i: int) -> bool:
        return self.layer_types[i] == "sliding_attention"

    def head_dim(self, i: int, default: int) -> int:
        if not self.is_sliding(i) and self.global_head_dim:
            return int(self.global_head_dim)
        return default

    def kv_heads(self, i: int, default: int) -> int:
        if not self.is_sliding(i) and self.num_global_key_value_heads:
            return int(self.num_global_key_value_heads)
        return default

    def share_target(self, i: int) -> int | None:
        """KV-sharing target: most recent non-shared layer of the same
        attention type (gemma4.rs:423-457 kv_sharing_target_layer)."""
        if self.num_kv_shared_layers == 0:
            return None
        first_shared = max(0, self._n - self.num_kv_shared_layers)
        if i < first_shared:
            return None
        want = self.layer_types[i]
        for c in range(first_shared - 1, -1, -1):
            if self.layer_types[c] == want:
                return c
        return None

    def layer_intermediate(self, i: int, base: int) -> int:
        first_shared = max(0, self._n - self.num_kv_shared_layers)
        if self.use_double_wide_mlp and self.num_kv_shared_layers and i >= first_shared:
            return base * 2
        return base


class Gemma4ForCausalLM(LlamaForCausalLM):
    """Gemma-4 text backbone (reference models/gemma4.rs)."""

    supports_pp = False  # PLE stream crosses every stage boundary

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.g4 = _Gemma4Extra(config)
        if self.g4.attn_logit_softcap:
            config.attn_logit_softcapping = float(self.g4.attn_logit_softcap)
        if self.g4.final_logit_softcap:
            config.final_logit_softcapping = float(self.g4.final_logit_softcap)
        config.qk_norm = True
        config.layer_types = self.g4.layer_types
        super().__init__(config, dtype)
        self.embedding_multiplier = math.sqrt(config.hidden_size)
        # layer -> pool index (KV-shared layers own no pool)
        self._pool_of: list[int | None] = []
        self._share: list[int | None] = []
        n_pools = 0
        for i in range(config.num_hidden_layers):
            tgt = self.g4.share_target(i)
            self._share.append(tgt)
            if tgt is None:
                self._pool_of.append(n_pools)
                n_pools += 1
            else:
                self._pool_of.append(None)

    def _make_attn_spec(self, layer_idx: int) -> AttentionSpec:
        cfg = self.config
        g4 = self.g4
        hd = g4.head_dim(layer_idx, cfg.head_dim)
        sliding = g4.is_sliding(layer_idx)
        if sliding:
            rotary = RotarySpec(
                head_dim=hd,
                rotary_dim=hd,
                max_position=cfg.max_position_embeddings,
                base=g4.rope_theta_local,
                scaling=None,
            )
        else:
            rd = int(hd * g4.partial_rotary_factor_full)
            rotary = RotarySpec(
                head_dim=hd,
                rotary_dim=rd - (rd % 2),
                max_position=cfg.max_position_embeddings,
                base=g4.rope_theta_full,
                scaling=None,
            )
        return AttentionSpec(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=g4.kv_heads(layer_idx, cfg.num_key_value_heads),
            head_dim=hd,
            rotary=rotary,
            sm_scale=1.0,  # q/k norms carry the magnitude (gemma4.rs:10)
            qk_norm=True,
            rms_eps=cfg.rms_norm_eps,
            sliding_window=cfg.sliding_window if sliding else None,
            soft_cap=(
                float(g4.attn_logit_softcap) if g4.attn_logit_softcap else None
            ),
            v_norm_unweighted=True,
        )

    # -- KV geometry ---------------------------------------------------------

    @property
    def kv_head_info(self):
        """One pool per NON-SHARED layer (shared layers read the target's
        pool; no allocation — reference KvLayerSpec.shares_with)."""
        return [
            (s.num_kv_heads, s.head_dim)
            for i, s in enumerate(self.attn_specs)
            if self._share[i] is None
        ]

    # -- params --------------------------------------------------------------

    def init_params(self, rng=None, scale: float = 0.02):
        cfg = self.config
        g4 = self.g4
        d = self.dtype
        h = cfg.hidden_size
        counter = [0]

        def w(shape):
            if rng is None:
                return jnp.zeros(shape, d)
            counter[0] += 1
            return (
                scale
                * jax.random.normal(
                    jax.random.fold_in(rng, counter[0]), shape, jnp.float32
                )
            ).astype(d)

        layers = []
        for i in range(cfg.num_hidden_layers):
            spec = self.attn_specs[i]
            hd, nkv = spec.head_dim, spec.num_kv_heads
            inter = g4.layer_intermediate(i, cfg.intermediate_size)
            shared = self._share[i] is not None
            attn = {
                "q_proj": {"weight": w((h, cfg.num_attention_heads * hd))},
                "o_proj": {"weight": w((cfg.num_attention_heads * hd, h))},
                "q_norm": jnp.ones((hd,), d),
            }
            if not shared:
                attn["k_proj"] = {"weight": w((h, nkv * hd))}
                attn["v_proj"] = {"weight": w((h, nkv * hd))}
                attn["k_norm"] = jnp.ones((hd,), d)
            lp = {
                "self_attn": attn,
                "input_layernorm": jnp.ones((h,), d),
                "post_attention_layernorm": jnp.ones((h,), d),
                "pre_feedforward_layernorm": jnp.ones((h,), d),
                "post_feedforward_layernorm": jnp.ones((h,), d),
                "mlp": {
                    "gate_proj": {"weight": w((h, inter))},
                    "up_proj": {"weight": w((h, inter))},
                    "down_proj": {"weight": w((inter, h))},
                },
                "layer_scalar": jnp.ones((1,), jnp.float32),
            }
            if g4.enable_moe_block and g4.num_experts > 0:
                mi = g4.moe_intermediate_size
                lp["moe"] = {
                    "router": {
                        "scale": jnp.ones((h,), d),
                        "proj": {"weight": w((h, g4.num_experts))},
                    },
                    "per_expert_scale": jnp.ones((g4.num_experts,), d),
                    # stacked expert weights [E, in, out]
                    "gate_proj": w((g4.num_experts, h, mi)),
                    "up_proj": w((g4.num_experts, h, mi)),
                    "down_proj": w((g4.num_experts, mi, h)),
                }
                lp["post_feedforward_layernorm_1"] = jnp.ones((h,), d)
                lp["post_feedforward_layernorm_2"] = jnp.ones((h,), d)
                lp["pre_feedforward_layernorm_2"] = jnp.ones((h,), d)
            if g4.ple_dim:
                lp["per_layer_input_gate"] = {"weight": w((h, g4.ple_dim))}
                lp["per_layer_projection"] = {"weight": w((g4.ple_dim, h))}
                lp["post_per_layer_input_norm"] = jnp.ones((h,), d)
            layers.append(lp)

        params = {
            "embed_tokens": {"weight": w((cfg.vocab_size, h))},
            "layers": layers,
            "norm": jnp.ones((h,), d),
        }
        if g4.ple_dim:
            n = cfg.num_hidden_layers
            params["embed_tokens_per_layer"] = {
                "weight": w((g4.ple_vocab, n * g4.ple_dim))
            }
            params["per_layer_model_projection"] = {
                "weight": w((h, n * g4.ple_dim))
            }
            params["per_layer_projection_norm"] = jnp.ones((g4.ple_dim,), d)
        if not cfg.tie_word_embeddings:
            params["lm_head"] = {"weight": w((h, cfg.vocab_size))}
        # dual rope tables; proportional full table computed here since
        # its inv_freq denominator is head_dim, not rotary_dim
        # (rotary.rs:128-175)
        sl_spec = next(
            (s for i, s in enumerate(self.attn_specs) if self.g4.is_sliding(i)),
            self.attn_specs[0],
        )
        cos, sin = compute_rope_tables(sl_spec.rotary, cfg.max_position_embeddings)
        params["rope_cos"] = cos
        params["rope_sin"] = sin
        fl = next(
            (
                (i, s)
                for i, s in enumerate(self.attn_specs)
                if not self.g4.is_sliding(i)
            ),
            None,
        )
        if fl is not None:
            _, fs = fl
            hd, rd = fs.head_dim, fs.rotary.rotary_dim
            inv = 1.0 / (
                self.g4.rope_theta_full
                ** (np.arange(0, rd, 2, dtype=np.float64) / hd)
            )
            t = np.arange(cfg.max_position_embeddings, dtype=np.float64)
            freqs = np.outer(t, inv)
            params["rope_cos_full"] = jnp.asarray(np.cos(freqs), jnp.float32)
            params["rope_sin_full"] = jnp.asarray(np.sin(freqs), jnp.float32)
        return params

    def rope_tables_for_layer(self, params: dict, layer_idx: int):
        if not self.g4.is_sliding(layer_idx) and "rope_cos_full" in params:
            return (params["rope_cos_full"], params["rope_sin_full"])
        return (params["rope_cos"], params["rope_sin"])

    # HF checkpoint routing ---------------------------------------------------

    def _param_path(self, name: str):
        name = name.removeprefix("model.")
        if name == "embed_tokens_per_layer.weight":
            return ["embed_tokens_per_layer", "weight"], False
        if name == "per_layer_model_projection.weight":
            return ["per_layer_model_projection", "weight"], True
        if name == "per_layer_projection_norm.weight":
            return ["per_layer_projection_norm"], False
        parts = name.split(".")
        if parts[0] == "layers" and len(parts) >= 3:
            idx = int(parts[1])
            rest = parts[2:]
            if rest[0] == "layer_scalar":
                return ["layers", idx, "layer_scalar"], False
            if rest[0] == "moe":
                if rest[1] == "router":
                    if rest[2] == "scale":
                        return ["layers", idx, "moe", "router", "scale"], False
                    return (
                        ["layers", idx, "moe", "router", "proj", "weight"],
                        True,
                    )
                if rest[1] == "per_expert_scale":
                    return ["layers", idx, "moe", "per_expert_scale"], False
                return None  # per-expert weights handled in load_weights
            if rest[0] in ("per_layer_input_gate", "per_layer_projection"):
                return ["layers", idx, rest[0], "weight"], True
            if rest[0] == "post_per_layer_input_norm":
                return ["layers", idx, rest[0]], False
        return super()._param_path("model." + name)

    def load_weights(self, weights):
        expert_w: dict[tuple[int, int, str], np.ndarray] = {}
        rest = []
        for name, arr in weights:
            n = name.removeprefix("model.")
            parts = n.split(".")
            if (
                len(parts) >= 6
                and parts[0] == "layers"
                and parts[2] == "moe"
                and parts[3] == "experts"
            ):
                expert_w[(int(parts[1]), int(parts[4]), parts[5])] = np.asarray(
                    arr
                )
            else:
                rest.append((name, arr))
        params = super().load_weights(rest)
        for (li, ei, proj), a in expert_w.items():
            params["layers"][li]["moe"][proj] = (
                params["layers"][li]["moe"][proj]
                .at[ei]
                .set(jnp.asarray(a.T, self.dtype))
            )
        return params

    # -- forward -------------------------------------------------------------

    def _moe(self, mp: dict, x: jax.Array, router_input: jax.Array) -> jax.Array:
        """Gemma-4 MoE: topk on raw logits → softmax over all →
        renormalize → fold per_expert_scale (gemma4.rs:729-795). Dense
        all-expert dispatch — experts are few and tiny relative to the
        MXU tile; production sparse paths live in layers/moe.py."""
        g4 = self.g4
        rn = _unweighted_rms(router_input, self.config.rms_norm_eps)
        rn = rn * (self.config.hidden_size**-0.5)
        rn = rn * mp["router"]["scale"]
        logits = linear(rn, mp["router"]["proj"]).astype(jnp.float32)  # [T,E]
        topv, topi = jax.lax.top_k(logits, g4.top_k_experts)
        probs = jax.nn.softmax(logits, axis=-1)  # over ALL experts
        sel = jnp.take_along_axis(probs, topi, axis=-1)  # [T,K]
        sel = sel / jnp.maximum(sel.sum(-1, keepdims=True), 1e-9)
        scales = mp["per_expert_scale"].astype(jnp.float32)[topi]  # [T,K]
        wts = (sel * scales).astype(x.dtype)
        # dense per-expert GeGLU, weighted scatter-sum over top-k
        gate = jnp.einsum("th,ehi->eti", x, mp["gate_proj"])
        up = jnp.einsum("th,ehi->eti", x, mp["up_proj"])
        act = jax.nn.gelu(gate, approximate=False) * up
        outs = jnp.einsum("eti,eih->eth", act, mp["down_proj"])  # [E,T,H]
        onehot = jax.nn.one_hot(topi, g4.num_experts, dtype=x.dtype)  # [T,K,E]
        mix = jnp.einsum("tke,tk->te", onehot, wts)  # [T,E]
        return jnp.einsum("eth,te->th", outs, mix)

    def _ple_inputs(self, params: dict, input_ids, hidden):
        """Model-level per-layer inputs (gemma4.rs:1860-1915)."""
        g4 = self.g4
        n, p = self.config.num_hidden_layers, g4.ple_dim
        ids = jnp.minimum(input_ids, g4.ple_vocab - 1)
        emb = params["embed_tokens_per_layer"]["weight"][ids] * math.sqrt(p)
        emb = emb.reshape(-1, n, p)
        proj = linear(hidden, params["per_layer_model_projection"]) * (
            self.config.hidden_size**-0.5
        )
        proj = proj.reshape(-1, n, p)
        proj = rms_norm(
            proj, params["per_layer_projection_norm"], self.config.rms_norm_eps
        )
        return ((proj + emb) * (2.0**-0.5)).astype(hidden.dtype)

    def _shared_attention(self, spec, ap, x, md, kv_page, rope_tables):
        """Q-only attention for KV-shared layers: no k/v proj, no cache
        write — read the target layer's (already updated) pool
        (gemma4.rs:1040-1075)."""
        t = x.shape[0]
        h, d = spec.num_heads, spec.head_dim
        q = linear(x, ap["q_proj"]).reshape(t, h, d)
        q = rms_norm(q, ap["q_norm"], spec.rms_eps)
        cos, sin = rope_tables
        q, _ = apply_rope(
            q, q, md.positions, cos, sin, rotary_dim=spec.rotary.rotary_dim
        )
        ks, vs = self.kv_scales if self.kv_scales else (None, None)
        out = ragged_paged_attention_op(
            q,
            kv_page,
            md,
            None,
            None,
            sm_scale=spec.sm_scale,
            sliding_window=spec.sliding_window,
            soft_cap=spec.soft_cap,
            k_scale=ks,
            v_scale=vs,
            backend=self.attention_backend,
        )
        return linear(out.reshape(t, h * d), ap["o_proj"])

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        cfg = self.config
        eps = cfg.rms_norm_eps
        x = self.embed(params, input_ids, embeds)
        pli = (
            self._ple_inputs(params, input_ids, x) if self.g4.ple_dim else None
        )
        new_kv: list = [None] * len(kv_pages)
        ks, vs = self.kv_scales if self.kv_scales else (None, None)
        for i, lp in enumerate(params["layers"]):
            spec = self.attn_specs[i]
            rope_tables = self.rope_tables_for_layer(params, i)
            residual = x
            h = rms_norm(x, lp["input_layernorm"], eps)
            tgt = self._share[i]
            if tgt is None:
                pool = self._pool_of[i]
                attn_out, kv = attention_block(
                    spec,
                    lp["self_attn"],
                    h,
                    md,
                    kv_pages[pool],
                    rope_tables,
                    attention_backend=self.attention_backend,
                    k_scale=ks,
                    v_scale=vs,
                )
                new_kv[pool] = kv
            else:
                pool = self._pool_of[tgt]
                attn_out = self._shared_attention(
                    spec, lp["self_attn"], h, md, new_kv[pool], rope_tables
                )
            h = rms_norm(attn_out, lp["post_attention_layernorm"], eps)
            x = residual + h

            residual = x
            h = rms_norm(x, lp["pre_feedforward_layernorm"], eps)
            gate = linear(h, lp["mlp"]["gate_proj"])
            up = linear(h, lp["mlp"]["up_proj"])
            mlp_out = linear(
                jax.nn.gelu(gate, approximate=False) * up, lp["mlp"]["down_proj"]
            )
            if "moe" in lp:
                h1 = rms_norm(mlp_out, lp["post_feedforward_layernorm_1"], eps)
                h2 = rms_norm(residual, lp["pre_feedforward_layernorm_2"], eps)
                h2 = self._moe(lp["moe"], h2, residual)
                h2 = rms_norm(h2, lp["post_feedforward_layernorm_2"], eps)
                ffn = h1 + h2
            else:
                ffn = mlp_out
            h = rms_norm(ffn, lp["post_feedforward_layernorm"], eps)
            x = residual + h

            if pli is not None and "per_layer_input_gate" in lp:
                g = linear(x, lp["per_layer_input_gate"])
                g = jax.nn.gelu(g, approximate=True)
                contrib = linear(g * pli[:, i], lp["per_layer_projection"])
                contrib = rms_norm(
                    contrib, lp["post_per_layer_input_norm"], eps
                )
                x = x + contrib
            x = (x.astype(jnp.float32) * lp["layer_scalar"]).astype(self.dtype)

        x = rms_norm(x, params["norm"], eps)
        return x, new_kv


class Gemma4VLM:
    """Gemma-4 conditional generation: vision tower → Linear +
    unweighted RMSNorm projector → Gemma4 LM (reference gemma4_vlm.rs —
    "simpler than Gemma3: just Linear + unweighted RMSNorm").

    Round-1 divergence (documented): the reference builds a bespoke
    Gemma4VisionTower with vision RoPE + clippable linears
    (gemma4_vision.rs); we reuse the SigLIP tower — same patch/encoder
    topology, standard position embeddings.
    """

    is_multimodal = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        from .vision import SiglipVisionTower, _dense

        self._dense = _dense
        self.config = config
        self.dtype = dtype
        ex = config.extra
        text_cfg = dict(ex.get("text_config", {}))
        text_cfg.setdefault("architectures", ["Gemma4ForCausalLM"])
        self.text_config = ModelConfig.from_dict(text_cfg)
        self.lm = Gemma4ForCausalLM(self.text_config, dtype=dtype)
        self.vision = SiglipVisionTower(
            dict(ex.get("vision_config", {})), dtype=dtype
        )
        self.image_token_index = int(
            ex.get("image_token_id") or ex.get("image_token_index") or 262144
        )
        self.tokens_per_image = int(
            ex.get("mm_tokens_per_image") or self.vision.num_patches
        )

    # text proxies (same contract as vlm_breadth.VlmBase)
    @property
    def kv_head_info(self):
        return self.lm.kv_head_info

    @property
    def num_layers(self):
        return self.lm.num_layers

    @property
    def kv_scales(self):
        return self.lm.kv_scales

    @kv_scales.setter
    def kv_scales(self, v):
        self.lm.kv_scales = v

    @property
    def attention_backend(self):
        return self.lm.attention_backend

    @attention_backend.setter
    def attention_backend(self, v):
        self.lm.attention_backend = v

    def __call__(self, params, input_ids, md, kv_pages, embeds=None):
        return self.lm(
            params["language_model"], input_ids, md, kv_pages, embeds=embeds
        )

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params["language_model"], hidden)

    def init_params(self, rng=None, scale: float = 0.02):
        r1 = r2 = r3 = None
        if rng is not None:
            r1, r2, r3 = jax.random.split(rng, 3)
        vh, th = self.vision.hidden_size, self.text_config.hidden_size
        proj = {
            "embedding_projection": {
                "weight": (
                    jnp.zeros((vh, th), self.dtype)
                    if r3 is None
                    else (
                        scale * jax.random.normal(r3, (vh, th), jnp.float32)
                    ).astype(self.dtype)
                )
            }
        }
        return {
            "language_model": self.lm.init_params(r1, scale),
            "vision_tower": self.vision.init_params(r2, scale),
            "projector": proj,
        }

    def load_weights(self, weights):
        lm_s, vis_s, proj = [], [], {}
        for name, arr in weights:
            if name.startswith(("language_model.", "model.language_model.")):
                lm_s.append(
                    ("model." + name.split("language_model.", 1)[1], arr)
                )
            elif name.startswith("lm_head."):
                lm_s.append((name, arr))
            elif "vision_tower." in name:
                vis_s.append((name.split("vision_tower.", 1)[1], arr))
            elif "embed_vision.embedding_projection.weight" in name:
                proj["embedding_projection"] = {
                    "weight": jnp.asarray(np.asarray(arr).T, self.dtype)
                }
        out = {
            "language_model": self.lm.load_weights(lm_s),
            "vision_tower": self.vision.load_weights(vis_s),
            "projector": proj
            or {
                "embedding_projection": {
                    "weight": jnp.zeros(
                        (self.vision.hidden_size, self.text_config.hidden_size),
                        self.dtype,
                    )
                }
            },
        }
        return out

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision(params["vision_tower"], pixel_values)
        x = self._dense(feats, params["projector"]["embedding_projection"])
        x = _unweighted_rms(x, self.text_config.rms_norm_eps)
        return x.reshape(-1, x.shape[-1])


def register_gemma4(registry: dict):
    def _text(config, **kw):
        return Gemma4ForCausalLM(config, **kw)

    def _cond(config, **kw):
        if "vision_config" in config.extra:
            return Gemma4VLM(config, **kw)
        return Gemma4ForCausalLM(config, **kw)

    registry["Gemma4ForCausalLM"] = _text
    registry["Gemma4TextModel"] = _text
    registry["Gemma4UnifiedTextModel"] = _text
    registry["Gemma4ForConditionalGeneration"] = _cond
    registry["Gemma4UnifiedForConditionalGeneration"] = _cond
