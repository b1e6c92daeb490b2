"""MoE breadth 2: Llama4, PhiMoE, Ernie 4.5 (+MoE), Hunyuan V1
dense/MoE, MiniMax-M2.

Reference: models/{llama4,phimoe,ernie45_moe,hunyuan,minimax_m2}.rs.
All ride the shared grouped-matmul expert path (layers/moe.py) or the
DeepSeek-style biased router (deepseek.py deepseek_moe_ffn).

Round-1 simplifications (documented divergences):
- Llama4 chunked attention (attention_chunk_size) is approximated as a
  sliding window of the same width; the qk l2-norm and
  attn_temperature_tuning of NoPE layers are not applied.
- PhiMoE routes with plain top-2 (inference-time sparsemixer jitter is
  a training regularizer; vLLM also uses deterministic top-2 at
  inference).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.linear import linear
from ..layers.moe import MoESpec, moe_layer
from ..layers.mlp import swiglu_mlp
from ..layers.norm import layer_norm
from .deepseek import deepseek_moe_ffn
from .llama import LlamaForCausalLM
from .qwen3_moe import Qwen3MoeForCausalLM


class Llama4ForCausalLM(Qwen3MoeForCausalLM):
    """Llama 4 Scout/Maverick text model (reference models/llama4.rs):
    - NoPE layers per ``no_rope_layers`` (1 = rope, 0 = global no-rope);
      rope layers attend within ``attention_chunk_size`` (approximated
      by a sliding window here).
    - MoE every ``interleave_moe_layer_step`` layers: top-1 router with
      sigmoid weighting + always-on shared expert; fused gate_up
      checkpoint tensors.
    """

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = False
        config.num_experts = int(ex.get("num_local_experts",
                                        config.num_experts or 16))
        config.num_experts_per_tok = config.num_experts_per_tok or 1
        # shared expert is always present, sized like a routed expert
        config.shared_expert_intermediate_size = (
            config.moe_intermediate_size or config.intermediate_size
        )
        self.interleave = int(ex.get("interleave_moe_layer_step", 1))
        n = config.num_hidden_layers
        no_rope = ex.get("no_rope_layers") or [
            0 if (i + 1) % 4 == 0 else 1 for i in range(n)
        ]
        self.rope_layers = [bool(v) for v in no_rope]
        self.chunk = ex.get("attention_chunk_size", 8192)
        super().__init__(config, dtype)
        self.config.qk_norm = False
        self.moe_spec = MoESpec(
            num_experts=config.num_experts,
            top_k=config.num_experts_per_tok,
            norm_topk_prob=False,
            scoring="sigmoid",  # top-1 weight = sigmoid(selected logit)
            act=config.hidden_act,
            has_shared_expert=True,
        )

    def _make_attn_spec(self, layer_idx: int):
        spec = super()._make_attn_spec(layer_idx)
        if self.rope_layers[layer_idx]:
            # chunked local attention ~ sliding window of the chunk size
            return dataclasses.replace(
                spec, sliding_window=self.chunk, qk_norm=False
            )
        return dataclasses.replace(spec, rotary=None, sliding_window=None,
                                   qk_norm=False)

    def is_moe_layer(self, layer_idx: int) -> bool:
        step = max(1, self.interleave)
        return (layer_idx + 1) % step == 0

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        for lp in params["layers"]:
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
            if "experts" in lp["mlp"]:
                # Llama4 shared expert has no gate scalar
                lp["mlp"].pop("shared_expert_gate", None)
        return params

    def _moe_ffn(self, lp_mlp, h):
        out = moe_layer(
            self.moe_spec,
            {k: v for k, v in lp_mlp.items() if k != "shared_expert"},
            h,
            backend=self.moe_backend,
        )
        return out + swiglu_mlp(h, lp_mlp["shared_expert"], "silu")

    def load_weights(self, weights):
        """Llama4 checkpoints pre-stack experts with fused gate_up:
        feed_forward.experts.gate_up_proj [E, h, 2i] / down_proj [E, i, h]."""

        def conv(stream):
            for name, arr in stream:
                a = np.asarray(arr)
                n2 = name.replace(".feed_forward.", ".mlp.")
                if ".mlp.experts.gate_up_proj" in n2:
                    li = n2.split(".")[2]
                    i = a.shape[-1] // 2
                    pre = f"model.layers.{li}.mlp.experts."
                    yield pre + "gate_proj.stacked", a[..., :i]
                    yield pre + "up_proj.stacked", a[..., i:]
                elif ".mlp.experts.down_proj" in n2 and a.ndim == 3:
                    li = n2.split(".")[2]
                    yield f"model.layers.{li}.mlp.experts.down_proj.stacked", a
                elif ".mlp.router.weight" in n2:
                    yield n2.replace(".router.", ".gate."), a
                else:
                    yield n2, a

        pre_stacked, regular = [], []
        for name, a in conv(weights):
            (pre_stacked if name.endswith(".stacked") else regular).append(
                (name, a)
            )
        params = super().load_weights(iter(regular))
        for name, a in pre_stacked:
            parts = name.split(".")
            li = int(parts[2])
            params["layers"][li]["mlp"]["experts"][parts[-2]] = {
                "weight": jnp.asarray(a, self.dtype)
            }
        return params


class PhiMoEForCausalLM(Qwen3MoeForCausalLM):
    """Microsoft Phi-3.5-MoE (reference models/phimoe.rs): LayerNorm
    with bias, biased q/k/v/o/lm_head, top-2 without renorm."""

    qkv_bias = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = False
        config.norm_topk_prob = False
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 16,
            top_k=config.num_experts_per_tok or 2,
            norm_topk_prob=False,
            act=config.hidden_act,
        )

    def _norm(self, x, w):
        return layer_norm(x, w["weight"], w.get("bias"), 1e-5)

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        h = cfg.hidden_size

        def ln():
            return {"weight": jnp.ones((h,), d), "bias": jnp.zeros((h,), d)}

        for lp in params["layers"]:
            lp["input_layernorm"] = ln()
            lp["post_attention_layernorm"] = ln()
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
            lp["self_attn"]["o_proj"]["bias"] = jnp.zeros((h,), d)
        params["norm"] = ln()
        if "lm_head" in params:
            params["lm_head"]["bias"] = jnp.zeros((cfg.vocab_size,), d)
        return params

    def _norm_final(self, x, params):
        return layer_norm(x, params["norm"]["weight"],
                          params["norm"].get("bias"), 1e-5)

    def __call__(self, params, input_ids, md, kv_pages):
        # identical loop to the base but with dict layernorm params —
        # the base already routes through self._norm; only the final
        # norm needs the dict-aware path
        cfg = self.config
        x = params["embed_tokens"]["weight"][input_ids]
        new_kv = []
        from ..layers.attention import attention_block

        for i, lp in enumerate(params["layers"]):
            residual = x
            h = self._norm(x, lp["input_layernorm"])
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            x = residual + attn_out
            residual = x
            h = self._norm(x, lp["post_attention_layernorm"])
            if "experts" in lp["mlp"]:
                ffn = self._moe_ffn(lp["mlp"], h)
            else:
                ffn = swiglu_mlp(h, lp["mlp"], cfg.hidden_act)
            x = residual + ffn
        return self._norm_final(x, params), new_kv

    def _param_path(self, name: str):
        # layernorms carry biases: route leaf into the dict
        parts = name.removeprefix("model.").split(".")
        if (len(parts) == 4 and parts[0] == "layers"
                and parts[2] in ("input_layernorm", "post_attention_layernorm")):
            return ["layers", int(parts[1]), parts[2], parts[3]], False
        if name in ("model.norm.weight", "model.norm.bias", "norm.weight",
                    "norm.bias"):
            return ["norm", parts[-1]], False
        if name == "lm_head.bias":
            return ["lm_head", "bias"], False
        return super()._param_path(name)


class Ernie4_5ForCausalLM(LlamaForCausalLM):
    """Baidu ERNIE 4.5 dense (reference models/ernie45.rs): Llama-shaped
    with its own config names and GPT-J-style INTERLEAVED rope
    (HF Ernie4_5 rotate_half stacks even/odd pairs; verified vs HF
    numerics)."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        super().__init__(config, dtype)
        import dataclasses

        self.attn_specs = tuple(
            dataclasses.replace(s, interleaved_rope=True)
            for s in self.attn_specs
        )


class Ernie4_5_MoeForCausalLM(Qwen3MoeForCausalLM):
    """ERNIE 4.5 MoE (reference models/ernie45_moe.rs): dense layers up
    to moe_layer_start_index, sigmoid scoring with learnable correction
    bias, optional shared experts."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = False
        config.num_experts = int(ex.get("moe_num_experts",
                                        config.num_experts or 64))
        config.num_experts_per_tok = int(ex.get("moe_k",
                                                config.num_experts_per_tok or 6))
        config.moe_intermediate_size = int(
            ex.get("moe_intermediate_size",
                   config.moe_intermediate_size or config.intermediate_size)
        )
        config.scoring_func = "sigmoid"
        config.norm_topk_prob = True
        self.moe_start = int(ex.get("moe_layer_start_index", 0))
        self.moe_interval = int(ex.get("moe_layer_interval", 1))
        n_shared = int(ex.get("moe_num_shared_experts", 0))
        if n_shared and not config.shared_expert_intermediate_size:
            config.shared_expert_intermediate_size = (
                config.moe_intermediate_size * n_shared
            )
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts,
            top_k=config.num_experts_per_tok,
            norm_topk_prob=True,
            scoring="sigmoid",
            act=config.hidden_act,
            has_shared_expert=bool(n_shared),
        )
        # same interleaved rope as the dense ERNIE (shared HF modeling file)
        import dataclasses

        self.attn_specs = tuple(
            dataclasses.replace(s, interleaved_rope=True)
            for s in self.attn_specs
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        if layer_idx < self.moe_start:
            return False
        return (layer_idx - self.moe_start) % max(1, self.moe_interval) == 0

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg, d = self.config, self.dtype
        e = self.moe_spec.num_experts
        for i, lp in enumerate(params["layers"]):
            if not self.is_moe_layer(i):
                continue
            lp["mlp"]["e_score_correction_bias"] = jnp.zeros((e,), jnp.float32)
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
            if self.moe_spec.has_shared_expert:
                lp["mlp"].pop("shared_expert_gate", None)
        return params

    def _moe_ffn(self, lp_mlp, h):
        return deepseek_moe_ffn(self.config, self.moe_spec, lp_mlp, h)

    def _param_path(self, name: str):
        name = name.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
        if name.endswith(".mlp.moe_statics.e_score_correction_bias"):
            parts = name.split(".")
            return (["layers", int(parts[2]), "mlp", "e_score_correction_bias"],
                    False)
        return super()._param_path(name)


class HunyuanDenseV1ForCausalLM(LlamaForCausalLM):
    """Tencent HunYuan dense V1 (reference models/hunyuan.rs): Llama
    shape with optional per-head q/k RMSNorm (``use_qk_norm``) named
    query_layernorm / key_layernorm in checkpoints."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        config.qk_norm = bool(config.extra.get("use_qk_norm", False))
        super().__init__(config, dtype)

    def _param_path(self, name: str):
        name = name.replace(".self_attn.query_layernorm.", ".self_attn.q_norm_leaf.")
        name = name.replace(".self_attn.key_layernorm.", ".self_attn.k_norm_leaf.")
        parts = name.removeprefix("model.").split(".")
        if len(parts) == 5 and parts[3] in ("q_norm_leaf", "k_norm_leaf"):
            leaf = "q_norm" if parts[3][0] == "q" else "k_norm"
            return ["layers", int(parts[1]), "self_attn", leaf], False
        return super()._param_path(name)


class HunyuanMoEV1ForCausalLM(Qwen3MoeForCausalLM):
    """HunYuan MoE V1 (reference models/hunyuan.rs MoE variant): top-k
    routing with shared experts (use_mixed_mlp_moe), optional qk norm."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = bool(ex.get("use_qk_norm", False))
        topk = ex.get("moe_topk", config.num_experts_per_tok or 2)
        if isinstance(topk, list):
            topk = topk[0]
        config.num_experts_per_tok = int(topk)
        ne = ex.get("num_experts", config.num_experts or 8)
        if isinstance(ne, list):
            ne = ne[0]
        config.num_experts = int(ne)
        if ex.get("use_mixed_mlp_moe", 0):
            ns = ex.get("num_shared_expert", 1)
            if isinstance(ns, list):
                ns = ns[0]
            config.shared_expert_intermediate_size = (
                config.moe_intermediate_size or config.intermediate_size
            ) * int(ns)
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts,
            top_k=config.num_experts_per_tok,
            norm_topk_prob=True,
            act=config.hidden_act,
            has_shared_expert=bool(config.shared_expert_intermediate_size),
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        if self.moe_spec.has_shared_expert:
            for lp in params["layers"]:
                if "experts" in lp["mlp"]:
                    lp["mlp"].pop("shared_expert_gate", None)
        return params

    def _moe_ffn(self, lp_mlp, h):
        out = moe_layer(
            self.moe_spec,
            {k: v for k, v in lp_mlp.items() if k != "shared_expert"}, h,
            backend=self.moe_backend,
        )
        if "shared_expert" in lp_mlp:
            out = out + swiglu_mlp(h, lp_mlp["shared_expert"], "silu")
        return out

    def _param_path(self, name: str):
        name = name.replace(".mlp.shared_mlp.", ".mlp.shared_expert.")
        name = name.replace(".self_attn.query_layernorm.", ".self_attn.qln.")
        name = name.replace(".self_attn.key_layernorm.", ".self_attn.kln.")
        parts = name.removeprefix("model.").split(".")
        if len(parts) == 5 and parts[3] in ("qln", "kln"):
            leaf = "q_norm" if parts[3][0] == "q" else "k_norm"
            return ["layers", int(parts[1]), "self_attn", leaf], False
        return super()._param_path(name)


class MiniMaxM2ForCausalLM(Qwen3MoeForCausalLM):
    """MiniMax-M2 (reference models/minimax_m2.rs): per-head q/k RMSNorm,
    partial rotary (rotary_dim), MoE with sigmoid scoring + e-score
    correction bias."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = bool(ex.get("use_qk_norm", True))
        rd = ex.get("rotary_dim")
        if rd and config.head_dim:
            config.partial_rotary_factor = float(rd) / config.head_dim
        config.num_experts = int(ex.get("num_local_experts",
                                        config.num_experts or 8))
        if ex.get("scoring_func"):
            config.scoring_func = ex["scoring_func"]
        super().__init__(config, dtype)
        self.moe_spec = dataclasses.replace(
            self.moe_spec, scoring=config.scoring_func,
            norm_topk_prob=True,
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        e = self.moe_spec.num_experts
        for lp in params["layers"]:
            if "experts" in lp["mlp"]:
                lp["mlp"]["e_score_correction_bias"] = jnp.zeros(
                    (e,), jnp.float32
                )
        return params

    def _moe_ffn(self, lp_mlp, h):
        return deepseek_moe_ffn(self.config, self.moe_spec, lp_mlp, h)

    def _param_path(self, name: str):
        if name.endswith(".mlp.gate.e_score_correction_bias") or name.endswith(
            ".block_sparse_moe.gate.e_score_correction_bias"
        ):
            parts = name.split(".")
            return (["layers", int(parts[2]), "mlp", "e_score_correction_bias"],
                    False)
        return super()._param_path(name)


class Grok1ForCausalLM(Qwen3MoeForCausalLM):
    """xAI Grok-1 (reference models/grok1.rs): top-2 GELU-activated MoE,
    tanh router-logit softcap (30), four RMSNorms per layer (pre/post
    attention + pre/post MoE), attention-output and embedding/logit
    multipliers."""

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        ex = config.extra
        config.qk_norm = False
        config.hidden_act = "gelu"
        config.num_experts = int(ex.get("num_local_experts",
                                        config.num_experts or 8))
        config.num_experts_per_tok = config.num_experts_per_tok or 2
        super().__init__(config, dtype)
        config.qk_norm = False  # Qwen3Moe base re-enables it
        self.attn_specs = tuple(
            dataclasses.replace(s, qk_norm=False) for s in self.attn_specs
        )
        self.router_softcap = float(ex.get("router_logit_softcapping", 30.0))
        self.attn_out_mult = float(ex.get("attn_output_multiplier", 1.0))
        self.embedding_multiplier = float(
            ex.get("embedding_multiplier_scale", 1.0)
        )
        if ex.get("output_multiplier_scale"):
            config.logits_scaling = 1.0 / float(ex["output_multiplier_scale"])
        self.moe_spec = dataclasses.replace(
            self.moe_spec, act="gelu", norm_topk_prob=True
        )

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        h = self.config.hidden_size
        for lp in params["layers"]:
            lp["self_attn"].pop("q_norm", None)
            lp["self_attn"].pop("k_norm", None)
            lp["post_attn_norm"] = jnp.ones((h,), self.dtype)
            lp["post_moe_norm"] = jnp.ones((h,), self.dtype)
        return params

    def _moe_ffn(self, lp_mlp, h):
        from ..layers.linear import linear as _linear
        from ..layers.moe import _dense_experts, _gmm_experts, route
        from ..utils import on_tpu

        logits = _linear(h, lp_mlp["router"]).astype(jnp.float32)
        cap = self.router_softcap
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        topv, topi = route(self.moe_spec, logits)
        fn = _gmm_experts if on_tpu() else _dense_experts
        return fn(self.moe_spec, lp_mlp, h, topv, topi)

    def __call__(self, params, input_ids, md, kv_pages):
        from ..layers.attention import attention_block
        from ..layers.norm import rms_norm

        cfg = self.config
        eps = cfg.rms_norm_eps
        x = params["embed_tokens"]["weight"][input_ids]
        x = (x.astype(jnp.float32) * self.embedding_multiplier).astype(
            self.dtype
        )
        new_kv = []
        for i, lp in enumerate(params["layers"]):
            residual = x
            h = rms_norm(x, lp["input_layernorm"], eps)
            attn_out, kv = attention_block(
                self.attn_specs[i], lp["self_attn"], h, md, kv_pages[i],
                (params["rope_cos"], params["rope_sin"]),
                attention_backend=self.attention_backend,
            )
            new_kv.append(kv)
            attn_out = rms_norm(attn_out * self.attn_out_mult,
                                lp["post_attn_norm"], eps)
            x = residual + attn_out
            residual = x
            h = rms_norm(x, lp["post_attention_layernorm"], eps)
            ffn = self._moe_ffn(lp["mlp"], h)
            x = residual + rms_norm(ffn, lp["post_moe_norm"], eps)
        x = rms_norm(x, params["norm"], eps)
        return x, new_kv

    def _param_path(self, name: str):
        name = (
            name.replace(".pre_attn_norm.", ".input_layernorm.")
            .replace(".pre_moe_norm.", ".post_attention_layernorm.")
            .replace(".moe_block.gate", ".mlp.router")
        )
        parts = name.removeprefix("model.").split(".")
        if (len(parts) == 4 and parts[0] == "layers"
                and parts[2] in ("post_attn_norm", "post_moe_norm")):
            return ["layers", int(parts[1]), parts[2]], False
        return super()._param_path(name)


def register_moe_breadth2(registry: dict) -> None:
    registry.update(
        {
            "Llama4ForCausalLM": Llama4ForCausalLM,
            "Llama4ForConditionalGeneration": Llama4ForCausalLM,
            "PhiMoEForCausalLM": PhiMoEForCausalLM,
            "Ernie4_5ForCausalLM": Ernie4_5ForCausalLM,
            "Ernie4_5_ForCausalLM": Ernie4_5ForCausalLM,
            "Ernie4_5_MoeForCausalLM": Ernie4_5_MoeForCausalLM,
            "HunYuanDenseV1ForCausalLM": HunyuanDenseV1ForCausalLM,
            "HunyuanDenseV1ForCausalLM": HunyuanDenseV1ForCausalLM,
            "HunYuanMoEV1ForCausalLM": HunyuanMoEV1ForCausalLM,
            "HunyuanMoEV1ForCausalLM": HunyuanMoEV1ForCausalLM,
            "MiniMaxM2ForCausalLM": MiniMaxM2ForCausalLM,
            "Grok1ForCausalLM": Grok1ForCausalLM,
            "Grok1ModelForCausalLM": Grok1ForCausalLM,
        }
    )
