"""GPT-OSS (OpenAI open-weight MoE family, 20B/120B).

Reference: models/gpt_oss.rs + moe/ (MXFP4 path via mxfp4.rs). Quirks:
  - attention sinks: per-layer learned [num_heads] logits that join the
    softmax denominator (ops/paged_attention.py sinks support; the
    in-house decode kernel handles them natively)
  - alternating sliding/full attention from config.layer_types
  - qkv/o biases; YaRN rope; head_dim 64
  - MoE every layer: top-4 of 32/128 experts, softmax AFTER top-k,
    clamped swiglu (alpha=1.702, limit=7), expert AND router biases
  - checkpoint stores experts stacked with gate/up INTERLEAVED:
    mlp.experts.gate_up_proj [E, H, 2I] (even cols gate, odd cols up),
    *_bias [E, 2I]; down_proj [E, I, H] + bias [E, H]
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..layers.moe import MoESpec
from .qwen3_moe import Qwen3MoeForCausalLM


class GptOssForCausalLM(Qwen3MoeForCausalLM):
    moe_backend = "auto"
    qkv_bias = True

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        from .llama import LlamaForCausalLM

        config.qk_norm = False
        LlamaForCausalLM.__init__(self, config, dtype)
        self.moe_spec = MoESpec(
            num_experts=config.num_experts or 32,
            top_k=config.num_experts_per_tok or 4,
            scoring="softmax_after_topk",
            act="swiglu_oss",
        )

    def is_moe_layer(self, layer_idx: int) -> bool:
        return True

    def init_params(self, rng=None, scale: float = 0.02):
        params = super().init_params(rng, scale)
        cfg = self.config
        h = cfg.hidden_size
        e = self.moe_spec.num_experts
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        d = self.dtype
        for lp in params["layers"]:
            lp["self_attn"]["o_proj"].setdefault(
                "bias", jnp.zeros((h,), d)
            )
            lp["self_attn"]["sinks"] = jnp.zeros(
                (cfg.num_attention_heads,), jnp.float32
            )
            lp["mlp"]["router"]["bias"] = jnp.zeros((e,), d)
            for pname, shape in [
                ("gate_proj", (e, inter)),
                ("up_proj", (e, inter)),
                ("down_proj", (e, h)),
            ]:
                lp["mlp"]["experts"][pname]["bias"] = jnp.zeros(shape, d)
        return params

    def load_weights(self, weights):
        cfg = self.config
        params = self.init_params(rng=None)
        d = self.dtype
        weights = _dequant_mxfp4_stream(weights)
        for name, arr in weights:
            a = np.asarray(arr)
            n = name.removeprefix("model.")
            if n == "embed_tokens.weight":
                params["embed_tokens"]["weight"] = jnp.asarray(a, d)
            elif n == "norm.weight":
                params["norm"] = jnp.asarray(a, d)
            elif name == "lm_head.weight":
                if not cfg.tie_word_embeddings:
                    params["lm_head"]["weight"] = jnp.asarray(a.T, d)
            elif n.startswith("layers."):
                parts = n.split(".")
                li = int(parts[1])
                lp = params["layers"][li]
                rest = ".".join(parts[2:])
                if rest in ("input_layernorm.weight",
                            "post_attention_layernorm.weight"):
                    lp[parts[2]] = jnp.asarray(a, d)
                elif rest == "self_attn.sinks":
                    lp["self_attn"]["sinks"] = jnp.asarray(a, jnp.float32)
                elif rest.startswith("self_attn."):
                    proj, leaf = parts[3], parts[4]
                    if leaf == "weight":
                        lp["self_attn"][proj]["weight"] = jnp.asarray(a.T, d)
                    else:
                        lp["self_attn"][proj]["bias"] = jnp.asarray(a, d)
                elif rest.startswith("mlp.router."):
                    leaf = parts[4]
                    w = a.T if leaf == "weight" else a
                    lp["mlp"]["router"][leaf] = jnp.asarray(w, d)
                elif rest == "mlp.experts.gate_up_proj":
                    # [E, H, 2I] interleaved: even=gate, odd=up
                    lp["mlp"]["experts"]["gate_proj"]["weight"] = jnp.asarray(
                        a[..., 0::2], d
                    )
                    lp["mlp"]["experts"]["up_proj"]["weight"] = jnp.asarray(
                        a[..., 1::2], d
                    )
                elif rest == "mlp.experts.gate_up_proj_bias":
                    lp["mlp"]["experts"]["gate_proj"]["bias"] = jnp.asarray(
                        a[..., 0::2], d
                    )
                    lp["mlp"]["experts"]["up_proj"]["bias"] = jnp.asarray(
                        a[..., 1::2], d
                    )
                elif rest == "mlp.experts.down_proj":
                    lp["mlp"]["experts"]["down_proj"]["weight"] = jnp.asarray(
                        a, d
                    )
                elif rest == "mlp.experts.down_proj_bias":
                    lp["mlp"]["experts"]["down_proj"]["bias"] = jnp.asarray(
                        a, d
                    )
        return params


def _dequant_mxfp4_stream(weights):
    """Pair up `{p}_blocks` / `{p}_scales` tensors from MXFP4 checkpoints
    and yield the dequantized `{p}` in their place (other tensors pass
    through). MXFP4 expert tensors are [E, out, K] row-major — transpose
    to our [E, K, out] stacked layout."""
    pending: dict[str, dict[str, object]] = {}
    for name, arr in weights:
        if name.endswith("_blocks") or name.endswith("_scales"):
            base, _, kind = name.rpartition("_")
            entry = pending.setdefault(base, {})
            entry[kind] = arr
            if "blocks" in entry and "scales" in entry:
                from ..quantization.mxfp4 import dequant_mxfp4

                w = dequant_mxfp4(entry["blocks"], entry["scales"])
                del pending[base]
                # [E, out, K] -> [E, K, out] (our stacked-expert layout
                # is K-major, matching the bf16 checkpoint convention)
                yield base, np.swapaxes(w, -1, -2)
        else:
            yield name, arr
