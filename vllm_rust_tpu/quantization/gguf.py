"""GGUF model loading: metadata → ModelConfig, tensors → param tree.

Reference: loader.rs:255 load_gguf_model + quantization/gguf/mod.rs
(GgufLinear, fused QMatMul). TPU strategy:
  - Q4_K linears map EXACTLY onto the fused w4a16 kernel: the K-quant
    sub-block structure w = (d·sc_j)·q - (dmin·m_j) per 32 elements IS
    grouped scale+zero quantization with g=32, so decode runs at int4
    HBM bandwidth through ops/pallas/quant_matmul.py.
  - Every other K-quant / I-quant (Q2_K..Q6_K, Q4_0..Q8_0, IQ2/IQ3/IQ4
    families) repacks EXACTLY into int8 + per-16 group scales/zeros and
    runs through the fused w8a16 kernel (ops/pallas/int8_matmul.py) at
    int8 HBM bandwidth — one kernel replaces the reference's per-format
    MMVQ CUDA kernels (ADR 0025).
  - Float tensors and unsupported shapes dequantize to bf16 at load.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .gguf_file import GGUFReader
from .registry import register_quant_method
from .types import QuantLinear

logger = logging.getLogger(__name__)

_ARCH_MAP = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "gemma3": "Gemma3ForCausalLM",
}

# blk.{i}.<ggml name> -> path inside our layer dict
_LAYER_MAP = {
    "attn_norm.weight": ("input_layernorm",),
    "ffn_norm.weight": ("post_attention_layernorm",),
    "post_attention_norm.weight": ("post_attention_layernorm",),
    "post_ffw_norm.weight": ("post_feedforward_layernorm",),
    "ffn_norm_pre.weight": ("pre_feedforward_layernorm",),
    "attn_q.weight": ("self_attn", "q_proj"),
    "attn_k.weight": ("self_attn", "k_proj"),
    "attn_v.weight": ("self_attn", "v_proj"),
    "attn_output.weight": ("self_attn", "o_proj"),
    "attn_q.bias": ("self_attn", "q_proj"),
    "attn_k.bias": ("self_attn", "k_proj"),
    "attn_v.bias": ("self_attn", "v_proj"),
    "attn_q_norm.weight": ("self_attn", "q_norm"),
    "attn_k_norm.weight": ("self_attn", "k_norm"),
    "ffn_gate.weight": ("mlp", "gate_proj"),
    "ffn_up.weight": ("mlp", "up_proj"),
    "ffn_down.weight": ("mlp", "down_proj"),
}


def config_from_gguf(reader: GGUFReader) -> ModelConfig:
    md = reader.metadata
    arch = md.get("general.architecture", "llama")

    def g(key, default=None):
        return md.get(f"{arch}.{key}", default)

    hf_arch = _ARCH_MAP.get(arch)
    if hf_arch is None:
        raise ValueError(f"unsupported GGUF architecture {arch!r}")
    n_heads = int(g("attention.head_count", 32))
    d = dict(
        architectures=[hf_arch],
        model_type=arch,
        vocab_size=len(md.get("tokenizer.ggml.tokens", []))
        or int(g("vocab_size", 32000)),
        hidden_size=int(g("embedding_length", 4096)),
        intermediate_size=int(g("feed_forward_length", 11008)),
        num_hidden_layers=int(g("block_count", 32)),
        num_attention_heads=n_heads,
        num_key_value_heads=int(g("attention.head_count_kv", n_heads)),
        max_position_embeddings=int(g("context_length", 4096)),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(g("rope.freq_base", 10000.0)),
    )
    if g("attention.key_length"):
        d["head_dim"] = int(g("attention.key_length"))
    if g("attention.sliding_window"):
        d["sliding_window"] = int(g("attention.sliding_window"))
    eos = md.get("tokenizer.ggml.eos_token_id")
    if eos is not None:
        d["eos_token_id"] = int(eos)
    cfg = ModelConfig(**d)
    cfg.extra["gguf_architecture"] = arch
    return cfg


def _q4k_to_quant_linear(reader: GGUFReader, name: str) -> QuantLinear:
    """Repack a Q4_K tensor into the fused-kernel layout without ever
    materializing bf16 weights."""
    from ..ops.pallas.quant_matmul import prepare_tiled_scales
    from .awq import repack_k_half
    from .gguf_file import _f16, _k_scales_6bit

    ti = reader.tensors[name]
    raw = reader.tensor_bytes(name)
    n_out, n_in = tuple(reversed(ti.shape))  # torch convention
    from ..native import native_extract_q4k

    extracted = native_extract_q4k(raw, ti.num_elements)
    if extracted is not None:
        q, s_flat, zs_flat = extracted
        scales_g = s_flat.reshape(-1, 8)
        zs_g = zs_flat.reshape(-1, 8)
    else:
        blocks = raw.reshape(n_out * n_in // 256, 144)
        d = _f16(blocks[:, 0:2].reshape(-1))[:, None]
        dmin = _f16(blocks[:, 2:4].reshape(-1))[:, None]
        sc, m = _k_scales_6bit(blocks[:, 4:16])  # [B, 8]
        scales_g = (d * sc).astype(np.float32)  # per-32 group scale
        zs_g = (dmin * m).astype(np.float32)  # per-32 group zero*scale
        qs = blocks[:, 16:144]
        # unpack nibbles into element order [B, 256]
        q = np.empty((blocks.shape[0], 256), np.uint8)
        for c in range(4):
            chunk = qs[:, c * 32 : (c + 1) * 32]
            q[:, c * 64 : c * 64 + 32] = chunk & 0xF
            q[:, c * 64 + 32 : c * 64 + 64] = chunk >> 4
    # reshape to weight matrices: rows = out, inner = in
    q = q.reshape(n_out, n_in)  # int4 values
    scales = scales_g.reshape(n_out, n_in // 32)
    zs = zs_g.reshape(n_out, n_in // 32)
    # transpose to [in, out] / [in/32, out] (our K-major layout)
    qt = np.ascontiguousarray(q.T)
    st = np.ascontiguousarray(scales.T).astype(jnp.bfloat16)
    zt = np.ascontiguousarray(zs.T).astype(jnp.bfloat16)

    aux = {}
    tiled = prepare_tiled_scales(st, zt, n_in // 2)
    if tiled is not None:
        aux = {"s_tiled": jnp.asarray(tiled[0]), "zs_tiled": jnp.asarray(tiled[1])}
    return QuantLinear(
        qweight=jnp.asarray(repack_k_half(qt)),
        scales=jnp.asarray(st),
        zs=jnp.asarray(zt),
        aux=aux,
        method="gguf_q4k",
    )


@register_quant_method("gguf_q4k")
def apply_gguf_q4k(x, p: QuantLinear):
    from .awq import apply_awq

    return apply_awq(x, p)  # identical packed layout and math


def _int8_to_quant_linear(reader: GGUFReader, name: str) -> QuantLinear:
    """Repack any K-quant/I-quant tensor into the exact w8a16 layout
    (int8 weights + per-16 group scales/zeros) — int8 HBM bandwidth
    without materializing bf16. Reference counterpart: the per-format
    MMVQ kernels (gguf/iq/mod.rs:457-463, ADR 0025)."""
    from ..ops.pallas.int8_matmul import prepare_tiled_scales_w8
    from .gguf_file import dequant_int8_grouped

    ti = reader.tensors[name]
    raw = reader.tensor_bytes(name)
    n_out, n_in = tuple(reversed(ti.shape))
    q, s, z = dequant_int8_grouped(raw, ti.ggml_type, ti.num_elements)
    # rows are output channels; transpose to K-major [K, N] / [K/16, N]
    qt = np.ascontiguousarray(q.reshape(n_out, n_in).T)
    st = np.ascontiguousarray(s.reshape(n_out, n_in // 16).T)
    zt = (
        np.ascontiguousarray(z.reshape(n_out, n_in // 16).T)
        if z is not None
        else None
    )
    has_z = zt is not None
    aux = {}
    tiled = prepare_tiled_scales_w8(st, zt, n_in)
    if tiled is not None:
        aux["s_tiled"] = jnp.asarray(tiled[0])
        aux["zs_tiled"] = jnp.asarray(tiled[1])
    return QuantLinear(
        qweight=jnp.asarray(qt),
        scales=jnp.asarray(st),
        zs=jnp.asarray(zt) if has_z else None,
        aux=aux,
        method="gguf_i8",
    )


@register_quant_method("gguf_i8")
def apply_gguf_i8(x, p: QuantLinear):
    from ..ops.pallas.int8_matmul import quant_matmul_w8a16

    t_shape = x.shape[:-1]
    out = quant_matmul_w8a16(
        x.reshape(-1, x.shape[-1]),
        p.qweight,
        p.scales,
        p.zs,
        s_tiled=p.aux.get("s_tiled"),
        zs_tiled=p.aux.get("zs_tiled"),
        has_z=p.zs is not None,  # pytree structure => static under jit
    ).reshape(*t_shape, -1).astype(x.dtype)
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out


def load_gguf_model(path: str, dtype=jnp.bfloat16):
    """Returns (model, params, ModelConfig)."""
    from ..models import from_config

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    model = from_config(cfg, dtype=dtype)
    params = model.init_params(rng=None)

    def place(path_parts, value):
        node = params
        for p in path_parts[:-1]:
            node = node[p]
        node[path_parts[-1]] = value

    for name, ti in reader.tensors.items():
        if name == "token_embd.weight":
            place(
                ["embed_tokens", "weight"],
                jnp.asarray(reader.dequant(name), dtype),
            )
        elif name == "output_norm.weight":
            params["norm"] = jnp.asarray(reader.dequant(name), dtype)
        elif name == "output.weight":
            if not cfg.tie_word_embeddings and "lm_head" in params:
                place(
                    ["lm_head", "weight"],
                    jnp.asarray(reader.dequant(name).T, dtype),
                )
        elif name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            idx = int(idx)
            dest = _LAYER_MAP.get(rest)
            if dest is None:
                logger.debug("skipping unmapped GGUF tensor %s", name)
                continue
            layer = params["layers"][idx]
            is_linear_weight = rest.endswith(".weight") and dest[-1].endswith(
                "_proj"
            )
            from .gguf_file import _INT8_GROUPED

            if is_linear_weight and ti.type_name == "Q4_K":
                node = layer
                for p in dest[:-1]:
                    node = node[p]
                node[dest[-1]] = _q4k_to_quant_linear(reader, name)
            elif (
                is_linear_weight
                and ti.type_name in _INT8_GROUPED
                and ti.shape[0] % 16 == 0
            ):
                # every other K-quant / I-quant: exact int8 + per-16
                # scales through the fused w8a16 kernel
                node = layer
                for p in dest[:-1]:
                    node = node[p]
                node[dest[-1]] = _int8_to_quant_linear(reader, name)
            elif is_linear_weight:
                node = layer
                for p in dest[:-1]:
                    node = node[p]
                node[dest[-1]] = {
                    "weight": jnp.asarray(reader.dequant(name).T, dtype)
                }
            elif rest.endswith(".bias"):
                node = layer
                for p in dest[:-1]:
                    node = node[p]
                tgt = node[dest[-1]]
                bias = jnp.asarray(reader.dequant(name), dtype)
                if isinstance(tgt, QuantLinear):
                    tgt.bias = bias
                else:
                    tgt["bias"] = bias
            else:  # norms
                node = layer
                for p in dest[:-1]:
                    node = node[p]
                node[dest[-1]] = jnp.asarray(reader.dequant(name), dtype)
    if cfg.tie_word_embeddings is False and "output.weight" not in reader.tensors:
        cfg.tie_word_embeddings = True
        params.pop("lm_head", None)
    return model, params, cfg


def tokenizer_from_gguf(reader: GGUFReader):
    """Build a tokenizers.Tokenizer from GGUF vocab (BPE models).

    Reference: the reference reads tokenizer.json alongside; GGUF-only
    checkpoints carry vocab in metadata (tokenizer.ggml.*)."""
    md = reader.metadata
    model_type = md.get("tokenizer.ggml.model", "gpt2")
    tokens = list(md.get("tokenizer.ggml.tokens", []))
    if not tokens:
        raise ValueError("GGUF has no embedded tokenizer vocabulary")
    if model_type != "gpt2":
        raise NotImplementedError(
            f"GGUF tokenizer model {model_type!r} not supported yet — "
            "pass an external HF tokenizer directory"
        )
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    merges_raw = md.get("tokenizer.ggml.merges", [])
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = [tuple(m.split(" ", 1)) for m in merges_raw]
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    class _Wrap:
        eos_token_id = (
            int(md["tokenizer.ggml.eos_token_id"])
            if "tokenizer.ggml.eos_token_id" in md
            else None
        )
        bos_token_id = (
            int(md["tokenizer.ggml.bos_token_id"])
            if "tokenizer.ggml.bos_token_id" in md
            else None
        )
        chat_template = md.get("tokenizer.chat_template")
        vocab_size = len(tokens)

        def encode(self, text, add_special_tokens=True):
            return tok.encode(text).ids

        def decode(self, ids, skip_special_tokens=True):
            return tok.decode(list(ids))

        def apply_chat_template(self, messages, **kw):
            from ..tokenizer import TokenizerWrapper

            return TokenizerWrapper.apply_chat_template(self, messages, **kw)

    return _Wrap()
