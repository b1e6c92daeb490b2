"""Weight loading: safetensors (single or sharded-index), dummy weights.

Reference: crates/core/src/loader.rs (fetch_model_with_options :115,
load_gguf_model :255, load_dummy_weights :205, quant detect :308). GGUF
loading lives in quantization/gguf_file.py. HF-hub download is
intentionally not implemented (zero-egress environment) — models load
from local directories; the fetch layer is a thin resolver.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

from .config import ModelConfig


def resolve_model_path(model: str) -> str:
    """Resolve a model name/path to a local directory."""
    if os.path.isdir(model):
        return model
    for root in (
        os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface")),
        os.environ.get("VLLM_TPU_MODEL_DIR", "/models"),
    ):
        cand = os.path.join(root, model)
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        f"model '{model}' not found locally (no network access; set "
        "VLLM_TPU_MODEL_DIR or pass a directory path)"
    )


def iter_safetensors(model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    """Stream (name, numpy array) from all safetensors files, following
    the sharded index when present (reference loader.rs:191)."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = sorted(
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        )
    if not files:
        raise FileNotFoundError(f"no safetensors files in {model_dir}")
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_model(
    model: str,
    *,
    dtype=None,
    dummy: bool = False,
    seed: int = 0,
    quantization: str | None = None,
):
    """Resolve → config → registry dispatch → weights. Returns
    (model_obj, params, ModelConfig).

    ``dummy=True`` boots with random weights and no checkpoint — the
    LoadFormat::Dummy path (reference loader.rs:18) used by tests, warmup
    development, and benchmarks of compute paths.
    """
    import jax
    import jax.numpy as jnp

    from .models import from_config
    from .quantization.registry import detect_quantization

    model_dir = None if dummy and not os.path.isdir(model) else resolve_model_path(model)
    if model_dir is not None:
        config = ModelConfig.from_pretrained(model_dir)
        with open(os.path.join(model_dir, "config.json")) as f:
            raw = json.load(f)
        # explicit --quantization wins over detection: online methods
        # (experts_int8, moe_wna16 over an awq/gptq checkpoint) have no
        # quantization_config of their own (reference config.rs:15
        # QuantizationMethod + experts_int8.rs from_detected)
        quant = quantization or detect_quantization(raw, model_dir)
    else:
        raise FileNotFoundError(model)

    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    m = from_config(config, **kwargs)
    if quant:
        from .quantization.loader import load_quantized_weights

        params = load_quantized_weights(m, quant, raw, iter_safetensors(model_dir))
        # quantized checkpoints keep a dense bf16 lm_head; at decode it is
        # the single biggest HBM read of the step (0.78 GB on Qwen3-4B).
        # Serve it int8 per-column by default (VLLM_TPU_INT8_LM_HEAD=0 to
        # keep bf16). Reference analog: lm-head stays on the quant plan in
        # marlin-served checkpoints (crates/core/src/quantization/mod.rs).
        if os.environ.get("VLLM_TPU_INT8_LM_HEAD", "1") != "0":
            from .quantization.compressed_tensors import quantize_lm_head

            params = quantize_lm_head(params)
    elif dummy:
        params = m.init_params(jax.random.PRNGKey(seed))
    else:
        params = m.load_weights(iter_safetensors(model_dir))
    return m, params, config
