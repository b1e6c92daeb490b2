"""torchao / inc / fp_quant format support.

Reference: crates/core/src/quantization/{torchao,inc,fp_quant}.rs —
torchao checkpoints serve dense (standard tensors, standard matmul);
INC/AutoRound routes to gptq or awq by packing_format; FP-Quant packed
FP4 weights dequantize on host and serve int8-grouped.
"""

import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.quantization.formats_extra import resolve_method
from vllm_rust_tpu.quantization.loader import load_quantized_weights
from vllm_rust_tpu.quantization.mxfp4 import FP4_VALUES
from vllm_rust_tpu.testing import tiny_llama_config


def _qc(d):
    return {"quantization_config": d}


def test_resolve_torchao_serves_dense():
    assert resolve_method(_qc({"quant_method": "torchao"})) is None


def test_resolve_inc_routes_to_gptq_or_awq():
    assert resolve_method(_qc({"quant_method": "inc"})) == "gptq"
    assert (
        resolve_method(
            _qc({"quant_method": "auto-round",
                 "packing_format": "auto_round:auto_awq"})
        )
        == "awq"
    )
    assert (
        resolve_method(_qc({"quant_method": "inc", "backend": "auto_awq"}))
        == "awq"
    )
    assert (
        resolve_method(
            _qc({"quant_method": "auto-round",
                 "packing_format": "auto_round:auto_gptq"})
        )
        == "gptq"
    )


def test_fp_quant_mxfp4_loader():
    cfg = tiny_llama_config()
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n, k, gs = 64, 64, 32  # q_proj: [out, in]
    q = rng.integers(0, 256, size=(n, k // 2), dtype=np.uint8)
    scales = rng.integers(118, 130, size=(n, k // gs), dtype=np.uint8)
    gscale = np.asarray([0.5], np.float32)

    lo, hi = FP4_VALUES[q & 0xF], FP4_VALUES[q >> 4]
    vals = np.stack([lo, hi], axis=-1).reshape(n, k)
    sf = np.exp2(scales.astype(np.float32) - 127.0)
    want = (vals.reshape(n, k // gs, gs) * sf[:, :, None]).reshape(n, k) * 0.5

    base = "model.layers.0.self_attn.q_proj"
    stream = [
        (f"{base}.qweight", q),
        (f"{base}.scales", scales),
        (f"{base}.weight_global_scale", gscale),
        (f"{base}.forward_hadamard_matrix", np.eye(32, dtype=np.float32)),
        ("model.norm.weight", np.ones(cfg.hidden_size, np.float32)),
    ]
    hf_cfg = _qc({"quant_method": "fp_quant", "forward_dtype": "mxfp4"})
    params = load_quantized_weights(model, "fp_quant", hf_cfg, iter(stream))
    ql = params["layers"][0]["self_attn"]["q_proj"]
    assert ql.method == "gguf_i8" and ql.qweight.dtype == jnp.int8
    deq = np.asarray(ql.qweight, np.float32) * np.repeat(
        np.asarray(ql.scales), 16, axis=0
    )
    np.testing.assert_allclose(
        deq, want.T, atol=np.abs(want).max() / 90
    )
    # dense tensor in the same checkpoint places normally
    np.testing.assert_allclose(np.asarray(params["norm"]), 1.0)
