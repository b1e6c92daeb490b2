"""Quantized-MoE checkpoint loading (quantization/loader.py).

Reference: crates/core/src/quantization/experts_int8.rs (online int8
expert quantization) and moe_wna16.rs (AWQ/GPTQ int4 expert linears
served via the quantized-stack path). Both land experts in the MoE
layer's native int8-stack format {qweight, scale}.
"""

import jax.numpy as jnp
import numpy as np

from tests.test_moe import tiny_moe_config
from tests.test_quantization import pack_awq_int32
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.quantization.formats_extra import dequant_expert_int8
from vllm_rust_tpu.quantization.loader import load_quantized_weights

H, INTER, E = 64, 32, 4


def _dense_expert_stream(rng):
    """HF-named dense checkpoint tensors for the 2-layer tiny MoE model."""
    stream, golden = [], {}
    for li in range(2):
        stream.append(
            (f"model.layers.{li}.mlp.gate.weight",
             rng.normal(size=(E, H)).astype(np.float32))
        )
        for j in range(E):
            for pname, shape in [
                ("gate_proj", (INTER, H)),
                ("up_proj", (INTER, H)),
                ("down_proj", (H, INTER)),
            ]:
                w = (rng.normal(size=shape) * 0.1).astype(np.float32)
                golden[(li, pname, j)] = w
                stream.append(
                    (f"model.layers.{li}.mlp.experts.{j}.{pname}.weight", w)
                )
    return stream, golden


def test_experts_int8_online_quant():
    model = from_config(tiny_moe_config(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    stream, golden = _dense_expert_stream(rng)
    params = load_quantized_weights(model, "experts_int8", {}, iter(stream))
    node = params["layers"][1]["mlp"]["experts"]["up_proj"]
    assert set(node) == {"qweight", "scale"}
    assert node["qweight"].dtype == jnp.int8
    assert node["qweight"].shape == (E, H, INTER)
    deq = np.asarray(dequant_expert_int8(node))
    want = golden[(1, "up_proj", 2)].T  # [in, out]
    np.testing.assert_allclose(deq[2], want, atol=np.abs(want).max() / 100)


def test_moe_wna16_awq_checkpoint():
    """AWQ int4 expert tensors group, dequantize, stack, int8-requantize."""
    model = from_config(tiny_moe_config(), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    g = 32
    stream = [
        ("model.layers.0.mlp.gate.weight",
         rng.normal(size=(E, H)).astype(np.float32)),
        ("model.layers.1.mlp.gate.weight",
         rng.normal(size=(E, H)).astype(np.float32)),
    ]
    golden = {}
    for li in range(2):
        for j in range(E):
            for pname, (k, n) in [
                ("gate_proj", (H, INTER)),
                ("up_proj", (H, INTER)),
                ("down_proj", (INTER, H)),
            ]:
                q = rng.integers(0, 16, size=(k, n)).astype(np.int64)
                z = np.full((k // g, n), 8, np.int64)
                s = (rng.uniform(0.01, 0.05, size=(k // g, n))).astype(
                    np.float32
                )
                golden[(li, pname, j)] = (
                    (q - np.repeat(z, g, axis=0)).astype(np.float32)
                    * np.repeat(s, g, axis=0)
                )  # [in, out]
                base = f"model.layers.{li}.mlp.experts.{j}.{pname}"
                stream += [
                    (f"{base}.qweight", pack_awq_int32(q)),
                    (f"{base}.qzeros", pack_awq_int32(z)),
                    (f"{base}.scales", s),
                ]
    hf_cfg = {"quantization_config": {"quant_method": "moe_wna16",
                                      "zero_point": True, "bits": 4,
                                      "group_size": g}}
    params = load_quantized_weights(model, "moe_wna16", hf_cfg, iter(stream))
    node = params["layers"][0]["mlp"]["experts"]["down_proj"]
    assert set(node) == {"qweight", "scale"}
    assert node["qweight"].shape == (E, INTER, H)
    deq = np.asarray(dequant_expert_int8(node))
    for j in range(E):
        want = golden[(0, "down_proj", j)]
        np.testing.assert_allclose(
            deq[j], want, atol=np.abs(want).max() / 90
        )
