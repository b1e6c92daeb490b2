"""Gated MLP (SwiGLU / GeGLU).

Reference: crates/core/src/layers/mlp.rs:60 (SwiGluMlp) + fused CUDA
activations (kernels/swiglu.cu, activations.cu). On TPU the gate/up
matmuls and activation fuse under XLA; no custom kernel required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linear import linear

_ACTS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


def swiglu_mlp(x: jax.Array, params: dict, act: str = "silu") -> jax.Array:
    """down( act(gate(x)) * up(x) ).

    Supports a fused gate_up projection when params contain "gate_up_proj"
    (single matmul, split in half — better MXU utilization at decode)."""
    act_fn = _ACTS[act]
    if "gate_up_proj" in params:
        gu = linear(x, params["gate_up_proj"])
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = linear(x, params["gate_proj"])
        up = linear(x, params["up_proj"])
    return linear(act_fn(gate) * up, params["down_proj"])
