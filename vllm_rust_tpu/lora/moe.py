"""Per-expert LoRA for MoE layers.

Reference: crates/core/src/moe/lora.rs (MoELoraWeights::from_adapters /
from_tensors, apply_expert_lora). TPU-native application lives in
layers/moe.py: the low-rank factors are stacked [E, in, r]/[E, r, out]
arrays that ride the same grouped-matmul / batched-einsum machinery as
the expert weights, so LoRA costs two extra gmm hops per projection —
no per-expert host loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

_PROJS = ("gate_proj", "up_proj", "down_proj")


@dataclass
class MoELoraWeights:
    """Stacked per-expert LoRA factors for the three expert projections.

    gate/up: A [E, hidden, r], B [E, r, inter]
    down:    A [E, inter, r],  B [E, r, hidden]
    """

    gate_a: np.ndarray
    gate_b: np.ndarray
    up_a: np.ndarray
    up_b: np.ndarray
    down_a: np.ndarray
    down_b: np.ndarray
    scale: float
    rank: int

    @property
    def num_experts(self) -> int:
        return self.gate_a.shape[0]

    @staticmethod
    def from_adapters(
        gate: list[tuple[np.ndarray, np.ndarray]],  # per-expert (A [in,r], B [r,out])
        up: list[tuple[np.ndarray, np.ndarray]],
        down: list[tuple[np.ndarray, np.ndarray]],
        scale: float,
    ) -> "MoELoraWeights":
        if not gate:
            raise ValueError("MoELoraWeights requires at least one expert")
        if not (len(gate) == len(up) == len(down)):
            raise ValueError(
                f"adapter lists must agree: gate={len(gate)} up={len(up)} "
                f"down={len(down)}"
            )
        stack = lambda pairs, i: np.stack([p[i] for p in pairs])
        w = MoELoraWeights(
            gate_a=stack(gate, 0), gate_b=stack(gate, 1),
            up_a=stack(up, 0), up_b=stack(up, 1),
            down_a=stack(down, 0), down_b=stack(down, 1),
            scale=scale, rank=gate[0][0].shape[-1],
        )
        w.validate()
        return w

    @staticmethod
    def from_tensors(
        gate_a, gate_b, up_a, up_b, down_a, down_b, scale: float
    ) -> "MoELoraWeights":
        w = MoELoraWeights(
            gate_a=np.asarray(gate_a), gate_b=np.asarray(gate_b),
            up_a=np.asarray(up_a), up_b=np.asarray(up_b),
            down_a=np.asarray(down_a), down_b=np.asarray(down_b),
            scale=scale, rank=np.asarray(gate_a).shape[-1],
        )
        w.validate()
        return w

    def validate(self) -> None:
        e = self.gate_a.shape[0]
        for name in ("gate_b", "up_a", "up_b", "down_a", "down_b"):
            arr = getattr(self, name)
            if arr.shape[0] != e:
                raise ValueError(
                    f"{name} has {arr.shape[0]} experts, expected {e}"
                )
        for a, b in ((self.gate_a, self.gate_b), (self.up_a, self.up_b),
                     (self.down_a, self.down_b)):
            if a.shape[-1] != b.shape[1]:
                raise ValueError(
                    f"rank mismatch: A {a.shape} vs B {b.shape}"
                )


def attach_moe_lora(
    layer_params: dict, weights: MoELoraWeights, dtype=jnp.bfloat16
) -> None:
    """Install the factors under experts/lora/{gate,up,down}_proj (+scale)
    of one MoE layer's param dict; layers/moe.py picks them up on the
    next jitted step (a new lora subtree triggers one recompile)."""
    experts = layer_params["experts"]
    pairs = {
        "gate_proj": (weights.gate_a, weights.gate_b),
        "up_proj": (weights.up_a, weights.up_b),
        "down_proj": (weights.down_a, weights.down_b),
    }
    e_have = experts["gate_proj"]["weight"].shape[0] if "weight" in experts["gate_proj"] else None
    if e_have is not None and weights.num_experts != e_have:
        raise ValueError(
            f"adapter has {weights.num_experts} experts, layer has {e_have}"
        )
    experts["lora"] = {
        proj: {"A": jnp.asarray(a, dtype), "B": jnp.asarray(b, dtype)}
        for proj, (a, b) in pairs.items()
    }
    experts["lora"]["scale"] = jnp.float32(weights.scale)


def detach_moe_lora(layer_params: dict) -> None:
    layer_params["experts"].pop("lora", None)
