"""LoRA adapter loading + slot management.

Design: the engine owns ``max_loras`` device-resident adapter slots.
Every LoRA-targeted linear in the param tree carries a "lora" subtree
{A: [L, in, r_max], B: [L, r_max, out], scale: [L]}; loading an adapter
writes its (rank-padded) matrices into one slot's rows across all
targeted linears. Per-token slot indices ride the packed step metadata.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

# PEFT tensor name:
# base_model.model.model.layers.N.self_attn.q_proj.lora_A.weight  [r, in]
# base_model.model.model.layers.N.mlp.up_proj.lora_B.weight       [out, r]
_PEFT_RE = re.compile(
    r"(?:base_model\.model\.)?model\.layers\.(\d+)\.(self_attn|mlp)\.(\w+)\."
    r"lora_(A|B)\.weight"
)

TARGETS = (
    ("self_attn", "q_proj"),
    ("self_attn", "k_proj"),
    ("self_attn", "v_proj"),
    ("self_attn", "o_proj"),
    ("mlp", "gate_proj"),
    ("mlp", "up_proj"),
    ("mlp", "down_proj"),
)


@dataclass
class LoraAdapter:
    name: str
    rank: int
    alpha: float
    # (layer, module, proj) -> (A [in, r], B [r, out])
    weights: dict[tuple[int, str, str], tuple[np.ndarray, np.ndarray]] = field(
        default_factory=dict
    )

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    @staticmethod
    def load(name: str, path: str) -> "LoraAdapter":
        from safetensors import safe_open

        cfg_path = os.path.join(path, "adapter_config.json")
        rank, alpha = 8, 16.0
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            rank = int(cfg.get("r", rank))
            alpha = float(cfg.get("lora_alpha", alpha))
        st = os.path.join(path, "adapter_model.safetensors")
        a = LoraAdapter(name=name, rank=rank, alpha=alpha)
        halves: dict[tuple, dict[str, np.ndarray]] = {}
        with safe_open(st, framework="np") as f:
            for tname in f.keys():
                m = _PEFT_RE.match(tname)
                if not m:
                    continue
                li, mod, proj, ab = (
                    int(m.group(1)), m.group(2), m.group(3), m.group(4),
                )
                halves.setdefault((li, mod, proj), {})[ab] = f.get_tensor(tname)
        for key, h in halves.items():
            if "A" in h and "B" in h:
                # PEFT: A [r, in], B [out, r] → ours A [in, r], B [r, out]
                a.weights[key] = (h["A"].T, h["B"].T)
        if not a.weights:
            raise ValueError(f"no LoRA tensors found in {st}")
        return a


class LoraManager:
    """Slot registry (reference lora/manager.rs LRU id registry)."""

    def __init__(self, engine, max_loras: int = 4, max_rank: int = 64):
        self.engine = engine
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.slots: list[str | None] = [None] * max_loras
        self.adapters: dict[str, LoraAdapter] = {}
        self._use_clock = 0
        self._last_use: dict[str, int] = {}
        self._attach_empty()

    # -- param tree wiring ----------------------------------------------------

    def _attach_empty(self) -> None:
        """Insert zeroed lora subtrees into every targeted linear."""
        params = self.engine.params
        dt = self.engine.model.dtype
        for lp in params["layers"]:
            for mod, proj in TARGETS:
                node = lp.get(mod, {}).get(proj)
                if not isinstance(node, dict) or "weight" not in node:
                    continue
                din, dout = node["weight"].shape
                node["lora"] = {
                    "A": jnp.zeros((self.max_loras, din, self.max_rank), dt),
                    "B": jnp.zeros((self.max_loras, self.max_rank, dout), dt),
                    "scale": jnp.zeros((self.max_loras,), jnp.float32),
                }

    # -- public API -----------------------------------------------------------

    def load(self, name: str, path: str) -> int:
        """Load (or re-activate) an adapter; returns its slot index."""
        if name in self.adapters and name in self.slots:
            self._touch(name)
            return self.slots.index(name)
        adapter = LoraAdapter.load(name, path)
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"adapter rank {adapter.rank} exceeds max_rank {self.max_rank}"
            )
        self.adapters[name] = adapter
        slot = self._pick_slot()
        self._write_slot(slot, adapter)
        self.slots[slot] = name
        self._touch(name)
        return slot

    def unload(self, name: str) -> None:
        if name in self.slots:
            slot = self.slots.index(name)
            self._clear_slot(slot)
            self.slots[slot] = None
        self.adapters.pop(name, None)
        self._last_use.pop(name, None)

    def slot_of(self, name: str) -> int:
        if name not in self.slots:
            raise ValueError(f"LoRA adapter {name!r} is not loaded")
        self._touch(name)
        return self.slots.index(name)

    def list(self) -> list[dict]:
        return [
            {"name": n, "slot": i, "rank": self.adapters[n].rank}
            for i, n in enumerate(self.slots)
            if n is not None
        ]

    # -- internals ------------------------------------------------------------

    def _touch(self, name: str) -> None:
        self._use_clock += 1
        self._last_use[name] = self._use_clock

    def _pick_slot(self) -> int:
        for i, n in enumerate(self.slots):
            if n is None:
                return i
        # evict LRU (no in-flight tracking needed: sequences hold adapter
        # NAMES; an evicted adapter's requests fail fast at next schedule)
        lru = min(
            (n for n in self.slots if n is not None),
            key=lambda n: self._last_use.get(n, 0),
        )
        slot = self.slots.index(lru)
        self.slots[slot] = None
        return slot

    def _write_slot(self, slot: int, adapter: LoraAdapter) -> None:
        params = self.engine.params
        dt = self.engine.model.dtype
        r = adapter.rank
        for (li, mod, proj), (a_np, b_np) in adapter.weights.items():
            node = params["layers"][li].get(mod, {}).get(proj)
            if not isinstance(node, dict) or "lora" not in node:
                continue
            lora = node["lora"]
            a_pad = np.zeros(lora["A"].shape[1:], a_np.dtype)
            a_pad[:, :r] = a_np
            b_pad = np.zeros(lora["B"].shape[1:], b_np.dtype)
            b_pad[:r, :] = b_np
            lora["A"] = lora["A"].at[slot].set(jnp.asarray(a_pad, dt))
            lora["B"] = lora["B"].at[slot].set(jnp.asarray(b_pad, dt))
            lora["scale"] = lora["scale"].at[slot].set(adapter.scaling)

    def _clear_slot(self, slot: int) -> None:
        params = self.engine.params
        for lp in params["layers"]:
            for mod, proj in TARGETS:
                node = lp.get(mod, {}).get(proj)
                if isinstance(node, dict) and "lora" in node:
                    node["lora"]["scale"] = (
                        node["lora"]["scale"].at[slot].set(0.0)
                    )
