"""LoRA adapters.

Reference: crates/core/src/lora/ (safetensors adapter loader,
LoraManager LRU registry manager.rs:53, low-rank linear linear.rs,
per-request LoraContext; server hot-load via /v1/load_lora_adapter).
"""

from .manager import LoraAdapter, LoraManager

__all__ = ["LoraAdapter", "LoraManager"]
