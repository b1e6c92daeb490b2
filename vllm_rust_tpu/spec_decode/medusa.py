"""Medusa proposer: independent draft heads over the target hidden state.

Reference: spec_decode/medusa.rs (425) + medusa_proposer.rs (254) —
head k is a stack of residual SiLU blocks followed by an lm_head,
predicting the token k+2 positions ahead of the hidden state's position.

TPU design: the heads run INSIDE the jitted verification step
(SpecStepFunction.head_fn) on the hidden state of the last emitted
position, so next-step drafts ride the same packed fetch as this step's
verification results — proposing costs zero extra dispatches. The host
merely stores the [K] draft ids per sequence and hands them back on the
next ``propose`` call.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..request import Sequence


def medusa_head_fn(head_params, hidden: jax.Array, last_tok=None) -> jax.Array:
    """Apply every head to hidden [S, H] -> greedy drafts [S, K]."""
    cols = []
    for hp in head_params["heads"]:
        h = hidden
        for blk in hp["blocks"]:
            h = h + jax.nn.silu(h @ blk["weight"] + blk["bias"])
        logits = h @ hp["lm_head"]["weight"]
        cols.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return jnp.stack(cols, axis=1)


class MedusaProposer:
    device_head_fn = staticmethod(medusa_head_fn)

    def __init__(
        self,
        config: ModelConfig,
        num_heads: int = 4,
        num_layers_per_head: int = 1,
        dtype: Any = jnp.bfloat16,
    ):
        self.config = config
        self.num_heads = num_heads
        self.num_layers_per_head = num_layers_per_head
        self.dtype = dtype
        self.max_draft_tokens = num_heads
        self.device_params: dict | None = None
        self._pending: dict[str, list[int]] = {}

    # -- params ---------------------------------------------------------------

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        h, v = self.config.hidden_size, self.config.vocab_size
        d = self.dtype

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        n_keys = self.num_heads * (self.num_layers_per_head + 1)
        keys = iter(
            jax.random.split(rng, n_keys) if rng is not None else [None] * n_keys
        )
        heads = []
        for _ in range(self.num_heads):
            blocks = [
                {"weight": w(next(keys), (h, h)), "bias": jnp.zeros((h,), d)}
                for _ in range(self.num_layers_per_head)
            ]
            heads.append(
                {"blocks": blocks, "lm_head": {"weight": w(next(keys), (h, v))}}
            )
        self.device_params = {"heads": heads}
        return self.device_params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """HF medusa checkpoint names: ``medusa_head.{k}.{i}.linear.weight``
        / ``.bias`` for residual blocks and ``medusa_head.{k}.{L}.weight``
        for the final lm_head (both with or without the prefix)."""
        params = self.init_params(rng=None)
        for name, arr in weights:
            name = name.removeprefix("medusa_head.").removeprefix("medusa_heads.")
            parts = name.split(".")
            try:
                k = int(parts[0])
            except ValueError:
                continue
            if k >= self.num_heads:
                continue
            a = np.asarray(arr)
            head = params["heads"][k]
            if "linear" in parts:
                i = int(parts[1])
                leaf = parts[-1]  # weight | bias
                t = a.T if leaf == "weight" else a
                head["blocks"][i][leaf] = jnp.asarray(t, self.dtype)
            elif parts[-1] == "weight":
                head["lm_head"]["weight"] = jnp.asarray(a.T, self.dtype)
        return params

    # -- proposer protocol ----------------------------------------------------

    def propose(self, seq: Sequence) -> list[int]:
        return self._pending.get(seq.request_id, [])

    def store(self, seq: Sequence, drafts: list[int]) -> None:
        self._pending[seq.request_id] = drafts

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass

    def on_preempt(self, seq: Sequence) -> None:
        # the stored drafts were conditioned on pre-preemption state
        self._pending.pop(seq.request_id, None)

    def on_request_complete(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)
