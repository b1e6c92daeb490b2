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


def medusa_head_fn(head_params, hidden: jax.Array, last_tok=None,
                   width: int = 1) -> jax.Array:
    """Apply every head to hidden [S, H] -> drafts [S, K*width]
    (per head, the top-``width`` candidate tokens, best first)."""
    cols = []
    for hp in head_params["heads"]:
        h = hidden
        for blk in hp["blocks"]:
            h = h + jax.nn.silu(h @ blk["weight"] + blk["bias"])
        logits = h @ hp["lm_head"]["weight"]
        if width == 1:
            cols.append(jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None])
        else:
            _, ids = jax.lax.top_k(logits, width)
            cols.append(ids.astype(jnp.int32))
    return jnp.concatenate(cols, axis=1)  # [S, K*width]


class MedusaProposer:
    def __init__(
        self,
        config: ModelConfig,
        num_heads: int = 4,
        num_layers_per_head: int = 1,
        dtype: Any = jnp.bfloat16,
        tree_width: int = 1,
    ):
        self.config = config
        self.num_heads = num_heads
        self.num_layers_per_head = num_layers_per_head
        self.dtype = dtype
        self.max_draft_tokens = num_heads
        self.tree_width = tree_width
        self.proposes_trees = tree_width > 1
        self.device_params: dict | None = None
        self._pending: dict[str, list[int]] = {}
        import functools

        self.device_head_fn = functools.partial(
            medusa_head_fn, width=tree_width
        )

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
        flat = self._pending.get(seq.request_id, [])
        if self.tree_width == 1:
            return flat
        # top-1 chain: first candidate of each head
        return [flat[k * self.tree_width] for k in range(len(flat) // self.tree_width)]

    def propose_paths(self, seq: Sequence) -> list[list[int]]:
        """Deviate-once path set over the per-head top-``width``
        candidates: the all-top1 chain first, then for each depth j and
        alternate candidate c, the path [top1..top1(j-1), c] (reference
        tree_attention.rs from_medusa_candidates, flattened to root
        paths so verification rides the ragged batch instead of a
        custom tree mask)."""
        flat = self._pending.get(seq.request_id, [])
        w = self.tree_width
        if not flat or w == 1:
            return [self.propose(seq)] if flat else []
        k = len(flat) // w
        cands = [flat[j * w : (j + 1) * w] for j in range(k)]
        top1 = [c[0] for c in cands]
        paths = [top1]
        for j in range(k):
            for c in cands[j][1:]:
                if c != cands[j][0]:
                    paths.append(top1[:j] + [c])
        return paths

    def store(self, seq: Sequence, drafts: list[int]) -> None:
        self._pending[seq.request_id] = drafts

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass

    def on_preempt(self, seq: Sequence) -> None:
        # the stored drafts were conditioned on pre-preemption state
        self._pending.pop(seq.request_id, None)

    def on_request_complete(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)
