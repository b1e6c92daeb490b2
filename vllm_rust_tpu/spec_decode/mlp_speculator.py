"""MLP speculator (IBM-style) proposer.

Reference: spec_decode/mlp_speculator_proposer.rs + models/
mlp_speculator.rs — K chained MLP stages, each combining a projection of
the running state with the embedding of the previously drafted token,
L2-layernormed, GELU-activated, with a separate lm_head per stage.

TPU design: runs as an in-step head (SpecStepFunction.head_fn) on the
hidden state of the last emitted position plus the last emitted token —
next-step drafts ride the same packed fetch, zero extra dispatches.
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..request import Sequence


def _l2norm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    )
    if p is not None:
        out = out * p["weight"].astype(jnp.float32) + p["bias"].astype(
            jnp.float32
        )
    return out.astype(x.dtype)


def mlp_speculator_head_fn(head_params, hidden, last_tok) -> jax.Array:
    """(hidden [S, H], last token [S]) -> greedy drafts [S, K]."""
    meta = head_params["meta"]
    scale = meta["emb_weight"] / meta["state_weight"]
    state = hidden
    if "ln0" in head_params:
        state = _l2norm(state, None) / math.sqrt(2.0)
    tok = last_tok
    drafts = []
    for stage in head_params["stages"]:
        z = stage["emb"]["weight"][tok]  # [S, inner]
        state = state @ stage["proj"]["weight"] + z * scale
        state = jax.nn.gelu(_l2norm(state, stage["ln"]), approximate=False)
        logits = state @ stage["head"]["weight"]
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafts.append(tok)
    return jnp.stack(drafts, axis=1)


class MLPSpeculatorProposer:
    device_head_fn = staticmethod(mlp_speculator_head_fn)

    def __init__(self, config: ModelConfig, dtype: Any = jnp.bfloat16):
        self.config = config
        self.dtype = dtype
        x = config.extra
        self.emb_dim = int(x.get("emb_dim") or config.hidden_size)
        self.inner_dim = int(x.get("inner_dim") or 0) or self.emb_dim
        self.n_predict = int(x.get("n_predict") or 3)
        self.tie_weights = bool(x.get("tie_weights", False))
        self.scale_input = bool(x.get("scale_input", False))
        self.max_draft_tokens = self.n_predict
        self.device_params: dict | None = None
        self._pending: dict[str, list[int]] = {}

    def init_params(self, rng: jax.Array | None = None, scale: float = 0.02):
        v = self.config.vocab_size
        d = self.dtype
        inner, embd = self.inner_dim, self.emb_dim
        k = self.n_predict

        def w(key, shape):
            if key is None:
                return jnp.zeros(shape, d)
            return (scale * jax.random.normal(key, shape, jnp.float32)).astype(d)

        keys = iter(
            jax.random.split(rng, 3 * k) if rng is not None else [None] * 3 * k
        )
        stages = []
        for i in range(k):
            stages.append(
                {
                    "emb": {"weight": w(next(keys), (v, inner))},
                    "proj": {
                        "weight": w(
                            next(keys), (embd if i == 0 else inner, inner)
                        )
                    },
                    "ln": {
                        "weight": jnp.ones((inner,), d),
                        "bias": jnp.zeros((inner,), d),
                    },
                    "head": {"weight": w(next(keys), (inner, v))},
                }
            )
        # decay weights from the paper (reference mlp_speculator.rs:190)
        sw = 0.5 ** (0.5 / k)
        ew = math.sqrt((1 - sw * sw) * (inner / 2.0))
        params: dict = {
            "stages": stages,
            "meta": {"state_weight": sw, "emb_weight": ew},
        }
        if self.scale_input:
            params["ln0"] = True  # marker (affine-free L2 norm)
        self.device_params = params
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        """HF mlp-speculator names: emb.{i}.weight, proj.{i}.weight,
        ln.{i}.{weight,bias}, head.{i}.weight (tied checkpoints store
        only index 0 / proj 0,1)."""
        params = self.init_params(rng=None)
        stages = params["stages"]
        k = self.n_predict
        for name, arr in weights:
            name = name.removeprefix("speculator.")
            parts = name.split(".")
            if len(parts) < 3:
                continue
            group, idx, leaf = parts[0], parts[1], parts[-1]
            if not idx.isdigit():
                continue
            i = int(idx)
            a = np.asarray(arr)
            targets = [i] if i < k else []
            if self.tie_weights:
                # shared tensors fan out to every stage
                if group in ("emb", "ln") and i == 0:
                    targets = list(range(k))
                elif group == "proj" and i == 1:
                    targets = list(range(1, k))
            for t in targets:
                if group == "emb" and leaf == "weight":
                    stages[t]["emb"]["weight"] = jnp.asarray(a, self.dtype)
                elif group == "proj" and leaf == "weight":
                    stages[t]["proj"]["weight"] = jnp.asarray(a.T, self.dtype)
                elif group == "ln":
                    stages[t]["ln"][leaf] = jnp.asarray(a, self.dtype)
                elif group == "head" and leaf == "weight":
                    stages[t]["head"]["weight"] = jnp.asarray(a.T, self.dtype)
        self.device_params = params
        return params

    # -- proposer protocol ----------------------------------------------------

    def propose(self, seq: Sequence) -> list[int]:
        return self._pending.get(seq.request_id, [])

    def store(self, seq: Sequence, drafts: list[int]) -> None:
        self._pending[seq.request_id] = drafts

    def on_tokens_verified(self, seq: Sequence, accepted: int) -> None:
        pass

    def on_preempt(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)

    def on_request_complete(self, seq: Sequence) -> None:
        self._pending.pop(seq.request_id, None)
