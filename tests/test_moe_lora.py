"""Per-expert MoE LoRA (layers/moe.py + lora/moe.py).

Mirrors reference moe/lora.rs: stacked per-expert factors, applied to
gate/up/down; all three backends must agree with an explicit dense
recomputation of (W + scale * A@B) per expert.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.layers.moe import MoESpec, moe_layer
from vllm_rust_tpu.lora.moe import (
    MoELoraWeights,
    attach_moe_lora,
    detach_moe_lora,
)

E, H, I, R, T = 4, 64, 96, 8, 12


def _params(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    return {
        "router": {"weight": jnp.asarray(mk(H, E))},
        "experts": {
            "gate_proj": {"weight": jnp.asarray(mk(E, H, I))},
            "up_proj": {"weight": jnp.asarray(mk(E, H, I))},
            "down_proj": {"weight": jnp.asarray(mk(E, I, H))},
        },
    }


def _lora(seed=1, scale=2.0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    return MoELoraWeights.from_tensors(
        mk(E, H, R), mk(E, R, I), mk(E, H, R), mk(E, R, I),
        mk(E, I, R), mk(E, R, H), scale)


def _merged_params(params, lw):
    """Fold scale*A@B into dense expert weights (ground truth)."""
    import copy

    merged = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    for proj, (a, b) in (
        ("gate_proj", (lw.gate_a, lw.gate_b)),
        ("up_proj", (lw.up_a, lw.up_b)),
        ("down_proj", (lw.down_a, lw.down_b)),
    ):
        w = merged["experts"][proj]["weight"]
        merged["experts"][proj]["weight"] = jnp.asarray(
            w + lw.scale * np.einsum("eir,ero->eio", a, b)
        )
    return jax.tree_util.tree_map(jnp.asarray, merged)


SPEC = MoESpec(num_experts=E, top_k=2, norm_topk_prob=True)


@pytest.mark.parametrize("backend", ["dense", "gmm", "ep"])
def test_moe_lora_matches_merged(backend):
    params = _params()
    lw = _lora()
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((T, H)) * 0.1, jnp.float32
    )
    ref = moe_layer(SPEC, _merged_params(params, lw), x, backend=backend)
    attach_moe_lora(params, lw, dtype=jnp.float32)
    out = moe_layer(SPEC, params, x, backend=backend)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3
    )
    # detach restores the base layer
    detach_moe_lora(params)
    base = moe_layer(SPEC, params, x, backend=backend)
    assert not np.allclose(np.asarray(base), np.asarray(ref), atol=1e-4)


def test_from_adapters_stacking_and_validation():
    rng = np.random.default_rng(3)
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    per = lambda din, dout: [(mk(din, R), mk(R, dout)) for _ in range(E)]
    lw = MoELoraWeights.from_adapters(per(H, I), per(H, I), per(I, H), 1.5)
    assert lw.num_experts == E and lw.rank == R
    assert lw.gate_a.shape == (E, H, R) and lw.down_b.shape == (E, R, H)
    with pytest.raises(ValueError):
        MoELoraWeights.from_adapters(per(H, I)[:2], per(H, I), per(I, H), 1.0)
    with pytest.raises(ValueError):
        MoELoraWeights.from_adapters([], [], [], 1.0)
    with pytest.raises(ValueError):
        bad = per(I, H)
        bad[0] = (mk(I, R + 4), bad[0][1])  # rank mismatch within a proj
        MoELoraWeights.from_tensors(
            lw.gate_a, lw.gate_b, lw.up_a, lw.up_b,
            mk(E, I, R + 4), lw.down_b, 1.0)


def test_attach_rejects_expert_mismatch():
    params = _params()
    rng = np.random.default_rng(4)
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    lw = MoELoraWeights.from_tensors(
        mk(E + 1, H, R), mk(E + 1, R, I), mk(E + 1, H, R), mk(E + 1, R, I),
        mk(E + 1, I, R), mk(E + 1, R, H), 1.0)
    with pytest.raises(ValueError):
        attach_moe_lora(params, lw)
