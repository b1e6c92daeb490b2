"""Qwen3-Next: gated-delta-net scan correctness (vs naive sequential
recurrence) + engine teacher-forced equivalence for the hybrid model."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.ops.ssm import gated_delta_scan

from test_ssm import make_md, teacher_forced_check


def _naive_gdn(q, k, v, alpha, beta, S0):
    """Sequential reference of the gated delta rule for one sequence."""
    S = S0.copy()  # [H, Dk, Dv]
    ys = []
    for t in range(q.shape[0]):
        S = S * alpha[t][:, None, None]
        pred = np.einsum("hkv,hk->hv", S, k[t])
        delta = beta[t][:, None] * (v[t] - pred)
        S = S + np.einsum("hk,hv->hkv", k[t], delta)
        ys.append(np.einsum("hkv,hk->hv", S, q[t]))
    return np.stack(ys), S


def test_gated_delta_scan_vs_naive():
    rng = np.random.default_rng(0)
    h, dk, dv = 2, 4, 3
    lens = [5, 3]
    t = sum(lens)
    q = rng.normal(size=(t, h, dk)).astype(np.float32)
    k = rng.normal(size=(t, h, dk)).astype(np.float32)
    v = rng.normal(size=(t, h, dv)).astype(np.float32)
    alpha = rng.uniform(0.6, 0.99, size=(t, h)).astype(np.float32)
    beta = rng.uniform(0.1, 0.9, size=(t, h)).astype(np.float32)

    state = jnp.zeros((5, h, dk, dv), jnp.float32)
    md = make_md(lens, slots=[0, 1], positions_start=[0, 0])
    y, new_state = gated_delta_scan(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(alpha), jnp.asarray(beta), state, md,
    )
    off = 0
    for i, n in enumerate(lens):
        ref_y, ref_S = _naive_gdn(
            q[off : off + n], k[off : off + n], v[off : off + n],
            alpha[off : off + n], beta[off : off + n],
            np.zeros((h, dk, dv), np.float32),
        )
        np.testing.assert_allclose(np.asarray(y[off : off + n]), ref_y,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(new_state[i]), ref_S,
                                   rtol=2e-5, atol=2e-5)
        off += n


def test_gated_delta_scan_resume():
    """Two chunks must equal one full pass (state carry across steps)."""
    rng = np.random.default_rng(1)
    h, dk, dv = 2, 4, 3
    t = 6
    q = rng.normal(size=(t, h, dk)).astype(np.float32)
    k = rng.normal(size=(t, h, dk)).astype(np.float32)
    v = rng.normal(size=(t, h, dv)).astype(np.float32)
    alpha = rng.uniform(0.6, 0.99, size=(t, h)).astype(np.float32)
    beta = rng.uniform(0.1, 0.9, size=(t, h)).astype(np.float32)
    j = lambda x: jnp.asarray(x)

    state = jnp.zeros((5, h, dk, dv), jnp.float32)
    md_full = make_md([t], slots=[0], positions_start=[0])
    y_full, _ = gated_delta_scan(j(q), j(k), j(v), j(alpha), j(beta),
                                 state, md_full)

    state = jnp.zeros((5, h, dk, dv), jnp.float32)
    md1 = make_md([3], slots=[0], positions_start=[0])
    y1, state = gated_delta_scan(j(q[:3]), j(k[:3]), j(v[:3]),
                                 j(alpha[:3]), j(beta[:3]), state, md1)
    md2 = make_md([3], slots=[0], positions_start=[3])
    y2, state = gated_delta_scan(j(q[3:]), j(k[3:]), j(v[3:]),
                                 j(alpha[3:]), j(beta[3:]), state, md2)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2])), np.asarray(y_full),
        rtol=2e-5, atol=2e-5,
    )


def _tiny_next_config():
    return ModelConfig.from_dict(
        dict(architectures=["Qwen3NextForCausalLM"], model_type="qwen3_next",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=8, tie_word_embeddings=True,
             eos_token_id=0, max_position_embeddings=128,
             num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
             shared_expert_intermediate_size=16, norm_topk_prob=True,
             full_attention_interval=2, attn_output_gate=True,
             linear_num_value_heads=4, linear_num_key_heads=2,
             linear_key_head_dim=8, linear_value_head_dim=8,
             linear_conv_kernel_dim=4)
    )


def test_qwen3_next_structure():
    mc = _tiny_next_config()
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["linear", "full", "linear", "full"]
    info = m.kv_head_info
    assert isinstance(info[1], tuple)
    assert info[0]["ssm"] == (4, 8, 8)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "linear_attn" in params["layers"][0]
    assert "self_attn" not in params["layers"][0]
    assert "g_proj" in params["layers"][1]["self_attn"]
    assert "experts" in params["layers"][0]["mlp"]
    assert "shared_expert" in params["layers"][0]["mlp"]


def test_qwen3_next_engine_matches_full_prefill():
    teacher_forced_check(_tiny_next_config(), [3, 1, 4, 1, 5], n=6)
