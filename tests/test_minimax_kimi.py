"""MiniMax-Text-01 lightning attention + Kimi-Linear KDA: scan
correctness vs naive sequential recurrences, structure, and engine
teacher-forced equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.ops.ssm import kda_scan, lightning_scan

from test_ssm import make_md, teacher_forced_check


# -- lightning scan ---------------------------------------------------------


def _naive_lightning(q, k, v, decay, S0):
    """S_t = λ_h S_{t-1} + k⊗v; y_t = q @ S_t (state updated first)."""
    S = S0.copy()  # [H, D, D]
    ys = []
    for t in range(q.shape[0]):
        S = S * decay[:, None, None] + np.einsum("hd,he->hde", k[t], v[t])
        ys.append(np.einsum("hde,hd->he", S, q[t]))
    return np.stack(ys), S


def test_lightning_scan_vs_naive():
    rng = np.random.default_rng(0)
    h, d = 3, 4
    lens = [7, 5]
    t = sum(lens)
    q = rng.normal(size=(t, h, d)).astype(np.float32)
    k = rng.normal(size=(t, h, d)).astype(np.float32)
    v = rng.normal(size=(t, h, d)).astype(np.float32)
    decay = rng.uniform(0.5, 0.99, size=(h,)).astype(np.float32)

    state = jnp.zeros((5, h, d, d), jnp.float32)
    md = make_md(lens, slots=[0, 1], positions_start=[0, 0])
    # chunk=3 exercises multi-chunk + partial-final-chunk paths
    y, new_state = lightning_scan(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(decay), state, md, chunk=3,
    )
    off = 0
    for i, n in enumerate(lens):
        ref_y, ref_S = _naive_lightning(
            q[off : off + n], k[off : off + n], v[off : off + n],
            decay, np.zeros((h, d, d), np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(y[off : off + n]), ref_y, rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state[i]), ref_S, rtol=2e-5, atol=2e-5
        )
        off += n


def test_lightning_scan_resume():
    """Chunked prefill (state carry across engine steps) must equal one
    full pass."""
    rng = np.random.default_rng(1)
    h, d = 2, 4
    t = 9
    q = rng.normal(size=(t, h, d)).astype(np.float32)
    k = rng.normal(size=(t, h, d)).astype(np.float32)
    v = rng.normal(size=(t, h, d)).astype(np.float32)
    decay = rng.uniform(0.5, 0.99, size=(h,)).astype(np.float32)
    j = jnp.asarray

    state = jnp.zeros((5, h, d, d), jnp.float32)
    md_full = make_md([t], slots=[0], positions_start=[0])
    y_full, _ = lightning_scan(j(q), j(k), j(v), j(decay), state, md_full,
                               chunk=4)

    state = jnp.zeros((5, h, d, d), jnp.float32)
    md1 = make_md([5], slots=[0], positions_start=[0])
    y1, state = lightning_scan(j(q[:5]), j(k[:5]), j(v[:5]), j(decay),
                               state, md1, chunk=4)
    md2 = make_md([4], slots=[0], positions_start=[5])
    y2, state = lightning_scan(j(q[5:]), j(k[5:]), j(v[5:]), j(decay),
                               state, md2, chunk=4)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2])), np.asarray(y_full),
        rtol=2e-5, atol=2e-5,
    )


# -- KDA scan ---------------------------------------------------------------


def _naive_kda(q, k, v, log_g, beta, S0):
    """Per-channel gated delta rule, sequential."""
    S = S0.copy()  # [H, Dk, Dv]
    ys = []
    for t in range(q.shape[0]):
        S = S * np.exp(log_g[t])[:, :, None]
        pred = np.einsum("hkv,hk->hv", S, k[t])
        delta = beta[t][:, None] * (v[t] - pred)
        S = S + np.einsum("hk,hv->hkv", k[t], delta)
        ys.append(np.einsum("hkv,hk->hv", S, q[t]))
    return np.stack(ys), S


def test_kda_scan_vs_naive():
    rng = np.random.default_rng(2)
    h, dk, dv = 2, 4, 4
    lens = [6, 3]
    t = sum(lens)
    q = rng.normal(size=(t, h, dk)).astype(np.float32)
    k = rng.normal(size=(t, h, dk)).astype(np.float32)
    v = rng.normal(size=(t, h, dv)).astype(np.float32)
    log_g = -rng.uniform(0.01, 0.5, size=(t, h, dk)).astype(np.float32)
    beta = rng.uniform(0.1, 0.9, size=(t, h)).astype(np.float32)

    state = jnp.zeros((5, h, dk, dv), jnp.float32)
    md = make_md(lens, slots=[0, 1], positions_start=[0, 0])
    y, new_state = kda_scan(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(log_g), jnp.asarray(beta), state, md,
    )
    off = 0
    for i, n in enumerate(lens):
        ref_y, ref_S = _naive_kda(
            q[off : off + n], k[off : off + n], v[off : off + n],
            log_g[off : off + n], beta[off : off + n],
            np.zeros((h, dk, dv), np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(y[off : off + n]), ref_y, rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state[i]), ref_S, rtol=2e-5, atol=2e-5
        )
        off += n


# -- MiniMax-Text-01 ----------------------------------------------------------


def _tiny_minimax_config():
    return ModelConfig.from_dict(
        dict(architectures=["MiniMaxText01ForCausalLM"],
             model_type="minimax_text01",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=8, tie_word_embeddings=True,
             eos_token_id=0, max_position_embeddings=128,
             attn_type_list=[0, 1, 0, 1],
             num_local_experts=4, num_experts_per_tok=2,
             shared_intermediate_size=16, shared_moe_mode="sigmoid",
             layernorm_linear_attention_alpha=1.0,
             layernorm_linear_attention_beta=1.0,
             layernorm_full_attention_alpha=1.0,
             layernorm_full_attention_beta=1.0,
             layernorm_mlp_alpha=1.0, layernorm_mlp_beta=1.0)
    )


def test_minimax_structure():
    m = from_config(_tiny_minimax_config(), dtype=jnp.float32)
    assert m.kinds == ["linear", "full", "linear", "full"]
    info = m.kv_head_info
    assert info[0] == {"ssm": (4, 8, 8)}
    assert info[1] == (2, 8)
    params = m.init_params(jax.random.PRNGKey(0))
    sa = params["layers"][0]["self_attn"]
    assert set(sa) == {"qkv_proj", "output_gate", "out_proj", "norm"}
    assert "q_proj" in params["layers"][1]["self_attn"]
    assert "experts" in params["layers"][0]["mlp"]
    assert "shared_mlp" in params["layers"][0]
    assert "coefficient" in params["layers"][0]
    # layer-scaled decay: first linear layer decays slower than the last
    assert float(m.decays[0][0]) < float(m.decays[2][0])


def test_minimax_engine_matches_full_prefill():
    teacher_forced_check(_tiny_minimax_config(), [3, 1, 4, 1, 5], n=6)


def test_minimax_dense_no_shared():
    cfg = ModelConfig.from_dict(
        dict(architectures=["MiniMaxText01ForCausalLM"],
             model_type="minimax_text01",
             vocab_size=64, hidden_size=16, intermediate_size=32,
             num_hidden_layers=2, num_attention_heads=2,
             num_key_value_heads=2, head_dim=8, tie_word_embeddings=True,
             eos_token_id=0, max_position_embeddings=64,
             attn_type_list=[0, 1], num_local_experts=1)
    )
    teacher_forced_check(cfg, [2, 3], n=4)


# -- Kimi-Linear --------------------------------------------------------------


def _tiny_kimi_config():
    return ModelConfig.from_dict(
        dict(architectures=["KimiLinearForCausalLM"],
             model_type="kimi_linear",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=8, tie_word_embeddings=True,
             eos_token_id=0, max_position_embeddings=128,
             kda_layers=[0, 2], is_moe=True, num_experts=4,
             num_experts_per_token=2, moe_intermediate_size=16,
             first_k_dense_replace=1, num_shared_experts=1,
             routed_scaling_factor=1.0,
             linear_attn_config=dict(short_conv_kernel_size=4,
                                     num_heads=4, head_dim=8))
    )


def test_kimi_structure():
    m = from_config(_tiny_kimi_config(), dtype=jnp.float32)
    assert m.kinds == ["kda", "full", "kda", "full"]
    info = m.kv_head_info
    assert info[0] == {"conv": (96, 3), "ssm": (4, 8, 8)}
    assert info[1] == (2, 8)
    params = m.init_params(jax.random.PRNGKey(0))
    la = params["layers"][0]["linear_attn"]
    assert "q_proj" in la and "f_a_proj" in la and "o_norm" in la
    assert "self_attn" not in params["layers"][0]
    assert "experts" not in params["layers"][0]["mlp"]  # first_k_dense
    assert "experts" in params["layers"][1]["mlp"]
    assert "shared_experts" in params["layers"][1]["mlp"]


def test_kimi_engine_matches_full_prefill():
    teacher_forced_check(_tiny_kimi_config(), [3, 1, 4, 1, 5], n=6)


def test_kimi_conv_packing():
    """Separate q/k/v_conv1d checkpoint tensors pack into the fused conv."""
    m = from_config(_tiny_kimi_config(), dtype=jnp.float32)
    inner = 32
    rng = np.random.default_rng(3)
    stream = []
    for which in ("q_conv1d", "k_conv1d", "v_conv1d"):
        stream.append(
            (f"model.layers.0.linear_attn.{which}.weight",
             rng.normal(size=(inner, 1, 4)).astype(np.float32))
        )
    params = m.load_weights(iter(stream))
    wfused = np.asarray(params["layers"][0]["linear_attn"]["conv1d"]["weight"])
    np.testing.assert_allclose(wfused[:inner], stream[0][1][:, 0, :])
    np.testing.assert_allclose(wfused[2 * inner :], stream[2][1][:, 0, :])
