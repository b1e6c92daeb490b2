"""SSM tests: segmented-scan ops vs naive sequential recurrences, and
engine-level incremental == full-prefill equivalence for Mamba/Mamba2/
Jamba (the reference pins SSD CUDA kernels against CPU ports the same
way — SURVEY.md §4 GPU tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.ops.ssm import causal_conv1d, selective_scan, ssd_scan
from vllm_rust_tpu.request import SamplingParams


def make_md(chunks, slots, positions_start, s_pad=4, t_pad=None):
    """Metadata for a flat batch: chunks[i] tokens for row i starting at
    positions_start[i]."""
    total = sum(chunks)
    t = t_pad or total
    cu = np.zeros(s_pad + 1, np.int32)
    pos = np.zeros(t, np.int32)
    kv_lens = np.zeros(s_pad, np.int32)
    logits = np.zeros(s_pad, np.int32)
    off = 0
    for i, (n, st) in enumerate(zip(chunks, positions_start)):
        cu[i + 1] = cu[i] + n
        pos[off : off + n] = np.arange(st, st + n)
        kv_lens[i] = st + n
        logits[i] = off + n - 1
        off += n
    cu[len(chunks) + 1 :] = cu[len(chunks)]
    return AttentionMetadata(
        slot_mapping=jnp.zeros(t, jnp.int32),
        kv_lens=jnp.asarray(kv_lens),
        page_indices=jnp.zeros((s_pad, 4), jnp.int32),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([len(chunks)], jnp.int32),
        positions=jnp.asarray(pos),
        logits_indices=jnp.asarray(logits),
        slot_ids=jnp.asarray(
            list(slots) + [0] * (s_pad - len(slots)), jnp.int32
        ),
    )


def naive_conv(u, w, b, init):
    """Sequential causal conv over one sequence. init: [C, K-1] history."""
    c, k = w.shape
    hist = list(init.T)  # K-1 vectors of [C]
    ys = []
    for t in range(u.shape[0]):
        window = hist[-(k - 1) :] + [u[t]] if k > 1 else [u[t]]
        y = sum(window[j] * w[:, j] for j in range(k))
        if b is not None:
            y = y + b
        ys.append(y / (1 + np.exp(-y)))  # silu
        hist.append(u[t])
    state = np.stack(hist[-(k - 1) :], axis=1)
    return np.stack(ys), state


def test_causal_conv1d_vs_naive():
    rng = np.random.default_rng(0)
    c, k = 6, 4
    w = rng.normal(size=(c, k)).astype(np.float32)
    b = rng.normal(size=c).astype(np.float32)
    u1 = rng.normal(size=(5, c)).astype(np.float32)
    u2 = rng.normal(size=(3, c)).astype(np.float32)
    init2 = rng.normal(size=(c, k - 1)).astype(np.float32)

    # row 0: fresh sequence (5 tokens from pos 0); row 1: resumed (pos 7)
    conv_state = jnp.zeros((5, c, k - 1), jnp.float32)
    conv_state = conv_state.at[2].set(init2)
    md = make_md([5, 3], [1, 2], [0, 7])
    u = jnp.asarray(np.concatenate([u1, u2]))
    y, new_state = causal_conv1d(u, jnp.asarray(w), jnp.asarray(b), conv_state, md)

    y1, s1 = naive_conv(u1, w, b, np.zeros((c, k - 1), np.float32))
    y2, s2 = naive_conv(u2, w, b, init2)
    np.testing.assert_allclose(np.asarray(y[:5]), y1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y[5:8]), y2, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state[1]), s1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state[2]), s2, rtol=1e-5, atol=1e-6)


def naive_ssd(x, dt, a_log, b, c, d, init):
    """Sequential Mamba2 recurrence for one sequence."""
    t, h, p = x.shape
    n = b.shape[-1]
    g = b.shape[1]
    rep = h // g
    s = init.copy()  # [H, P, N]
    ys = []
    for i in range(t):
        decay = np.exp(-np.exp(a_log) * dt[i])  # [H]
        bh = np.repeat(b[i], rep, axis=0)  # [H, N]
        ch = np.repeat(c[i], rep, axis=0)
        s = decay[:, None, None] * s + dt[i][:, None, None] * (
            x[i][:, :, None] * bh[:, None, :]
        )
        ys.append(np.einsum("hpn,hn->hp", s, ch) + d[:, None] * x[i])
    return np.stack(ys), s


def test_ssd_scan_vs_naive():
    rng = np.random.default_rng(1)
    h, p, g, n = 4, 3, 2, 5
    a_log = rng.normal(size=h).astype(np.float32)
    d = rng.normal(size=h).astype(np.float32)

    x1 = rng.normal(size=(6, h, p)).astype(np.float32)
    dt1 = rng.uniform(0.1, 1.0, size=(6, h)).astype(np.float32)
    b1 = rng.normal(size=(6, g, n)).astype(np.float32)
    c1 = rng.normal(size=(6, g, n)).astype(np.float32)
    x2 = rng.normal(size=(2, h, p)).astype(np.float32)
    dt2 = rng.uniform(0.1, 1.0, size=(2, h)).astype(np.float32)
    b2 = rng.normal(size=(2, g, n)).astype(np.float32)
    c2 = rng.normal(size=(2, g, n)).astype(np.float32)
    init2 = rng.normal(size=(h, p, n)).astype(np.float32)

    state = jnp.zeros((5, h, p, n), jnp.float32).at[3].set(init2)
    md = make_md([6, 2], [0, 3], [0, 9])
    y, new_state = ssd_scan(
        jnp.asarray(np.concatenate([x1, x2])),
        jnp.asarray(np.concatenate([dt1, dt2])),
        jnp.asarray(a_log),
        jnp.asarray(np.concatenate([b1, b2])),
        jnp.asarray(np.concatenate([c1, c2])),
        jnp.asarray(d),
        state,
        md,
    )
    y1, s1 = naive_ssd(x1, dt1, a_log, b1, c1, d, np.zeros((h, p, n), np.float32))
    y2, s2 = naive_ssd(x2, dt2, a_log, b2, c2, d, init2)
    np.testing.assert_allclose(np.asarray(y[:6]), y1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y[6:8]), y2, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_state[0]), s1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_state[3]), s2, rtol=2e-4, atol=2e-4)


def test_selective_scan_chunked_equals_oneshot():
    """Mamba1 scan: processing [8] in one call == [5]+[3] with carried
    state (the chunked-prefill invariant)."""
    rng = np.random.default_rng(2)
    d, n = 6, 4
    a_log = rng.normal(size=(d, n)).astype(np.float32)
    dsk = rng.normal(size=d).astype(np.float32)
    x = rng.normal(size=(8, d)).astype(np.float32)
    dt = rng.uniform(0.1, 1.0, size=(8, d)).astype(np.float32)
    b = rng.normal(size=(8, n)).astype(np.float32)
    c = rng.normal(size=(8, n)).astype(np.float32)

    st = jnp.zeros((3, d, n), jnp.float32)
    y_full, st_full = selective_scan(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(a_log),
        jnp.asarray(b), jnp.asarray(c), jnp.asarray(dsk),
        st, make_md([8], [1], [0]),
    )
    st2 = jnp.zeros((3, d, n), jnp.float32)
    y_a, st2 = selective_scan(
        jnp.asarray(x[:5]), jnp.asarray(dt[:5]), jnp.asarray(a_log),
        jnp.asarray(b[:5]), jnp.asarray(c[:5]), jnp.asarray(dsk),
        st2, make_md([5], [1], [0]),
    )
    y_b, st2 = selective_scan(
        jnp.asarray(x[5:]), jnp.asarray(dt[5:]), jnp.asarray(a_log),
        jnp.asarray(b[5:]), jnp.asarray(c[5:]), jnp.asarray(dsk),
        st2, make_md([3], [1], [5]),
    )
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([y_a, y_b]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_full[1]), np.asarray(st2[1]), rtol=2e-4, atol=2e-4
    )


# -- model / engine level ------------------------------------------------------


def tiny_mamba2_config(**over):
    d = dict(
        architectures=["Mamba2ForCausalLM"],
        model_type="mamba2",
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=1,
        tie_word_embeddings=True,
        eos_token_id=0,
        state_size=8,
        conv_kernel=4,
        expand=2,
        n_groups=2,
        num_heads=4,  # head_dim = 64/4 = 16
    )
    d.update(over)
    return ModelConfig.from_dict(d)


def tiny_mamba1_config(**over):
    d = dict(
        architectures=["MambaForCausalLM"],
        model_type="mamba",
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=1,
        tie_word_embeddings=True,
        eos_token_id=0,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=4,
    )
    d.update(over)
    return ModelConfig.from_dict(d)


def tiny_jamba_config(**over):
    d = dict(
        architectures=["JambaForCausalLM"],
        model_type="jamba",
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        tie_word_embeddings=True,
        eos_token_id=0,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_dt_rank=4,
        attn_layer_period=2,
        attn_layer_offset=1,
        expert_layer_period=2,
        expert_layer_offset=0,
        num_experts=4,
        num_experts_per_tok=2,
    )
    d.update(over)
    return ModelConfig.from_dict(d)


def build_engine(mc):
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=96,
        token_buckets=(16, 32, 64),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg), model, params


def teacher_forced_check(mc, prompt, n=10):
    """Engine greedy output must match position-by-position argmax of
    fresh full-sequence forwards (incremental state == full prefill)."""
    eng, model, params = build_engine(mc)
    out = eng.generate(
        [prompt], SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    )[0]
    assert len(out.token_ids) == n

    from vllm_rust_tpu.kv_cache.manager import KVCacheManager

    seq = list(prompt)
    for tok in out.token_ids:
        kvm = KVCacheManager(eng.config.cache, model.kv_head_info)
        pools = kvm.create_device_pools(jnp.float32, num_slots=4)
        t = len(seq)
        pages = list(range(1, (t + 15) // 16 + 1))
        md = AttentionMetadata(
            slot_mapping=jnp.asarray(
                [pages[p // 16] * 16 + p % 16 for p in range(t)], jnp.int32
            ),
            kv_lens=jnp.asarray([t, 0, 0, 0], jnp.int32),
            page_indices=jnp.zeros((4, 6), jnp.int32).at[0, : len(pages)].set(
                jnp.asarray(pages, jnp.int32)
            ),
            cu_q_lens=jnp.asarray([0, t, t, t, t], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            positions=jnp.arange(t, dtype=jnp.int32),
            logits_indices=jnp.asarray([t - 1, 0, 0, 0], jnp.int32),
            slot_ids=jnp.asarray([0, 1, 2, 3], jnp.int32),
        )
        hidden, _ = model(params, jnp.asarray(seq, jnp.int32), md, pools)
        logits = model.compute_logits(params, hidden[md.logits_indices])
        pred = int(jnp.argmax(logits[0]))
        assert pred == tok, f"divergence at len {t}: engine {tok} vs full {pred}"
        seq.append(tok)


def test_mamba2_engine_matches_full_prefill():
    teacher_forced_check(tiny_mamba2_config(), [3, 1, 4, 1, 5], n=8)


def test_mamba1_engine_matches_full_prefill():
    teacher_forced_check(tiny_mamba1_config(), [2, 7, 1, 8], n=8)


def test_jamba_engine_matches_full_prefill():
    teacher_forced_check(tiny_jamba_config(), [1, 2, 3, 4, 5], n=8)


def test_mamba2_chunked_prefill_and_batching():
    """Long prompt forced through chunked prefill + concurrent requests."""
    mc = tiny_mamba2_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=16),
        max_model_len=96,
        token_buckets=(16, 32),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = LLMEngine(model, params, cfg)
    long_prompt = [(i % 120) + 1 for i in range(40)]  # 3 chunks of 16
    outs = eng.generate(
        [long_prompt, [5, 6, 7]],
        SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True),
    )
    # reference: same prompts, one at a time with a fresh engine
    for prompt, got in zip([long_prompt, [5, 6, 7]], outs):
        eng2, _, _ = build_engine(mc)
        ref = eng2.generate(
            [prompt], SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
        )[0]
        assert got.token_ids == ref.token_ids


def test_mamba_prefix_caching_rejected():
    mc = tiny_mamba2_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=96,
        enable_prefix_caching=True,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="prefix caching"):
        LLMEngine(model, params, cfg)


def test_jamba_load_weights_naming():
    mc = tiny_jamba_config()
    model = from_config(mc, dtype=jnp.float32)
    h = mc.hidden_size
    rng = np.random.default_rng(0)
    f32 = np.float32
    di = 2 * h
    stream = [
        ("model.embed_tokens.weight", rng.normal(size=(mc.vocab_size, h)).astype(f32)),
        ("model.layers.0.mamba.conv1d.weight", rng.normal(size=(di, 1, 4)).astype(f32)),
        ("model.layers.0.mamba.A_log", rng.normal(size=(di, 8)).astype(f32)),
        ("model.layers.1.self_attn.q_proj.weight",
         rng.normal(size=(mc.num_attention_heads * mc.head_dim, h)).astype(f32)),
        ("model.layers.0.feed_forward.experts.2.gate_proj.weight",
         rng.normal(size=(mc.intermediate_size, h)).astype(f32)),
        ("model.layers.0.feed_forward.experts.0.gate_proj.weight",
         rng.normal(size=(mc.intermediate_size, h)).astype(f32)),
    ]
    # fill remaining experts so stacking succeeds
    for e in (1, 3):
        stream.append(
            (f"model.layers.0.feed_forward.experts.{e}.gate_proj.weight",
             rng.normal(size=(mc.intermediate_size, h)).astype(f32))
        )
    params = model.load_weights(stream)
    assert params["layers"][0]["mamba"]["conv1d"]["weight"].shape == (di, 4)
    assert params["layers"][0]["mamba"]["A_log"].shape == (di, 8)
    assert params["layers"][1]["self_attn"]["q_proj"]["weight"].shape[0] == h
    ex = params["layers"][0]["feed_forward"]["experts"]["gate_proj"]["weight"]
    assert ex.shape == (4, h, mc.intermediate_size)
    assert not np.allclose(np.asarray(ex[2]), 0)
