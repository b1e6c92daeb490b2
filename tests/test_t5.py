"""T5 encoder-decoder tests: HF parity (encoder cross-KV path,
teacher-forced decoder logits with relative position bias) and engine
greedy equivalence through the EncoderDecoderEngine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from vllm_rust_tpu.engine.encdec import EncoderDecoderEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams

torch = pytest.importorskip("torch")


def tiny_t5_dict(proj="relu"):
    return dict(
        architectures=["T5ForConditionalGeneration"],
        model_type="t5",
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj=proj,
        tie_word_embeddings=True,
        n_positions=64,
        eos_token_id=1,
        decoder_start_token_id=0,
    )


def make_pair(proj="relu"):
    from transformers import T5Config, T5ForConditionalGeneration

    hf_cfg = T5Config(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj=proj,
        dropout_rate=0.0,
        tie_word_embeddings=True,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    mc = ModelConfig.from_dict(tiny_t5_dict(proj))
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (k, v.numpy()) for k, v in hf.state_dict().items()
    )
    return model, params, hf, mc


@pytest.mark.parametrize("proj", ["relu", "gated-gelu"])
def test_t5_teacher_forced_parity(proj):
    model, params, hf, mc = make_pair(proj)
    enc_ids = [5, 17, 42, 7, 33, 2]
    dec_ids = [0, 9, 14, 77]
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([enc_ids]),
            decoder_input_ids=torch.tensor([dec_ids]),
        ).logits[0].numpy()

    from vllm_rust_tpu.kv_cache.manager import KVCacheManager
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    kvm = KVCacheManager(CacheConfig(num_pages=8, page_size=16), model.kv_head_info)
    pools = kvm.create_device_pools(jnp.float32, num_slots=2)
    enc = model.encode(params, jnp.asarray(enc_ids, jnp.int32))
    for i, e in enumerate(enc):
        pools[i]["cross"] = pools[i]["cross"].at[0, : e.shape[0]].set(e)
        pools[i]["enc_len"] = pools[i]["enc_len"].at[0].set(e.shape[0])

    t = len(dec_ids)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(16, 16 + t, dtype=jnp.int32),
        kv_lens=jnp.asarray([t, 0], jnp.int32),
        page_indices=jnp.zeros((2, 2), jnp.int32).at[0, 0].set(1),
        cu_q_lens=jnp.asarray([0, t, t], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.asarray([t - 1, 0], jnp.int32),
        slot_ids=jnp.asarray([0, 1], jnp.int32),
    )
    hidden, _ = model(params, jnp.asarray(dec_ids, jnp.int32), md, pools)
    got = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def test_t5_engine_greedy_matches_hf():
    model, params, hf, mc = make_pair()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=16, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
        max_model_len=48,
        token_buckets=(8, 16, 32),
    )
    eng = EncoderDecoderEngine(model, params, cfg)
    enc_ids = np.asarray([5, 17, 42, 7, 33, 2], np.int32)
    n = 6
    eng.add_encoded_request(
        "a", enc_ids, [0],
        SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    got = outs["a"].token_ids

    ids = [0]
    with torch.no_grad():
        for _ in range(n):
            logits = hf(
                input_ids=torch.tensor([enc_ids.tolist()]),
                decoder_input_ids=torch.tensor([ids]),
            ).logits[0, -1]
            ids.append(int(logits.argmax()))
    assert got == ids[1:], f"{got} vs {ids[1:]}"


def test_t5_concurrent_variable_enc_lens():
    """Different encoder lengths in one batch must stay isolated (the
    enc_len mask distinguishes them inside the shared cross buffer)."""
    model, params, hf, mc = make_pair()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=16, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
        max_model_len=48,
        token_buckets=(8, 16, 32),
    )
    p = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    enc_a = np.asarray([5, 17, 42], np.int32)
    enc_b = np.asarray([9, 8, 7, 6, 5, 4, 3, 2], np.int32)

    solo = {}
    for name, e in (("a", enc_a), ("b", enc_b)):
        eng = EncoderDecoderEngine(model, params, cfg)
        eng.add_encoded_request(name, e, [0], p)
        while eng.has_unfinished:
            for o in eng.step():
                if o.finished:
                    solo[name] = o.token_ids

    eng = EncoderDecoderEngine(model, params, cfg)
    eng.add_encoded_request("a", enc_a, [0], p)
    eng.add_encoded_request("b", enc_b, [0], p)
    both = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                both[o.request_id] = o.token_ids
    assert both == solo
