"""NemotronParse encoder-decoder tests: structure, incremental == full
teacher forcing, and end-to-end engine greedy decode over image input."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from vllm_rust_tpu.engine.encdec import EncoderDecoderEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams

D = 32


def tiny_parse_cfg():
    return ModelConfig.from_dict(dict(
        architectures=["NemotronParseForConditionalGeneration"],
        model_type="nemotron_parse",
        vocab_size=100,
        hidden_size=D,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        eos_token_id=91,
        decoder_start_token_id=90,
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=28, patch_size=14),
        decoder_config=dict(d_model=D, decoder_layers=2,
                            decoder_attention_heads=4, decoder_ffn_dim=64,
                            vocab_size=100),
    ))


def test_structure_and_encode():
    m = from_config(tiny_parse_cfg(), dtype=jnp.float32)
    assert m.is_encoder_decoder
    assert m.num_layers == 2
    assert m.enc_positions == 4  # 2x2 patch grid
    params = m.init_params(jax.random.PRNGKey(0))
    # untied lm_head present
    assert params["lm_head"]["weight"].shape == (D, 100)
    pix = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28))
    cross = m.encode(params, pix)
    assert len(cross) == 2
    assert cross[0].shape == (4, 8, 8)  # [enc, 2*nh, hd]
    assert np.isfinite(np.asarray(cross[0])).all()


def test_engine_greedy_decode():
    mc = tiny_parse_cfg()
    m = from_config(mc, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=16, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=32),
        max_model_len=32,
        token_buckets=(8, 16, 32),
    )
    eng = EncoderDecoderEngine(m, params, cfg)
    pix = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28)))
    eng.add_encoded_request(
        "a", pix, [90],
        SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    got = outs["a"].token_ids
    assert len(got) == 5

    # teacher-forced parity: replay the same prefix through one forward
    from tests.test_model_forward import md_single_seq

    states = [
        {
            "kv": jnp.zeros((8, 16, 8, 8), jnp.float32),
            "cross": jnp.zeros((2, 4, 8, 8), jnp.float32),
            "enc_len": jnp.asarray([4, 0], jnp.int32),
        }
        for _ in range(2)
    ]
    cross = m.encode(params, jnp.asarray(pix))
    for i in range(2):
        states[i]["cross"] = states[i]["cross"].at[0].set(cross[i])
    md = md_single_seq(1 + len(got) - 1)
    ids = jnp.asarray([90] + got[:-1], jnp.int32)
    md = md_single_seq(len(ids))
    md = md.__class__(**{**md.__dict__, "slot_ids": jnp.zeros(
        (md.kv_lens.shape[0],), jnp.int32)}) if not hasattr(
            md, "slot_ids") or md.slot_ids is None else md
    hidden, _ = m(params, ids, md, states)
    logits = m.compute_logits(params, hidden)
    greedy = np.asarray(jnp.argmax(logits, -1))[: len(ids)]
    assert list(greedy) == got, (list(greedy), got)
