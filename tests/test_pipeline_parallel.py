"""Pipeline-parallel tests: stage partitioning, microbatch metadata
split, and a PP forward on a virtual pp×tp mesh that must match the
single-device forward bit-for-bit (same math, different placement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.parallel.pipeline import (
    PipelineRunner,
    PipelineStageConfig,
    split_md_by_seqs,
)
from vllm_rust_tpu.testing import tiny_llama_config
from tests.test_misc_archs import _smoke  # noqa: F401 (conftest mesh)
from tests.test_model_forward import make_kv_pages, md_single_seq


def test_stage_boundaries():
    sc = PipelineStageConfig(num_layers=7, num_stages=3)
    assert sc.boundaries() == [(0, 3), (3, 5), (5, 7)]
    assert sc.stage_of_layer(0) == 0
    assert sc.stage_of_layer(4) == 1
    assert sc.stage_of_layer(6) == 2


def _two_seq_md(lens, s_pad=4, pages_per_seq=6):
    total = sum(lens)
    cu = np.zeros(s_pad + 1, np.int32)
    pos = np.zeros(total, np.int32)
    kv_lens = np.zeros(s_pad, np.int32)
    logits = np.zeros(s_pad, np.int32)
    slot_map = np.zeros(total, np.int32)
    page_idx = np.zeros((s_pad, pages_per_seq), np.int32)
    off = 0
    for i, n in enumerate(lens):
        cu[i + 1] = cu[i] + n
        pos[off : off + n] = np.arange(n)
        kv_lens[i] = n
        logits[i] = off + n - 1
        pages = [i * 3 + 1, i * 3 + 2]
        page_idx[i, :2] = pages
        slot_map[off : off + n] = [
            pages[q // 16] * 16 + q % 16 for q in range(n)
        ]
        off += n
    cu[len(lens) + 1 :] = cu[len(lens)]
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    return AttentionMetadata(
        slot_mapping=jnp.asarray(slot_map),
        kv_lens=jnp.asarray(kv_lens),
        page_indices=jnp.asarray(page_idx),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([len(lens)], jnp.int32),
        positions=jnp.asarray(pos),
        logits_indices=jnp.asarray(logits),
        slot_ids=jnp.asarray([0, 1, 2, 3], jnp.int32),
    )


def test_split_md_by_seqs():
    md = _two_seq_md([5, 3])
    mbs = split_md_by_seqs(md, 2)
    assert len(mbs) == 2
    md0, t0, t1 = mbs[0]
    assert (t0, t1) == (0, 5)
    assert int(np.asarray(md0.num_seqs)[0]) == 1
    assert list(np.asarray(md0.cu_q_lens)) == [0, 5]
    md1, t0, t1 = mbs[1]
    assert (t0, t1) == (5, 8)
    assert list(np.asarray(md1.cu_q_lens)) == [0, 3]
    assert int(np.asarray(md1.logits_indices)[0]) == 2


@pytest.mark.parametrize("microbatches", [1, 2])
def test_pp_forward_matches_single_device(microbatches):
    devices = jax.devices()
    assert len(devices) >= 4
    mesh = Mesh(np.array(devices[:4]).reshape(2, 2), ("pp", "tp"))

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    # reference: plain single-device forward over 2 sequences
    md = _two_seq_md([5, 3])
    ids = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, mc.vocab_size)
    kv = make_kv_pages(model)
    h, _ = model(params, ids, md, kv)
    ref = np.asarray(model.compute_logits(params, h))

    runner = PipelineRunner(model, mesh)
    p2 = runner.place_params(params)
    kv2 = make_kv_pages(model)
    logits, new_pages = runner(p2, ids, md, kv2,
                               num_microbatches=microbatches)
    assert len(new_pages) == model.num_layers
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-5, atol=2e-5)


def test_pp_rejects_unsupported_model():
    from vllm_rust_tpu.config import ModelConfig

    devices = jax.devices()
    mesh = Mesh(np.array(devices[:4]).reshape(2, 2), ("pp", "tp"))
    mc = ModelConfig.from_dict(
        dict(architectures=["Qwen3MoeForCausalLM"], vocab_size=64,
             hidden_size=32, intermediate_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, num_experts=2,
             num_experts_per_tok=1, moe_intermediate_size=16)
    )
    model = from_config(mc, dtype=jnp.float32)
    with pytest.raises(ValueError, match="pipeline"):
        PipelineRunner(model, mesh)
