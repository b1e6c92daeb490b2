"""Multi-host serving protocol (parallel/multihost.py).

Reference: crates/core/src/distributed/launcher.rs + engine/
tensor_parallel.rs worker loops. World-size 1 broadcasts are identity,
so the coordinator→worker lockstep is testable single-process by
recording the coordinator's dispatch stream and replaying it into a
second identical engine's worker_loop (the MockCommunicator strategy,
SURVEY.md §4).
"""

import jax
import numpy as np

from tests.test_engine import MockTokenizer, make_engine
from vllm_rust_tpu.parallel.multihost import (
    MultihostCoordinator,
    StepHeader,
    _pack_mask,
    _unpack_mask,
    deserialize_eplb_plan,
    serialize_eplb_plan,
    worker_loop,
)
from vllm_rust_tpu.request import SamplingParams


def test_step_header_roundtrip():
    h = StepHeader(
        alive=1, t=64, s=8, p=16, p_bucket=32, buf_len=500, gmask_words=12,
        use_penalties=True, use_grammar=True, decode_only=True,
        use_top_logprobs=True, vocab=151, cycle_id=7,
    )
    h2 = StepHeader.decode(h.encode())
    assert h2 == h


def test_mask_pack_roundtrip():
    rng = np.random.default_rng(0)
    mask = rng.random((8, 151)) < 0.3
    words = _pack_mask(mask)
    assert words.dtype == np.int32
    np.testing.assert_array_equal(_unpack_mask(words, 8, 151), mask)


class RecordingCoordinator(MultihostCoordinator):
    """Capture the coordinator's broadcast stream instead of sending."""

    def __init__(self, engine):
        super().__init__(engine)
        self.log = []

    def broadcast_dispatch(self, hb, grammar_mask, p_bucket,
                           cycle_id=0, **flags):
        L = hb.layout
        g = _pack_mask(grammar_mask) if grammar_mask is not None else None
        header = StepHeader(
            alive=1, t=L.t, s=L.s, p=L.p, p_bucket=p_bucket,
            buf_len=hb.buf.shape[0],
            gmask_words=0 if g is None else g.shape[0],
            vocab=0 if grammar_mask is None else grammar_mask.shape[1],
            cycle_id=cycle_id, **flags,
        )
        # mirror the production pending-EPLB pickup (ADVICE r2)
        eng = self.engine
        header.eplb_reset = bool(getattr(eng, "_eplb_pending_reset", False))
        plan = getattr(eng, "_eplb_pending_plan", None)
        eng._eplb_pending_reset = False
        eng._eplb_pending_plan = None
        pw = serialize_eplb_plan(plan) if plan is not None else None
        header.eplb_plan_len = 0 if pw is None else pw.shape[0]
        # exercise the wire encoding
        self.log.append((StepHeader.decode(header.encode()),
                         hb.buf.copy(), g, pw))


def test_worker_lockstep_replay():
    """A worker engine replaying the coordinator's broadcast stream must
    land in the same device state (token ring + counts)."""
    coord = make_engine(fetch_interval=3)
    RecordingCoordinator(coord)
    coord.add_request("r1", [1, 5, 9, 13], SamplingParams(max_tokens=6,
                                                          temperature=0.0))
    coord.add_request("r2", [2, 4], SamplingParams(max_tokens=5,
                                                   temperature=0.0))
    outs = {}
    while coord.has_unfinished:
        for r in coord.step():
            outs.setdefault(r.request_id, []).extend(r.new_token_ids)
    log = coord.multihost.log
    assert len(log) >= 6  # prefill + decode steps all broadcast

    worker = make_engine(fetch_interval=3)  # identical params (same seed)
    stream = iter(log)

    def fake_broadcast(_none, *a, **kw):
        try:
            return next(stream)
        except StopIteration:
            return (StepHeader(alive=0, t=0, s=0, p=0, p_bucket=0,
                               buf_len=0, gmask_words=0), None, None, None)

    worker_loop(worker, _broadcast_fn=fake_broadcast)
    np.testing.assert_array_equal(
        np.asarray(coord.token_counts), np.asarray(worker.token_counts)
    )
    np.testing.assert_array_equal(
        np.asarray(coord._ring_write), np.asarray(worker._ring_write)
    )
    np.testing.assert_array_equal(
        np.asarray(coord._ring_prev), np.asarray(worker._ring_prev)
    )


def test_eplb_plan_wire_roundtrip():
    """Replica ORDER must survive the wire: replica_router strides by
    list position, so all processes must rebuild the identical table."""
    from vllm_rust_tpu.parallel.eplb import plan_rebalance

    rng = np.random.default_rng(3)
    plan = plan_rebalance(rng.random(8) * 100, num_ranks=4, slots_per_rank=3)
    p2 = deserialize_eplb_plan(serialize_eplb_plan(plan))
    assert p2.num_ranks == plan.num_ranks
    assert p2.slots_per_rank == plan.slots_per_rank
    assert [list(s) for s in p2.logical_to_phys] == [
        list(s) for s in plan.logical_to_phys
    ]
    np.testing.assert_array_equal(p2.phys_to_logical, plan.phys_to_logical)


def make_moe_engine():
    import jax.numpy as jnp

    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config(
        architectures=["Qwen3MoeForCausalLM"], model_type="qwen3_moe",
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        norm_topk_prob=True, head_dim=16,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    return LLMEngine(model, params, cfg)


def test_worker_applies_broadcast_eplb_plan():
    """An EPLB replan recorded by the coordinator must reach the worker's
    params through the step broadcast (ADVICE r2: divergence bug)."""
    coord = make_moe_engine()
    coord.enable_eplb(num_ranks=2, interval=2, slots_per_rank=None)
    coord.eplb.threshold = 1.0 - 1e-9  # force replan at every refresh
    RecordingCoordinator(coord)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    coord.add_request("r1", [1, 2, 3], sp)
    while coord.has_unfinished:
        coord.step()
    assert coord.stats.get("eplb_rebalances", 0) >= 1
    resets = [h.eplb_reset for h, *_ in coord.multihost.log]
    plans = [pw for *_, pw in coord.multihost.log if pw is not None]
    assert any(resets) and plans, (resets, len(plans))

    worker = make_moe_engine()
    worker.enable_eplb(num_ranks=2, interval=2, slots_per_rank=None)
    stream = iter(coord.multihost.log)

    def fake_broadcast(_none, *a, **kw):
        try:
            return next(stream)
        except StopIteration:
            return (StepHeader(alive=0, t=0, s=0, p=0, p_bucket=0,
                               buf_len=0, gmask_words=0), None, None, None)

    worker_loop(worker, _broadcast_fn=fake_broadcast)
    for (li, _), (lj, _) in zip(
        coord._eplb_logical, worker._eplb_logical
    ):
        cm = coord.params["layers"][li]["mlp"]
        wm = worker.params["layers"][lj]["mlp"]
        np.testing.assert_array_equal(
            np.asarray(cm["eplb_table"]), np.asarray(wm["eplb_table"])
        )
        cl = jax.tree_util.tree_leaves(cm["experts"])
        wl = jax.tree_util.tree_leaves(wm["experts"])
        assert len(cl) == len(wl)
        for a, b in zip(cl, wl):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(coord._eplb_counts), np.asarray(worker._eplb_counts)
    )
