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
        # exercise the wire encoding
        self.log.append((StepHeader.decode(header.encode()),
                         hb.buf.copy(), g))


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
                               buf_len=0, gmask_words=0), None, None)

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
