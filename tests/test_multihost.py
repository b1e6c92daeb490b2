"""Multi-host scaffolding tests (world_size == 1 identity — the same
single-process strategy the reference uses for its distributed paths)."""

import numpy as np

from vllm_rust_tpu.parallel.multihost import (
    StepHeader,
    broadcast_step,
    init_multihost,
)


def test_header_roundtrip():
    h = StepHeader(alive=1, layout_id=3, p_bucket=16, use_penalties=True,
                   use_top_filters=False, use_grammar=True, use_lora=False,
                   t_pad=64)
    h2 = StepHeader.decode(h.encode())
    assert h2 == h


def test_broadcast_identity_world1():
    h = StepHeader(alive=1, layout_id=0, p_bucket=8, use_penalties=False,
                   use_top_filters=True, use_grammar=False, use_lora=False,
                   t_pad=4)
    buf = np.arange(4, dtype=np.int32)
    h2, buf2 = broadcast_step(h, buf, max_buf=16)
    assert h2 == h
    np.testing.assert_array_equal(np.asarray(buf2)[:4], buf)


def test_init_multihost_single(monkeypatch):
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("WORLD_SIZE", raising=False)
    pid, n = init_multihost()
    assert (pid, n) == (0, 1)
    # reference MASTER_* env names resolve too
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("RANK", "0")
    pid, n = init_multihost()  # world still 1: no distributed init
    assert (pid, n) == (0, 1)
