"""REAL two-process multihost integration (VERDICT r2 #10).

Reference: crates/server/src/distributed_launcher.rs:1-60 — rank 0
spawns workers; here both processes join one JAX runtime via
``jax.distributed.initialize`` on localhost CPU and run the production
coordinator/worker protocol (parallel/multihost.py broadcast_step).
The replay test (test_multihost.py) simulates lockstep; this one
exercises the actual cross-process broadcast path.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=rank,
)
assert jax.process_count() == 2

import numpy as np
from vllm_rust_tpu.parallel.multihost import (
    StepHeader, broadcast_step, serialize_eplb_plan,
)

# protocol smoke: coordinator broadcasts a step header + payload; the
# worker must receive identical bytes through the real collective
if rank == 0:
    h = StepHeader(alive=1, t=8, s=4, p=4, p_bucket=8, buf_len=10,
                   gmask_words=3, use_penalties=True, cycle_id=5)
    buf = np.arange(10, dtype=np.int32) * 3
    gmask = np.asarray([7, 8, 9], np.int32)
    out = broadcast_step(h, buf, gmask)
else:
    out = broadcast_step(None)
h2, buf2, gmask2, plan2 = out
assert h2.alive == 1 and h2.t == 8 and h2.use_penalties and h2.cycle_id == 5
np.testing.assert_array_equal(np.asarray(buf2), np.arange(10) * 3)
np.testing.assert_array_equal(np.asarray(gmask2), [7, 8, 9])
assert plan2 is None

# shutdown signal
if rank == 0:
    from vllm_rust_tpu.parallel.multihost import StepHeader as SH
    out = broadcast_step(SH(alive=0, t=0, s=0, p=0, p_bucket=0,
                            buf_len=0, gmask_words=0))
else:
    out = broadcast_step(None)
assert out[0].alive == 0

print(f"RANK{rank}_OK")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_broadcast_protocol():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for rank in (0, 1)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank}_OK" in out, out[-2000:]


_ENGINE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=rank,
)
assert jax.device_count() == 2 and len(jax.local_devices()) == 1

import jax.numpy as jnp
import numpy as np
from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.parallel.multihost import MultihostCoordinator, worker_loop
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config

mc = tiny_llama_config(
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=128,
)
cfg = EngineConfig(
    model=mc,
    cache=CacheConfig(num_pages=32, page_size=16),
    scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
    max_model_len=128,
    token_buckets=(16, 32, 64),
    tensor_parallel_size=2,  # tp axis SPANS the two processes
)
model = from_config(mc, dtype=jnp.float32)
params = model.init_params(jax.random.PRNGKey(0))
eng = LLMEngine(model, params, cfg)
assert eng.mesh is not None and eng.mesh.shape["tp"] == 2

if rank == 0:
    MultihostCoordinator(eng)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    eng.add_request("r1", [1, 5, 9, 13], sp)
    outs = []
    while eng.has_unfinished:
        for o in eng.step():
            outs.extend(o.new_token_ids)
    eng.multihost.shutdown()
    print(f"RANK0_TOKENS={outs}")
else:
    worker_loop(eng)
    print("RANK1_DONE")
print(f"RANK{rank}_OK")
"""


def test_two_process_engine_lockstep():
    """Full engine across two processes: the tp mesh axis spans both,
    rank 0 schedules + broadcasts the packed step, rank 1 lockstep-
    dispatches the same jit. Greedy tokens must match the single-process
    result for the same seed/config."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ENGINE_WORKER, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for rank in (0, 1)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"RANK{rank}_OK" in out, out[-2000:]

    # cross-check vs single-process greedy with identical config
    import jax
    import jax.numpy as jnp

    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128,
    )
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = LLMEngine(model, params, cfg)
    want = eng.generate(
        [[1, 5, 9, 13]],
        SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True),
    )[0].token_ids
    import re

    m = re.search(r"RANK0_TOKENS=\[([0-9, ]*)\]", outs[0])
    assert m, outs[0][-2000:]
    got = [int(x) for x in m.group(1).split(",")]
    assert got == want, f"2-process diverged: {got} vs {want}"
