"""Multi-host (DCN) serving scaffolding.

Reference: distributed/launcher.rs (NCCL unique-id bootstrap over TCP,
rank 0 = HTTP server + coordinator) + engine/tensor_parallel.rs
lockstep worker loops. TPU-native shape (SURVEY.md §7.8): processes
join one JAX runtime via ``jax.distributed.initialize`` (coordinator
over DCN); the mesh spans all hosts' devices; the model/KV arrays are
globally sharded; and the only host-side protocol left is getting the
scheduler's per-step PACKED METADATA (one int32 buffer + a tiny static
header) from process 0 to everyone — ``broadcast_one_to_all``. There is
no NCCL bootstrap, no per-tensor send/recv, no worker forward loop to
hand-write: every process calls the same jitted step and XLA runs the
collectives over ICI/DCN.

Process model mirrors the reference: process 0 runs the HTTP server and
the scheduler; processes 1..N-1 run ``worker_loop`` which blocks on the
metadata broadcast and dispatches the same step function.

At world_size == 1 every broadcast is the identity, so the wrapper is
transparent — the same strategy the reference uses to unit-test its
distributed paths single-process (MockCommunicator, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Join the global JAX runtime (reference launcher.rs bootstrap ->
    jax.distributed.initialize over DCN). Falls back to env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID or the MASTER_*
    names the reference uses). Returns (process_id, num_processes)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        coordinator_address = (
            f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '8476')}"
        )
    num_processes = num_processes or int(
        os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", 1))
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("PROCESS_ID", os.environ.get("RANK", 0)))
    )
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return process_id, num_processes


_HEADER_LEN = 8  # [alive, layout_id, p_bucket, flags(4), t_pad]


@dataclasses.dataclass
class StepHeader:
    """The static jit-selector state process 0 must disseminate each step
    (everything else is inside the packed int32 buffer)."""

    alive: int  # 0 = shutdown signal for worker loops
    layout_id: int
    p_bucket: int
    use_penalties: bool
    use_top_filters: bool
    use_grammar: bool
    use_lora: bool
    t_pad: int

    def encode(self) -> np.ndarray:
        return np.asarray(
            [self.alive, self.layout_id, self.p_bucket,
             int(self.use_penalties), int(self.use_top_filters),
             int(self.use_grammar), int(self.use_lora), self.t_pad],
            np.int32,
        )

    @staticmethod
    def decode(a: np.ndarray) -> "StepHeader":
        a = np.asarray(a, np.int32)
        return StepHeader(
            alive=int(a[0]), layout_id=int(a[1]), p_bucket=int(a[2]),
            use_penalties=bool(a[3]), use_top_filters=bool(a[4]),
            use_grammar=bool(a[5]), use_lora=bool(a[6]), t_pad=int(a[7]),
        )


def broadcast_step(header: StepHeader | None, buf: np.ndarray | None,
                   max_buf: int):
    """Process 0 passes its header+buffer; others pass None and receive
    them. Identity at world_size == 1."""
    if jax.process_count() == 1:
        return header, buf
    from jax.experimental import multihost_utils

    payload = np.zeros(_HEADER_LEN + max_buf, np.int32)
    if header is not None:
        payload[:_HEADER_LEN] = header.encode()
        payload[_HEADER_LEN : _HEADER_LEN + buf.shape[0]] = buf
    out = np.asarray(multihost_utils.broadcast_one_to_all(payload))
    h = StepHeader.decode(out[:_HEADER_LEN])
    return h, out[_HEADER_LEN:]


def worker_loop(engine, layouts: dict[int, object]) -> None:
    """Processes 1..N-1: block on the step broadcast and dispatch the
    same jitted step over the globally-sharded state (reference
    engine/tensor_parallel.rs tensor_worker_loop — minus the manual
    tensor broadcast protocol, which SPMD dissolves)."""
    import jax.numpy as jnp

    # packed-buffer capacity: largest token bucket's HostBatch size
    from ..engine.batch_pack import HostBatch

    max_buf = HostBatch(
        max(engine.config.token_buckets), engine.num_slots,
        engine.config.pages_per_seq,
    ).buf.shape[0]
    while True:
        header, payload = broadcast_step(None, None, max_buf)
        if not header.alive:
            return
        buf = payload[: header.t_pad]
        engine.kv_pages, engine.token_counts, engine._ring_write = (
            engine.step_fn(
                engine.params,
                engine.kv_pages,
                jnp.asarray(buf.copy()),
                engine.token_counts,
                engine._ring_write,
                engine._ring_prev,
                engine._dummy_mask,
                layout=layouts[header.layout_id],
                p_bucket=header.p_bucket,
                use_penalties=header.use_penalties,
                use_top_filters=header.use_top_filters,
                use_grammar=header.use_grammar,
                use_lora=header.use_lora,
            )
        )
