"""Multi-host (DCN) serving: coordinator + worker loops over SPMD.

Reference: distributed/launcher.rs (NCCL unique-id bootstrap over TCP,
rank 0 = HTTP server + coordinator) + engine/tensor_parallel.rs
lockstep worker loops. TPU-native shape (SURVEY.md §7.8): processes
join one JAX runtime via ``jax.distributed.initialize`` (coordinator
over DCN); the mesh spans all hosts' devices; the model/KV arrays are
globally sharded; and the only host-side protocol left is getting the
scheduler's per-step PACKED METADATA (one int32 buffer + a small
header of static jit selectors) from process 0 to everyone —
``broadcast_one_to_all``. There is no NCCL bootstrap, no per-tensor
send/recv, no worker forward loop to hand-write: every process calls
the same jitted step and XLA runs the collectives over ICI/DCN.

Process model mirrors the reference: process 0 runs the HTTP server and
the scheduler (``MultihostCoordinator`` hooks its dispatch); processes
1..N-1 run ``worker_loop`` which blocks on the step broadcast and
dispatches the same step function with the same static selectors, so
every process hits the same jit cache entry.

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


# header fields, all int32 — see StepHeader. Mirrors every static jit
# selector of engine/step_fn.py so worker processes hit the same
# compile-cache entry as the coordinator.
_HEADER_LEN = 22


@dataclasses.dataclass
class StepHeader:
    alive: int  # 0 = shutdown signal for worker loops
    t: int  # PackLayout dims
    s: int
    p: int
    p_bucket: int
    buf_len: int
    gmask_words: int  # packed grammar-mask byte count (0 = none)
    use_penalties: bool = False
    use_top_filters: bool = False
    use_grammar: bool = False
    use_lora: bool = False
    decode_only: bool = False
    use_bias: bool = False
    use_typical: bool = False
    use_top_logprobs: bool = False
    use_prompt_logprobs: bool = False
    use_eplb: bool = False
    # lockstep EPLB (ADVICE r2): coordinator-side rebalances must reach
    # every process or params diverge after the first replan
    eplb_reset: bool = False  # zero the device count accumulator now
    mrope: bool = False  # PackLayout carries 3-axis position rows
    vocab: int = 0
    cycle_id: int = 0  # workers rotate their token rings on increment
    eplb_plan_len: int = 0  # serialized-plan ints appended to the payload

    _BOOLS = (
        "use_penalties", "use_top_filters", "use_grammar", "use_lora",
        "decode_only", "use_bias", "use_typical", "use_top_logprobs",
        "use_prompt_logprobs", "use_eplb", "eplb_reset", "mrope",
    )

    def encode(self) -> np.ndarray:
        ints = [self.alive, self.t, self.s, self.p, self.p_bucket,
                self.buf_len, self.gmask_words]
        ints += [int(getattr(self, b)) for b in self._BOOLS]
        ints += [self.vocab, self.cycle_id, self.eplb_plan_len]
        return np.asarray(ints, np.int32)

    @staticmethod
    def decode(a: np.ndarray) -> "StepHeader":
        a = np.asarray(a, np.int32)
        h = StepHeader(
            alive=int(a[0]), t=int(a[1]), s=int(a[2]), p=int(a[3]),
            p_bucket=int(a[4]), buf_len=int(a[5]), gmask_words=int(a[6]),
        )
        for i, b in enumerate(StepHeader._BOOLS):
            setattr(h, b, bool(a[7 + i]))
        h.vocab = int(a[19])
        h.cycle_id = int(a[20])
        h.eplb_plan_len = int(a[21])
        return h


def serialize_eplb_plan(plan) -> np.ndarray:
    """EplbPlan -> int32 vector preserving replica ordering exactly
    (replica_router strides by list position; all processes must build
    the identical table)."""
    ints = [plan.num_ranks, plan.slots_per_rank, len(plan.logical_to_phys)]
    ints += [len(s) for s in plan.logical_to_phys]
    for s in plan.logical_to_phys:
        ints += s
    return np.asarray(ints, np.int32)


def deserialize_eplb_plan(a: np.ndarray):
    from .eplb import EplbPlan

    a = [int(x) for x in np.asarray(a, np.int32)]
    num_ranks, spr, e = a[0], a[1], a[2]
    lens, rest = a[3 : 3 + e], a[3 + e :]
    logical_to_phys, off = [], 0
    for n in lens:
        logical_to_phys.append(rest[off : off + n])
        off += n
    p2l = np.zeros(num_ranks * spr, np.int64)
    for logical, slots in enumerate(logical_to_phys):
        for p in slots:
            p2l[p] = logical
    return EplbPlan(p2l, logical_to_phys, num_ranks, spr)


def _broadcast(arr: np.ndarray | None, length: int) -> np.ndarray:
    """One-to-all int32 broadcast; identity at world_size == 1."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    payload = np.zeros(length, np.int32)
    if arr is not None:
        payload[: arr.shape[0]] = arr
    return np.asarray(multihost_utils.broadcast_one_to_all(payload))


def broadcast_step(
    header: StepHeader | None,
    buf: np.ndarray | None = None,
    gmask: np.ndarray | None = None,
    eplb_plan: np.ndarray | None = None,
):
    """Two-phase step broadcast: the fixed-size header first (it carries
    the payload length), then buffer + packed grammar mask + any pending
    EPLB plan. Process 0 passes its values; workers pass None and
    receive them."""
    if jax.process_count() == 1:
        return header, buf, gmask, eplb_plan
    h_arr = _broadcast(
        header.encode() if header is not None else None, _HEADER_LEN
    )
    h = StepHeader.decode(h_arr)
    if not h.alive:
        return h, None, None, None
    if header is not None:  # coordinator
        payload = np.concatenate(
            [buf.astype(np.int32)]
            + ([gmask.astype(np.int32)] if gmask is not None else [])
            + ([eplb_plan.astype(np.int32)] if eplb_plan is not None else [])
        )
    else:
        payload = None
    out = _broadcast(payload, h.buf_len + h.gmask_words + h.eplb_plan_len)
    buf_out = out[: h.buf_len]
    gmask_out = (
        out[h.buf_len : h.buf_len + h.gmask_words] if h.gmask_words else None
    )
    plan_out = out[h.buf_len + h.gmask_words :] if h.eplb_plan_len else None
    return h, buf_out, gmask_out, plan_out


def _pack_mask(mask: np.ndarray) -> np.ndarray:
    """bool [S, V] -> packed int32 words."""
    bits = np.packbits(mask.reshape(-1).astype(np.uint8))
    pad = (-bits.shape[0]) % 4
    if pad:
        bits = np.pad(bits, (0, pad))
    return bits.view(np.int32)


def _unpack_mask(words: np.ndarray, s: int, vocab: int) -> np.ndarray:
    bits = np.unpackbits(np.asarray(words, np.int32).view(np.uint8))
    return bits[: s * vocab].reshape(s, vocab).astype(bool)


class MultihostCoordinator:
    """Process-0 side: installed on the engine as ``engine.multihost``;
    the dispatch path calls :meth:`broadcast_dispatch` right before
    ``step_fn`` so workers execute the same step in lockstep."""

    def __init__(self, engine):
        self.engine = engine
        engine.multihost = self

    def broadcast_dispatch(
        self, hb, grammar_mask: np.ndarray | None, p_bucket: int,
        cycle_id: int = 0, **flags
    ) -> None:
        L = hb.layout
        gmask = (
            _pack_mask(grammar_mask) if grammar_mask is not None else None
        )
        # pending EPLB sync recorded by the engine's _eplb_refresh: ship
        # the counts reset + replan so every process mutates params in
        # lockstep (ADVICE r2)
        eng = self.engine
        reset = bool(getattr(eng, "_eplb_pending_reset", False))
        plan = getattr(eng, "_eplb_pending_plan", None)
        eng._eplb_pending_reset = False
        eng._eplb_pending_plan = None
        plan_arr = serialize_eplb_plan(plan) if plan is not None else None
        header = StepHeader(
            alive=1, t=L.t, s=L.s, p=L.p, p_bucket=p_bucket,
            buf_len=hb.buf.shape[0],
            gmask_words=0 if gmask is None else gmask.shape[0],
            vocab=(
                0 if grammar_mask is None else grammar_mask.shape[1]
            ),
            cycle_id=cycle_id,
            mrope=L.mrope,
            eplb_reset=reset,
            eplb_plan_len=0 if plan_arr is None else plan_arr.shape[0],
            **flags,
        )
        broadcast_step(header, hb.buf, gmask, plan_arr)

    def shutdown(self) -> None:
        broadcast_step(
            StepHeader(alive=0, t=0, s=0, p=0, p_bucket=0, buf_len=0,
                       gmask_words=0)
        )


def worker_loop(engine, *, _broadcast_fn=broadcast_step) -> None:
    """Processes 1..N-1: block on the step broadcast and dispatch the
    same jitted step over the globally-sharded state (reference
    engine/tensor_parallel.rs tensor_worker_loop — minus the manual
    tensor broadcast protocol, which SPMD dissolves). ``_broadcast_fn``
    is injectable so the loop is unit-testable single-process."""
    import jax.numpy as jnp

    from ..engine.batch_pack import PackLayout

    cycle_id = 0
    while True:
        header, buf, gwords, plan_words = _broadcast_fn(None)
        if header is None or not header.alive:
            return
        if header.cycle_id != cycle_id:
            # stay in ring lockstep with the coordinator's cycle (workers
            # never fetch results, so just advance the pool index)
            engine._ring_idx = (engine._ring_idx + 1) % engine._num_rings
            cycle_id = header.cycle_id
        if header.eplb_reset:
            # mirror the coordinator's _eplb_refresh counts reset
            engine._eplb_counts = engine._place(
                jnp.zeros_like(engine._eplb_counts)
            )
        if plan_words is not None:
            engine._apply_eplb_plan(deserialize_eplb_plan(plan_words))
        layout = PackLayout(header.t, header.s, header.p, header.mrope)
        if gwords is not None:
            gmask_dev = jnp.asarray(
                _unpack_mask(gwords, header.s, header.vocab)
            )
        else:
            gmask_dev = engine._dummy_mask
        step_out = engine.step_fn(
            engine.params,
            engine.kv_pages,
            jnp.asarray(np.asarray(buf, np.int32).copy()),
            engine.token_counts,
            engine._ring_write,
            engine._ring_prev,
            gmask_dev,
            engine._eplb_counts if header.use_eplb else engine._dummy_eplb,
            layout=layout,
            p_bucket=header.p_bucket,
            use_penalties=header.use_penalties,
            use_top_filters=header.use_top_filters,
            use_grammar=header.use_grammar,
            use_lora=header.use_lora,
            decode_only=header.decode_only,
            use_bias=header.use_bias,
            use_typical=header.use_typical,
            use_top_logprobs=header.use_top_logprobs,
            use_prompt_logprobs=header.use_prompt_logprobs,
            use_eplb=header.use_eplb,
        )
        step_out = list(step_out)
        if header.use_eplb:
            engine._eplb_counts = step_out.pop()
        if header.use_prompt_logprobs:
            engine.kv_pages, engine.token_counts, engine._ring_write = (
                step_out[0], step_out[1], step_out[2]
            )
        else:
            engine.kv_pages, engine.token_counts, engine._ring_write = (
                step_out[:3]
            )
