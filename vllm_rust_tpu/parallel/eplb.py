"""EPLB — expert-parallel load balancing.

Reference: crates/core/src/moe/{eplb,eplb_execute}.rs (expert load
balancing across ranks + execution plan). Hot experts get replicated
into spare physical slots and the physical slots are packed onto ranks
with a greedy LPT bin-pack; the MoE layer then routes each token to the
least-loaded replica of its logical expert.

TPU shape: the physical expert table is just a gathered copy of the
stacked expert weights ([P, in, out] instead of [E, in, out]) sharded
on the expert axis — "moving an expert" is a device_put of one gather,
not a hand-written weight transfer protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class EplbPlan:
    """Physical-slot layout: phys_to_logical[p] = logical expert served
    by physical slot p; rank r owns slots [r*slots_per_rank, (r+1)*...)."""

    phys_to_logical: np.ndarray  # [P] int
    logical_to_phys: list[list[int]]  # logical -> replica slots
    num_ranks: int
    slots_per_rank: int

    @property
    def num_physical(self) -> int:
        return self.num_ranks * self.slots_per_rank

    def rank_of_slot(self, p: int) -> int:
        return p // self.slots_per_rank

    def rank_loads(self, loads: np.ndarray) -> np.ndarray:
        """Per-rank load under this plan (each logical expert's load is
        split evenly across its replicas)."""
        out = np.zeros(self.num_ranks)
        for logical, slots in enumerate(self.logical_to_phys):
            for p in slots:
                out[self.rank_of_slot(p)] += loads[logical] / len(slots)
        return out


def plan_rebalance(
    loads: np.ndarray, num_ranks: int, slots_per_rank: int | None = None
) -> EplbPlan:
    """Build a balanced physical layout from observed per-expert loads
    (reference eplb.rs rebalancing).

    1. Spare slots (P - E) replicate the hottest experts — each replica
       of an expert with r replicas carries load/r.
    2. Physical slots are LPT-packed onto ranks: heaviest slot first,
       always to the currently lightest rank.
    """
    loads = np.asarray(loads, np.float64)
    e = len(loads)
    if slots_per_rank is None:
        slots_per_rank = -(-e // num_ranks)
    p_total = num_ranks * slots_per_rank
    assert p_total >= e, (p_total, e)

    # replica counts: give each spare slot to the expert with the highest
    # per-replica load
    replicas = np.ones(e, np.int64)
    for _ in range(p_total - e):
        per_rep = loads / replicas
        replicas[int(per_rep.argmax())] += 1

    # physical slot list with per-slot load
    slot_logical: list[int] = []
    slot_load: list[float] = []
    for logical in range(e):
        for _ in range(int(replicas[logical])):
            slot_logical.append(logical)
            slot_load.append(loads[logical] / replicas[logical])

    # LPT pack onto ranks (each rank holds exactly slots_per_rank slots)
    order = np.argsort(slot_load)[::-1]
    rank_load = np.zeros(num_ranks)
    rank_fill = np.zeros(num_ranks, np.int64)
    slot_rank = np.zeros(p_total, np.int64)
    for idx in order:
        open_ranks = np.where(rank_fill < slots_per_rank)[0]
        r = open_ranks[np.argmin(rank_load[open_ranks])]
        slot_rank[idx] = r
        rank_load[r] += slot_load[idx]
        rank_fill[r] += 1

    # materialize: rank-major physical table
    phys_to_logical = np.zeros(p_total, np.int64)
    logical_to_phys: list[list[int]] = [[] for _ in range(e)]
    cursor = np.zeros(num_ranks, np.int64)
    for idx in range(p_total):
        r = slot_rank[idx]
        p = int(r * slots_per_rank + cursor[r])
        cursor[r] += 1
        phys_to_logical[p] = slot_logical[idx]
        logical_to_phys[slot_logical[idx]].append(p)
    return EplbPlan(phys_to_logical, logical_to_phys, num_ranks,
                    slots_per_rank)


def apply_plan_to_experts(expert_params: dict, plan: EplbPlan) -> dict:
    """Gather stacked expert weights [E, ...] into the physical table
    [P, ...] (reference eplb_execute.rs execution plan — here one gather)."""
    idx = jnp.asarray(plan.phys_to_logical, jnp.int32)

    def gather(leaf):
        return jnp.take(leaf, idx, axis=0)

    return jax.tree_util.tree_map(gather, expert_params)


def replica_router(plan: EplbPlan):
    """Returns (map_fn, num_physical): map_fn(topi, token_index) maps
    logical expert ids to physical slots, striding replicas by token
    index so each replica takes an equal share."""
    max_r = max(len(s) for s in plan.logical_to_phys)
    table = np.zeros((len(plan.logical_to_phys), max_r), np.int32)
    counts = np.zeros(len(plan.logical_to_phys), np.int32)
    for logical, slots in enumerate(plan.logical_to_phys):
        counts[logical] = len(slots)
        for j in range(max_r):
            table[logical, j] = slots[j % len(slots)]
    table_j = jnp.asarray(table)
    counts_j = jnp.asarray(counts)

    def map_fn(topi: jax.Array) -> jax.Array:
        t = topi.shape[0]
        stride = jnp.arange(t, dtype=jnp.int32).reshape(
            (t,) + (1,) * (topi.ndim - 1)
        )
        rep = jnp.broadcast_to(stride, topi.shape) % counts_j[topi]
        return table_j[topi, rep]

    return map_fn, plan.num_physical


@dataclass
class EplbState:
    """Online expert-load tracker (EMA over steps). The engine calls
    observe() with each step's routing counts and rebalance() when the
    imbalance factor crosses the threshold."""

    num_experts: int
    num_ranks: int
    decay: float = 0.95
    threshold: float = 1.25  # max/mean rank load triggering a replan
    loads: np.ndarray = field(default=None)
    plan: EplbPlan = field(default=None)

    def __post_init__(self):
        if self.loads is None:
            self.loads = np.zeros(self.num_experts)
        if self.plan is None:
            self.plan = plan_rebalance(
                np.ones(self.num_experts), self.num_ranks
            )

    def observe(self, expert_counts: np.ndarray) -> None:
        self.loads = self.decay * self.loads + (1 - self.decay) * np.asarray(
            expert_counts, np.float64
        )

    def imbalance(self) -> float:
        rl = self.plan.rank_loads(self.loads)
        mean = rl.mean()
        return float(rl.max() / mean) if mean > 0 else 1.0

    def maybe_rebalance(self) -> EplbPlan | None:
        if self.imbalance() <= self.threshold:
            return None
        self.plan = plan_rebalance(self.loads, self.num_ranks,
                                   self.plan.slots_per_rank)
        return self.plan
