"""Data-parallel serving: request routing over per-replica engines.

TPU-native re-design of the reference's data parallelism
(crates/core/src/distributed/data_parallel.rs): the reference runs one
engine per rank in NCCL lockstep and must all-reduce batch sizes every
step so no rank skips a collective (coordinate_batch_across_dp,
data_parallel.rs:137) and hash requests to ranks
(request_belongs_to_rank, :178). On TPU none of that machinery is
needed: each replica is an independent ``LLMEngine`` compiled against
its own DISJOINT submesh (tp devices each), so there are no cross-
replica collectives to keep in lockstep — XLA dispatch is async and the
replicas' device work overlaps naturally. What remains of DP is pure
routing policy, implemented here.

Routing: least-loaded (waiting + running + in-flight) with round-robin
tie-breaking — better tail latency than the reference's static hash,
which cannot react to imbalanced prompt lengths.
"""

from __future__ import annotations

import jax

from ..config import EngineConfig
from ..request import RequestOutput, SamplingParams
from .engine import LLMEngine


class DataParallelLLMEngine:
    """dp_size independent replicas + a request router.

    Public surface mirrors LLMEngine's serving API (add_request / step /
    abort_request / has_unfinished / generate / stats).
    """

    def __init__(self, model, params, config: EngineConfig, tokenizer=None,
                 devices=None):
        dp = config.data_parallel_size
        tp = config.tensor_parallel_size
        devices = devices if devices is not None else jax.devices()
        if dp * tp > len(devices):
            raise ValueError(
                f"dp={dp} x tp={tp} needs {dp*tp} devices, have {len(devices)}"
            )
        self.config = config
        self.tokenizer = tokenizer
        self.engines: list[LLMEngine] = []
        for r in range(dp):
            sub = devices[r * tp : (r + 1) * tp]
            import dataclasses

            sub_cfg = dataclasses.replace(
                config, data_parallel_size=1, tensor_parallel_size=tp
            )
            self.engines.append(
                LLMEngine(model, params, sub_cfg, tokenizer, devices=sub)
            )
        self._rank_of: dict[str, int] = {}
        self._rr = 0

    # -- routing ------------------------------------------------------------

    def _load(self, eng: LLMEngine) -> int:
        return len(eng.requests) - sum(
            1 for s in eng.requests.values() if s.is_finished
        )

    def _pick_rank(self) -> int:
        loads = [self._load(e) for e in self.engines]
        m = min(loads)
        # round-robin among the least loaded
        n = len(self.engines)
        for i in range(n):
            r = (self._rr + i) % n
            if loads[r] == m:
                self._rr = (r + 1) % n
                return r
        return 0

    # -- serving API --------------------------------------------------------

    def add_request(self, request_id: str, prompt, params: SamplingParams | None = None,
                    priority: int = 0) -> None:
        rank = self._pick_rank()
        self._rank_of[request_id] = rank
        self.engines[rank].add_request(request_id, prompt, params, priority)

    def abort_request(self, request_id: str) -> None:
        rank = self._rank_of.get(request_id)
        if rank is not None:
            self.engines[rank].abort_request(request_id)

    @property
    def has_unfinished(self) -> bool:
        return any(e.has_unfinished for e in self.engines)

    def step(self) -> list[RequestOutput]:
        # dispatch every replica before fetching any results: device work
        # across disjoint submeshes overlaps (async dispatch)
        outs: list[RequestOutput] = []
        for e in self.engines:
            if e.has_unfinished:
                outs.extend(e.step())
        return outs

    def generate(self, prompts, params=None) -> list[RequestOutput]:
        # mirrors LLMEngine.generate's batch loop
        if not isinstance(prompts, list):
            prompts = [prompts]
        plist = params if isinstance(params, list) else [params] * len(prompts)
        ids = []
        for i, (p, sp) in enumerate(zip(prompts, plist)):
            rid = f"gen-dp-{i}"
            ids.append(rid)
            self.add_request(rid, p, sp)
        done: dict[str, RequestOutput] = {}
        while self.has_unfinished:
            for out in self.step():
                if out.finished:
                    done[out.request_id] = out
        return [done[r] for r in ids]

    @property
    def requests(self):
        merged = {}
        for e in self.engines:
            merged.update(e.requests)
        return merged

    @property
    def stats(self):
        agg = {"per_replica": []}
        for e in self.engines:
            agg["per_replica"].append(dict(e.stats))
        for k in ("num_steps", "num_preemptions", "prompt_tokens",
                  "generated_tokens"):
            agg[k] = sum(s.get(k, 0) for s in agg["per_replica"])
        return agg

    def warmup(self, gen_tokens: int = 2) -> float:
        # replicas share compiled executables only if their submeshes are
        # isomorphic; warm each (compile cache makes later ones cheap)
        return sum(e.warmup(gen_tokens) for e in self.engines)

    def reset_prefix_cache(self) -> int:
        return sum(e.reset_prefix_cache() for e in self.engines)
