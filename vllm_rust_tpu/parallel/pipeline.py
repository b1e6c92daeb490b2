"""Pipeline parallelism: contiguous layer partition over a "pp" device
axis with microbatched stage streaming.

Reference: crates/core/src/distributed/pipeline.rs
(PipelineStageConfig :31, P2P communicator :104, sync executor +
microbatch split/merge :152,199-240) and engine/pipeline.rs
pipeline_worker_loop. TPU design: there is no explicit send/recv worker
protocol — each stage's parameters live on that stage's devices
(device_put with a per-stage sharding); a stage forward is a jitted
function whose output activation is transferred to the next stage's
devices by the runtime. Microbatches are dispatched asynchronously, so
stage s of microbatch m overlaps stage s+1 of microbatch m-1 without an
explicit schedule (XLA queues per-device work; the host loop never
blocks until the final fetch).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import param_spec, _path_str


@dataclass(frozen=True)
class PipelineStageConfig:
    """Contiguous layer partition (reference pipeline.rs:31): even split,
    remainder distributed to the EARLY stages (they also host embed /
    final-norm work in the reference)."""

    num_layers: int
    num_stages: int

    def boundaries(self) -> list[tuple[int, int]]:
        base = self.num_layers // self.num_stages
        rem = self.num_layers % self.num_stages
        out = []
        lo = 0
        for s in range(self.num_stages):
            hi = lo + base + (1 if s < rem else 0)
            out.append((lo, hi))
            lo = hi
        return out

    def stage_of_layer(self, layer_idx: int) -> int:
        for s, (lo, hi) in enumerate(self.boundaries()):
            if lo <= layer_idx < hi:
                return s
        raise IndexError(layer_idx)


def split_microbatches(total_tokens: int, num_microbatches: int) -> list[tuple[int, int]]:
    """Token-range split for microbatching (reference pipeline.rs:199
    split/merge). Returns [(start, end)] ranges covering [0, total)."""
    base = total_tokens // num_microbatches
    rem = total_tokens % num_microbatches
    out = []
    lo = 0
    for m in range(num_microbatches):
        hi = lo + base + (1 if m < rem else 0)
        if hi > lo:
            out.append((lo, hi))
        lo = hi
    return out


def split_md_by_seqs(md, num_microbatches: int):
    """Split one step's AttentionMetadata at SEQUENCE granularity
    (reference pipeline.rs microbatch split keeps sequences whole).
    Returns [(md_mb, tok_lo, tok_hi)] in original sequence order."""
    import dataclasses as _dc

    n = int(np.asarray(md.num_seqs)[0])
    num_microbatches = max(1, min(num_microbatches, n))
    cu = np.asarray(md.cu_q_lens)
    bounds = []
    base = n // num_microbatches
    rem = n % num_microbatches
    s = 0
    for m in range(num_microbatches):
        e = s + base + (1 if m < rem else 0)
        bounds.append((s, e))
        s = e
    out = []
    for (s0, s1) in bounds:
        t0, t1 = int(cu[s0]), int(cu[s1])
        ns = s1 - s0
        md_mb = _dc.replace(
            md,
            slot_mapping=md.slot_mapping[t0:t1],
            kv_lens=md.kv_lens[s0:s1],
            page_indices=md.page_indices[s0:s1],
            cu_q_lens=jnp.asarray(cu[s0 : s1 + 1] - cu[s0], jnp.int32),
            num_seqs=jnp.asarray([ns], jnp.int32),
            positions=md.positions[t0:t1],
            logits_indices=md.logits_indices[s0:s1] - t0,
            slot_ids=(md.slot_ids[s0:s1] if md.slot_ids is not None else None),
        )
        out.append((md_mb, t0, t1))
    return out


class PipelineRunner:
    """Drives a layer-partitioned model over a pp×tp mesh.

    Requires the model to expose the stage hooks ``embed`` /
    ``run_layers`` / ``final_norm`` (LlamaForCausalLM and subclasses
    that don't override __call__ — the same per-arch PP capability
    gating as the reference's Capabilities::PP flag).
    """

    def __init__(self, model, mesh: Mesh, num_stages: int | None = None):
        assert "pp" in mesh.axis_names, mesh.axis_names
        if not getattr(model, "supports_pp", False):
            raise ValueError(
                f"{type(model).__name__} does not support pipeline "
                "parallelism (no stage hooks — reference Capabilities::PP)"
            )
        self.model = model
        self.mesh = mesh
        self.num_stages = num_stages or mesh.shape["pp"]
        self.stages = PipelineStageConfig(model.num_layers, self.num_stages)
        # per-stage single-axis submeshes over the tp slice of each pp row
        devs = np.asarray(mesh.devices)  # [pp, tp]
        self._stage_meshes = [
            Mesh(devs[s : s + 1].reshape(1, -1), ("dp", "tp"))
            for s in range(self.num_stages)
        ]
        self._fns = None

    def stage_sharding(self, stage: int, spec: P) -> NamedSharding:
        return NamedSharding(self._stage_meshes[stage], spec)

    def place_params(self, params: dict) -> list[dict]:
        """Split the param tree into per-stage subtrees, each placed on
        its stage's devices. Unowned entries become None (absent from
        the stage jit's input pytree). Embedding lives on stage 0 (and
        on the last stage too when the lm_head is tied); rope tables
        replicate to every stage; norm/lm_head live on the last stage."""
        last = self.num_stages - 1
        tied = getattr(self.model.config, "tie_word_embeddings", False)
        out = []
        for s in range(self.num_stages):
            def place(path, leaf, s=s):
                ps = _path_str(path)
                parts = ps.split("/")
                if parts[0] == "layers":
                    if self.stages.stage_of_layer(int(parts[1])) != s:
                        return None
                elif parts[0].startswith("rope_"):
                    pass  # every stage
                elif parts[0] == "embed_tokens":
                    if not (s == 0 or (tied and s == last)):
                        return None
                else:  # norm, lm_head
                    if s != last:
                        return None
                return jax.device_put(
                    leaf, self.stage_sharding(s, param_spec(ps))
                )

            out.append(
                jax.tree_util.tree_map_with_path(place, params)
            )
        return out

    def _build_fns(self):
        bounds = self.stages.boundaries()
        m = self.model

        def first(params, input_ids, md, kv_pages):
            x = m.embed(params, input_ids)
            lo, hi = bounds[0]
            return m.run_layers(params, x, md, kv_pages, lo, hi)

        def middle_for(stage):
            lo, hi = bounds[stage]

            def mid(params, x, md, kv_pages):
                return m.run_layers(params, x, md, kv_pages, lo, hi)

            return mid

        def last_norm(params, x):
            h = m.final_norm(params, x)
            return m.compute_logits(params, h)

        fns = [jax.jit(first, static_argnames=())]
        for s in range(1, self.num_stages):
            fns.append(jax.jit(middle_for(s)))
        self._logits_fn = jax.jit(last_norm)
        self._fns = fns

    def __call__(self, stage_params, input_ids, md, kv_pages,
                 num_microbatches: int = 1):
        """Full forward: returns (logits [T, V], new kv_pages).

        ``stage_params``: list from place_params. Microbatching splits
        at sequence granularity; each microbatch streams through all
        stages, async dispatch overlaps stage s of microbatch m with
        stage s+1 of microbatch m-1. KV pages are shared (different
        tokens write disjoint slots)."""
        if self._fns is None:
            self._build_fns()
        bounds = self.stages.boundaries()
        mbs = (
            [(md, 0, input_ids.shape[0])]
            if num_microbatches <= 1
            else split_md_by_seqs(md, num_microbatches)
        )
        outs = []
        new_pages = list(kv_pages)
        for (md_mb, lo_t, hi_t) in mbs:
            ids_mb = input_ids[lo_t:hi_t]
            x, kv0 = self._fns[0](stage_params[0], ids_mb, md_mb,
                                  new_pages[bounds[0][0] : bounds[0][1]])
            new_pages[bounds[0][0] : bounds[0][1]] = kv0
            for s in range(1, self.num_stages):
                lo, hi = bounds[s]
                # activation crosses the stage boundary here (device→device)
                x = jax.device_put(x, self.stage_sharding(s, P()))
                x, kvs = self._fns[s](stage_params[s], x, md_mb,
                                      new_pages[lo:hi])
                new_pages[lo:hi] = kvs
            outs.append(self._logits_fn(stage_params[-1], x))
        logits = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return logits, new_pages
