"""Packed step-metadata layout: ONE host→device transfer per step.

The axon-tunneled TPU serializes each host transfer RPC against in-flight
executions (~2.7 ms each, measured); 13 per-step metadata arrays cost
more than the model forward. All step metadata therefore travels as a
single flat int32 vector (floats bitcast), unpacked with static offsets
inside the jitted step. The reference faces the same class of problem
with CUDA launch/H2D overhead and solves it with CUDA graphs + pooled
tensors (output_pool.rs); one packed transfer is the TPU/tunnel analogue.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.attn_metadata import AttentionMetadata
from ..sampling.sampler import SamplerInputs


BIAS_SLOTS = 16  # per-seq sparse logit-bias / banned-token slots


@dataclass(frozen=True)
class PackLayout:
    """Static offsets for a (T, S, P) batch shape.

    ``mrope`` adds two extra per-token rows (height/width positions) for
    3-axis multimodal RoPE (Qwen2-VL family, reference rotary.rs mrope)."""

    t: int
    s: int
    p: int
    mrope: bool = False

    @property
    def token_rows(self) -> int:
        return 8 if self.mrope else 6

    @property
    def token_base(self) -> int:
        return 2

    @property
    def seq_base(self) -> int:
        return 2 + self.token_rows * self.t

    @property
    def page_base(self) -> int:
        return self.seq_base + 10 * self.s + 1

    @property
    def bias_id_base(self) -> int:
        return self.page_base + self.s * self.p

    @property
    def float_base(self) -> int:
        return self.bias_id_base + self.s * BIAS_SLOTS

    @property
    def total(self) -> int:
        # floats: 6 per-seq knobs + typical_p + BIAS_SLOTS bias values
        return self.float_base + (7 + BIAS_SLOTS) * self.s


class HostBatch:
    """Host-side packed buffer with named views (numpy, zero-copy)."""

    def __init__(self, t: int, s: int, p: int, mrope: bool = False):
        self.layout = PackLayout(t, s, p, mrope)
        self.buf = np.zeros(self.layout.total, np.int32)
        L = self.layout
        tb, sb, pb, fb = L.token_base, L.seq_base, L.page_base, L.float_base
        self.header = self.buf[0:2]  # [ring_slot, num_seqs]
        self.input_ids = self.buf[tb : tb + t]
        self.feedback_src = self.buf[tb + t : tb + 2 * t]
        self.positions = self.buf[tb + 2 * t : tb + 3 * t]
        self.slot_mapping = self.buf[tb + 3 * t : tb + 4 * t]
        self.lora_idx = self.buf[tb + 4 * t : tb + 5 * t]
        # prompt-logprob target token per position (-1 = not requested)
        self.lp_targets = self.buf[tb + 5 * t : tb + 6 * t]
        if mrope:  # 3-axis positions: rows 6/7 = height/width axes
            self.positions_h = self.buf[tb + 6 * t : tb + 7 * t]
            self.positions_w = self.buf[tb + 7 * t : tb + 8 * t]
        self.kv_lens = self.buf[sb : sb + s]
        self.logits_indices = self.buf[sb + s : sb + 2 * s]
        self.slot_ids = self.buf[sb + 2 * s : sb + 3 * s]
        self.sample_mask = self.buf[sb + 3 * s : sb + 4 * s]
        self.ban_eos = self.buf[sb + 4 * s : sb + 5 * s]
        self.top_k = self.buf[sb + 5 * s : sb + 6 * s]
        self.seeds = self.buf[sb + 6 * s : sb + 7 * s].view(np.uint32)
        self.rng_pos = self.buf[sb + 7 * s : sb + 8 * s]
        # per-seq single stop-token id the DEVICE watches in decode
        # windows (-1 = none); multi-token stops / stop strings stay
        # host-side
        self.watch_stop = self.buf[sb + 8 * s : sb + 9 * s]
        self.cu_q_lens = self.buf[sb + 9 * s : sb + 10 * s + 1]
        self.page_indices = self.buf[pb : pb + s * p].reshape(s, p)
        bb = L.bias_id_base
        self.bias_ids = self.buf[bb : bb + s * BIAS_SLOTS].reshape(
            s, BIAS_SLOTS
        )
        floats = self.buf[fb:].view(np.float32)
        self.temperature = floats[0:s]
        self.top_p = floats[s : 2 * s]
        self.min_p = floats[2 * s : 3 * s]
        self.repetition_penalty = floats[3 * s : 4 * s]
        self.presence_penalty = floats[4 * s : 5 * s]
        self.frequency_penalty = floats[5 * s : 6 * s]
        self.typical_p = floats[6 * s : 7 * s]
        self.bias_vals = floats[7 * s : (7 + BIAS_SLOTS) * s].reshape(
            s, BIAS_SLOTS
        )

    def reset(self):
        self.buf.fill(0)
        self.feedback_src.fill(-1)
        self.watch_stop.fill(-1)
        self.lora_idx.fill(-1)
        self.lp_targets.fill(-1)
        self.bias_ids.fill(-1)
        self.temperature.fill(1.0)
        self.top_p.fill(1.0)
        self.repetition_penalty.fill(1.0)
        self.typical_p.fill(1.0)


def unpack_device(meta, layout: PackLayout, p_eff: int | None = None):
    """Inside-jit unpack of the packed vector into metadata structs.

    ``p_eff``: bucketed page-table width — attention kernels only scan
    page slots that can actually be live given the batch's max kv length
    (static slice; a major win for short-context decode)."""
    t, s, p = layout.t, layout.s, layout.p
    tb, sb, pb, fb = (
        layout.token_base,
        layout.seq_base,
        layout.page_base,
        layout.float_base,
    )
    import jax

    floats = jax.lax.bitcast_convert_type(meta[fb:], jnp.float32)
    ring_slot = meta[0]
    page_indices = meta[pb : pb + s * p].reshape(s, p)
    if p_eff is not None and p_eff < p:
        page_indices = page_indices[:, :p_eff]
    positions = meta[tb + 2 * t : tb + 3 * t]
    if layout.mrope:
        # [3, T]: temporal / height / width axes (mrope)
        positions = jnp.stack(
            [
                positions,
                meta[tb + 6 * t : tb + 7 * t],
                meta[tb + 7 * t : tb + 8 * t],
            ]
        )
    md = AttentionMetadata(
        slot_mapping=meta[tb + 3 * t : tb + 4 * t],
        kv_lens=meta[sb : sb + s],
        page_indices=page_indices,
        cu_q_lens=meta[sb + 9 * s : sb + 10 * s + 1],
        num_seqs=meta[1:2],
        positions=positions,
        logits_indices=meta[sb + s : sb + 2 * s],
        slot_ids=meta[sb + 2 * s : sb + 3 * s],
    )
    bb = layout.bias_id_base
    si = SamplerInputs(
        temperature=floats[0:s],
        top_k=meta[sb + 5 * s : sb + 6 * s],
        top_p=floats[s : 2 * s],
        min_p=floats[2 * s : 3 * s],
        repetition_penalty=floats[3 * s : 4 * s],
        presence_penalty=floats[4 * s : 5 * s],
        frequency_penalty=floats[5 * s : 6 * s],
        seed=meta[sb + 6 * s : sb + 7 * s].astype(jnp.uint32),
        position=meta[sb + 7 * s : sb + 8 * s],
        ban_eos=meta[sb + 4 * s : sb + 5 * s] == 2,
        typical_p=floats[6 * s : 7 * s],
        bias_ids=meta[bb : bb + s * BIAS_SLOTS].reshape(s, BIAS_SLOTS),
        bias_vals=floats[7 * s : (7 + BIAS_SLOTS) * s].reshape(
            s, BIAS_SLOTS
        ),
    )
    input_ids = meta[tb : tb + t]
    feedback_src = meta[tb + t : tb + 2 * t]
    lora_idx = meta[tb + 4 * t : tb + 5 * t]
    lp_targets = meta[tb + 5 * t : tb + 6 * t]
    slot_ids = meta[sb + 2 * s : sb + 3 * s]
    sample_mask = meta[sb + 3 * s : sb + 4 * s] > 0
    # tri-state ban_eos row: 1 = seq stops at EOS (device watches for it
    # in multi-step windows — on-device stop, reference
    # engine/helpers.rs:2746-2795 per-step stop checks)
    watch_eos = meta[sb + 4 * s : sb + 5 * s] == 1
    watch_stop = meta[sb + 8 * s : sb + 9 * s]  # per-seq stop id, -1=none
    return (
        ring_slot, input_ids, feedback_src, md, si, slot_ids, sample_mask,
        lora_idx, lp_targets, watch_eos, watch_stop,
    )
