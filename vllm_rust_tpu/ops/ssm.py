"""SSM ops: causal conv1d + selective scan (Mamba1) + SSD scan (Mamba2).

Reference: crates/core/src/ssm/ (causal conv1d, selective_scan, SSD
chunked scan + ssd_scan.cu kernel, SSMStateManager). TPU-native design:

- Recurrent state lives in per-slot device pools ([num_slots+1, ...],
  slot `num_slots` = null slot for padding rows) instead of the
  reference's SSMStateManager side tables — the same donation discipline
  as the paged KV pools, threaded through the jitted step.
- The mixed prefill+decode batch is ONE flattened token axis; the linear
  recurrences run as a SEGMENTED associative scan over it: the decay
  coefficient is zeroed at each sequence start and the carried-in state
  (for resumed chunks / decode steps) is injected into the first token's
  increment. `lax.associative_scan` maps this onto the TPU in O(log T)
  steps — no per-sequence host loop, no dynamic shapes.
- Final per-sequence states are gathered at each segment's last token and
  scattered back to the slots, so preemption-recompute heals for free
  (re-prefill rewrites the state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .attn_metadata import AttentionMetadata


def segment_info(md: AttentionMetadata, num_slots: int):
    """Per-token segment bookkeeping for the flattened batch.

    Returns (seq_of [T], local_idx [T], tok_real [T] bool,
    read_slot [T], row_real [S] bool, write_slot [S], last_idx [S])."""
    t = md.positions.shape[0]
    s = md.kv_lens.shape[0]
    tok_idx = jnp.arange(t, dtype=jnp.int32)
    seq_of = jnp.clip(
        jnp.searchsorted(md.cu_q_lens, tok_idx, side="right") - 1, 0, s - 1
    )
    local_idx = tok_idx - md.cu_q_lens[seq_of]
    tok_real = tok_idx < md.cu_q_lens[s]
    slot_ids = md.slot_ids
    assert slot_ids is not None, "SSM layers require slot_ids in metadata"
    read_slot = jnp.where(tok_real, slot_ids[seq_of], num_slots)
    row_real = md.kv_lens > 0
    write_slot = jnp.where(row_real, slot_ids, num_slots)
    last_idx = jnp.maximum(md.cu_q_lens[1:] - 1, 0)
    return seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx


def causal_conv1d(
    u: jax.Array,  # [T, C]
    weight: jax.Array,  # [C, K]
    bias: jax.Array | None,  # [C]
    conv_state: jax.Array,  # [num_slots+1, C, K-1]
    md: AttentionMetadata,
    *,
    resumed: jax.Array | None = None,  # [S] bool: carry state in (pos>0)
    activation: str = "silu",
) -> tuple[jax.Array, jax.Array]:
    """Segmented causal conv along the flattened token axis with per-slot
    edge state. Returns (y [T, C], updated conv_state)."""
    t, c = u.shape
    kk = weight.shape[1]
    num_slots = conv_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )
    if resumed is None:
        resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0
    # whether each token's out-of-segment history is valid (mid-sequence)
    carry_tok = resumed[seq_of]

    y = u * weight[None, :, kk - 1]
    for k in range(1, kk):
        shifted = jnp.concatenate([jnp.zeros((k, c), u.dtype), u[:-k]], axis=0)
        # state column for a token k back across the segment edge:
        # conv_state[:, :, K-1-k+local] holds input (k-local) before start
        col = jnp.clip(local_idx + (kk - 1) - k, 0, kk - 2)
        edge = conv_state[read_slot, :, col]  # [T, C]
        edge = jnp.where(carry_tok[:, None], edge, 0.0).astype(u.dtype)
        val = jnp.where((local_idx >= k)[:, None], shifted, edge)
        y = y + val * weight[None, :, kk - 1 - k]
    if bias is not None:
        y = y + bias[None, :]
    if activation == "silu":
        y = jax.nn.silu(y)

    # new edge state per row: the last K-1 inputs of each segment,
    # borrowing from the old state when the segment is shorter
    seg_len = md.cu_q_lens[1:] - md.cu_q_lens[:-1]  # [S]
    cols = []
    for j in range(kk - 1):
        loc = seg_len - (kk - 1) + j  # [S]
        from_u = u[jnp.clip(md.cu_q_lens[:-1] + jnp.maximum(loc, 0), 0, t - 1)]
        old = conv_state[write_slot, :, jnp.clip(j + seg_len, 0, kk - 2)]
        old = jnp.where(resumed[:, None], old, 0.0).astype(u.dtype)
        cols.append(jnp.where((loc >= 0)[:, None], from_u, old))
    new_edge = jnp.stack(cols, axis=2)  # [S, C, K-1]
    conv_state = conv_state.at[write_slot].set(
        jnp.where(
            row_real[:, None, None], new_edge, conv_state[write_slot]
        ).astype(conv_state.dtype)
    )
    return y, conv_state


def _segmented_scan(decay, inc, local_idx, tok_real):
    """h_t = decay_t * h_{t-1} + inc_t with resets at segment starts
    (decay zeroed at local_idx == 0; carried-in state must already be
    folded into inc at segment starts)."""
    start = (local_idx == 0) | ~tok_real
    shape = [decay.shape[0]] + [1] * (inc.ndim - 1)
    p = jnp.where(start.reshape(shape), 0.0, decay.reshape(decay.shape + (1,) * (inc.ndim - decay.ndim)))
    p = jnp.broadcast_to(p, inc.shape)

    def combine(a, b):
        pa, qa = a
        pb, qb = b
        return pa * pb, qa * pb + qb

    _, h = jax.lax.associative_scan(combine, (p, inc), axis=0)
    return h


def ssd_scan(
    x: jax.Array,  # [T, H, P]
    dt: jax.Array,  # [T, H] (already softplus'd)
    a_log: jax.Array,  # [H]
    b: jax.Array,  # [T, G, N]
    c: jax.Array,  # [T, G, N]
    d_skip: jax.Array | None,  # [H]
    ssm_state: jax.Array,  # [num_slots+1, H, P, N] f32
    md: AttentionMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Mamba2 state-space duality recurrence over the flattened batch:
    S_t = exp(-exp(a_log)·dt_t)·S_{t-1} + dt_t·(x_t ⊗ B_t);
    y_t = S_t·C_t + D·x_t. Returns (y [T, H, P], updated ssm_state)."""
    t, h, p = x.shape
    g, n = b.shape[1], b.shape[2]
    rep = h // g
    num_slots = ssm_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    decay = jnp.exp(-jnp.exp(a_log.astype(jnp.float32))[None, :] * dtf)  # [T,H]
    bh = jnp.repeat(b.astype(jnp.float32), rep, axis=1)  # [T, H, N]
    ch = jnp.repeat(c.astype(jnp.float32), rep, axis=1)
    inc = (dtf[:, :, None, None] * xf[:, :, :, None]) * bh[:, :, None, :]

    # fold carried-in state into segment starts: h_0 = decay_0·S_init + inc_0
    resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0
    init = ssm_state[read_slot]  # [T, H, P, N]
    at_start = (local_idx == 0) & tok_real & resumed[seq_of]
    inc = inc + jnp.where(
        at_start[:, None, None, None], decay[:, :, None, None] * init, 0.0
    )

    hseq = _segmented_scan(decay, inc, local_idx, tok_real)  # [T, H, P, N]
    y = jnp.einsum("thpn,thn->thp", hseq, ch)
    if d_skip is not None:
        y = y + d_skip.astype(jnp.float32)[None, :, None] * xf

    final = hseq[last_idx]  # [S, H, P, N]
    ssm_state = ssm_state.at[write_slot].set(
        jnp.where(row_real[:, None, None, None], final, ssm_state[write_slot])
    )
    return y.astype(x.dtype), ssm_state


def selective_scan(
    x: jax.Array,  # [T, D]
    dt: jax.Array,  # [T, D] (already softplus'd)
    a_log: jax.Array,  # [D, N]
    b: jax.Array,  # [T, N]
    c: jax.Array,  # [T, N]
    d_skip: jax.Array | None,  # [D]
    ssm_state: jax.Array,  # [num_slots+1, D, N] f32
    md: AttentionMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Mamba1 selective scan: h_t = exp(dt_t·A)·h_{t-1} + dt_t·B_t·x_t;
    y_t = h_t·C_t + D·x_t. Returns (y [T, D], updated ssm_state)."""
    t, d = x.shape
    n = b.shape[1]
    num_slots = ssm_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    a = -jnp.exp(a_log.astype(jnp.float32))  # [D, N]
    decay = jnp.exp(dtf[:, :, None] * a[None])  # [T, D, N]
    inc = (dtf * xf)[:, :, None] * b.astype(jnp.float32)[:, None, :]  # [T,D,N]

    resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0
    init = ssm_state[read_slot]
    at_start = (local_idx == 0) & tok_real & resumed[seq_of]
    inc = inc + jnp.where(at_start[:, None, None], decay * init, 0.0)

    start = (local_idx == 0) | ~tok_real
    p = jnp.where(start[:, None, None], 0.0, decay)

    def combine(a2, b2):
        pa, qa = a2
        pb, qb = b2
        return pa * pb, qa * pb + qb

    _, hseq = jax.lax.associative_scan(combine, (p, inc), axis=0)  # [T,D,N]
    y = jnp.einsum("tdn,tn->td", hseq, c.astype(jnp.float32))
    if d_skip is not None:
        y = y + d_skip.astype(jnp.float32)[None, :] * xf

    final = hseq[last_idx]
    ssm_state = ssm_state.at[write_slot].set(
        jnp.where(row_real[:, None, None], final, ssm_state[write_slot])
    )
    return y.astype(x.dtype), ssm_state


def lightning_scan(
    q: jax.Array,  # [T, H, D] (already activated/scaled by caller)
    k: jax.Array,  # [T, H, D]
    v: jax.Array,  # [T, H, D]
    decay: jax.Array,  # [H] per-head constant decay λ_h in (0, 1]
    ssm_state: jax.Array,  # [num_slots+1, H, D, D] f32
    md: AttentionMetadata,
    *,
    chunk: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Lightning attention (MiniMax-Text-01 linear attention; reference
    models/minimax_text01.rs:353-545 runs it as a per-token host loop):

        S_t = λ_h · S_{t-1} + k_t ⊗ v_t
        y_t = q_t @ S_t            (state updated BEFORE readout)

    Because λ is a per-head constant, the recurrence admits the chunked
    parallel form: within a chunk of C tokens the output is one masked
    [C, C] decay-weighted attention matmul (MXU work), and the state is
    carried across chunks by a short lax.scan — O(T/C) sequential steps
    instead of the reference's O(T).
    """
    t, h, d = q.shape
    s = md.kv_lens.shape[0]
    num_slots = ssm_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )

    seg_len = md.cu_q_lens[1:] - md.cu_q_lens[:-1]  # [S]
    resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0

    # gather the flat token axis into per-sequence rows [S, L, ...]
    c = min(chunk, t)
    l_pad = ((t + c - 1) // c) * c
    n_chunks = l_pad // c
    pos_idx = jnp.arange(l_pad, dtype=jnp.int32)
    tok_of = jnp.minimum(md.cu_q_lens[:-1][:, None] + pos_idx[None, :], t - 1)
    valid = pos_idx[None, :] < seg_len[:, None]  # [S, L]

    qf = q.astype(jnp.float32)[tok_of]  # [S, L, H, D]
    kf = jnp.where(valid[:, :, None, None], k.astype(jnp.float32)[tok_of], 0.0)
    vf = jnp.where(valid[:, :, None, None], v.astype(jnp.float32)[tok_of], 0.0)

    lam = decay.astype(jnp.float32)  # [H]
    log_lam = jnp.log(jnp.maximum(lam, 1e-38))
    ci = jnp.arange(c, dtype=jnp.float32)
    # intra-chunk decay matrix λ^{i-j} for i ≥ j (diagonal = λ^0 = 1)
    diff = ci[:, None] - ci[None, :]
    dmat = jnp.where(diff >= 0, jnp.exp(log_lam[:, None, None] * diff), 0.0)
    # [H, C, C]

    init = jnp.where(
        (row_real & resumed)[:, None, None, None],
        ssm_state[jnp.where(row_real, md.slot_ids, num_slots)],
        0.0,
    )  # [S, H, D, D]

    def step(S, inp):
        qc, kc, vc, nvalid = inp  # [S,C,H,D] ×3, [S]
        scores = jnp.einsum("sihd,sjhd->shij", qc, kc)
        intra = jnp.einsum("shij,sjhe->sihe", scores * dmat[None], vc)
        # cross-chunk: y_i += λ^{i+1} · q_i @ S_in
        lam_q = jnp.exp(log_lam[None, :] * (ci[:, None] + 1.0))  # [C, H]
        cross = jnp.einsum("sihd,shde->sihe", qc, S)
        y_c = intra + cross * lam_q[None, :, :, None]
        # state: S' = λ^{n} S_in + Σ_j λ^{n-1-j} k_j ⊗ v_j  (n = valid count)
        nv = nvalid.astype(jnp.float32)[:, None]  # [S, 1]
        w_j = jnp.exp(log_lam[None, None, :] * (nv[:, :, None] - 1.0 - ci[None, :, None]))
        w_j = jnp.where((ci[None, :] < nv)[:, :, None], w_j, 0.0)  # [S, C, H]
        s_inc = jnp.einsum("sjh,sjhd,sjhe->shde", w_j, kc, vc)
        lam_n = jnp.exp(log_lam[None, :] * nv)  # [S, H]
        S_new = S * lam_n[:, :, None, None] + s_inc
        return S_new, y_c

    qcs = qf.reshape(s, n_chunks, c, h, d).transpose(1, 0, 2, 3, 4)
    kcs = kf.reshape(s, n_chunks, c, h, d).transpose(1, 0, 2, 3, 4)
    vcs = vf.reshape(s, n_chunks, c, h, d).transpose(1, 0, 2, 3, 4)
    nvs = jnp.clip(
        seg_len[None, :] - jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * c,
        0,
        c,
    )  # [NC, S]
    S_fin, ys = jax.lax.scan(step, init, (qcs, kcs, vcs, nvs))
    # ys: [NC, S, C, H, D] → flat [S*L, H, D]
    flat = ys.transpose(1, 0, 2, 3, 4).reshape(s * l_pad, h, d)
    src = seq_of * l_pad + jnp.minimum(local_idx, l_pad - 1)
    y = jnp.where(tok_real[:, None, None], flat[src], 0.0)

    ssm_state = ssm_state.at[write_slot].set(
        jnp.where(row_real[:, None, None, None], S_fin, ssm_state[write_slot])
    )
    return y.astype(q.dtype), ssm_state


def kda_scan(
    q: jax.Array,  # [T, H, Dk] (already normalized/scaled by caller)
    k: jax.Array,  # [T, H, Dk]
    v: jax.Array,  # [T, H, Dv]
    log_g: jax.Array,  # [T, H, Dk] per-CHANNEL log-decay (≤ 0)
    beta: jax.Array,  # [T, H] delta-rule write strength in (0, 1)
    ssm_state: jax.Array,  # [num_slots+1, H, Dk, Dv] f32
    md: AttentionMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Kimi Delta Attention (KDA): the gated delta rule with a per-key-
    channel (diagonal) decay instead of GDN's per-head scalar
    (reference models/kimi_linear.rs documents the architecture but
    substitutes full attention for the KDA layers — here it runs for
    real, like gated_delta_scan):

        S_t = Diag(exp(g_t)) · S_{t-1}
        S_t = S_t + β_t · k_t (v_t - S_t^T k_t)^T
        y_t = S_t^T q_t
    """
    t, h, dk = q.shape
    dv = v.shape[-1]
    s = md.kv_lens.shape[0]
    num_slots = ssm_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )

    seg_len = md.cu_q_lens[1:] - md.cu_q_lens[:-1]
    max_len = t
    resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0
    pos_idx = jnp.arange(max_len, dtype=jnp.int32)
    tok_of = jnp.minimum(md.cu_q_lens[:-1][:, None] + pos_idx[None, :], t - 1)
    valid = pos_idx[None, :] < seg_len[:, None]

    def g2(x):
        return x[tok_of]

    qf = g2(q.astype(jnp.float32))
    kf = g2(k.astype(jnp.float32))
    vf = g2(v.astype(jnp.float32))
    af = g2(jnp.exp(log_g.astype(jnp.float32)))  # [S, L, H, Dk]
    bf = g2(beta.astype(jnp.float32))

    init = jnp.where(
        (row_real & resumed)[:, None, None, None],
        ssm_state[jnp.where(row_real, md.slot_ids, num_slots)],
        0.0,
    )

    def step(S, inp):
        q_t, k_t, v_t, a_t, b_t, ok = inp  # [S,H,Dk]×2,[S,H,Dv],[S,H,Dk],[S,H],[S]
        Sd = S * a_t[:, :, :, None]
        pred = jnp.einsum("shkv,shk->shv", Sd, k_t)
        delta = b_t[:, :, None] * (v_t - pred)
        S_new = Sd + jnp.einsum("shk,shv->shkv", k_t, delta)
        S_new = jnp.where(ok[:, None, None, None], S_new, S)
        y_t = jnp.einsum("shkv,shk->shv", S_new, q_t)
        return S_new, y_t

    xs = (
        qf.transpose(1, 0, 2, 3), kf.transpose(1, 0, 2, 3),
        vf.transpose(1, 0, 2, 3), af.transpose(1, 0, 2, 3),
        bf.transpose(1, 0, 2), valid.T,
    )
    S_fin, ys = jax.lax.scan(step, init, xs)

    flat = ys.transpose(1, 0, 2, 3).reshape(s * max_len, h, dv)
    src = seq_of * max_len + jnp.minimum(local_idx, max_len - 1)
    y = jnp.where(tok_real[:, None, None], flat[src], 0.0)

    ssm_state = ssm_state.at[write_slot].set(
        jnp.where(row_real[:, None, None, None], S_fin, ssm_state[write_slot])
    )
    return y.astype(q.dtype), ssm_state


def gated_delta_scan(
    q: jax.Array,  # [T, H, Dk] (already normalized/scaled by caller)
    k: jax.Array,  # [T, H, Dk]
    v: jax.Array,  # [T, H, Dv]
    alpha: jax.Array,  # [T, H] per-token decay in (0, 1]
    beta: jax.Array,  # [T, H] delta-rule write strength in (0, 1)
    ssm_state: jax.Array,  # [num_slots+1, H, Dk, Dv] f32
    md: AttentionMetadata,
) -> tuple[jax.Array, jax.Array]:
    """Gated delta rule (Qwen3-Next GDN; reference qwen3_next.rs documents
    the recurrence but falls back to full attention — here it runs for
    real as a TPU scan):

        S_t = alpha_t * S_{t-1}
        S_t = S_t + beta_t * k_t (v_t - S_t^T k_t)^T
        y_t = S_t^T q_t

    The matrix-valued state breaks the associative-scan trick the
    diagonal SSMs use, so the recurrence runs as a lax.scan over the
    position axis, vectorized across the sequences of the step (decode
    batches scan exactly one position). Returns (y [T, H, Dv], updated
    ssm_state)."""
    t, h, dk = q.shape
    dv = v.shape[-1]
    s = md.kv_lens.shape[0]
    num_slots = ssm_state.shape[0] - 1
    seq_of, local_idx, tok_real, read_slot, row_real, write_slot, last_idx = (
        segment_info(md, num_slots)
    )

    seg_len = md.cu_q_lens[1:] - md.cu_q_lens[:-1]  # [S]
    max_len = t  # static upper bound on per-sequence tokens this step
    resumed = md.positions[jnp.maximum(md.cu_q_lens[:-1], 0)] > 0

    # [S, L] gather of the flat token axis (padded rows read token 0)
    pos_idx = jnp.arange(max_len, dtype=jnp.int32)
    tok_of = jnp.minimum(md.cu_q_lens[:-1][:, None] + pos_idx[None, :], t - 1)
    valid = pos_idx[None, :] < seg_len[:, None]  # [S, L]

    def g2(x):
        return x[tok_of]  # [S, L, ...]

    qf = g2(q.astype(jnp.float32))
    kf = g2(k.astype(jnp.float32))
    vf = g2(v.astype(jnp.float32))
    af = g2(alpha.astype(jnp.float32))
    bf = g2(beta.astype(jnp.float32))

    init = jnp.where(
        (row_real & resumed)[:, None, None, None],
        ssm_state[jnp.where(row_real, md.slot_ids, num_slots)],
        0.0,
    )  # [S, H, Dk, Dv]

    def step(S, inp):
        q_t, k_t, v_t, a_t, b_t, ok = inp  # [S,H,Dk],... [S,H], [S]
        Sd = S * a_t[:, :, None, None]
        pred = jnp.einsum("shkv,shk->shv", Sd, k_t)  # S^T k
        delta = b_t[:, :, None] * (v_t - pred)  # [S, H, Dv]
        S_new = Sd + jnp.einsum("shk,shv->shkv", k_t, delta)
        S_new = jnp.where(ok[:, None, None, None], S_new, S)
        y_t = jnp.einsum("shkv,shk->shv", S_new, q_t)
        return S_new, y_t

    xs = (
        qf.transpose(1, 0, 2, 3), kf.transpose(1, 0, 2, 3),
        vf.transpose(1, 0, 2, 3), af.transpose(1, 0, 2),
        bf.transpose(1, 0, 2), valid.T,
    )
    S_fin, ys = jax.lax.scan(step, init, xs)  # ys [L, S, H, Dv]

    # scatter back to the flat token axis
    flat = ys.transpose(1, 0, 2, 3).reshape(s * max_len, h, dv)
    src = seq_of * max_len + jnp.minimum(local_idx, max_len - 1)
    y = flat[src]
    y = jnp.where(tok_real[:, None, None], y, 0.0)

    ssm_state = ssm_state.at[write_slot].set(
        jnp.where(row_real[:, None, None, None], S_fin, ssm_state[write_slot])
    )
    return y.astype(q.dtype), ssm_state
