"""On-device batched sampler.

Design (vs reference sampling/gpu.rs): one jitted function over the
gathered last-position logits [S, V]. Penalties use a per-slot token
count matrix kept on device (scatter-updated with the sampled token in
the same step — no host round-trip). RNG is stateless: key =
fold_in(fold_in(PRNGKey(seed), request_seed), position) — this makes
recompute-preemption resume byte-identical streams for free (reference
contract #3 preserves sampler RNG across preemption; here it is a pure
function of (seed, position)).

Feature flags (`use_penalties`, `use_top_filters`) are static so that
all-greedy batches compile to a single argmax with no [S, V] sort.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e10)


@jax.tree_util.register_dataclass
@dataclass
class SamplerInputs:
    """Per-step, per-sequence sampling controls (padded to S)."""

    temperature: jax.Array  # [S] f32; 0 => greedy
    top_k: jax.Array  # [S] i32; 0 => off
    top_p: jax.Array  # [S] f32; 1.0 => off
    min_p: jax.Array  # [S] f32; 0 => off
    repetition_penalty: jax.Array  # [S] f32; 1.0 => off
    presence_penalty: jax.Array  # [S] f32
    frequency_penalty: jax.Array  # [S] f32
    seed: jax.Array  # [S] u32 per-request seed
    position: jax.Array  # [S] i32 sampling position (for stateless RNG)
    ban_eos: jax.Array  # [S] bool — min_tokens not yet reached
    # typical-p sampling (reference sampling/mod.rs typical_p): 1.0 => off
    typical_p: jax.Array | None = None  # [S] f32
    # sparse per-seq logit bias / per-step banned tokens (reference
    # logits_processor.rs LogitBias + BadWords — bad-word bans arrive as
    # bias entries with a -inf-like value). id -1 => empty slot.
    bias_ids: jax.Array | None = None  # [S, B] i32
    bias_vals: jax.Array | None = None  # [S, B] f32


def apply_penalties(
    logits: jax.Array,  # [S, V] f32
    counts: jax.Array,  # [S, V] i32 generated-token counts
    inputs: SamplerInputs,
) -> jax.Array:
    seen = counts > 0
    rp = inputs.repetition_penalty[:, None]
    logits = jnp.where(
        seen, jnp.where(logits > 0, logits / rp, logits * rp), logits
    )
    logits = logits - inputs.frequency_penalty[:, None] * counts.astype(jnp.float32)
    logits = logits - inputs.presence_penalty[:, None] * seen.astype(jnp.float32)
    return logits


def _top_filters(scaled: jax.Array, inputs: SamplerInputs) -> jax.Array:
    """Apply top-k / top-p / min-p via one full descending sort."""
    s, v = scaled.shape
    sorted_logits, sorted_idx = jax.lax.top_k(scaled, v)  # [S, V] desc
    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]
    k = jnp.where(inputs.top_k > 0, inputs.top_k, v)[:, None]
    keep = ranks < k

    probs = jax.nn.softmax(jnp.where(keep, sorted_logits, NEG_INF), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p; first always kept
    keep &= (cum - probs) < inputs.top_p[:, None]
    # min_p: tokens with prob >= min_p * p_max
    keep &= probs >= inputs.min_p[:, None] * probs[:, :1]

    masked_sorted = jnp.where(keep, sorted_logits, NEG_INF)
    # scatter back to vocab order
    out = jnp.full_like(scaled, NEG_INF)
    return out.at[jnp.arange(s)[:, None], sorted_idx].set(masked_sorted)


def _typical_filter(scaled: jax.Array, typical_p: jax.Array) -> jax.Array:
    """Typical-p (locally typical) sampling: keep the tokens whose
    surprisal is closest to the distribution's entropy until their
    cumulative probability reaches typical_p (reference
    sampling/mod.rs typical sampling)."""
    s, v = scaled.shape
    logp = jax.nn.log_softmax(scaled, axis=-1)
    p = jnp.exp(logp)
    entropy = -jnp.sum(p * logp, axis=-1, keepdims=True)  # [S, 1]
    dev = jnp.abs(-logp - entropy)  # [S, V] surprisal deviation
    order = jnp.argsort(dev, axis=-1)  # ascending deviation
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < typical_p[:, None]  # first always kept
    keep = (
        jnp.zeros((s, v), bool)
        .at[jnp.arange(s)[:, None], order]
        .set(keep_sorted)
    )
    keep |= typical_p[:, None] >= 1.0  # off => keep everything
    return jnp.where(keep, scaled, NEG_INF)


def apply_logit_bias(
    logits: jax.Array,  # [S, V]
    bias_ids: jax.Array,  # [S, B] i32, -1 = empty
    bias_vals: jax.Array,  # [S, B] f32
) -> jax.Array:
    s = logits.shape[0]
    rows = jnp.broadcast_to(jnp.arange(s)[:, None], bias_ids.shape)
    vals = jnp.where(bias_ids >= 0, bias_vals, 0.0)
    ids = jnp.maximum(bias_ids, 0)
    return logits.at[rows, ids].add(vals)


def apply_grammar_mask(logits: jax.Array, mask_words: jax.Array) -> jax.Array:
    """In-place grammar bitmask (reference ADR 0020 apply_grammar_bitmask
    CUDA kernel): mask_words [S, ceil(V/32)] packed int32; bit set =
    token allowed. Unconstrained rows are all-ones; the zero tail
    implicitly forbids padded vocab entries."""
    s, v = logits.shape
    bits = (
        (mask_words[:, :, None] >> jnp.arange(32, dtype=jnp.int32)) & 1
    ).reshape(s, -1)[:, :v]
    return jnp.where(bits > 0, logits, NEG_INF)


def sample_tokens(
    logits: jax.Array,  # [S, V] f32
    inputs: SamplerInputs,
    token_counts: jax.Array | None,  # [S, V] i32 (None when penalties off)
    eos_ids: tuple[int, ...],
    *,
    use_penalties: bool,
    use_top_filters: bool,
    grammar_mask: jax.Array | None = None,  # [S, ceil(V/32)] i32
    use_bias: bool = False,
    use_typical: bool = False,
    top_logprobs_k: int = 0,  # 0 => no top-logprob output
):
    """Returns (tokens [S] i32, chosen logprobs [S] f32) and, when
    ``top_logprobs_k > 0``, additionally (top ids [S, K] i32,
    top logprobs [S, K] f32)."""
    s, v = logits.shape
    if use_penalties and token_counts is not None:
        logits = apply_penalties(logits, token_counts, inputs)
    if use_bias and inputs.bias_ids is not None:
        logits = apply_logit_bias(logits, inputs.bias_ids, inputs.bias_vals)
    if grammar_mask is not None:
        logits = apply_grammar_mask(logits, grammar_mask)

    if eos_ids:
        eos = jnp.array(eos_ids, jnp.int32)
        ban = inputs.ban_eos[:, None] & (
            jnp.arange(v, dtype=jnp.int32)[None, :] == eos[:, None, None]
        ).any(0)
        logits = jnp.where(ban, NEG_INF, logits)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(inputs.temperature, 1e-6)[:, None]
    scaled = logits / temp
    if use_typical and inputs.typical_p is not None:
        scaled = _typical_filter(scaled, inputs.typical_p)
    if use_top_filters:
        scaled = _top_filters(scaled, inputs)

    def one_key(seed, pos):
        return jax.random.fold_in(jax.random.PRNGKey(seed), pos)

    keys = jax.vmap(one_key)(inputs.seed, inputs.position)
    # per-seq independent keys → vmap categorical
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, scaled)
    sampled = sampled.astype(jnp.int32)

    tokens = jnp.where(inputs.temperature <= 0.0, greedy_tok, sampled)

    logprobs_all = jax.nn.log_softmax(logits, axis=-1)
    chosen_lp = jnp.take_along_axis(
        logprobs_all, tokens[:, None], axis=-1
    ).squeeze(-1)
    if top_logprobs_k > 0:
        top_lp, top_ids = jax.lax.top_k(logprobs_all, top_logprobs_k)
        return tokens, chosen_lp, top_ids.astype(jnp.int32), top_lp
    return tokens, chosen_lp
