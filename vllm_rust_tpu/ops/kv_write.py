"""KV cache scatter-write.

TPU-native equivalent of the reference's `reshape_and_cache` CUDA kernel
(crates/core/kernels/cache_ops.cu, wrapper cuda_kernels.rs:4768): new K/V
vectors for this step's tokens are scattered into the paged KV pool at
`slot_mapping` positions. On TPU this is a single XLA scatter on a
flattened view — no custom kernel needed; XLA emits an efficient
dynamic-update-scatter and the op fuses with the surrounding layer.

KV pool layout (shared with the ragged paged-attention kernels):
  ``[num_pages, page_size, 2 * num_kv_heads, head_dim]``
with K heads at even combined-head indices and V at odd — so one scatter
writes both K and V.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# Trace-time K/V amax collection for first-write scale calibration
# (reference kv_cache/quantization.rs:80-100 calibrates on first write
# then pins). Same tracing-sink idiom as layers/moe.py counts_sink.
_AMAX_SINK: contextvars.ContextVar = contextvars.ContextVar(
    "kv_amax_sink", default=None
)


@contextlib.contextmanager
def amax_sink():
    """Collect per-layer (amax_k, amax_v) f32 scalars from every
    write_kv_pages call traced inside the context."""
    sink: list = []
    tok = _AMAX_SINK.set(sink)
    try:
        yield sink
    finally:
        _AMAX_SINK.reset(tok)


def write_kv_pages(
    kv_pages: jax.Array,  # [num_pages, page_size, 2*K, D]
    k: jax.Array,  # [T, K, D]
    v: jax.Array,  # [T, K, D]
    slot_mapping: jax.Array,  # [T] int32, slot = page*page_size + offset
    *,
    k_scale: float | None = None,
    v_scale: float | None = None,
) -> jax.Array:
    """Scatter this step's K/V into the pool; returns the updated pool.

    Under jit the pool buffer is donated, so this is an in-place update.
    Padded tokens must carry slots inside the reserved null page (page 0).
    Optional scales quantize into a low-precision pool (fp8/int8 KV cache,
    reference: kv_cache/quantization.rs).
    """
    num_pages, page_size, combined, head_dim = kv_pages.shape
    t, num_kv, _ = k.shape
    assert combined == 2 * num_kv, (combined, num_kv)

    sink = _AMAX_SINK.get()
    if sink is not None:
        sink.append(
            (
                jnp.max(jnp.abs(k.astype(jnp.float32))),
                jnp.max(jnp.abs(v.astype(jnp.float32))),
            )
        )

    if k_scale is not None:
        k = (k.astype(jnp.float32) / k_scale)
    if v_scale is not None:
        v = (v.astype(jnp.float32) / v_scale)
    if kv_pages.dtype == jnp.int8:
        k = jnp.clip(jnp.round(k), -128, 127)
        v = jnp.clip(jnp.round(v), -128, 127)

    # Interleave K/V into combined heads: [T, K, 2, D] -> [T, 2K, D]
    kv = jnp.stack([k, v], axis=2).reshape(t, combined, head_dim)
    kv = kv.astype(kv_pages.dtype)

    flat = kv_pages.reshape(num_pages * page_size, combined, head_dim)
    flat = flat.at[slot_mapping].set(kv, mode="drop")
    return flat.reshape(num_pages, page_size, combined, head_dim)
