"""Workarounds for backend/plugin bugs, applied at import time.

axon s4 relayout recursion (r5): the experimental TPU plugin reports
``sub_byte_element_size_in_bits=0`` in the Format of int4 arrays it
produces, while compiled executables want the same physical layout with
``=4``. jax's shard_arg then treats the layouts as different and calls
``device_put(x, Format(...))`` to relayout — which re-enters shard_arg
with the same mismatch and recurses forever (RecursionError at every
jit boundary an s4 array crosses). The layouts are bit-identical
(verified in benchmarks/int4_layout_probe.py: same major_to_minor, same
tiling); only the metadata width field differs, so the relayout is
spurious. This shim wraps the registered ArrayImpl shard_arg handler
and clears the wanted layout when a sub-byte array's actual layout
matches it on every field the hardware cares about.

Scope-limited on purpose: arrays whose major_to_minor or tiling REALLY
differ still take the normal relayout path.
"""

from __future__ import annotations

_PATCHED = False


def apply_s4_shard_arg_patch() -> bool:
    """Install the sub-byte layout-equality shim (idempotent)."""
    global _PATCHED
    if _PATCHED:
        return True
    try:
        from jax._src import array as _jarray
        from jax._src.interpreters import pxla

        orig = pxla.shard_arg_handlers[_jarray.ArrayImpl]

        def _sub_byte(dtype) -> bool:
            name = getattr(dtype, "name", str(dtype))
            return name in ("int4", "uint4", "int2", "uint2")

        def _same_physical(have, want) -> bool:
            try:
                return (
                    have.major_to_minor == want.major_to_minor
                    and have.tiling == want.tiling
                )
            except AttributeError:
                return False

        def patched(xs, shardings, layouts, copy_semantics):
            fixed = list(layouts)
            for i, (x, want) in enumerate(zip(xs, layouts)):
                if want is None or not _sub_byte(x.dtype):
                    continue
                have = x.format.layout
                if have != want and _same_physical(have, want):
                    fixed[i] = None  # identical physical layout
            return orig(xs, shardings, fixed, copy_semantics)

        pxla.shard_arg_handlers[_jarray.ArrayImpl] = patched
        _PATCHED = True
        return True
    except Exception:  # pragma: no cover - future jax refactors
        return False
