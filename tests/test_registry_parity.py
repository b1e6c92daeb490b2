"""Registry parity gate: every architecture string the reference
registers (registry.rs arch_names) must be covered here — implemented,
aliased, recognized as a speculator module, or explicitly
registry-only-unsupported (VERDICT r3 #7 done-condition: the diff is
empty). Skips when the reference checkout isn't present."""

import os
import re

import pytest

REF = "/root/reference/crates/core/src/models/registry.rs"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not present")
def test_registry_covers_all_reference_arch_names():
    from vllm_rust_tpu.models import (
        _KNOWN_UNSUPPORTED,
        speculator_kind,
        supported_architectures,
    )

    src = open(REF).read()
    ref = set()
    for m in re.finditer(r"arch_names:\s*&\[(.*?)\]", src, re.S):
        ref.update(re.findall(r'"([^"]+)"', m.group(1)))
    assert len(ref) > 250, "registry parse looks broken"
    sup = set(supported_architectures())
    missing = sorted(
        a
        for a in ref
        if a not in sup and not speculator_kind(a) and a not in _KNOWN_UNSUPPORTED
    )
    assert not missing, f"reference arch names not covered: {missing}"
