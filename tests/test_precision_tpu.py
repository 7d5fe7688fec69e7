"""Traversal precision regression gate — TPU only.

The packet kernels' Woop intersection runs on the MXU, whose DEFAULT
dot precision rounds f32 operands to bf16; the split-operand form
(tracer_pallas WS_* layout) restores near-f32 accuracy. The CPU parity
suite runs interpret mode (exact f32) and is structurally blind to
this, so the gate must execute on real TPU hardware: the castle
primary population must agree with the f32 XLA tracer to >= 99.9%
triangle identity, < 0.1% hit flips, and t rel err p99 < 1e-3 (the
round-4 audit measured 97.57% / ~1% / 4.8e-3 before the fix; the DXR
traversal the kernels replace is f32-exact). Skipped on CPU-only
hosts; `python benchmarks/precision_check.py --assert` runs the same
gate standalone.
"""

import numpy as np
import pytest
import jax

_tpu = any(d.platform != "cpu" for d in jax.devices())


@pytest.mark.skipif(not _tpu, reason="device-precision gate needs a TPU")
def test_traversal_precision_gate():
    import sys, os

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    )
    from precision_check import audit, castle_primary_population

    agreement, flips, spurious, rel, n, hits = audit(
        *castle_primary_population()
    )
    assert agreement >= 0.999, (agreement, flips, spurious)
    assert flips <= 0.001 * max(hits, 1), (flips, hits)
    assert rel.size and float(np.percentile(rel, 99)) < 1e-3
