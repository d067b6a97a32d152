"""Hand-pinned spec KATs for the shared quantized resampling kernels.

Engine (operators/render.py) and oracle (oracle/minitiler.py) both
import tilers_tools_spark/functions/kernels.py, so the engine-vs-oracle
byte-identical render gate can no longer catch a formula-level bug in
the tap computation (wrong tap offset, wrong support, wrong residue
fold) — both sides would share it. These tests anchor the shared
formula to integer tap lists computed ONCE by hand from the spec
(scalar math.sin derivation, independent of np.sinc and of kernels.py;
see the derivation notes inline). VERDICT r4 ask #5 / ADVICE r4 #3.
"""

from __future__ import annotations

import math

import numpy as np

from tilers_tools_spark.functions import kernels

# Hand-derivation used to produce the pinned lists below (kept for
# auditability; runs nowhere):
#   sinc(t) = sin(pi t)/(pi t), sinc(0) = 1
#   lanczos3 taps at offsets j-2-f for j in 0..5, w = sinc(x)*sinc(x/3)
#     masked to |x| < 3; quantized floor(w*256 + 0.5); residue so the sum
#     is exactly 256 folded into index 2.
#   cubic (Catmull-Rom) w0..w3 at offsets -1..+2; residue into index 1.

# f -> 6 quantized Lanczos-3 taps (hand-computed)
LANCZOS3_KAT = {
    0.0: [0, 0, 256, 0, 0, 0],  # integer offset: pure passthrough tap
    0.25: [8, -34, 228, 69, -17, 2],
    0.5: [6, -35, 158, 156, -35, 6],  # both center raws quantize to 156; +2 residue -> 158
    0.75: [2, -17, 69, 228, -34, 8],
}

# f -> 4 quantized Catmull-Rom taps (hand-computed)
CUBIC_KAT = {
    0.0: [0, 256, 0, 0],
    0.25: [-18, 222, 58, -6],
    0.5: [-16, 144, 144, -16],
    0.75: [-6, 58, 222, -18],
}


def test_lanczos_taps_pinned():
    for f, expected in LANCZOS3_KAT.items():
        assert kernels.lanczos_wq_scalar(f) == expected, f
    # vectorized path agrees with the scalar wrapper
    fs = np.array(sorted(LANCZOS3_KAT))
    vec = kernels.lanczos_weights_q(fs)
    assert vec.tolist() == [LANCZOS3_KAT[f] for f in sorted(LANCZOS3_KAT)]


def test_cubic_taps_pinned():
    for f, expected in CUBIC_KAT.items():
        assert kernels.cubic_wq_scalar(f) == expected, f
    fs = np.array(sorted(CUBIC_KAT))
    vec = kernels.cubic_weights_q(fs)
    assert vec.tolist() == [CUBIC_KAT[f] for f in sorted(CUBIC_KAT)]


def test_taps_sum_256_everywhere():
    """Flat-field preservation: quantized taps sum to exactly 256 for a
    dense sweep of fractional offsets (the residue-fold invariant)."""
    fs = np.linspace(0.0, 1.0, 257, endpoint=False)
    assert (kernels.lanczos_weights_q(fs).sum(axis=-1) == 256).all()
    assert (kernels.cubic_weights_q(fs).sum(axis=-1) == 256).all()


def test_independent_scalar_rederivation():
    """Full re-derivation with math.sin (no NumPy in the weight math) for
    a non-KAT offset — guards the pinned table itself against a
    transcription slip."""

    def sinc(t):
        return 1.0 if t == 0.0 else math.sin(math.pi * t) / (math.pi * t)

    f = 0.375
    ws = []
    for j in range(6):
        x = j - 2.0 - f
        ws.append(sinc(x) * sinc(x / 3.0) if abs(x) < 3.0 else 0.0)
    wq = [math.floor(w * 256.0 + 0.5) for w in ws]
    wq[2] += 256 - sum(wq)
    assert kernels.lanczos_wq_scalar(f) == wq


def test_engine_and_oracle_share_the_module():
    """The sharing is real, not two copies that happen to agree."""
    from oracle import minitiler
    from tilers_tools_spark.operators import render

    assert render._lanczos_weights_q is kernels.lanczos_weights_q
    assert render._cubic_weights_q is kernels.cubic_weights_q
    assert minitiler._lanczos_wq is kernels.lanczos_wq_scalar
    assert minitiler._cubic_wq is kernels.cubic_wq_scalar
