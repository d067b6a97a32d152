"""Quantized resampling-kernel taps — the ONE shared implementation.

Both the engine's base-resample path (operators/render.py) and the
pixel oracle (oracle/minitiler.py) import these, so engine/oracle
bit-identity for the multi-tap kernels holds BY CONSTRUCTION (round 4
had two transcriptions of the same formula; a 1-ULP libm divergence at
a w*256+0.5 quantization boundary could flip a tap on some platform,
and after the oracle was aligned to np.sinc the two copies were no
longer independent anyway — VERDICT r4 ask #5).

Independence anchor: because engine and oracle now share this module, a
formula-level bug here would be invisible to the engine-vs-oracle gate.
tests/test_kernels_spec.py therefore pins the quantized taps for
several fractional offsets to HAND-COMPUTED integer lists (derived once
with math.sin, checked into the test) — the shared formula is anchored
to spec values, not to itself.

Contract (fixed-point 8.8, flat-field preserving):
* cubic (Catmull-Rom): 4 taps at offsets -1..+2 from floor(s);
  w0..w3 the standard Catmull-Rom polynomials; each tap quantized
  floor(w*256 + 0.5); residue folded into tap 1 so the sum is
  exactly 256.
* lanczos (Lanczos-3): 6 taps at offsets -2..+3 from floor(s);
  w = sinc(x) * sinc(x/3) masked to |x| < 3 (np.sinc's normalized
  sinc); same quantization; residue folded into the CENTER tap
  (index 2).

Pure NumPy — safe to import from the oracle (no Spark dependency).
"""

from __future__ import annotations

import numpy as np


def cubic_weights_q(f: np.ndarray) -> np.ndarray:
    """Quantized 8.8 fixed-point Catmull-Rom weights: 4 taps at offsets
    -1..+2 from floor(s); residue (sum must be exactly 256 to preserve
    flat fields) folded into tap 1. Returns int32 (taps can be
    negative). Vectorized over any leading shape of `f`."""
    f = np.asarray(f, dtype=np.float64)
    w0 = ((-0.5 * f + 1.0) * f - 0.5) * f
    w1 = (1.5 * f - 2.5) * f * f + 1.0
    w2 = ((-1.5 * f + 2.0) * f + 0.5) * f
    w3 = (0.5 * f - 0.5) * f * f
    wq = np.floor(np.stack([w0, w1, w2, w3], axis=-1) * 256.0 + 0.5).astype(np.int32)
    wq[..., 1] += 256 - wq.sum(axis=-1)
    return wq


def lanczos_weights_q(f: np.ndarray, a: int = 3) -> np.ndarray:
    """Quantized 8.8 fixed-point Lanczos-a taps: 2a taps at offsets
    -(a-1)..+a from floor(s); w = sinc(x)*sinc(x/a) masked to |x| < a;
    residue folded into the center tap (index a-1) so the taps sum to
    exactly 256. Returns int32. Vectorized over any leading shape."""
    f = np.asarray(f, dtype=np.float64)
    x = np.arange(2 * a, dtype=np.float64)[None, :] - (a - 1.0) - f[..., None]
    w = np.sinc(x) * np.sinc(x / a) * (np.abs(x) < a)
    wq = np.floor(w * 256.0 + 0.5).astype(np.int32)
    wq[..., a - 1] += 256 - wq.sum(axis=-1)
    return wq


def cubic_wq_scalar(f: float) -> list[int]:
    """Scalar convenience wrapper (oracle's per-pixel loop)."""
    return [int(v) for v in cubic_weights_q(np.array([f]))[0]]


def lanczos_wq_scalar(f: float, a: int = 3) -> list[int]:
    """Scalar convenience wrapper (oracle's per-pixel loop)."""
    return [int(v) for v in lanczos_weights_q(np.array([f]), a)[0]]
