"""Clean-room polyphase audio resampling — the canonical-rate
front-end of the audio dedup tier (charter extension, SURVEY.md
§2.10; reference analog: none).

Why: :mod:`.audio_fp`'s documented SCOPE LIMIT was that the SAME
recording stored at a different sample RATE never matched — the
1024-sample analysis frame covers a different time span, so frames
don't align even though the band edges scale. The standard fix in
every published fingerprinting system (Haitsma-Kalker included) is
resampling to a canonical rate before analysis. This module is that
front-end, built from textbook DSP only (windowed-sinc low-pass +
rational-ratio polyphase evaluation — Crochiere & Rabiner 1983; the
Kaiser window is a numpy builtin):

- :func:`resample` converts ``from_rate → to_rate`` for any rational
  ratio L/M (gcd-reduced). Conceptually: upsample by L (zero-fill),
  low-pass at ``min(π/L, π/M)`` with a Kaiser-windowed sinc (gain L),
  downsample by M. Evaluated POLYPHASE — only the output samples'
  dot products are computed, never the zero-filled signal:
  ``y[n] = Σ_t h[p_n + tL] · x[s_n − t]`` with ``p_n = (nM) mod L``,
  ``s_n = ⌊nM/L⌋`` — vectorized as two numpy gathers + one row-wise
  dot (no Python per-sample loop).
- the filter is designed per (L, M) pair and cached; ~24 taps per
  phase at β=8.6 (≈80 dB stopband) — alias rejection is asserted
  quantitatively in tests, not assumed.

Scale shape: pure per-recording numpy inside the same Arrow kernels
that decode — map-only, no shuffle, no new operator topology. The
fingerprint kernels take an optional ``canonical_rate``; the default
stays None so existing goldens/benches are byte-identical.
"""

from __future__ import annotations

import math
from functools import lru_cache

#: taps per polyphase leg; 24 at β=8.6 gives ≈80 dB stopband with a
#: transition band comfortably inside the fingerprint's 3 kHz edge
_TAPS_PER_PHASE = 24
_KAISER_BETA = 8.6


@lru_cache(maxsize=64)
def _polyphase_filter(L: int, M: int):
    """(bank, center, T): the Kaiser-windowed sinc low-pass at the
    upsampled rate (gain L), PRE-DECOMPOSED into its (L, T) polyphase
    bank — row p holds ``h[p + tL]`` zero-padded at the tail, so the
    hot loop indexes ``bank[p]`` instead of gathering h through a
    per-output index matrix (review catch: the gather recomputed the
    same L-periodic rows every block and doubled the transient)."""
    import numpy as np

    # length scales with max(L, M): the cutoff is 1/max(L, M) of the
    # upsampled rate, so the sinc needs ~TAPS periods of THAT width
    # (a decimator with L=1 would otherwise get a 25-tap filter and
    # ~-29 dB alias rejection — caught by the quantitative test)
    n_taps = _TAPS_PER_PHASE * max(L, M)
    if n_taps % 2 == 0:
        n_taps += 1
    center = n_taps // 2
    fc = 0.5 / max(L, M)  # cycles/sample in the upsampled domain
    k = np.arange(n_taps) - center
    h = (2.0 * fc * np.sinc(2.0 * fc * k)
         * np.kaiser(n_taps, _KAISER_BETA) * L)
    T = (n_taps - 1) // L + 1
    bank = np.zeros((L, T), dtype=np.float64)
    for p in range(L):
        row = h[p::L]
        bank[p, :row.size] = row
    return bank, center, T


def resample(samples, from_rate: int, to_rate: int):
    """Resample a 1-D float waveform between integer rates. Output
    length is ``ceil(n · to/from)``; identical rates return the
    input unchanged (same object — callers treat it read-only)."""
    import numpy as np

    if from_rate <= 0 or to_rate <= 0:
        raise ValueError("rates must be positive")
    x = np.asarray(samples, dtype=np.float64)
    if from_rate == to_rate or x.size == 0:
        return x
    g = math.gcd(from_rate, to_rate)
    L, M = to_rate // g, from_rate // g
    bank, center, T = _polyphase_filter(L, M)
    n_out = -(-x.size * L // M)  # ceil
    t = np.arange(T, dtype=np.int64)
    # x padded with T zeros each side: out-of-range gathers land on
    # zeros instead of paying np.where masks over full temporaries
    xpad = np.concatenate(
        [np.zeros(T, dtype=np.float64), x, np.zeros(T, dtype=np.float64)]
    )
    out = np.empty(n_out, dtype=np.float64)
    # y[n] = Σ_j h[j] · xup[nM + center − j], xup zero except at
    # multiples of L; substituting j = p_n + tL with
    # p_n = (nM + center) mod L makes the filter side a bank-row
    # lookup and the signal side one gather. BLOCKWISE with the
    # block scaled INVERSELY to T, so transients stay ~tens of MB
    # regardless of the decimation ratio (review catch: a fixed 64k
    # block hit ~600 MB at 192 kHz → 16 kHz, T = 289)
    block = max(1024, (1 << 21) // T)
    for b0 in range(0, n_out, block):
        n = np.arange(b0, min(n_out, b0 + block), dtype=np.int64)
        pos = n * M + center
        p = pos % L
        s = pos // L
        xidx = np.clip(s[:, None] - t[None, :] + T, 0, xpad.size - 1)
        out[b0:b0 + n.size] = np.einsum(
            "ij,ij->i", bank[p], xpad[xidx]
        )
    return out
