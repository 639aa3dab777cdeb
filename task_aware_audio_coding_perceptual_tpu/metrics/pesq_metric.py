"""PESQ: real package when available, otherwise a clearly-labeled proxy.

The reference uses the ``pesq`` PyPI package (ITU-T P.862,
``sgmse/sgmse/model.py:247``) and a differentiable ``torch_pesq`` loss
(``model.py:83-86``). Neither is installed in this environment, so:

- :func:`pesq` delegates to the real package when importable and otherwise
  raises ``ImportError`` — callers that *require* ITU PESQ fail loudly.
- :func:`pesq_proxy` is a frequency-weighted segmental-SNR MOS estimate
  (fwSNRseg mapped into the [1.0, 4.5] MOS-LQO range). It correlates with
  PESQ on additive-noise degradations and is used by the validation loop as
  a stand-in metric; results are logged under ``pesq_proxy``, never ``pesq``.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only when the real package exists
    from pesq import pesq as _pesq_real

    HAVE_PESQ = True
except ImportError:  # pragma: no cover
    _pesq_real = None
    HAVE_PESQ = False


def pesq(fs: int, ref: np.ndarray, deg: np.ndarray, mode: str = "wb") -> float:
    """ITU-T P.862 PESQ via the ``pesq`` package (reference ``model.py:247``)."""
    if _pesq_real is None:
        raise ImportError(
            "The 'pesq' package is not available in this environment. "
            "Use metrics.pesq_proxy for a stand-in estimate."
        )
    return float(_pesq_real(fs, ref, deg, mode))


def _mel_like_weights(n_bands: int) -> np.ndarray:
    # Articulation-index-style band importance (flat-topped raised cosine).
    w = np.hanning(n_bands + 2)[1:-1]
    return w / w.sum()


def pesq_proxy(fs: int, ref: np.ndarray, deg: np.ndarray, mode: str = "wb") -> float:
    """Frequency-weighted segmental-SNR MOS proxy in [1.04, 4.64].

    NOT ITU PESQ — a monotone stand-in for environments without the package.
    """
    ref = np.asarray(ref, dtype=np.float64).reshape(-1)
    deg = np.asarray(deg, dtype=np.float64).reshape(-1)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    frame = int(0.032 * fs)
    hop = frame // 2
    if n < 2 * frame:
        return 1.04
    win = np.hanning(frame)
    n_frames = (n - frame) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    R = np.fft.rfft(ref[idx] * win, axis=-1)
    D = np.fft.rfft(deg[idx] * win, axis=-1)

    n_bands = 23
    bins = R.shape[-1]
    edges = np.unique(np.geomspace(2, bins, n_bands + 1).astype(int))
    w = _mel_like_weights(len(edges) - 1)

    ref_pow = np.abs(R) ** 2
    err_pow = np.abs(R - D) ** 2
    band_snr = []
    for b in range(len(edges) - 1):
        s = ref_pow[:, edges[b] : edges[b + 1]].sum(-1)
        e = err_pow[:, edges[b] : edges[b + 1]].sum(-1)
        band_snr.append(10 * np.log10((s + 1e-12) / (e + 1e-12)))
    band_snr = np.stack(band_snr, -1)  # (frames, bands)
    band_snr = np.clip(band_snr, -10.0, 35.0)

    # only count frames with speech energy
    frame_energy = 10 * np.log10(ref_pow.sum(-1) + 1e-12)
    active = frame_energy > (frame_energy.max() - 40.0)
    if not np.any(active):
        return 1.04
    fwsnr = float((band_snr[active] @ w).mean())
    # map [-10, 35] dB -> [1.04, 4.64] MOS-LQO-ish with a logistic curve
    mos = 1.04 + 3.6 / (1.0 + np.exp(-(fwsnr - 8.0) / 5.0))
    return float(mos)
