"""Moment-matched synthetic datasets for recall evaluation (zero egress).

The reference's published numbers are SIFT1M/GIST1M (README.md:277-330,
TexMex datasets, README.md:153-157); this image cannot download them, so
recall parity is read against generators tuned to land trained indexes in
the reference's recall regime. The SIFT generator reproduces the published
table SHAPE at 1M (flat 8x8 0.93-0.95, IVF ordering, 4-bit delta at or
under the reference's +0.022 — benchmarks/recall_curves.py logs); the
earlier latent-Gaussian synthetic sat at 0.72 flat recall, too far from
SIFT to read deltas against published numbers (round-3 RESULTS).

When real TexMex files exist (QADC_SIFT_DIR), benchmarks/recall_curves.py
uses them instead — these generators are the fallback, not a replacement.
"""

from __future__ import annotations

import numpy as np


def sift_moment_like(rng, n, nq=256, clusters=2048, spread=0.5, dim=128):
    """SIFT-moment-matched synthetic.

    Gamma marginals with SIFT's 4x4x8 cell-energy profile (corner/edge
    cells carry less gradient energy), hierarchical clusters, per-sample
    illumination scaling, uint8 quantization. Relative contrast (mean NN
    dist / mean pair dist) ~0.43 vs real SIFT's ~0.4-0.5.
    """
    cell_w = np.array([
        0.55, 0.75, 0.75, 0.55,
        0.75, 1.0, 1.0, 0.75,
        0.75, 1.0, 1.0, 0.75,
        0.55, 0.75, 0.75, 0.55,
    ])
    profile = np.repeat(cell_w, 8)[:dim]
    centers = rng.gamma(1.2, 40.0, size=(clusters, dim)).astype(np.float32)
    centers *= profile[None, :]

    def draw(k):
        who = rng.integers(0, clusters, k)
        c = centers[who]
        x = c * rng.lognormal(0.0, spread, size=(k, 1)).astype(np.float32)
        x = x + rng.normal(scale=spread * (c + 8.0)).astype(np.float32)
        return np.clip(np.rint(x), 0, 255).astype(np.float32)

    return draw(n), draw(nq)


def gist_moment_like(rng, n, nq=256, clusters=2048, spread=0.45, dim=960):
    """GIST-moment-matched synthetic.

    GIST descriptors are Gabor filter energies over a 4x4 spatial grid x 60
    channels (960-d), small positive floats with strong within-cell channel
    correlation and LOWER relative contrast than SIFT (scene gists crowd the
    space — the published reason GIST recall sits below SIFT at equal code
    size). Model: scene-type cluster centers with a smooth per-cell energy
    envelope, per-sample global illumination (lognormal), per-cell activation
    jitter shared across that cell's 60 channels (the correlation SIFT's
    generator lacks), plus channel noise. No uint8 rounding — GIST is float.
    """
    cells, chans = 16, dim // 16
    # smooth spatial envelope: center cells carry more energy
    cell_w = np.array([
        0.7, 0.85, 0.85, 0.7,
        0.85, 1.0, 1.0, 0.85,
        0.85, 1.0, 1.0, 0.85,
        0.7, 0.85, 0.85, 0.7,
    ])
    profile = np.repeat(cell_w, chans)[:dim]
    centers = rng.gamma(1.5, 0.045, size=(clusters, dim)).astype(np.float32)
    centers *= profile[None, :]

    def draw(k):
        who = rng.integers(0, clusters, k)
        c = centers[who]
        g = rng.lognormal(0.0, spread, size=(k, 1)).astype(np.float32)
        cell_act = rng.lognormal(
            0.0, spread * 0.8, size=(k, cells)
        ).astype(np.float32)
        act = np.repeat(cell_act, chans, axis=1)[:, :dim]
        x = c * g * act + rng.normal(
            scale=spread * 0.35 * (c + 0.01)
        ).astype(np.float32)
        return np.clip(x, 0.0, 1.0).astype(np.float32)

    return draw(n), draw(nq)
