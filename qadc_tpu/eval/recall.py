"""Recall@R evaluation.

Reference: recall_file (recall.hpp:33-61) with t=1 (query_common.hpp:342):
a query scores 1 iff its true nearest neighbor appears among the R returned
labels — NOT intersection recall.
"""

from __future__ import annotations

import numpy as np


def recall_at_r(result_labels, groundtruth, t: int = 1) -> float:
    """Fraction of queries whose t first groundtruth entries all appear in results.

    Args:
      result_labels: (Q, R) int labels returned by search.
      groundtruth: (Q, >=t) int — groundtruth neighbor ids (e.g. from an
        .ivecs file or exact_knn).
      t: number of leading groundtruth entries that must be found (default 1,
        matching the reference).

    Returns:
      recall in [0, 1].
    """
    result_labels = np.asarray(result_labels)
    groundtruth = np.asarray(groundtruth)
    if groundtruth.ndim == 1:
        groundtruth = groundtruth[:, None]
    # Vectorized membership: want (Q, t) broadcast against results (Q, 1, R).
    # O(Q*t*R) numpy ops instead of an interpreted double loop — this runs
    # inside benchmark config sweeps.
    want = groundtruth[:, :t]                               # (Q, t)
    found = (want[:, :, None] == result_labels[:, None, :]).any(axis=2)
    return float(found.all(axis=1).mean())
