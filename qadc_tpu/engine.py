"""Query engine: batched search with per-phase metrics.

Reference: nns_engine / nns_engine_batch (query_common.hpp:149-309) — the
per-query path and the batch path that amortizes assignment/rotation/tables
over a batch. On TPU every phase is batched by construction; this engine
exists for (a) the CLI's CSV metrics contract (phase timings like the
reference's index/rotate/table/scan columns, db_query_4.cpp:387-390) and
(b) chunking query streams into fixed-shape batches so jit compiles once.

For production serving use the fused jitted search functions directly — the
phase-split here exists to attribute time, at the cost of fusion across
phases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qadc_tpu.eval.metrics import PhaseTimer, QueryMetrics
from qadc_tpu.index import flat, ivf
from qadc_tpu.index.flat import FlatIndex
from qadc_tpu.index.ivf import IVFIndex


class QueryEngine:
    """Runs fixed-size query batches against an index with phase metrics."""

    def __init__(
        self,
        index,
        r: int = 100,
        ma: int = 1,
        keep: float = 0.01,
        adc_type: str = "qadc",
        batch_size: int = 32,
        rerank: bool = True,
    ):
        if adc_type not in ("adc", "qadc"):
            raise ValueError(f"adc_type must be adc|qadc, got {adc_type}")
        if adc_type == "qadc" and index.pq.sq_bits != 4:
            # Reference: db_query_4 exits unless sq_bits==4 (db_query_4.cpp:393-402).
            raise ValueError("Quick ADC requires sq_bits == 4")
        self.index = index
        self.r = r
        self.ma = ma
        self.keep = keep
        self.adc_type = adc_type
        self.batch_size = batch_size
        self.rerank = rerank
        self.is_ivf = isinstance(index, IVFIndex)
        if not self.is_ivf and not isinstance(index, FlatIndex):
            raise TypeError(f"unsupported index type {type(index)}")

    def _search(self, queries):
        if self.is_ivf:
            if self.adc_type == "qadc":
                return ivf.search_qadc(
                    self.index, queries, r=self.r, ma=self.ma, keep=self.keep,
                    rerank=self.rerank,
                )
            return ivf.search_adc(self.index, queries, r=self.r, ma=self.ma)
        if self.adc_type == "qadc":
            return flat.search_qadc(
                self.index, queries, r=self.r, keep=self.keep, rerank=self.rerank
            )
        return flat.search_adc(self.index, queries, r=self.r)

    def _phase_metrics(self, queries, metrics: QueryMetrics):
        """Attribute time to index/rotate/table/scan by running phases split."""
        from qadc_tpu.ops.tables import adc_tables

        timer = PhaseTimer()
        if self.is_ivf:
            parts, rot = ivf.assign_queries(self.index, queries, self.ma)
            jax.block_until_ready((parts, rot))
            index_us = timer.lap_us()
            rotate_us = 0.0  # fused into assign_queries (rotation of residuals)
        else:
            rot = self.index.pq.rotate(queries)
            jax.block_until_ready(rot)
            index_us = 0.0
            rotate_us = timer.lap_us()
        tables = adc_tables(rot, self.index.pq.centroids)
        jax.block_until_ready(tables)
        table_us = timer.lap_us()
        out = self._search(queries)
        jax.block_until_ready(out)
        scan_us = timer.lap_us()
        q = queries.shape[0]
        # Per-query averages; QueryMetrics.averaged() then averages over batches.
        metrics.add(index_us / q, rotate_us / q, table_us / q, scan_us / q)
        return out

    def run(self, queries, with_metrics: bool = True):
        """Process all queries in fixed-size batches.

        Returns (dists (Q, r), labels (Q, r), QueryMetrics).
        """
        queries = np.asarray(queries, np.float32)
        q = queries.shape[0]
        b = self.batch_size
        metrics = QueryMetrics()
        all_d, all_l = [], []
        for s in range(0, q, b):
            batch = queries[s : s + b]
            if batch.shape[0] < b:  # pad the tail batch to the jitted shape
                pad = np.zeros((b - batch.shape[0], batch.shape[1]), np.float32)
                padded = np.concatenate([batch, pad])
            else:
                padded = batch
            if with_metrics:
                d, l = self._phase_metrics(jnp.asarray(padded), metrics)
            else:
                d, l = self._search(jnp.asarray(padded))
            all_d.append(np.asarray(d)[: batch.shape[0]])
            all_l.append(np.asarray(l)[: batch.shape[0]])
        return np.concatenate(all_d), np.concatenate(all_l), metrics
