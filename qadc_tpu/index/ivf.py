"""IVF (inverted file) index with multiple assignment.

Reference: index_db (databases.hpp:176-331) + scanner_4 (db_query_4.cpp:73-310).
part_count coarse centroids; each vector is stored in the partition of its
nearest centroid as a PQ code of its residual; a query probes its `ma` nearest
partitions with per-assignment residual tables.

TPU-native departures:
  - Partitions are a UNIFORM 3D array (P, part_pad, code_size) padded by
    repeating each partition's last code (labels clamp to the partition's last
    real label — reference tail quirk, simd_layout.hpp:47-50). Static shapes:
    probing = a gather along axis 0, no ragged pointers.
  - The reference's separate "starts" prefix buffers (db_query_4.cpp:133-191)
    are unnecessary: the keep-prefix of partition p is rows [0, size_p*keep) of
    the same 3D array, sliced statically and masked.
  - Coarse k-means training is in-framework and jitted (ops/kmeans.py).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qadc_tpu.core.layout import codes_per_row
from qadc_tpu.core.packing import unpack_codes
from qadc_tpu.kernels.lut_scan import (
    DEFAULT_WINDOW,
    MASK_BIG,
    slots_to_rows,
    window_slots,
)
from qadc_tpu.ops.kmeans import kmeans
from qadc_tpu.ops.knn import exact_knn
from qadc_tpu.ops.quantization import (
    clamp_bound_to_max_distance,
    keep_prefix_bound,
    quantize_tables_int8,
)
from qadc_tpu.ops.tables import adc_tables
from qadc_tpu.ops.topk import (
    exact_screen_smallest,
    exact_tile_screen,
    merge_topk,
    topk_smallest,
)
from qadc_tpu.quantizers.pq import ProductQuantizer

PART_ALIGN = 512  # partition padding granularity (rows); multiple of the
                  # grouped-scan kernel block so partitions tile evenly


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pq", "coarse_centroids", "codes", "labels", "part_sizes",
                 "planes"],
    meta_fields=["n", "max_part_size"],
)
@dataclasses.dataclass(frozen=True)
class IVFIndex:
    """IVF index.

    Attributes:
      pq: ProductQuantizer / OPQQuantizer (trained on residuals).
      coarse_centroids: (P, dim) float32.
      codes: (P, part_pad/cpr, 128) uint8 ROW128 storage (core/layout.py).
      labels: (P, part_pad) int32.
      part_sizes: (P,) int32 real sizes.
      n: total real vector count — static.
      max_part_size: max real partition size — static (for keep slicing).
      planes: optional (cb, P*part_pad) uint8 byte-planes (to_planes at
        tq_block_n()) — the tq grouped scan's storage (deletes the row128
        kernel's expansion matmuls; kernels/lut_scan.py round-5 comment).
        Derived data: rebuilt on add/load, never serialized. None = row128
        grouped kernel fallback.
    """

    pq: ProductQuantizer
    coarse_centroids: jax.Array
    codes: jax.Array
    labels: jax.Array
    part_sizes: jax.Array
    n: int
    max_part_size: int
    planes: jax.Array | None = None

    @property
    def part_count(self) -> int:
        return self.coarse_centroids.shape[0]

    @property
    def cpr(self) -> int:
        return codes_per_row(self.pq.code_size)

    @property
    def part_pad(self) -> int:
        return self.codes.shape[1] * self.cpr

    def tq_block_n(self) -> int | None:
        """Grouped tq block size for this geometry (None = not applicable).

        Matches the grouped block policies (4-bit: gcd(2048, part_pad) at
        window=min(cpr,16), _search_qadc_grouped_impl; 8-bit:
        gcd(1024, part_pad) at window=8, _search_adc8_grouped_impl); tq
        additionally needs 128-aligned chunk width, block_n % (W*128) == 0.
        """
        cpr = self.cpr
        if self.pq.sq_bits == 4:
            window = min(cpr, DEFAULT_WINDOW)
            bn = math.gcd(2048, self.part_pad)
        elif self.pq.sq_bits == 8:
            window = min(cpr, 8)
            bn = math.gcd(1024, self.part_pad)
        else:
            return None
        if bn % (window * 128) != 0:
            return None
        return bn

    def with_planes(self) -> "IVFIndex":
        """Return a copy carrying tq planes (no-op when not applicable)."""
        from qadc_tpu.kernels.lut_scan import to_planes

        bn0 = self.tq_block_n()
        if bn0 is None:
            return dataclasses.replace(self, planes=None)
        return dataclasses.replace(
            self,
            planes=to_planes(
                self.codes.reshape(-1, 128), self.pq.code_size, bn0
            ),
        )

    @classmethod
    def create(cls, pq: ProductQuantizer, coarse_centroids) -> "IVFIndex":
        """Empty index (reference: indexdb_create1/2)."""
        cc = jnp.asarray(coarse_centroids, jnp.float32)
        p = cc.shape[0]
        cpr = codes_per_row(pq.code_size)
        return cls(
            pq=pq,
            coarse_centroids=cc,
            codes=jnp.zeros((p, PART_ALIGN // cpr, 128), jnp.uint8),
            labels=jnp.zeros((p, PART_ALIGN), jnp.int32),
            part_sizes=jnp.zeros((p,), jnp.int32),
            n=0,
            max_part_size=0,
        )


def set_quantizer(index: IVFIndex, pq: ProductQuantizer) -> IVFIndex:
    """Install an (externally trained) quantizer into an EMPTY IVF index.

    Reference: indexdb_create2 swaps the real residual-trained PQ/OPQ into
    the empty index emitted by indexdb_create1 (indexdb_create2.cpp:41-59) —
    the second step of its external-training workflow (README.md:166-260).
    Codes already present were encoded with the old quantizer and would be
    silently misinterpreted, so a non-empty index is rejected; swap first,
    then add vectors.
    """
    dim = index.coarse_centroids.shape[1]
    if pq.dim != dim:
        raise ValueError(f"quantizer dim {pq.dim} != index dim {dim}")
    if index.n != 0:
        raise ValueError(
            f"cannot swap quantizer into a non-empty index (n={index.n}): "
            "existing codes were encoded with the old quantizer"
        )
    return IVFIndex.create(pq, index.coarse_centroids)


def keep_for_init(init: int, part_count: int, ma: int, n: int) -> float:
    """Convert the paper's `init` parameter to a keep fraction.

    Reference README.md:335-342: keep = (init * K) / (ma * N) — init is the
    total number of codes exact-scanned per query; keep is the per-partition
    prefix fraction that achieves it.
    """
    if min(init, part_count, ma, n) <= 0:
        raise ValueError("all of init, part_count, ma, n must be positive")
    return (init * part_count) / (ma * n)


def train_coarse(key, learn_vectors, part_count: int, iters: int = 50,
                 balance_cap: float | None = None):
    """Learn the coarse quantizer (reference: learn_coarse_quantizer,
    databases.cpp:94-118 — OpenCV kmeans++ + 48 Lloyd iterations).

    balance_cap: optional ratio — bound the largest cell at balance_cap x
    the mean cell size by splitting oversized cells (K stays part_count;
    ops.kmeans.balance_centroids). TPU-specific departure: static shapes
    pad every partition to the largest, so unbounded cell skew inflates
    the whole index (measured 23x padding / 13x QPS loss at 1M clustered;
    the reference's variable-length partitions never pay this). 3.0 is a
    good default for clustered data; None preserves plain Lloyd.
    """
    x = jnp.asarray(learn_vectors, jnp.float32)
    centroids, _ = kmeans(key, x, part_count, iters)
    if balance_cap is not None:
        from qadc_tpu.ops.kmeans import balance_centroids

        centroids, _ = balance_centroids(
            jax.random.fold_in(key, 0x6A1), x, centroids,
            cap_ratio=balance_cap,
        )
    return centroids


def compute_residuals(index: IVFIndex, vectors, assignments):
    """residual = vector - coarse_centroid[assignment] (databases.cpp:24-48)."""
    return jnp.asarray(vectors, jnp.float32) - index.coarse_centroids[assignments]


def add(index: IVFIndex, vectors, encode_batch: int = 262144) -> IVFIndex:
    """Assign -> residual -> encode -> scatter into partitions.

    Reference: index_db::add_vectors (databases.hpp:270-298). One-shot
    convenience wrapper over index.build.IVFBuilder — for STREAMED ingest
    (many chunks) use the builder directly so per-partition buffers append in
    place and tail padding happens once at finalize().
    """
    from qadc_tpu.index.build import IVFBuilder

    b = IVFBuilder.from_index(index)
    b.add(vectors, encode_batch=encode_batch)
    return b.finalize()


def _one_hot_gathered(codes, sq_count: int, sq_bits: int, dtype):
    """(..., S, code_bytes) uint8 -> (..., S, M*K) one-hot."""
    idx = unpack_codes(codes, sq_count, sq_bits)  # (..., S, M)
    k = 1 << sq_bits
    oh = jax.nn.one_hot(idx, k, dtype=dtype)
    return oh.reshape(*idx.shape[:-1], sq_count * k)


def assign_queries(index: IVFIndex, queries, ma: int):
    """(Q, ma) nearest partitions + (Q, ma, dim) rotated residual queries.

    Reference: index_db::assign_compute_residuals (databases.hpp:201-231) +
    OPQ rotation of residuals (query_common.hpp:289).
    """
    queries = jnp.asarray(queries, jnp.float32)
    _, parts = exact_knn(queries, index.coarse_centroids, ma)  # (Q, ma)
    residuals = queries[:, None, :] - index.coarse_centroids[parts]
    q, _, dim = residuals.shape
    rot = index.pq.rotate(residuals.reshape(q * ma, dim)).reshape(q, ma, dim)
    return parts, rot


def search_adc(
    index: IVFIndex, queries, r: int = 100, ma: int = 1,
    grouped: bool | None = None, group_size: int = 128,
    interpret: bool = False, scan_budget_bytes: int | None = None,
):
    """Conventional float ADC IVF search (reference: db_query.cpp).

    On TPU, 4- and 8-bit ride the grouped scalar-prefetch Pallas kernels:
    4-bit with f32 tables + whole-window exact rerank (exact top-r, see
    _search_adc4_grouped_impl); 8-bit with bf16 tables + exact-f32 candidate
    rerank (_search_adc8_grouped_impl). Elsewhere, a one-hot x table einsum
    per probed partition. 16-bit: the ADC distance is computed as the squared
    distance to the PQ reconstruction (decode = per-sq row gathers; see
    index.flat._search_adc_recon) — 65536-entry tables and one-hots never
    materialize.
    """
    # Probing more partitions than exist == probing all of them (the
    # reference's binheap assignment degrades unpredictably there; clamp).
    ma = min(ma, index.part_count)
    on_kernel = jax.default_backend() == "tpu" or interpret
    if grouped is None:
        grouped = (
            on_kernel
            and index.part_pad % 512 == 0
            and (
                (index.pq.sq_bits == 8 and 128 % index.pq.sq_count == 0)
                or (index.pq.sq_bits == 4 and index.pq.sq_count in (16, 32))
            )
        ) or (
            # 16-bit grouped is pure jnp (decode-GEMM, no Pallas): profitable
            # whenever probes repeat partitions, on any backend.
            index.pq.sq_bits == 16 and index.part_pad % 512 == 0
        )
    budget = _default_scan_budget() if scan_budget_bytes is None else scan_budget_bytes
    if grouped and index.pq.sq_bits == 4:
        def run4(qs):
            return _search_adc4_grouped_impl(
                index, qs, r, ma, group_size, interpret=interpret
            )

        window4 = min(codes_per_row(index.pq.code_size), 16)
        chunk = _governed_query_chunk(
            lambda qc: _grouped_scan_bytes(
                qc, ma, index.part_count, index.part_pad, window4, group_size,
                lanes=(index.pq.sq_count // 2) * 16, val_bytes=4,
                slab_bytes=4, n_streams=1, r=r, cb=index.pq.code_size,
            ),
            queries.shape[0], budget,
        )
        if chunk < queries.shape[0]:
            return _run_query_chunks(run4, jnp.asarray(queries), chunk)
        return run4(queries)
    if grouped and index.pq.sq_bits == 8:
        def run8(qs):
            return _search_adc8_grouped_impl(
                index, qs, r, ma, group_size, interpret=interpret
            )

        window8 = min(128 // index.pq.sq_count, 8)
        chunk = _governed_query_chunk(
            lambda qc: _grouped_scan_bytes(
                qc, ma, index.part_count, index.part_pad, window8, group_size,
                lanes=index.pq.sq_count * 256, val_bytes=4,
                slab_bytes=2, n_streams=2,  # vals + slots streams
            ),
            queries.shape[0], budget,
        )
        if chunk < queries.shape[0]:
            return _run_query_chunks(run8, jnp.asarray(queries), chunk)
        return run8(queries)
    if grouped and index.pq.sq_bits == 16:
        return _search_adc16_grouped_impl(index, queries, r, ma, group_size)
    return _search_adc_jnp_impl(index, queries, r, ma)


@partial(jax.jit, static_argnames=("r", "ma"))
def _search_adc_jnp_impl(index: IVFIndex, queries, r: int = 100, ma: int = 1):
    parts, rot = assign_queries(index, queries, ma)
    m = index.pq.sq_count
    wide = index.pq.sq_bits == 16
    if not wide:
        tables = adc_tables(rot, index.pq.centroids)  # (Q, ma, M, K)
        k = index.pq.sq_centroid_count
        tflat = tables.reshape(*tables.shape[:2], m * k)

    sizes = index.part_sizes[parts]  # (Q, ma)

    def scan_one_assignment(ass_i, carry):
        best_v, best_l = carry
        pids = jax.lax.dynamic_index_in_dim(parts, ass_i, 1, keepdims=False)
        pcodes = index.codes[pids].reshape(
            -1, index.part_pad, index.pq.code_size
        )                                              # (Q, part_pad, cb)
        plabels = index.labels[pids]                   # (Q, part_pad)
        if wide:
            from qadc_tpu.index.flat import decode_rows

            idx = unpack_codes(pcodes, m, 16)          # (Q, part_pad, M)
            dec = decode_rows(index.pq, idx)           # (Q, part_pad, dim)
            ra = jax.lax.dynamic_index_in_dim(rot, ass_i, 1, keepdims=False)
            cross = jnp.einsum(
                "qd,qsd->qs", ra, dec,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d = (
                jnp.sum(ra * ra, axis=1)[:, None]
                + jnp.sum(dec * dec, axis=2)
                - 2.0 * cross
            )
        else:
            oh = _one_hot_gathered(pcodes, m, index.pq.sq_bits, jnp.float32)
            t = jax.lax.dynamic_index_in_dim(tflat, ass_i, 1, keepdims=False)
            d = jnp.einsum("qsf,qf->qs", oh, t, preferred_element_type=jnp.float32)
        # Mask padded rows (duplicates of the last code would flood the top-r
        # at our padding granularity) and empty partitions.
        sz = jax.lax.dynamic_index_in_dim(sizes, ass_i, 1, keepdims=True)
        col = jnp.arange(index.part_pad, dtype=jnp.int32)
        d = jnp.where(col[None, :] < sz, d, jnp.inf)
        cv, cl = topk_smallest(d, plabels, min(r, index.part_pad))
        return merge_topk(best_v, best_l, cv, cl, r)

    q = queries.shape[0]
    init = (jnp.full((q, r), jnp.inf, jnp.float32), jnp.zeros((q, r), jnp.int32))
    vals, labs = jax.lax.fori_loop(0, ma, scan_one_assignment, init)
    return vals, labs


@partial(
    jax.jit,
    static_argnames=("r", "ma", "group_size", "window", "block_n", "interpret"),
)
def _search_adc8_grouped_impl(
    index: IVFIndex, queries, r: int, ma: int, group_size: int,
    window: int | None = None, block_n: int = 1024, interpret: bool = False,
):
    """8-bit IVF ADC via the grouped Pallas kernel (MoE-style routing).

    The jnp per-assignment path materializes (Q, part_pad, M*256) one-hots in
    HBM (~6 GB/batch at SIFT1M geometry); here each probed partition is
    scanned ONCE in VMEM against its group's (m*256, G) bf16 table slab
    (kernels.lut_scan8_grouped_prefetch). Window MINIMA are screened at query
    level, then every member of each winning window is reranked with
    exact-f32 table gathers — whole-window expansion, the same contract as
    the flat 8-bit path's window_rerank (a true top-r entry is lost only if
    its entire window misses the wq-window screen). Reference:
    scan_standard<uint8_t> over probed partitions (query_common.hpp:92-118).
    """
    from qadc_tpu.core.packing import gather_codes_row128, unpack_codes
    from qadc_tpu.index.routing import route_queries
    from qadc_tpu.kernels.lut_scan import (
        build_scan8_tables,
        lut_scan8_grouped_prefetch,
        slots_to_rows,
    )

    parts, rot = assign_queries(index, queries, ma)
    tables = adc_tables(rot, index.pq.centroids)          # (Q, ma, M, 256) f32
    m = index.pq.sq_count
    q = queries.shape[0]
    qa = q * ma
    part_pad = index.part_pad
    cpr = 128 // m
    block_n = math.gcd(block_n, part_pad)
    if window is None:
        # window=8 measured best after whole-window expansion: the rerank's
        # wq*window element gathers dominate, so halving the window beats
        # the doubled minima stream (704 -> 626 us/q b=32 at a skewed 1M
        # geometry, window=16 vs 8; window=4 adds little more —
        # benchmarks/ab_adc8_window.py; recall == jnp oracle at both).
        window = min(cpr, 8)

    routed = route_queries(parts, index.part_count, group_size)
    g = routed.group_size

    t8 = build_scan8_tables(tables.reshape(qa, m, 256), q_pad=qa).T  # (QA, lanes)
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)

    nblk = _group_nblk(
        index.part_sizes, routed.group_part, block_n, part_pad // block_n
    )
    # tq (plane-major) kernel when the index carries planes at this block
    # size — deletes the bf16 expansion matmul and the deinterleave rolls;
    # identical window minima/slots (to_planes production slot order).
    if index.planes is not None and index.tq_block_n() == block_n \
            and block_n % (window * 128) == 0:
        from qadc_tpu.kernels.lut_scan import lut_scan8_grouped_tq

        (tg,) = _group_table_slabs_tq(routed, t8)
        vals_rows, slot_rows = lut_scan8_grouped_tq(
            index.planes, routed.group_part, tg,
            rows_per_group=part_pad, m=m, block_n=block_n, window=window,
            interpret=interpret, group_nblk=nblk,
        )
    else:
        (tg,) = _group_table_slabs(routed, t8)
        vals_rows, slot_rows = lut_scan8_grouped_prefetch(
            index.codes.reshape(-1, 128), routed.group_part, tg,
            rows_per_group=part_pad, m=m, block_n=block_n, window=window,
            interpret=interpret, transpose_out=True,
            group_nblk=nblk,
        )
    c = part_pad // window
    cv = vals_rows[qa_g * g + qa_s]                       # (QA, C) [row gather]
    sl = slot_rows[qa_g * g + qa_s]                       # (QA, C) local slots
    rows_local = slots_to_rows(sl, block_n, m)            # (QA, C) in [0, part_pad)
    p_of_pair = parts.reshape(qa)
    sz = index.part_sizes[p_of_pair]                      # (QA,)
    # A window is alive iff it covers at least one real row; padded argmin
    # rows clamp to the last real code (tail-repeat padding duplicates it, so
    # the clamped candidate's value/label are exactly that code's —
    # reference's bh_push index clamp, simd_scan.hpp:63-73).
    win_ids = jnp.arange(c, dtype=jnp.int32)
    win_has_valid = _window_valid_mask(sz, c, block_n, window, m)
    # Dedup the clamp: a clamped argmin means every padded row (all equal to
    # the last real code) beat the window's real rows, so ALL such windows
    # would report the same duplicate — for a nearly-empty partition whose
    # last code is the query's NN that floods the top-r. Keep the clamped
    # candidate only in the ONE window that contains the real last row
    # (others are masked; their real rows rank >= the duplicate, the same
    # loss class as window-collision screening).
    clamped = rows_local >= sz[:, None]
    last = jnp.maximum(sz - 1, 0)
    gr = block_n // window
    rblk = block_n // cpr
    pb = last % block_n
    slot_last = (pb % cpr) * rblk + pb // cpr
    wi_last = (last // block_n) * gr + slot_last % gr     # (QA,)
    keep = (~clamped) | (win_ids[None, :] == wi_last[:, None])
    cv = jnp.where(win_has_valid & keep, cv, jnp.inf)

    # Query-level screen of 2r WINDOWS across the query's ma partitions, then
    # expand each winning window and exactly rerank EVERY member. Ranking
    # only per-window argmins lost co-window top-r members when the true
    # top-r clusters into few partitions — measured -0.039 recall@100 at 1M
    # clustered geometry vs the jnp oracle (benchmarks/diag_path_recall.py);
    # whole-window expansion is the same shape the 4-bit path's
    # window_rerank uses and restores oracle parity up to window-screen
    # misses (a lost entry now needs its whole WINDOW to miss the wq cut).
    # wq >= r suffices for containment under an EXACT screen (r windows with
    # smaller true minima would hold r better codes); the margin absorbs the
    # kernel's bf16-table rounding of window minima (~0.4% relative) near
    # the cut. Expansion volume is wq*window candidates/query of exact-f32
    # element gathers — the dominant rerank cost, so wq is kept tight
    # (2r measured +90% on the b=32 e2e vs this).
    wq = min(r + max(16, r // 8), ma * c)
    cv_q = cv.reshape(q, ma * c)
    # EXACT window screen: with whole-window expansion below, top-wq windows
    # by true min (wq >= r) provably contain every true top-r member's
    # window; the approx segment screen dropped clustered windows (measured,
    # benchmarks/diag_path_recall.py). Width is only ma*C — cascade regime.
    screen_v, selq = exact_tile_screen(cv_q, wq)      # (Q, wq) into ma*C
    sel_ai = selq // c
    sel_win = selq % c                                    # window id in its partition
    sel_pair = jnp.arange(q, dtype=jnp.int32)[:, None] * ma + sel_ai
    sel_part = _select_cols(parts, sel_ai, ma)            # (Q, wq)
    all_rows = slots_to_rows(
        window_slots(sel_win, block_n, window), block_n, m
    )                                                     # (Q, wq, window) local rows
    sz_sel = index.part_sizes[sel_part]                   # (Q, wq)
    member_ok = (
        (all_rows < sz_sel[..., None]) & jnp.isfinite(screen_v)[..., None]
    )
    rows_cl = jnp.minimum(all_rows, jnp.maximum(sz_sel - 1, 0)[..., None])
    cand_global = (
        sel_part[..., None] * part_pad + rows_cl
    ).reshape(q, wq * window)                             # (Q, wq*window) code rows
    cand_lab = index.labels.reshape(-1)[cand_global]

    # Exact-f32 rerank: one flat element gather per (candidate, sub-quantizer)
    # from the per-pair f32 tables (Q*wq*window*m elements).
    cand_codes = gather_codes_row128(
        index.codes.reshape(-1, 128), cand_global, m
    )                                                     # (Q, wq*window, m) u8
    idx8 = unpack_codes(cand_codes, m, 8)                 # (Q, wq*window, m) int32
    tab_flat = tables.reshape(qa * m * 256)
    m_iota = jnp.arange(m, dtype=jnp.int32)
    pair_rep = jnp.repeat(sel_pair, window, axis=1)       # (Q, wq*window)
    flat_ix = (pair_rep[:, :, None] * m + m_iota) * 256 + idx8
    fd = jnp.sum(tab_flat[flat_ix], axis=-1)              # (Q, wq*window) f32
    fd = jnp.where(member_ok.reshape(q, wq * window), fd, jnp.inf)
    if r > wq * window:  # tiny probed volume: pad to the (Q, r) contract
        fd = jnp.pad(fd, [(0, 0), (0, r - wq * window)], constant_values=jnp.inf)
        cand_lab = jnp.pad(cand_lab, [(0, 0), (0, r - wq * window)])
    return topk_smallest(fd, cand_lab, r)


@partial(
    jax.jit,
    static_argnames=("r", "ma", "group_size", "window", "group_chunk"),
)
def _search_adc16_grouped_impl(
    index: IVFIndex, queries, r: int, ma: int, group_size: int,
    window: int = 8, group_chunk: int = 8,
):
    """16-bit IVF ADC, grouped: decode each DISTINCT probed partition once.

    The 65536-entry tables never materialize (reconstruction-GEMM scan, as
    flat._search_adc_recon); MoE routing means a partition probed by many
    queries is decoded once and GEMMed against its whole query group, vs the
    per-assignment path's Q*ma decodes. Chunked over groups (lax.map) so the
    decoded partitions and distance blocks stay O(group_chunk * part_pad).
    Per-window argmin candidates, exact reconstruction rerank of the 2r
    screened winners. Reference: scan_standard<uint16_t> over probed
    partitions (query_common.hpp:92-118).
    """
    from qadc_tpu.index.flat import decode_rows
    from qadc_tpu.index.routing import route_queries

    parts, rot = assign_queries(index, queries, ma)
    m = index.pq.sq_count
    cb = index.pq.code_size
    q = queries.shape[0]
    qa = q * ma
    dim = rot.shape[-1]
    part_pad = index.part_pad
    c = part_pad // window

    routed = route_queries(parts, index.part_count, group_size)
    gcap, g = routed.gcap, routed.group_size
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)
    slot_to_pair = jnp.zeros((gcap * g,), jnp.int32).at[qa_g * g + qa_s].set(
        jnp.arange(qa, dtype=jnp.int32)
    )
    rotq = rot.reshape(qa, dim)
    qslab = rotq[slot_to_pair].reshape(gcap, g, dim)

    gcap_pad = -(-gcap // group_chunk) * group_chunk
    gp = jnp.pad(routed.group_part, (0, gcap_pad - gcap))
    qslab = jnp.pad(qslab, [(0, gcap_pad - gcap), (0, 0), (0, 0)])

    def chunk_fn(ci):
        gp_c = jax.lax.dynamic_slice_in_dim(gp, ci * group_chunk, group_chunk)
        codes_c = index.codes[gp_c]                   # (ch, rows, 128) rows
        idx = unpack_codes(codes_c.reshape(group_chunk * part_pad, cb), m, 16)
        dec = decode_rows(index.pq, idx).reshape(group_chunk, part_pad, dim)
        qs_c = jax.lax.dynamic_slice_in_dim(qslab, ci * group_chunk, group_chunk)
        cross = jnp.einsum(
            "cpd,cgd->cgp", dec, qs_c,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d = (
            jnp.sum(qs_c * qs_c, -1)[:, :, None]
            + jnp.sum(dec * dec, -1)[:, None, :]
            - 2.0 * cross
        )                                             # (ch, g, part_pad)
        dw = d.reshape(group_chunk, g, c, window)
        return jnp.min(dw, -1), jnp.argmin(dw, -1).astype(jnp.int32)

    mins, args = jax.lax.map(chunk_fn, jnp.arange(gcap_pad // group_chunk))
    vals_rows = mins.reshape(gcap_pad * g, c)[: gcap * g]
    arg_rows = args.reshape(gcap_pad * g, c)[: gcap * g]

    cv = vals_rows[qa_g * g + qa_s]                   # (QA, C)
    rows_local = (
        jnp.arange(c, dtype=jnp.int32)[None, :] * window
        + arg_rows[qa_g * g + qa_s]
    )                                                 # (QA, C) code order
    p_of_pair = parts.reshape(qa)
    sz = index.part_sizes[p_of_pair]
    # Windows are CONSECUTIVE codes here: valid iff the window starts before
    # the partition's real size; clamp padded argmins to the last real code
    # keeping only the window that contains it (flood dedup, see the 8-bit
    # grouped path).
    win_start = jnp.arange(c, dtype=jnp.int32)[None, :] * window
    win_has_valid = win_start < sz[:, None]
    clamped = rows_local >= sz[:, None]
    last = jnp.maximum(sz - 1, 0)
    keep = (~clamped) | (
        jnp.arange(c, dtype=jnp.int32)[None, :] == (last // window)[:, None]
    )
    cv = jnp.where(win_has_valid & keep, cv, jnp.inf)

    # wq >= r suffices under an exact screen (see the 8-bit path); the
    # margin absorbs decode/window-min rounding near the cut, and expansion
    # volume (wq*window decodes) is the dominant rerank cost.
    wq = min(r + max(16, r // 8), ma * c)
    cv_q = cv.reshape(q, ma * c)
    # EXACT window screen + whole-window expansion (same contract as the
    # 4/8-bit grouped paths): ranking only per-window argmins lost co-window
    # top-r members on clustered data (benchmarks/diag_path_recall.py), and
    # top-wq windows by true min provably contain every true top-r member's
    # window. Windows here are CONSECUTIVE codes (row order), so expansion
    # is win*window + arange(window).
    screen_v, selq = exact_tile_screen(cv_q, wq)
    sel_ai = selq // c
    sel_win = selq % c
    sel_pair = jnp.arange(q, dtype=jnp.int32)[:, None] * ma + sel_ai
    sel_part = _select_cols(parts, sel_ai, ma)
    all_rows = (
        sel_win[..., None] * window
        + jnp.arange(window, dtype=jnp.int32)
    )                                                 # (Q, wq, window) local
    sz_sel = index.part_sizes[sel_part]
    member_ok = (
        (all_rows < sz_sel[..., None]) & jnp.isfinite(screen_v)[..., None]
    )
    rows_cl = jnp.minimum(all_rows, jnp.maximum(sz_sel - 1, 0)[..., None])
    cand_global = (
        sel_part[..., None] * part_pad + rows_cl
    ).reshape(q, wq * window)
    cand_lab = index.labels.reshape(-1)[cand_global]

    # Exact reconstruction rerank of every member: decode wq*window codes
    # per query and measure against each candidate's own rotated residual
    # query.
    from qadc_tpu.core.packing import gather_codes_row128

    cand_codes = gather_codes_row128(
        index.codes.reshape(-1, 128), cand_global, cb
    )
    idx16 = unpack_codes(cand_codes, m, 16)           # (Q, wq*window, M)
    dec = decode_rows(index.pq, idx16)                # (Q, wq*window, dim)
    qvec = rotq[jnp.repeat(sel_pair, window, axis=1)]  # (Q, wq*window, dim)
    fd = jnp.sum((qvec - dec) ** 2, axis=-1)
    fd = jnp.where(member_ok.reshape(q, wq * window), fd, jnp.inf)
    if r > wq * window:
        fd = jnp.pad(fd, [(0, 0), (0, r - wq * window)], constant_values=jnp.inf)
        cand_lab = jnp.pad(cand_lab, [(0, 0), (0, r - wq * window)])
    return topk_smallest(fd, cand_lab, r)


@partial(
    jax.jit,
    static_argnames=("r", "ma", "group_size", "window", "block_n", "interpret"),
)
def _search_adc4_grouped_impl(
    index: IVFIndex, queries, r: int, ma: int, group_size: int,
    window: int | None = None, block_n: int = 2048, interpret: bool = False,
):
    """4-bit conventional (float) ADC via the grouped kernel.

    The Quick-ADC grouped machinery with quantization skipped: f32 tables
    through the scalar-prefetch kernel (acc_dtype float32), top-wq window
    selection, and whole-window exact-f32 rerank (window_rerank). A code
    outside the top-wq windows is beaten by wq >= r codes, so the expansion
    contains the true top-r and the returned distances are exact f32. Same
    caveat as flat.search_adc: on real TPU the kernel's f32 one-hot matmul
    runs bf16 passes, so window SELECTION sees ~0.4%-rounded minima — the
    wq = 2r margin absorbs near-tie swaps at the boundary (interpret mode,
    and therefore the parity tests, are bit-exact). Reference: scan_4<NSQ>
    over probed partitions (query_common.hpp:59-90, db_query.cpp:17-46).
    """
    from qadc_tpu.index.routing import route_queries
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables,
        build_scan_tables_tq,
        lut_scan_grouped_prefetch,
        lut_scan_grouped_tq,
    )

    parts, rot = assign_queries(index, queries, ma)
    tables = adc_tables(rot, index.pq.centroids)          # (Q, ma, M, 16) f32
    m = index.pq.sq_count
    q = queries.shape[0]
    qa = q * ma
    part_pad = index.part_pad
    block_n = math.gcd(block_n, part_pad)
    if window is None:
        window = min(codes_per_row(m // 2), 16)

    routed = route_queries(parts, index.part_count, group_size)
    g = routed.group_size

    use_tq = (
        index.planes is not None
        and index.tq_block_n() == block_n
        and block_n % (window * 128) == 0
    )
    nblk = _group_nblk(
        index.part_sizes, routed.group_part, block_n, part_pad // block_n
    )
    if use_tq:
        tcat_pairs = build_scan_tables_tq(
            tables.reshape(qa, m, 16), q_pad=qa
        ).astype(jnp.float32)
        (gcat,) = _group_table_slabs_tq(routed, tcat_pairs)
        vals_rows = lut_scan_grouped_tq(
            index.planes, routed.group_part, gcat,
            rows_per_group=part_pad, cb=m // 2, block_n=block_n,
            window=window, interpret=interpret, acc_dtype_name="float32",
            group_nblk=nblk,
        )
    else:
        tlo_pairs, thi_pairs = build_scan_tables(
            tables.reshape(qa, m, 16), q_pad=qa
        )
        glo, ghi = _group_table_slabs(
            routed, tlo_pairs.T.astype(jnp.float32),
            thi_pairs.T.astype(jnp.float32),
        )
        vals_rows = lut_scan_grouped_prefetch(
            index.codes.reshape(-1, 128), routed.group_part, glo, ghi,
            rows_per_group=part_pad, cb=m // 2, block_n=block_n, window=window,
            interpret=interpret, transpose_out=True, acc_dtype_name="float32",
            group_nblk=nblk,
        )
    c = part_pad // window
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)
    cv = vals_rows[qa_g * g + qa_s]                       # (QA, C) f32
    p_of_pair = parts.reshape(qa)
    sz = index.part_sizes[p_of_pair]
    cv = jnp.where(_window_valid_mask(sz, c, block_n, window, m // 2), cv, jnp.inf)

    # wq = r is LOSSLESS here: the screen minima and the rerank distances are
    # the same exact float ADC values, so the top-r codes live in at most r
    # windows and any displacing window holds a better code (see the
    # containment note in _search_qadc_grouped_impl; rerank tail is
    # wq-proportional).
    wq = min(r, ma * c)
    cv_q = cv.reshape(q, ma * c)
    # EXACT window screen; the sort cascade beats the K-dominated TopK
    # custom call at ma*C widths (ops/topk.py), identical selection/ties.
    screen_v, selq = exact_tile_screen(cv_q, wq)
    sel_ai = selq // c
    sel_wi = selq % c
    sel_pair = jnp.arange(q, dtype=jnp.int32)[:, None] * ma + sel_ai
    sel_part = _select_cols(parts, sel_ai, ma)
    sel_sz = _select_cols(sz.reshape(q, ma), sel_ai, ma)
    return window_rerank(
        index.codes.reshape(-1, 128), index.labels.reshape(-1), part_pad,
        tables, screen_v, sel_part, sel_pair, sel_wi, sel_sz,
        r, block_n, window, interpret=interpret,
    )


@partial(jax.jit, static_argnames=("r", "ma", "keep", "prefix_pad", "rerank", "saturate"))
def _search_qadc_impl(
    index: IVFIndex, queries, r: int, ma: int, keep: float, prefix_pad: int,
    rerank: bool, saturate: bool = False, bound=None,
):
    # Shared front half: assign, tables, keep-prefix bound (db_query_4.cpp:
    # 230-242), QuantizerMAX int8 quantize (db_query_4.cpp:256-284).
    parts, tables, qtables, _ = _quantized_tables(index, queries, r, ma,
                                                  keep, prefix_pad,
                                                  bound_override=bound)
    m = index.pq.sq_count
    q = queries.shape[0]
    sizes = index.part_sizes[parts]  # (Q, ma)
    tflat = tables.reshape(*tables.shape[:2], m * 16)
    qtflat = qtables.reshape(q, ma, m * 16)

    # ---- int8 screen of each probed partition (+ optional float rerank of
    # the screened candidates), merged top-r. The int8 scan is unsaturated
    # (int32 MXU accumulation, strictly more informative than the reference's
    # saturating adds); rerank recovers the per-entry truncation loss.
    rr = min((2 * r) if rerank else r, index.part_pad)

    def scan_one_assignment(ass_i, carry):
        best_v, best_l = carry
        pids = jax.lax.dynamic_index_in_dim(parts, ass_i, 1, keepdims=False)
        pcodes = index.codes[pids].reshape(-1, index.part_pad, index.pq.code_size)
        plabels = index.labels[pids]
        ohc = _one_hot_gathered(pcodes, m, 4, jnp.int8)
        qt = jax.lax.dynamic_index_in_dim(qtflat, ass_i, 1, keepdims=False)
        acc = jnp.einsum(
            "qsf,qf->qs", ohc, qt, preferred_element_type=jnp.int32
        )
        if saturate:
            # Reference saturating-int8 adds (simd_scan.hpp:161): entries are
            # >= 0, so the sequential saturated sum == min(sum, 127).
            acc = jnp.minimum(acc, 127)
        acc = acc.astype(jnp.float32)
        sz = jax.lax.dynamic_index_in_dim(sizes, ass_i, 1, keepdims=True)
        col = jnp.arange(index.part_pad, dtype=jnp.int32)
        d = jnp.where(col[None, :] < sz, acc, jnp.inf)
        neg_top, rows = jax.lax.top_k(-d, rr)           # (Q, rr) screened rows
        cl = jnp.take_along_axis(plabels, rows, axis=-1)
        if rerank:
            t = jax.lax.dynamic_index_in_dim(tflat, ass_i, 1, keepdims=False)
            cand_oh = jnp.take_along_axis(
                ohc, rows[:, :, None], axis=1
            ).astype(jnp.float32)                        # (Q, rr, M*16)
            cv = jnp.einsum(
                "qcf,qf->qc", cand_oh, t, preferred_element_type=jnp.float32
            )
            cv = jnp.where(jnp.isfinite(-neg_top), cv, jnp.inf)
        else:
            cv = -neg_top
        return merge_topk(best_v, best_l, cv, cl, r)

    init = (jnp.full((q, r), jnp.inf, jnp.float32), jnp.zeros((q, r), jnp.int32))
    vals, labs = jax.lax.fori_loop(0, ma, scan_one_assignment, init)
    return vals, labs


def tile_tables_rows(tables_qa3):
    """Per-pair float tables in COMPACT j-major lane layout.

    Args:
      tables_qa3: (QA, M, 16) float32 per-(query, assignment) tables.

    Returns:
      (tlo_c, thi_c): each (QA, 16*cb) f32 where lane j*cb + b holds
      table[sq 2b (lo) / 2b+1 (hi), centroid j]. COMPACT on purpose: the
      rerank gathers one row per selected window, and gathering pre-tiled
      (QA, 16*128) rows read+wrote ~420 MB/batch at SIFT1M geometry (measured
      2.5 ms of a 3.4 ms batch); the compact rows are 16x smaller and the
      tiling to byte lanes happens on-register in rows_adc.
    """
    qa, m, k = tables_qa3.shape
    assert k == 16
    cb = m // 2
    tev = tables_qa3[:, 0::2, :].transpose(0, 2, 1)   # (QA, 16, cb) even sqs
    tod = tables_qa3[:, 1::2, :].transpose(0, 2, 1)
    return tev.reshape(qa, 16 * cb), tod.reshape(qa, 16 * cb)


def rows_adc(rows, tlo_c, thi_c, cb: int, interpret: bool = False):
    """Exact float ADC distances for whole ROW128 storage rows.

    On TPU (or interpret=True) the lane accumulation runs as a Pallas kernel
    (kernels.lut_scan.rows_adc_accumulate): compact tables are tiled to byte
    lanes in VMEM via roll+repeat — gathering pre-tiled (A, 16*128) rows
    cost ~2.5 ms/batch (840 MB of HBM traffic) at SIFT1M geometry, and a jnp
    concat-based tiling lowered to narrow-slice relayouts (~6x slower e2e).

    Args:
      rows: (A, 128) uint8 — packed 4-bit codes, cpr codes per row.
      tlo_c/thi_c: (A, 16*cb) f32 — per-row COMPACT tables (lane j*cb + b)
        from tile_tables_rows, already gathered to row granularity.

    Returns:
      (A, cpr) float32 distances, one per code in each row.
    """
    a = rows.shape[0]
    cpr = 128 // cb
    if jax.default_backend() == "tpu" or interpret:
        from qadc_tpu.kernels.lut_scan import rows_adc_accumulate

        acc = rows_adc_accumulate(rows, tlo_c, thi_c, cb=cb, interpret=interpret)
    else:
        lo = (rows & 0x0F).astype(jnp.int32)     # lane l = c*cb + b -> sq 2b
        hi = (rows >> 4).astype(jnp.int32)       #                  -> sq 2b+1
        acc = jnp.zeros((a, 128), jnp.float32)
        for j in range(16):
            tl = jnp.concatenate([tlo_c[:, j * cb : (j + 1) * cb]] * cpr, axis=1)
            th = jnp.concatenate([thi_c[:, j * cb : (j + 1) * cb]] * cpr, axis=1)
            acc = acc + jnp.where(lo == j, tl, 0.0)
            acc = acc + jnp.where(hi == j, th, 0.0)
    # Per-code byte reduction as a tiny selector matmul (S[l, c] = l//cb == c);
    # HIGHEST keeps f32-exact sums (bf16 passes would perturb the ranking).
    s_mat = jnp.asarray(
        (np.arange(128)[:, None] // cb) == np.arange(cpr)[None, :], jnp.float32
    )
    return jnp.dot(acc, s_mat, precision=jax.lax.Precision.HIGHEST)


def _quantized_tables(index, queries, r, ma, keep, prefix_pad, interpret=False,
                      bound_override=None):
    """Shared front half: assign, tables, keep-prefix bound, int8 quantize.

    bound_override: optional (Q,) f32 — per-query quantization bound used
    INSTEAD of the keep-prefix estimate (the prefix scan is skipped). Lets
    callers with external knowledge (a previous pass's r-th distance — the
    TPU analog of the reference's intra-scan bound tightening,
    simd_scan.hpp:76-118 — or a recorded bound) sharpen int8 resolution:
    delta = (bound - qmin)/127, so a 2x tighter bound halves the
    quantization step everywhere below it.

    Returns (parts (Q, ma), tables f32 (Q, ma, M, 16), qtables int8,
    (tlo_full, thi_full) row-tiled float tables for reuse by the rerank).
    """
    parts, rot = assign_queries(index, queries, ma)
    tables = adc_tables(rot, index.pq.centroids)
    m = index.pq.sq_count
    q = queries.shape[0]
    qa = q * ma
    sizes = index.part_sizes[parts]
    cb = index.pq.code_size
    cpr = index.cpr
    tlo_full, thi_full = tile_tables_rows(tables.reshape(qa, m, 16))

    if bound_override is None:
        starts_sizes = jnp.maximum(
            1, (sizes.astype(jnp.float32) * keep).astype(jnp.int32)
        )
        starts_sizes = jnp.where(sizes > 0, starts_sizes, 0)
        # Keep-prefix distances via whole-ROW128-row gathers + full-lane
        # select-accumulate (rows_adc): no 4-D small-minor tensors (those get
        # ~7x TPU layout padding), no element gathers, tables tiled once and
        # shared with the rerank stage.
        rows_per_part = index.part_pad // cpr
        ppr = -(-prefix_pad // cpr)              # prefix rows per partition
        prow = (
            parts.reshape(qa)[:, None] * rows_per_part
            + jnp.arange(ppr, dtype=jnp.int32)[None, :]
        ).reshape(qa * ppr)
        rows = index.codes.reshape(-1, 128)[prow]           # (QA*ppr, 128)
        pair_of_row = (
            jnp.arange(qa, dtype=jnp.int32)[:, None]
            .repeat(ppr, axis=1).reshape(qa * ppr)
        )
        pd = rows_adc(rows, tlo_full[pair_of_row], thi_full[pair_of_row], cb,
                      interpret=interpret)
        pd = pd.reshape(q, ma, ppr * cpr)
        col = jnp.arange(ppr * cpr, dtype=jnp.int32)
        valid = col[None, None, :] < starts_sizes[:, :, None]
        bound = keep_prefix_bound(
            pd.reshape(q, ma * ppr * cpr), r, valid.reshape(q, ma * ppr * cpr)
        )
    else:
        bound = jnp.asarray(bound_override, jnp.float32).reshape(q)

    tables_nn = jnp.maximum(tables, 0.0)
    max_possible = jnp.max(jnp.sum(jnp.max(tables_nn, axis=-1), axis=-1), axis=-1)
    bound = clamp_bound_to_max_distance(bound, max_possible)
    qmin = jnp.min(tables_nn, axis=(-3, -2, -1))
    qtables = quantize_tables_int8(
        tables, bound[:, None, None, None], qmin[:, None, None, None]
    )
    return parts, tables, qtables, (tlo_full, thi_full)


# Largest probed-code volume (qa * part_pad) routed to the direct exact path:
# its float-table row gathers move ~512 B/row128-row, so it wins only while
# everything stays small (b=1..4 at SIFT1M geometry — the latency regime).
DIRECT_MAX_CODES = 600_000

# Probe DENSITY (live (query, assignment) pairs per probed partition) at or
# below which the direct path beats the grouped kernel REGARDLESS of volume:
# a group's table slab is G=128 columns wide whatever the live count, so at
# density d the grouped MXU does 128/d useful work. Measured crossover ~2 on
# v5e (benchmarks/ab_direct_density.py: direct wins 1.7-1.9x at density 1,
# grouped wins 1.2x at density 3) — sparse-probe regimes (large part_count,
# small batches: the Deep100M serving shape) route direct.
DIRECT_MAX_DENSITY = 1.5

# Memory governor for the grouped scan paths: the reference sizes its query
# batch so the distance tables fit a 1 GiB buffer (TABLES_BUFFER_SIZE,
# query_common.hpp:147,171-175). The grouped kernels' dominant transients —
# the (gcap*G, C) window-minimum output, the (QA, C) per-pair gather, and the
# (gcap*lanes, G) table slabs — all scale with the query count, so a large
# b x ma config is CHUNKED over queries to stay within this budget instead of
# discovering OOM at runtime.
#
# The budget must track the DEVICE, not a constant: chunking costs real
# throughput on sparse-probe shapes (each chunk re-pays the 128-wide group
# slab for its few live queries — a hardcoded 2 GiB budget chunked Deep100M
# b=512 into 8 pieces and cost 2.5x, measured 158.6 -> 399 us/query), so the
# default is a fraction of the accelerator's memory limit with the constant
# as the floor/fallback.
SCAN_BUDGET_BYTES = 2 << 30
_scan_budget_cache: int | None = None


def _default_scan_budget() -> int:
    """35% of the device memory limit (HBM), floored at SCAN_BUDGET_BYTES.

    Relayed devices can report empty memory_stats(); every current TPU has
    >= 16 GB HBM, so the TPU fallback is 6 GiB (~35% of the smallest).
    QADC_SCAN_BUDGET_BYTES overrides everything for exotic deployments.
    """
    global _scan_budget_cache
    if _scan_budget_cache is None:
        env = os.environ.get("QADC_SCAN_BUDGET_BYTES")
        if env:
            _scan_budget_cache = int(env)
            return _scan_budget_cache
        budget = SCAN_BUDGET_BYTES
        try:
            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit"
            )
            if limit:
                budget = max(budget, int(limit * 0.35))
            elif dev.platform == "tpu":
                budget = 6 << 30
        except Exception:  # noqa: BLE001 — stats are optional (CPU/relay)
            pass
        _scan_budget_cache = budget
    return _scan_budget_cache


def _grouped_scan_bytes(
    q: int, ma: int, part_count: int, part_pad: int, window: int,
    group_size: int, lanes: int, val_bytes: int, slab_bytes: int,
    n_streams: int, r: int = 0, cb: int = 0, prefix_pad: int = 0,
) -> int:
    """Estimated transient HBM bytes of one grouped scan call.

    With r and cb set, also counts the rerank tail — window_rerank's
    candidate gathers scale with q*wq and were previously unbudgeted, so a
    huge r*wq*ma config could OOM despite the governor: per selected window,
    one (128,) u8 code row, one (cpr,) label row, two (16*cb,) f32 compact
    table rows, and the (cpr,) rows_adc output. prefix_pad adds the
    keep-prefix bound scan's row/table gathers (qadc only).
    """
    qa = q * ma
    from qadc_tpu.index.routing import group_capacity

    gcap = group_capacity(q, ma, part_count, group_size)
    c = part_pad // window
    vals = gcap * group_size * c * val_bytes * n_streams
    gathered = qa * c * 4 * n_streams
    slabs = 2 * gcap * lanes * group_size * slab_bytes
    total = vals + gathered + slabs
    if r and cb:
        cpr = 128 // cb
        table_row = 2 * 16 * cb * 4
        a = q * min(r, ma * c)              # selected windows (wq = r)
        total += a * (128 + cpr * 4 + table_row + cpr * 4)
        if prefix_pad:
            pre = qa * (-(-prefix_pad // cpr))  # prefix rows scanned
            total += pre * (128 + table_row + cpr * 4)
    return total


def _governed_query_chunk(bytes_fn, q: int, budget: int) -> int:
    """Largest power-of-two chunk <= q whose scan transients fit the budget."""
    chunk = 1 << max(0, (q - 1).bit_length())
    while chunk > 1 and bytes_fn(min(chunk, q)) > budget:
        chunk //= 2
    return min(chunk, q)


def _run_query_chunks(search_one, queries, chunk: int):
    """Run fixed-shape query chunks (jit compiles once; tail padded)."""
    q = queries.shape[0]
    out_d, out_l = [], []
    for s in range(0, q, chunk):
        batch = queries[s : s + chunk]
        real = batch.shape[0]
        if real < chunk:
            batch = jnp.pad(batch, [(0, chunk - real), (0, 0)])
        d, l = search_one(batch)
        out_d.append(d[:real])
        out_l.append(l[:real])
    if len(out_d) == 1:
        return out_d[0], out_l[0]
    return jnp.concatenate(out_d), jnp.concatenate(out_l)


@partial(jax.jit, static_argnames=("r", "ma", "interpret"))
def _search_qadc_direct_impl(
    index: IVFIndex, queries, r: int, ma: int, interpret: bool = False,
):
    """Small-batch low-latency path: EXACT float ADC over all probed codes.

    The reference's per-query engine (query_common.hpp:245-309, b=1 default
    at db_query_4.cpp:331) exists because single-query latency matters; on
    TPU the screened pipeline's ~10 stages cost ~200 us of fixed launch
    latency at b=1. This path is 3 device stages: assign+tables, one
    rows_adc Pallas scan of the ma probed partitions (each row ranked with
    its own pair's float table), then candidate screening + exact ranking.

    Distance VALUES are exact float ADC everywhere, and the screen is
    ORACLE-EXACT (ops.topk.exact_tile_screen — provable containment of the
    probed top-r; see the screen comment below).
    """
    parts, rot = assign_queries(index, queries, ma)
    tables = adc_tables(rot, index.pq.centroids)         # (Q, ma, M, 16)
    m = index.pq.sq_count
    q = queries.shape[0]
    qa = q * ma
    cb = index.pq.code_size
    cpr = index.cpr
    rpp = index.part_pad // cpr                           # rows per partition
    tlo, thi = tile_tables_rows(tables.reshape(qa, m, 16))
    pflat = parts.reshape(qa)
    if jax.default_backend() == "tpu" or interpret:
        # Scan partitions in place (scalar-prefetch) — no row/table gathers.
        # Blocks past each partition's real size are trimmed (ragged skew
        # control; block unit = rows_adc_block_rows(rpp), measured 256 on
        # v5e — a coarser unit made nblocks==1 at SIFT geometry and the
        # padding untrimmable, benchmarks/ab_b1.py). compact_out fuses the
        # per-code selector reduction into the kernel epilogue: the
        # (QA*rpp, 128) lane-sum round trip through HBM and its separate
        # XLA matmul stage disappear (output shrinks 128/cpr-fold).
        from qadc_tpu.kernels.lut_scan import (
            rows_adc_block_rows,
            rows_adc_grouped_prefetch,
        )

        blk_rows = rows_adc_block_rows(rpp)
        sz_flat = index.part_sizes[pflat]                 # real codes per pair
        sz_rows = -(-sz_flat // cpr)                      # rows with real codes
        tile = 32 if rpp % 32 == 0 else None
        # Fatter grid steps: at the single-block geometry (blk == rpp, no
        # trimming possible anyway) scan several partitions per step —
        # amortizes the ~0.5 us/step fixed cost that dominated the b=1
        # kernel stage (measured 49.9 -> 39.0 us at ppg=3, bit-exact;
        # benchmarks/ab_b1.py round 5). Beyond ppg~3 the kernel is
        # VPU-compute-bound, so keep steps small enough to overlap DMA.
        ppg = next(
            (p for p in (4, 3, 2) if qa % p == 0), 1
        ) if blk_rows == rpp else 1
        d = rows_adc_grouped_prefetch(
            index.codes.reshape(-1, 128), pflat, tlo, thi, rpp, cb=cb,
            interpret=interpret, compact_out=True,
            group_nblk=jnp.clip(
                (sz_rows + blk_rows - 1) // blk_rows, 1, rpp // blk_rows
            ).astype(jnp.int32),
            # Validity masking fuses into the kernel epilogue (MASK_BIG into
            # padding outputs) — no separate compare+where pass below.
            mask_sizes=sz_flat,
            # Tile minima for the exact screen come out of a native-layout
            # XLA reduce over the kernel's compact output: the screen never
            # recomputes them from the relayouted full distance array.
            tile_min=tile,
            pairs_per_step=ppg,
        )
        if tile is not None:
            d, dmins = d                                   # (QA*cpr, rpp/32)
        else:
            dmins = None
        pre_masked = True
    else:
        grow = (
            pflat[:, None] * rpp + jnp.arange(rpp, dtype=jnp.int32)[None, :]
        ).reshape(qa * rpp)
        rows = index.codes.reshape(-1, 128)[grow]         # (QA*rpp, 128)
        pair = jnp.repeat(jnp.arange(qa, dtype=jnp.int32), rpp)
        d = rows_adc(rows, tlo[pair], thi[pair], cb, interpret=interpret)
        # Match the kernel's compact transposed layout: (QA, cpr, rpp).
        d = d.reshape(qa, rpp, cpr).transpose(0, 2, 1)
        pre_masked = False
        dmins = None
    # Compact layout: flat column f of a pair = c*rpp + rr holds the code at
    # local id rr*cpr + c.
    # Finite sentinel (not +inf): the sentinel flows through the screen when
    # fewer than wq valid candidates exist, and 0 * inf would NaN any matmul
    # it later touched; restored to +inf after the final top-k. The kernel
    # path writes it in its fused epilogue (mask_sizes); the jnp path masks
    # here.
    big = jnp.float32(MASK_BIG)
    if not pre_masked:
        sz = index.part_sizes[parts]                      # (Q, ma)
        col = jnp.arange(index.part_pad, dtype=jnp.int32)
        code_of_col = (col % rpp) * cpr + col // rpp      # column -> local id
        valid = (code_of_col[None, None, :] < sz[:, :, None]).reshape(
            q, ma * index.part_pad
        )
        d = d.reshape(q, ma * index.part_pad)
        d = jnp.where(valid, d, big)
    width = ma * index.part_pad
    d = d.reshape(q, width)
    # EXACT screen (ops.topk.exact_tile_screen): provably captures the
    # probed top-r by construction, on f32 — bf16 collapses exact distances
    # into tie plateaus (benchmarks/diag_screen_capture.py). This replaced
    # approx_min_k's segment-min whole-row screen, whose capture depended on
    # how the data's clusters landed in its contiguous segments (measured
    # 0.85-1.00 across clustered shapes, benchmarks/diag_path_recall.py +
    # smoke contract), at ~the same cost (tile minima: 24 vs 22 us at b=1).
    # wq == r: the screen is EXACT and returns values ASCENDING with their
    # columns, so its output IS the final ranking — no second top-k, and no
    # oversampling (the 2*r width was a holdover from the approx-screen era;
    # the TPU TopK/sort costs are K-dominated, so halving wq and deleting
    # the final sort cut the b=1 tail, benchmarks/profile_b1.py).
    wq = min(r, width)
    # Tile minima already computed on the scan output (kernel path): each
    # (pair, c) row contributes rpp contiguous columns with rpp % 32 == 0,
    # so the flat row's 32-tiles are exactly dmins' tiles.
    dm_flat = None if dmins is None else dmins.reshape(q, width // 32)
    sv, col = exact_tile_screen(d, wq, mins=dm_flat)      # (Q, wq) global col
    if r > wq:  # tiny probed volume: pad to the (Q, r) contract
        sv = jnp.pad(sv, [(0, 0), (0, r - wq)], constant_values=big)
        col = jnp.pad(col, [(0, 0), (0, r - wq)])
    a_id = col // index.part_pad                          # assignment index
    within = col % index.part_pad                         # compact column
    # Labels for the r winners only (the up-front (Q, ma*part_pad) label
    # gather + take_along was ~14 us of the b=1 budget; TPU element gathers
    # are per-element expensive, so gather AFTER the final cut): ma is
    # small, so select-accumulate the partition ids, then one (Q, r)
    # element gather.
    # ma select-accumulate passes win at batch (element gathers are
    # ~9 ns/el: 115 us at (128, 200)); at q<=4 the ma+~dispatch-bound tiny
    # passes lose to one small element gather (<=0.9 us/100 els).
    if q <= 4:
        part_sel = jnp.take_along_axis(parts, a_id, axis=1)
    else:
        part_sel = _select_cols(parts, a_id, ma)          # (Q, r) int32
    code_local = (within % rpp) * cpr + within // rpp     # -> local code id
    fl = index.labels.reshape(-1)[part_sel * index.part_pad + code_local]
    # Dead slots (r > valid candidates, or the r > wq pad above whose col=0
    # gathers a REAL label) return -1, the missing-result sentinel —
    # a caller not filtering on inf must not see a spurious genuine label.
    return (
        jnp.where(sv >= big, jnp.inf, sv),
        jnp.where(sv >= big, jnp.int32(-1), fl),
    )


@partial(
    jax.jit,
    static_argnames=("r", "ma", "keep", "prefix_pad", "rerank", "group_size",
                     "window", "interpret", "block_n", "saturate",
                     "screen_windows"),
)
def _search_qadc_grouped_impl(
    index: IVFIndex, queries, r: int, ma: int, keep: float, prefix_pad: int,
    rerank: bool, group_size: int, window: int, interpret: bool,
    block_n: int = 2048, saturate: bool = False, bound=None,
    screen_windows: int = 0,
):
    """Partition-grouped Quick-ADC IVF search (Pallas kernel path).

    MoE-style routing (index/routing.py) turns per-query partition probes into
    per-partition query groups; each group's partition is scanned ONCE with a
    (codes x G-tables) MXU matmul via kernels.lut_scan_grouped. Replaces the
    reference's per-query scan loop (db_query_4.cpp:287-308) with batched
    matmuls — the TPU needs wide distance columns, not register LUTs.
    """
    from qadc_tpu.index.routing import route_queries
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables,
        build_scan_tables_tq,
        lut_scan_grouped_prefetch,
        lut_scan_grouped_tq,
    )

    parts, tables, qtables, tiles = _quantized_tables(
        index, queries, r, ma, keep, prefix_pad, interpret=interpret,
        bound_override=bound,
    )
    q = queries.shape[0]
    m = index.pq.sq_count
    qa = q * ma
    part_pad = index.part_pad
    # block_n must divide part_pad; part_pad is a PART_ALIGN (512) multiple,
    # so gcd(block_n, part_pad) is 512/1024/2048 — always a valid block.
    block_n = math.gcd(block_n, part_pad)

    routed = route_queries(parts, index.part_count, group_size)
    g = routed.group_size

    # tq (plane-major) grouped kernel when the index carries planes at this
    # block size: identical window ids/minima, no expansion matmuls (the
    # dominant MXU cost at group widths << 128 — kernels/lut_scan.py).
    use_tq = (
        index.planes is not None
        and index.tq_block_n() == block_n
        and block_n % (window * 128) == 0
    )
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)
    nblk = _group_nblk(
        index.part_sizes, routed.group_part, block_n, part_pad // block_n
    )

    # Per-pair kernel tables into group slots (_group_table_slabs: scatter
    # pair ids + row gather; a direct 2-axis scatter is pathological on TPU).
    # Scan each group's partition IN PLACE (scalar-prefetch block routing —
    # no gather copy of the scanned bytes). Both kernels emit SLOT-MAJOR
    # (gcap*G, C) window minima (row128: per-block in-VMEM transpose, which
    # replaced a 10.7 ms whole-array relayout of a 130 ms Deep100M b=2048
    # batch; tq: the natural output layout). group_nblk trims blocks past
    # each partition's real size (skew control).
    if use_tq:
        tcat_pairs = build_scan_tables_tq(qtables.reshape(qa, m, 16), q_pad=qa)
        (gcat,) = _group_table_slabs_tq(routed, tcat_pairs)
        vals_rows = lut_scan_grouped_tq(
            index.planes, routed.group_part, gcat,
            rows_per_group=part_pad, cb=m // 2, block_n=block_n,
            window=window, interpret=interpret, group_nblk=nblk,
        )
    else:
        tlo_pairs, thi_pairs = build_scan_tables(
            qtables.reshape(qa, m, 16), q_pad=qa
        )
        glo, ghi = _group_table_slabs(routed, tlo_pairs.T, thi_pairs.T)
        vals_rows = lut_scan_grouped_prefetch(
            index.codes.reshape(-1, 128), routed.group_part, glo, ghi,
            rows_per_group=part_pad, cb=m // 2, block_n=block_n,
            window=window, interpret=interpret, transpose_out=True,
            group_nblk=nblk,
        )
    c = part_pad // window
    # Per-pair window minima via a SINGLE-AXIS row gather (slot-major rows —
    # multi-axis fancy gathers lower pathologically on TPU).
    cv = vals_rows[qa_g * g + qa_s].astype(jnp.float32)   # (QA, C)
    if saturate:
        # Entries >= 0, so window-min of saturating sums == min(min, 127).
        cv = jnp.minimum(cv, 127.0)
    p_of_pair = parts.reshape(qa)
    sz = index.part_sizes[p_of_pair]                      # (QA,)
    cv = jnp.where(_window_valid_mask(sz, c, block_n, window, m // 2), cv, jnp.inf)

    # Merge windows at QUERY level (top 2r windows across the query's ma
    # partitions), then expand EVERY row of each winning window and rank those
    # (quantization ties inside a window are harmless; candidate volume stays
    # Q x r x W instead of Q x ma x r x W).
    #
    # wq = r is SUFFICIENT with an exact screen: any window displacing a
    # top-r code's window has a smaller true minimum, i.e. holds a better
    # code itself — at most r windows can hold the quantized top-r. The old
    # 2r default was margin from the approx-screen era; measured at the 1M
    # parity build (benchmarks/ab_screen_width.py, v5e 2026-08-20): recall
    # IDENTICAL at wq = r / 1.5r / 2r (0.9141, the 16x4 exact-ADC ceiling,
    # same as every bound variant in ab_bound.py) and the rerank tail is
    # wq-proportional (b=32 45.7 -> 39.9 us/q on that build).
    wq = min(screen_windows or r, ma * c)
    cv_q = cv.reshape(q, ma * c)
    # EXACT window screen (sort cascade, ops.topk.exact_screen_smallest).
    # Exactness matters twice: (1) top-wq windows by true window min with
    # wq >= r provably contain every true top-r member's window (wq windows
    # with smaller minima would be wq better codes); the approx segment-min
    # screen violated this on clustered data — whole windows of the true
    # top-100 landed in one segment and were dropped, measured -0.02
    # recall@100 at 1M (benchmarks/diag_path_recall.py: rerank 0.9102 vs
    # no-rerank's exact-screen 0.9297). (2) no-rerank mode must rank by
    # quantized distance exactly (reference semantics). Width is only ma*C
    # (thousands), where the cascade beats both approx_min_k + regather and
    # the K-dominated TopK custom call (see ops/topk.py).
    screen_v, selq = exact_tile_screen(cv_q, wq)      # (Q, wq) into ma*C
    sel_ai = selq // c                                     # assignment index
    sel_wi = selq % c                                      # window in partition
    sel_pair = jnp.arange(q, dtype=jnp.int32)[:, None] * ma + sel_ai  # (Q, wq)
    # take_along_axis here is an ELEMENT gather — ~9 ns/element on TPU
    # regardless of source size (2 x 210 us/batch measured for (Q, wq) from
    # a (Q, ma) source). ma select-accumulate passes cost ~1 us.
    sel_part = _select_cols(parts, sel_ai, ma)             # (Q, wq)
    sel_sz = _select_cols(sz.reshape(q, ma), sel_ai, ma)

    tw_src = tables if rerank else qtables.astype(jnp.float32)
    return window_rerank(
        index.codes.reshape(-1, 128), index.labels.reshape(-1), part_pad,
        tw_src, screen_v, sel_part, sel_pair, sel_wi,
        sel_sz,
        r, block_n, window, tiles=tiles if rerank else None,
        clamp127=saturate and not rerank, interpret=interpret,
    )


def _group_nblk(part_sizes, group_part, block_n: int, nblocks: int):
    """Per-group live block count for ragged-partition trimming.

    ceil(real partition size / block_n), clamped to [1, nblocks] — the
    reference scans exactly size_p codes per partition (databases.hpp:
    270-298); this recovers that cost model under uniform padding (the
    grouped kernels skip compute AND the HBM reads of trimmed blocks).
    """
    g_sz = part_sizes[group_part]
    return jnp.clip(
        (g_sz + block_n - 1) // block_n, 1, nblocks
    ).astype(jnp.int32)


def _group_table_slabs(routed, *pair_tables):
    """(QA, lanes) per-pair table rows -> (gcap*lanes, G) group slabs.

    Scatters only the PAIR IDS (one int each) and row-GATHERS the table
    rows — a direct 2-axis table scatter is pathological on TPU (~1 s at
    SIFT1M geometry). Shared by the three grouped search impls.
    """
    gcap, g = routed.gcap, routed.group_size
    qa = routed.qa_group.size
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)
    slot_to_pair = jnp.zeros((gcap * g,), jnp.int32).at[qa_g * g + qa_s].set(
        jnp.arange(qa, dtype=jnp.int32)
    )
    out = []
    for t in pair_tables:
        lanes = t.shape[1]
        out.append(
            t[slot_to_pair].reshape(gcap, g, lanes)
            .transpose(0, 2, 1).reshape(gcap * lanes, g)
        )
    return out


def _group_table_slabs_tq(routed, *pair_tables):
    """(QA, 2*lanes) per-pair T_cat rows -> (gcap*G, 2*lanes) slot-major slabs.

    Same scatter-ids + row-gather scheme as _group_table_slabs, but the tq
    grouped kernel consumes tables SLOT-MAJOR — no per-group transpose.
    """
    gcap, g = routed.gcap, routed.group_size
    qa = routed.qa_group.size
    qa_g = routed.qa_group.reshape(qa)
    qa_s = routed.qa_slot.reshape(qa)
    slot_to_pair = jnp.zeros((gcap * g,), jnp.int32).at[qa_g * g + qa_s].set(
        jnp.arange(qa, dtype=jnp.int32)
    )
    return [t[slot_to_pair] for t in pair_tables]


def _window_valid_mask(sz, c: int, block_n: int, window: int, cb: int):
    """(QA, C) bool — window covers at least one real row of its partition."""
    win_ids = jnp.arange(c, dtype=jnp.int32)
    all_rows = slots_to_rows(window_slots(win_ids, block_n, window), block_n, cb)
    return jnp.min(all_rows, axis=1)[None, :] < sz[:, None]


def _select_cols(src, idx, ncols: int):
    """(Q, ncols) source, (Q, K) int column ids -> (Q, K) selected values.

    Data-parallel replacement for jnp.take_along_axis when ncols is small:
    TPU element gathers cost ~9 ns/element independent of source size, so
    ncols where-accumulate passes win whenever ncols << K.
    """
    out = jnp.zeros(idx.shape, src.dtype)
    for a in range(ncols):
        out = out + jnp.where(idx == a, src[:, a : a + 1], 0)
    return out


def window_rerank(
    codes_rows, labels_flat, part_pad: int,
    tables_qa, screen_v, sel_part, sel_pair, sel_wi, sel_sz,
    r: int, block_n: int, window: int, tiles=None, clamp127: bool = False,
    interpret: bool = False,
):
    """Expand winning windows to their codes and rank by exact float distance.

    KEY LAYOUT FACT (drives the whole design): when window | cpr, all codes of
    one scan window live in ONE 128-byte ROW128 storage row — window slots
    {w*gr + s} share raw row s mod R (R = block_n/cpr rows/block) and cover the
    parity class c = c0 + w*cs (cs = cpr/window, c0 = s//R) of that row's cpr
    codes. So the rerank needs only SINGLE-AXIS ROW gathers (fast on TPU):
    one (A, 128) codes-row gather, one (A, cpr) labels-row gather, and one
    (A, 16*128) gather of per-pair tables pre-tiled to the byte layout at the
    small qa level. Per-element gathers (the previous design) lower to ~30 ms
    per 3M elements on TPU and dominated the e2e latency 10:1.

    Args:
      codes_rows/labels_flat: (P*part_pad/cpr, 128) row128 codes /
        (P*part_pad,) labels, partition-major.
      tables_qa: (Q, ma, M, 16) float tables to rank with (float tables for
        rerank, quantized-as-float for reference-style ranking).
      screen_v: (Q, wq) screened window minima (inf = dead slot).
      sel_part/sel_pair/sel_wi/sel_sz: (Q, wq) selected windows' partition id,
        flattened (q*ma+a) pair id, window id, and partition real size.

    Returns (dists (Q, r), labels (Q, r)).
    """
    q, wq = screen_v.shape
    m = tables_qa.shape[2]
    cb = m // 2
    cpr = 128 // cb
    if cpr % window != 0:
        raise ValueError(
            f"window {window} must divide codes-per-row {cpr} (row-gather rerank)"
        )
    qa = tables_qa.shape[0] * tables_qa.shape[1]
    a = q * wq                                   # selected windows (rows)

    # Window id -> (storage row, parity class) decomposition.
    gr = block_n // window
    rblk = block_n // cpr                        # raw rows per block
    wi = sel_wi.reshape(a)
    rloc = (wi // gr) * rblk + (wi % gr) % rblk  # raw row within partition
    c0 = (wi % gr) // rblk                       # parity offset, in [0, cs)
    cs = cpr // window                           # parity stride
    grow = sel_part.reshape(a) * (part_pad // cpr) + rloc

    rows = codes_rows[grow]                      # (A, 128) u8  [row gather]
    lab = labels_flat.reshape(-1, cpr)[grow]     # (A, cpr)     [row gather]

    # Per-pair tables tiled to the 128-lane byte layout at qa level (small,
    # or reused from the front via `tiles`), then ONE row gather per window.
    if tiles is None:
        tiles = tile_tables_rows(tables_qa.reshape(qa, m, 16))
    tlo_full, thi_full = tiles
    pair = sel_pair.reshape(a)
    cvf = rows_adc(rows, tlo_full[pair], thi_full[pair], cb,
                   interpret=interpret)                             # (A, cpr)
    if clamp127:
        # Saturating-int8 reference semantics (simd_scan.hpp:161): table
        # entries are >= 0, so sequential saturating adds == min(sum, 127).
        cvf = jnp.minimum(cvf, 127.0)

    c_iota = jnp.arange(cpr, dtype=jnp.int32)
    alive = (
        ((c_iota[None, :] % cs) == c0[:, None])                  # own parity
        & ((rloc[:, None] * cpr + c_iota[None, :]) < sel_sz.reshape(a)[:, None])
        & jnp.isfinite(screen_v).reshape(a)[:, None]
    )
    cvf = jnp.where(alive, cvf, jnp.inf)
    cvf = cvf.reshape(q, wq * cpr)
    labq = lab.reshape(q, wq * cpr)
    if r > wq * cpr:  # tiny probed volume: pad to the (Q, r) contract
        cvf = jnp.pad(cvf, [(0, 0), (0, r - wq * cpr)], constant_values=jnp.inf)
        labq = jnp.pad(labq, [(0, 0), (0, r - wq * cpr)])
    return topk_smallest(cvf, labq, r)


def search_qadc(
    index: IVFIndex, queries, r: int = 100, ma: int = 1, keep: float = 0.01,
    rerank: bool = True, grouped: bool | None = None, group_size: int = 128,
    grouped_window: int | None = None, interpret: bool = False,
    saturate: bool = False, direct: bool | None = None,
    scan_budget_bytes: int | None = None,
    block_n: int | None = None, bound=None, screen_windows: int = 0,
):
    """Quick-ADC IVF search (reference: db_query_4.cpp; requires sq_bits==4).

    rerank: float-rerank the int8-screened candidates per assignment (see
    flat.search_qadc) — default on; pass False for reference-style ranking by
    quantized distance.
    grouped: use the partition-grouped Pallas kernel path (default: on TPU
    when geometry allows).
    saturate: reproduce the reference's saturating int8 accumulation exactly
    (simd_scan.hpp:161) — quantized sums clamp at 127. Entries are >= 0, so
    min(sum, 127) equals the sequential saturated sum; works through the
    Pallas kernel path (the clamp composes with the window-min reduction).
    direct: small-batch low-latency path — exact float ADC over all probed
    codes in 3 device stages (the TPU answer to the reference's per-query
    b=1 engine, query_common.hpp:245-309). Default: on TPU when rerank is on,
    saturate is off, and the probed volume is small (<= DIRECT_MAX_CODES).
    Results rank by exact distance (the direct screen is oracle-exact), so
    recall >= the screened pipeline's.
    scan_budget_bytes: memory governor — grouped-path query batches whose
    scan transients would exceed this are chunked (default SCAN_BUDGET_BYTES,
    the analog of the reference's TABLES_BUFFER_SIZE batch sizing,
    query_common.hpp:147,171-175).
    bound: optional (Q,) f32 per-query int8 quantization bound replacing the
    keep-prefix estimate (the prefix scan is skipped) — the TPU analog of
    the reference's intra-scan bound tightening (simd_scan.hpp:76-118): a
    caller can pass a previous pass's r-th distance for finer int8
    resolution (see _quantized_tables). Ignored by the direct path, whose
    ranking is exact float and needs no bound; pass direct=False to force
    the quantized pipeline when measuring bound effects.
    screen_windows: override the grouped path's window-screen width wq
    (default r — sufficient with the exact screen; see the containment note
    and measured A/B in _search_qadc_grouped_impl). Diagnostic knob for
    benchmarks/ab_screen_width.py.

    Returns (dists (Q, r) float32, labels (Q, r) int32).
    """
    if index.pq.sq_bits != 4:
        raise ValueError("Quick ADC requires sq_bits == 4")
    # Probing more partitions than exist == probing all of them.
    ma = min(ma, index.part_count)
    if direct is None:
        qa = queries.shape[0] * ma
        density = qa / max(1, min(index.part_count, qa))
        direct = (
            (jax.default_backend() == "tpu" or interpret)
            and rerank
            and not saturate
            and index.pq.sq_count in (16, 32)
            and (
                qa * index.part_pad <= DIRECT_MAX_CODES
                or density <= DIRECT_MAX_DENSITY
            )
        )
    if direct:
        # Memory governor for the direct path: its dominant transient is the
        # (q, ma*part_pad) distance matrix plus the valid mask and screen
        # intermediates (~9 bytes per probed code) — chunk the query batch
        # so sparse-probe large-volume configs stay within budget.
        budget = _default_scan_budget() if scan_budget_bytes is None else scan_budget_bytes
        chunk = _governed_query_chunk(
            lambda qc: qc * ma * index.part_pad * 9, queries.shape[0], budget
        )

        def run_direct(qs):
            return _search_qadc_direct_impl(
                index, qs, r, ma, interpret=interpret
            )

        if chunk < queries.shape[0]:
            return _run_query_chunks(run_direct, jnp.asarray(queries), chunk)
        return run_direct(queries)
    prefix_pad = max(1, int(index.max_part_size * keep)) if index.max_part_size else 1
    prefix_pad = min(prefix_pad, index.part_pad)
    if grouped is None:
        grouped = (
            jax.default_backend() == "tpu"
            and index.pq.sq_count in (16, 32)
            and index.part_pad % 512 == 0
        )
    if grouped and (block_n is None or grouped_window is None):
        # Measured per-geometry pick, if one was tuned and recorded
        # (qadc_tpu/autotune.py); the fixed heuristics below otherwise.
        from qadc_tpu import autotune as _autotune

        pick = _autotune.lookup(
            _autotune.geometry_key(index, "ivf_qadc_grouped", queries.shape[0])
        )
        if not pick and _autotune.enabled() and not interpret:
            pick = _autotune.tune_ivf_qadc(index, queries, r=r, ma=ma, keep=keep)
        if block_n is None:
            block_n = pick.get("block_n")
        if grouped_window is None:
            grouped_window = pick.get("grouped_window")
    if grouped_window is None:
        # Windows == whole ROW128 storage rows (or an even split of one):
        # the rerank gathers exactly one row per window (see window_rerank).
        grouped_window = min(codes_per_row(index.pq.code_size), 16)
    if block_n is None:
        block_n = 2048
    if grouped:
        def run(qs, bd=None):
            return _search_qadc_grouped_impl(
                index, qs, r, ma, keep, prefix_pad, rerank,
                group_size, grouped_window, interpret, saturate=saturate,
                block_n=block_n, bound=bd, screen_windows=screen_windows,
            )

        lanes = (index.pq.sq_count // 2) * 16
        chunk = _governed_query_chunk(
            lambda qc: _grouped_scan_bytes(
                qc, ma, index.part_count, index.part_pad, grouped_window,
                group_size, lanes, val_bytes=4, slab_bytes=1, n_streams=1,
                r=r, cb=index.pq.code_size, prefix_pad=prefix_pad,
            ),
            queries.shape[0],
            _default_scan_budget() if scan_budget_bytes is None else scan_budget_bytes,
        )
        if chunk < queries.shape[0]:
            if bound is None:
                return _run_query_chunks(run, jnp.asarray(queries), chunk)
            qs_all = jnp.asarray(queries)
            bd_all = jnp.asarray(bound, jnp.float32)
            outs = [
                run(qs_all[s0 : s0 + chunk], bd_all[s0 : s0 + chunk])
                for s0 in range(0, qs_all.shape[0], chunk)
            ]
            return (
                jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]),
            )
        return run(queries, bound)
    return _search_qadc_impl(
        index, queries, r, ma, keep, prefix_pad, rerank, saturate=saturate,
        bound=bound,
    )
