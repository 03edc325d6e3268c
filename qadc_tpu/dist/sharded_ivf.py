"""Partition-sharded IVF search over a device mesh.

The Deep100M-class configuration (SURVEY §6): partitions are sharded across
chips/hosts (each device owns P/D partitions' codes+labels), the coarse
quantizer and PQ are replicated (KiB-scale), and queries are replicated.
Per query batch:

  1. assignment runs replicated (centroids are tiny);
  2. each shard computes keep-prefix distances for the (query, assignment)
     pairs whose partition it OWNS; a psum assembles the global per-query
     bound (pairs partition disjointly across shards);
  3. tables quantize replicated; each shard routes its owned pairs
     (index/routing.py) and scans them with the grouped kernel;
  4. each shard emits its local top-r (dist, label) pairs; one all_gather +
     local k-select merges — compute and memory both scale with 1/D.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qadc_tpu.dist.mesh import SHARD_AXIS, make_mesh
from qadc_tpu.index.ivf import (
    IVFIndex,
    assign_queries,
    rows_adc,
    tile_tables_rows,
)
from qadc_tpu.index.routing import route_queries
from qadc_tpu.kernels.lut_scan import (
    build_scan_tables,
    build_scan_tables_tq,
    lut_scan_grouped_prefetch,
    lut_scan_grouped_tq,
    slots_to_rows,
    to_planes,
    window_slots,
)
from qadc_tpu.ops.quantization import (
    clamp_bound_to_max_distance,
    keep_prefix_bound,
    quantize_tables_int8,
)
from qadc_tpu.ops.tables import adc_tables
from qadc_tpu.ops.topk import topk_smallest


def shard_ivf_partitions(index: IVFIndex, mesh) -> IVFIndex:
    """Shard partitions (codes/labels/part_sizes) over the mesh; pad P to a
    device multiple with empty partitions. Coarse centroids + PQ replicated."""
    d = mesh.shape[SHARD_AXIS]
    p = index.part_count
    p_pad = -(-p // d) * d
    codes = np.asarray(index.codes)
    labels = np.asarray(index.labels)
    sizes = np.asarray(index.part_sizes)
    coarse = np.asarray(index.coarse_centroids)
    if p_pad != p:
        extra = p_pad - p
        codes = np.concatenate(
            [codes, np.zeros((extra, *codes.shape[1:]), codes.dtype)]
        )
        labels = np.concatenate(
            [labels, np.zeros((extra, labels.shape[1]), labels.dtype)]
        )
        sizes = np.concatenate([sizes, np.zeros((extra,), sizes.dtype)])
        # Padded coarse centroids far away so no query is assigned to them.
        far = np.full((extra, coarse.shape[1]), 1e30, np.float32)
        coarse = np.concatenate([coarse, far])
    shard = NamedSharding(mesh, P(SHARD_AXIS))
    out = IVFIndex(
        pq=index.pq,
        coarse_centroids=jnp.asarray(coarse),  # replicated
        codes=jax.device_put(jnp.asarray(codes), NamedSharding(mesh, P(SHARD_AXIS, None, None))),
        labels=jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(SHARD_AXIS, None))),
        part_sizes=jax.device_put(jnp.asarray(sizes), shard),
        n=index.n,
        max_part_size=index.max_part_size,
    )
    bn0 = out.tq_block_n()
    if bn0 is not None:
        # tq byte-planes, sharded along the partition-column axis (partition
        # p = columns [p*part_pad, (p+1)*part_pad), so P(None, SHARD_AXIS)
        # slices on partition boundaries — each shard's lane slice is its
        # own partitions' planes).
        planes = to_planes(
            jnp.asarray(codes).reshape(-1, 128), index.pq.code_size, bn0
        )
        out = dataclasses.replace(
            out,
            planes=jax.device_put(
                planes, NamedSharding(mesh, P(None, SHARD_AXIS))
            ),
        )
    return out


def load_sharded_index(path: str, mesh) -> IVFIndex:
    """Assemble a partition-sharded IVFIndex from a sharded checkpoint, with
    each PROCESS reading only the partition rows it will own — resharding on
    load when the checkpoint's shard count differs from the process count.

    Multi-process counterpart of shard_ivf_partitions (which device_puts a
    host-global array and so only works single-process). The checkpoint's k
    shard files define a contiguous global partition axis of k*parts_per_shard
    rows; that axis is re-padded to a device multiple with empty partitions
    and re-sliced contiguously over the p running processes (a checkpoint
    written for 8 hosts restarts on 2, and vice versa — SURVEY §5.3 elastic
    restart; the reference has only the offline split_vecs sharder,
    split_vecs.cpp). Global arrays are assembled via
    jax.make_array_from_process_local_data — no host ever materializes the
    whole index. Works unchanged with one process or shards == processes.
    """
    from qadc_tpu.io.checkpoint import load_index_rows

    procs = jax.process_count()
    d = mesh.shape[SHARD_AXIS]
    if d % procs != 0:
        raise ValueError(f"mesh axis ({d}) must be a multiple of process count ({procs})")
    # Each process's rows are contiguous in the global partition axis, so the
    # mesh's device order must be process-major for the local rows to land on
    # the process's own devices.
    axis_devs = list(mesh.devices.reshape(-1))
    pidx = [dev.process_index for dev in axis_devs]
    if pidx != sorted(pidx):
        raise ValueError("mesh device order must be process-major along the shard axis")

    import json as _json
    import os as _os

    with open(_os.path.join(path, "manifest.json")) as f:
        manifest = _json.load(f)
    stored = int(manifest["parts_per_shard"]) * int(manifest["num_shards"])
    p_pad = -(-stored // d) * d  # device multiple (hence process multiple)
    per_proc = p_pad // procs
    i = jax.process_index()
    local, _ = load_index_rows(path, i * per_proc, (i + 1) * per_proc)

    coarse = np.asarray(local.coarse_centroids)  # global, stored rows
    if p_pad != coarse.shape[0]:
        # Extra empty partitions: centroids far away so no query probes them
        # (same convention as shard_ivf_partitions / save_index_sharded).
        far = np.full((p_pad - coarse.shape[0], coarse.shape[1]), 1e30, np.float32)
        coarse = np.concatenate([coarse, far])

    def mk(arr, spec):
        arr = np.asarray(arr)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr, (p_pad,) + arr.shape[1:]
        )

    def mk_cols(arr, spec):
        # Axis-1-sharded assembly (planes: global (cb, p_pad*part_pad)).
        arr = np.asarray(arr)
        pp = local.part_pad
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr, (arr.shape[0], p_pad * pp)
        )

    out = IVFIndex(
        pq=local.pq,
        coarse_centroids=jnp.asarray(coarse),  # replicated
        codes=mk(local.codes, P(SHARD_AXIS, None, None)),
        labels=mk(local.labels, P(SHARD_AXIS, None)),
        part_sizes=mk(local.part_sizes, P(SHARD_AXIS)),
        n=local.n,
        max_part_size=local.max_part_size,
    )
    if local.planes is not None:
        # local.planes (built by load_index_rows().with_planes()) covers this
        # process's contiguous partitions; the global lane axis concatenates
        # process slices in order — exactly P(None, SHARD_AXIS).
        out = dataclasses.replace(
            out, planes=mk_cols(local.planes, P(None, SHARD_AXIS))
        )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "r", "ma", "keep", "prefix_pad", "group_size", "window", "interpret",
        "mesh", "overlap_chunks",
    ),
)
def _search_impl(
    index: IVFIndex, queries, r: int, ma: int, keep: float, prefix_pad: int,
    group_size: int, window: int, interpret: bool, mesh,
    overlap_chunks: int = 1,
):
    import math

    d = mesh.shape[SHARD_AXIS]
    p_total = index.part_count
    p_loc = p_total // d
    part_pad = index.part_pad
    m = index.pq.sq_count
    lanes = (m // 2) * 16
    q = queries.shape[0]
    qa = q * ma
    # Same block policy as the local grouped path (index.ivf): bigger blocks
    # = fewer grid steps (blk 1024->8192 measured ~30% on the flat kernel);
    # gcd keeps divisibility for every PART_ALIGN multiple.
    block_n = math.gcd(2048, part_pad)
    cb = m // 2

    # Replicated front: assignment + residual tables.
    parts, rot = assign_queries(index, queries, ma)        # (Q, ma) global ids
    tables = adc_tables(rot, index.pq.centroids)           # (Q, ma, M, 16)
    tables_nn = jnp.maximum(tables, 0.0)
    max_possible = jnp.max(jnp.sum(jnp.max(tables_nn, axis=-1), axis=-1), axis=-1)
    qmin = jnp.min(tables_nn, axis=(-3, -2, -1))
    tflat = tables.reshape(qa, m * 16)

    use_tq = (
        index.planes is not None
        and index.tq_block_n() == block_n
        and block_n % (window * 128) == 0
    )

    def local_shard(codes_l, labels_l, sizes_l, planes_l, parts_g, tflat_g, maxp, qmn):
        shard_i = jax.lax.axis_index(SHARD_AXIS)
        offset = shard_i * p_loc
        parts_local = parts_g - offset                      # (Q, ma)
        owned = (parts_local >= 0) & (parts_local < p_loc)
        parts_safe = jnp.where(owned, parts_local, 0)

        tables_g = tflat_g.reshape(q, ma, m, 16)
        sizes_pair = jnp.where(owned, sizes_l[parts_safe], 0)  # (Q, ma)

        # ---- keep-prefix distances for OWNED pairs; psum assembles globally.
        # Whole-ROW128-row gathers + full-lane select-accumulate (rows_adc);
        # table tiles shared with the rerank below — see index.ivf.
        starts_sizes = jnp.maximum(
            1, (sizes_pair.astype(jnp.float32) * keep).astype(jnp.int32)
        )
        starts_sizes = jnp.where(sizes_pair > 0, starts_sizes, 0)
        cpr = 128 // cb
        rows_per_part = part_pad // cpr
        ppr = -(-prefix_pad // cpr)
        tiles = tile_tables_rows(tables_g.reshape(qa, m, 16))
        tlo_full, thi_full = tiles
        prow = (
            parts_safe.reshape(qa)[:, None] * rows_per_part
            + jnp.arange(ppr, dtype=jnp.int32)[None, :]
        ).reshape(qa * ppr)
        rows = codes_l.reshape(-1, 128)[prow]               # (QA*ppr, 128)
        pair_of_row = (
            jnp.arange(qa, dtype=jnp.int32)[:, None]
            .repeat(ppr, axis=1).reshape(qa * ppr)
        )
        pd = rows_adc(rows, tlo_full[pair_of_row], thi_full[pair_of_row], cb,
                      interpret=interpret)
        pd = pd.reshape(q, ma, ppr * cpr)
        col = jnp.arange(ppr * cpr, dtype=jnp.int32)
        valid = (col[None, None, :] < starts_sizes[:, :, None]) & owned[:, :, None]
        pd = jnp.where(valid, pd, 0.0)
        pd_global = jax.lax.psum(pd, SHARD_AXIS)            # disjoint -> sum
        valid_global = jax.lax.psum(valid.astype(jnp.int32), SHARD_AXIS) > 0
        bound = keep_prefix_bound(
            pd_global.reshape(q, ma * ppr * cpr), r,
            valid_global.reshape(q, ma * ppr * cpr),
        )
        bound = clamp_bound_to_max_distance(bound, maxp)

        qtables = quantize_tables_int8(
            tables_g, bound[:, None, None, None], qmn[:, None, None, None]
        )

        from qadc_tpu.index.ivf import _group_nblk, window_rerank

        def scan_chunk(parts_c, sizes_c, qtables_c, tables_c, tiles_c):
            """Scan + rerank one query sub-chunk; returns local top-r."""
            qc = parts_c.shape[0]
            qac = qc * ma
            # ---- route owned pairs; unowned pairs route to partition 0 with
            # a poisoned slot masked at candidate selection.
            routed = route_queries(parts_c, p_loc, group_size)
            gcap, g = routed.gcap, routed.group_size
            qa_g = routed.qa_group.reshape(qac)
            qa_s = routed.qa_slot.reshape(qac)
            s2p = jnp.zeros((gcap * g,), jnp.int32).at[qa_g * g + qa_s].set(
                jnp.arange(qac, dtype=jnp.int32)
            )
            nblk = _group_nblk(
                sizes_l, routed.group_part, block_n, part_pad // block_n
            )
            # Slot-major kernel output: skips the (gcap, C, G) -> (gcap, G, C)
            # relayout copy (see index.ivf._search_qadc_grouped_impl).
            # group_nblk trims blocks past each partition's real size.
            # tq (plane-major) kernel when the index carries sharded planes
            # — identical window ids/minima, no expansion matmuls.
            if use_tq:
                tcat_p = build_scan_tables_tq(
                    qtables_c.reshape(qac, m, 16), q_pad=qac
                )
                vals_rows = lut_scan_grouped_tq(
                    planes_l, routed.group_part, tcat_p[s2p],
                    rows_per_group=part_pad, cb=cb, block_n=block_n,
                    window=window, interpret=interpret, group_nblk=nblk,
                )
            else:
                tlo_p, thi_p = build_scan_tables(
                    qtables_c.reshape(qac, m, 16), q_pad=qac
                )
                tlo_p, thi_p = tlo_p.T, thi_p.T
                glo = (
                    tlo_p[s2p].reshape(gcap, g, lanes).transpose(0, 2, 1)
                    .reshape(gcap * lanes, g)
                )
                ghi = (
                    thi_p[s2p].reshape(gcap, g, lanes).transpose(0, 2, 1)
                    .reshape(gcap * lanes, g)
                )
                vals_rows = lut_scan_grouped_prefetch(
                    codes_l.reshape(-1, 128), routed.group_part, glo, ghi,
                    rows_per_group=part_pad, cb=cb, block_n=block_n,
                    window=window, interpret=interpret, transpose_out=True,
                    group_nblk=nblk,
                )
            c = part_pad // window
            cv = vals_rows[qa_g * g + qa_s].astype(jnp.float32)
            win_ids = jnp.arange(c, dtype=jnp.int32)
            all_rows = slots_to_rows(
                window_slots(win_ids, block_n, window), block_n, cb
            )
            szf = sizes_c.reshape(qac)
            cv = jnp.where(
                (jnp.min(all_rows, axis=1)[None, :] < szf[:, None]), cv, jnp.inf
            )

            # ---- query-level window merge + whole-window exact rerank
            # (local, shared 2-D-shaped helper — index.ivf.window_rerank).
            # wq = r matches the single-chip grouped path (containment note
            # + measured A/B in index.ivf._search_qadc_grouped_impl); each
            # shard returns its own top-r before the cross-shard merge.
            wq = min(r, ma * c)
            cv_q = cv.reshape(qc, ma * c)
            # EXACT window screen (see index.ivf._search_qadc_grouped_impl:
            # the approx bf16 segment screen dropped whole clustered windows).
            from qadc_tpu.ops.topk import exact_tile_screen

            screen_v, selq = exact_tile_screen(cv_q, wq)
            sel_ai = selq // c
            sel_wi = selq % c
            sel_pair = jnp.arange(qc, dtype=jnp.int32)[:, None] * ma + sel_ai
            sel_part = jnp.take_along_axis(parts_c, sel_ai, axis=1)
            sel_sz = jnp.take_along_axis(sizes_c, sel_ai, axis=1)
            return window_rerank(
                codes_l.reshape(-1, 128), labels_l.reshape(-1), part_pad,
                tables_c, screen_v, sel_part, sel_pair, sel_wi, sel_sz,
                r, block_n, window, tiles=tiles_c, interpret=interpret,
            )

        # Unowned pairs are masked by zeroing their effective size: every
        # window then reads as empty (inf) and the pair contributes nothing.
        sizes_masked = jnp.where(owned, sizes_pair, 0)

        # SCAN <-> MERGE OVERLAP (SURVEY §5.8): process the query batch in
        # overlap_chunks sub-chunks; chunk i+1's scan has no data dependency
        # on chunk i's all_gather, so XLA's async collectives ride ICI while
        # the next scan computes. The final top-r merge consumes all chunks.
        nchunks = overlap_chunks if q % overlap_chunks == 0 else 1
        qc = q // nchunks
        tlo_full, thi_full = tiles
        gathered_v, gathered_l = [], []
        for ci in range(nchunks):
            qs, qe = ci * qc, (ci + 1) * qc
            ps, pe = qs * ma, qe * ma
            lv, ll = scan_chunk(
                parts_safe[qs:qe], sizes_masked[qs:qe], qtables[qs:qe],
                tables_g[qs:qe], (tlo_full[ps:pe], thi_full[ps:pe]),
            )
            # (Qc, D*r) — issued now, consumed after the remaining chunks.
            gathered_v.append(
                jax.lax.all_gather(lv, SHARD_AXIS, axis=1, tiled=True)
            )
            gathered_l.append(
                jax.lax.all_gather(ll, SHARD_AXIS, axis=1, tiled=True)
            )
        all_v = (
            gathered_v[0] if nchunks == 1 else jnp.concatenate(gathered_v, axis=0)
        )
        all_l = (
            gathered_l[0] if nchunks == 1 else jnp.concatenate(gathered_l, axis=0)
        )
        return topk_smallest(all_v, all_l, r)

    planes_arg = index.planes if use_tq else jnp.zeros((1, d), jnp.uint8)
    shard_fn = jax.shard_map(
        local_shard,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None, None),  # codes
            P(SHARD_AXIS, None),        # labels
            P(SHARD_AXIS),              # sizes
            P(None, SHARD_AXIS),        # planes (dummy (1, d) when unused)
            P(), P(), P(), P(),         # parts, tflat, max_possible, qmin
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard_fn(
        index.codes, index.labels, index.part_sizes, planes_arg, parts, tflat,
        max_possible, qmin
    )


def search_qadc_ivf_sharded(
    index: IVFIndex, queries, r: int = 100, ma: int = 1, keep: float = 0.01,
    mesh=None, group_size: int = 128, window: int | None = None,
    interpret: bool = False, overlap_chunks: int = 1,
):
    """Quick-ADC search over a partition-sharded IVFIndex.

    Same semantics as index.ivf.search_qadc (grouped path, rerank on); work
    and memory scale with 1/n_devices.

    overlap_chunks > 1 software-pipelines the scan against the cross-shard
    top-k all_gather (SURVEY §5.8 scan<->merge overlap): the query batch is
    processed in that many sub-chunks, and chunk i+1's scan is independent of
    chunk i's all_gather, so XLA's async collectives overlap it with compute.
    Results are identical for any value (must divide the batch; falls back to
    1 otherwise). Default 1 = off; A/B on hardware before changing.
    """
    if index.pq.sq_bits != 4:
        raise ValueError("Quick ADC requires sq_bits == 4")
    # Probing more partitions than exist == probing all (see ivf.search_qadc).
    ma = min(ma, index.part_count)
    if mesh is None:
        mesh = make_mesh()
    if index.part_count % mesh.shape[SHARD_AXIS] != 0:
        raise ValueError("partition count must be a device multiple (use shard_ivf_partitions)")
    prefix_pad = max(1, int(index.max_part_size * keep)) if index.max_part_size else 1
    prefix_pad = min(prefix_pad, index.part_pad)
    if window is None:
        window = min(128 // (index.pq.sq_count // 2), 16)
    return _search_impl(
        index, queries, r, ma, keep, prefix_pad, group_size, window, interpret,
        mesh, overlap_chunks,
    )
