"""Pallas kernel parity vs the jnp reference scan (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qadc_tpu.core.layout import to_row128
from qadc_tpu.core.packing import pack_codes
from qadc_tpu.kernels.lut_scan import (
    build_scan_tables,
    lut_scan_reduce,
    lut_scan_topk_int8,
    slots_to_rows,
    window_slots,
)
from qadc_tpu.kernels.scan_ref import adc_scan_int8


def _setup(rng, n=4096, m=16, q=5):
    idx = rng.integers(0, 16, size=(n, m))
    packed = np.asarray(pack_codes(idx, 4))
    qt = rng.integers(0, 127, size=(q, m, 16)).astype(np.int8)
    return packed, qt


def _sim_window_min(full, blk, window, cb):
    """Simulate the kernel's reduction: full (Q, N) -> (N/W, Q) window minima.

    Window wi covers SLOTS {(wi//gr)*blk + w*gr + wi%gr}; slots map to rows
    via the deinterleave permutation (slots_to_rows).
    """
    q, n = full.shape
    c_total = n // window
    wins = np.asarray(
        window_slots(jnp.arange(c_total, dtype=jnp.int32), blk, window)
    )  # (C, W) slots
    rows = np.asarray(slots_to_rows(jnp.asarray(wins), blk, cb))
    return full[:, rows].min(axis=2).T  # (C, Q)


def test_slot_row_mapping_is_permutation():
    blk, cb = 1024, 8
    slots = jnp.arange(4 * blk, dtype=jnp.int32)
    rows = np.asarray(slots_to_rows(slots, blk, cb))
    assert sorted(rows.tolist()) == list(range(4 * blk))
    # block-local: slots of block 1 map into block 1's rows
    assert set(rows[blk : 2 * blk]) == set(range(blk, 2 * blk))


def test_build_scan_tables_layout(rng):
    q, m = 3, 16
    qt = rng.integers(0, 127, size=(q, m, 16)).astype(np.int8)
    tlo, thi = build_scan_tables(jnp.asarray(qt))
    assert tlo.shape == ((m // 2) * 16, 128)
    cb = m // 2
    for b in range(cb):
        for j in range(16):  # j-major rows (kernel lane expansion order)
            np.testing.assert_array_equal(np.asarray(tlo)[j * cb + b, :q], qt[:, 2 * b, j])
            np.testing.assert_array_equal(np.asarray(thi)[j * cb + b, :q], qt[:, 2 * b + 1, j])


def test_kernel_matches_reference_scan(rng):
    packed, qt = _setup(rng)
    q = qt.shape[0]
    full = np.asarray(adc_scan_int8(packed, jnp.asarray(qt), saturate=False))  # (Q, N)

    tlo, thi = build_scan_tables(jnp.asarray(qt))
    rows128 = jnp.asarray(to_row128(packed))
    vals, rows = lut_scan_reduce(
        rows128, tlo, thi, cb=8, block_n=1024, window=16, interpret=True,
        with_rows=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    assert vals.shape == (4096 // 16, 128)
    want = _sim_window_min(full, 1024, 16, 8)
    np.testing.assert_array_equal(vals[:, :q], want)
    # returned rows point at codes achieving the min
    for g in range(0, 256, 37):
        for qi in range(q):
            assert full[qi, rows[g, qi]] == vals[g, qi]


def test_kernel_topk_matches_exact(rng):
    packed, qt = _setup(rng)
    q = qt.shape[0]
    n_valid = 4000  # padded region rows 4000..4095 must be masked
    full_all = np.asarray(adc_scan_int8(packed, jnp.asarray(qt), saturate=False))
    full = full_all[:, :n_valid]
    r = 50
    rows128 = jnp.asarray(to_row128(packed))
    vals, rows = lut_scan_topk_int8(
        rows128, jnp.asarray(qt), r, n_valid,
        cb=8, block_n=1024, window=16, interpret=True,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    assert rows.max() < n_valid
    # Every returned value is the true distance of its row.
    for qi in range(q):
        np.testing.assert_array_equal(full[qi, rows[qi]], vals[qi])
    # Exact parity with a numpy simulation of the reduction + masking.
    masked = full_all.astype(np.int64).copy()
    masked[:, n_valid:] = np.iinfo(np.int32).max
    sim = _sim_window_min(masked, 1024, 16, 8)  # (N/W, Q)
    for qi in range(q):
        np.testing.assert_array_equal(np.sort(vals[qi]), np.sort(sim[:, qi])[:r])
    # Membership vs the exact top-r: window collisions lose only a few members
    # (here r=50 of just 250 windows — far harsher than production ratios).
    exact = np.sort(full, axis=1)[:, :r]
    for qi in range(q):
        got = list(np.sort(vals[qi]))
        kept = 0
        for v in exact[qi]:
            if v in got:
                got.remove(v)
                kept += 1
        assert kept >= r - 12, (qi, kept)


@pytest.mark.parametrize("m", [16, 32])
@pytest.mark.parametrize("variant", ["bf16", "int8"])
def test_kernel_variants_match(rng, m, variant):
    """bf16 and int8 expansion variants agree exactly, and the min-only path
    (with_rows=False) matches the full path's vals."""
    packed, qt = _setup(rng, n=2048, m=m, q=3)
    full = np.asarray(adc_scan_int8(packed, jnp.asarray(qt), saturate=False))
    tlo, thi = build_scan_tables(jnp.asarray(qt))
    rows128 = jnp.asarray(to_row128(packed))
    vals, rows = lut_scan_reduce(
        rows128, tlo, thi, cb=m // 2, block_n=512, window=8, interpret=True,
        variant=variant, with_rows=True,
    )
    want = _sim_window_min(full, 512, 8, m // 2)
    np.testing.assert_array_equal(np.asarray(vals)[:, :3], want[:, :3])
    for g in range(0, vals.shape[0], 29):
        for qi in range(3):
            assert full[qi, np.asarray(rows)[g, qi]] == np.asarray(vals)[g, qi]
    vals_min, none_rows = lut_scan_reduce(
        rows128, tlo, thi, cb=m // 2, block_n=512, window=8, interpret=True,
        variant=variant, with_rows=False,
    )
    assert none_rows is None
    np.testing.assert_array_equal(np.asarray(vals_min), np.asarray(vals))


@pytest.mark.parametrize("m", [16, 32])
def test_kernel_sq_counts(rng, m):
    packed, qt = _setup(rng, n=2048, m=m, q=3)
    full = np.asarray(adc_scan_int8(packed, jnp.asarray(qt), saturate=False))
    tlo, thi = build_scan_tables(jnp.asarray(qt))
    rows128 = jnp.asarray(to_row128(packed))
    vals, rows = lut_scan_reduce(
        rows128, tlo, thi, cb=m // 2, block_n=512, window=8, interpret=True
    )
    want = _sim_window_min(full, 512, 8, m // 2)
    np.testing.assert_array_equal(np.asarray(vals)[:, :3], want[:, :3])


def test_kernel_float_tables(rng):
    """f32 accumulation path (conventional ADC tables on the same kernel)."""
    packed, _ = _setup(rng, n=1024, m=16, q=3)
    tables = rng.uniform(0, 10, size=(3, 16, 16)).astype(np.float32)
    from qadc_tpu.kernels.scan_ref import adc_scan_f32

    full = np.asarray(adc_scan_f32(packed, jnp.asarray(tables), 4))
    tlo, thi = build_scan_tables(jnp.asarray(tables))
    rows128 = jnp.asarray(to_row128(packed))
    vals, rows = lut_scan_reduce(
        rows128, tlo.astype(jnp.float32), thi.astype(jnp.float32),
        cb=8, block_n=512, window=8, interpret=True, acc_dtype_name="float32",
    )
    want = _sim_window_min(full, 512, 8, 8)
    np.testing.assert_allclose(np.asarray(vals)[:, :3], want[:, :3], rtol=1e-5, atol=1e-4)


def test_rows_adc_grouped_prefetch_parity(rng):
    """In-place per-group float ADC (the direct path's scan) vs the per-row
    gather formulation — both cb=8 (M=16) and cb=16 (M=32, the config whose
    offset-lane table halves previously failed Mosaic layout inference)."""
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import (
        rows_adc_accumulate,
        rows_adc_grouped_prefetch,
    )

    for cb in (8, 16):
        rpp, gcap, parts = 64, 4, 8
        codes = jnp.asarray(
            rng.integers(0, 256, size=(parts * rpp, 128), dtype=np.uint8)
        )
        gp = jnp.asarray(rng.permutation(parts)[:gcap].astype(np.int32))
        tl = jnp.asarray(rng.normal(size=(gcap, 16 * cb)).astype(np.float32))
        th = jnp.asarray(rng.normal(size=(gcap, 16 * cb)).astype(np.float32))
        out_g = rows_adc_grouped_prefetch(
            codes, gp, tl, th, rpp, cb=cb, interpret=True
        )
        rows = codes.reshape(parts, rpp, 128)[gp].reshape(gcap * rpp, 128)
        pair = jnp.repeat(jnp.arange(gcap, dtype=jnp.int32), rpp)
        out_r = rows_adc_accumulate(rows, tl[pair], th[pair], cb=cb, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_r))


def test_grouped_prefetch_transpose_out_parity(rng):
    """transpose_out=True must be an exact relayout of the default output:
    vals_t[gi*G + s, wi] == vals[gi*C + wi, s] for every group/slot/window."""
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import lut_scan_grouped_prefetch

    for cb in (8, 16):
        cpr = 128 // cb
        lanes = 16 * cb
        parts, gcap, gq = 8, 4, 128
        rows_per_group = 512          # codes per partition
        block_n, window = 256, 16
        codes = jnp.asarray(
            rng.integers(
                0, 256, size=(parts * rows_per_group // cpr, 128), dtype=np.uint8
            )
        )
        gp = jnp.asarray(rng.permutation(parts)[:gcap].astype(np.int32))
        slab = jnp.asarray(
            rng.integers(-127, 127, size=(gcap * lanes, gq)).astype(np.int8)
        )
        kw = dict(
            rows_per_group=rows_per_group, cb=cb, block_n=block_n,
            window=window, interpret=True,
        )
        vals = lut_scan_grouped_prefetch(codes, gp, slab, slab, **kw)
        vals_t = lut_scan_grouped_prefetch(
            codes, gp, slab, slab, transpose_out=True, **kw
        )
        c = rows_per_group // window
        want = (
            np.asarray(vals).reshape(gcap, c, gq).transpose(0, 2, 1)
            .reshape(gcap * gq, c)
        )
        np.testing.assert_array_equal(np.asarray(vals_t), want)


def test_lut_scan_reduce_transpose_out_parity(rng):
    """Flat-kernel transpose_out layout: vals_t[qp, wi] == vals[wi, qp]."""
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_reduce

    for cb in (8, 16):
        cpr = 128 // cb
        n = 4096
        codes = jnp.asarray(
            rng.integers(0, 256, size=(n // cpr, 128), dtype=np.uint8)
        )
        qt = jnp.asarray(
            rng.integers(0, 127, size=(16, 2 * cb, 16)).astype(np.int8)
        )
        tlo, thi = build_scan_tables(qt)
        kw = dict(cb=cb, block_n=1024, window=16, interpret=True)
        vals, _ = lut_scan_reduce(codes, tlo, thi, **kw)
        vals_t, _ = lut_scan_reduce(codes, tlo, thi, transpose_out=True, **kw)
        np.testing.assert_array_equal(np.asarray(vals_t), np.asarray(vals).T)


def test_rows_adc_narrow_cb_parity(rng):
    """cb < 8 (e.g. sq_count=8 -> cb=4): the compact table is narrower than
    128 lanes and must be repeated, not silently dropped (pre-fix the kernel
    returned all zeros for these configs). Parity vs the jnp fallback."""
    import jax.numpy as jnp
    from qadc_tpu.index.ivf import rows_adc, tile_tables_rows

    for cb in (2, 4):
        m = 2 * cb
        a = 64
        rows = jnp.asarray(rng.integers(0, 256, size=(a, 128), dtype=np.uint8))
        tables = jnp.asarray(rng.normal(size=(a, m, 16)).astype(np.float32))
        tlo, thi = tile_tables_rows(tables)
        d_jnp = rows_adc(rows, tlo, thi, cb, interpret=False)  # jnp path (cpu)
        d_krn = rows_adc(rows, tlo, thi, cb, interpret=True)   # pallas interpret
        np.testing.assert_allclose(
            np.asarray(d_krn), np.asarray(d_jnp), atol=1e-3
        )
        assert float(np.abs(np.asarray(d_krn)).max()) > 0.0


def test_rows_adc_grouped_prefetch_narrow_cb(rng):
    """Grouped-prefetch variant of the cb<8 repetition fix."""
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import (
        rows_adc_accumulate, rows_adc_grouped_prefetch,
    )
    from qadc_tpu.index.ivf import tile_tables_rows

    cb, m = 4, 8
    parts, gcap, rpp = 8, 4, 16
    codes = jnp.asarray(
        rng.integers(0, 256, size=(parts * rpp, 128), dtype=np.uint8)
    )
    gp = jnp.asarray(rng.permutation(parts)[:gcap].astype(np.int32))
    tables = jnp.asarray(rng.normal(size=(gcap, m, 16)).astype(np.float32))
    tlo, thi = tile_tables_rows(tables)
    out_g = rows_adc_grouped_prefetch(
        codes, gp, tlo, thi, rows_per_part=rpp, cb=cb, interpret=True
    )
    rows = codes.reshape(parts, rpp, 128)[gp].reshape(gcap * rpp, 128)
    pair = jnp.repeat(jnp.arange(gcap, dtype=jnp.int32), rpp)
    out_r = rows_adc_accumulate(rows, tlo[pair], thi[pair], cb=cb, interpret=True)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_r), atol=1e-4)


def test_grouped_kernel_trimming_parity(rng):
    """group_nblk trimming: live windows bit-match the untrimmed kernel;
    trimmed windows hold the sentinel — for the int8/f32 grouped scan and
    the 8-bit grouped scan, both output layouts."""
    import jax.numpy as jnp

    from qadc_tpu.kernels.lut_scan import (
        build_scan8_tables,
        build_scan_tables,
        lut_scan8_grouped_prefetch,
        lut_scan_grouped_prefetch,
    )

    m, parts, gcap, gq = 8, 8, 4, 128
    cpr = 128 // m
    rows_per_group, block_n, window = 2048, 256, 16
    nblocks = rows_per_group // block_n
    codes = jnp.asarray(
        rng.integers(0, 256, size=(parts * rows_per_group // cpr, 128),
                     dtype=np.uint8)
    )
    gp = jnp.asarray(rng.permutation(parts)[:gcap].astype(np.int32))
    gnb = jnp.asarray([1, 3, nblocks, 2], jnp.int32)
    c = rows_per_group // window
    gpw = block_n // window

    t8 = build_scan8_tables(
        jnp.asarray(rng.normal(size=(gq, m, 256)).astype(np.float32))
    )
    tg = jnp.concatenate([t8] * gcap, axis=0)
    kw = dict(rows_per_group=rows_per_group, m=m, block_n=block_n,
              window=window, interpret=True)
    v_full, s_full = lut_scan8_grouped_prefetch(codes, gp, tg, **kw)
    for transpose_out in (False, True):
        v_t, s_t = lut_scan8_grouped_prefetch(
            codes, gp, tg, group_nblk=gnb, transpose_out=transpose_out, **kw
        )
        if transpose_out:
            v_t = np.asarray(v_t).reshape(gcap, gq, c).transpose(0, 2, 1)
            s_t = np.asarray(s_t).reshape(gcap, gq, c).transpose(0, 2, 1)
        else:
            v_t = np.asarray(v_t).reshape(gcap, c, gq)
            s_t = np.asarray(s_t).reshape(gcap, c, gq)
        vf = np.asarray(v_full).reshape(gcap, c, gq)
        sf = np.asarray(s_full).reshape(gcap, c, gq)
        for gi in range(gcap):
            live = int(gnb[gi]) * gpw
            np.testing.assert_array_equal(v_t[gi][:live], vf[gi][:live])
            np.testing.assert_array_equal(s_t[gi][:live], sf[gi][:live])
            assert np.isinf(v_t[gi][live:]).all()

    cb = m  # 16x4: cb = 8 bytes
    qt = jnp.asarray(
        rng.integers(-20, 100, size=(gq, 16, 16)).astype(np.int8)
    )
    tlo, thi = build_scan_tables(qt)
    glo = jnp.concatenate([tlo] * gcap, axis=0)
    ghi = jnp.concatenate([thi] * gcap, axis=0)
    kw4 = dict(rows_per_group=rows_per_group, cb=cb, block_n=block_n,
               window=window, interpret=True)
    v_full4 = np.asarray(
        lut_scan_grouped_prefetch(codes, gp, glo, ghi, **kw4)
    ).reshape(gcap, c, gq)
    for transpose_out in (False, True):
        v4 = lut_scan_grouped_prefetch(
            codes, gp, glo, ghi, group_nblk=gnb, transpose_out=transpose_out,
            **kw4,
        )
        v4 = (
            np.asarray(v4).reshape(gcap, gq, c).transpose(0, 2, 1)
            if transpose_out else np.asarray(v4).reshape(gcap, c, gq)
        )
        for gi in range(gcap):
            live = int(gnb[gi]) * gpw
            np.testing.assert_array_equal(v4[gi][:live], v_full4[gi][:live])
            assert (v4[gi][live:] == (1 << 30)).all()


def test_vpu_variant_matches_mxu(rng):
    """lut_scan_vpu_reduce (VPU select-accumulate contraction) must produce
    the exact window minima of the MXU one-hot kernel — it exists for the
    SURVEY §7 'benchmark both' A/B (benchmarks/ab_kernel.py)."""
    import jax.numpy as jnp

    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables,
        lut_scan_reduce,
        lut_scan_vpu_reduce,
    )

    for m in (16, 32):
        cb = m // 2
        cpr = 128 // cb
        n, q = 4096, 16
        codes = jnp.asarray(
            rng.integers(0, 256, size=(n // cpr, 128), dtype=np.uint8)
        )
        qt = jnp.asarray(rng.integers(-30, 120, size=(q, m, 16)).astype(np.int8))
        tlo, thi = build_scan_tables(qt)
        v_mxu, _ = lut_scan_reduce(
            codes, tlo, thi, cb=cb, block_n=1024, interpret=True
        )
        v_vpu = lut_scan_vpu_reduce(
            codes, tlo, thi, cb=cb, block_n=1024, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(v_mxu), np.asarray(v_vpu))


def test_rows_adc_compact_out_parity(rng):
    """compact_out fuses the selector reduction into the kernel; its
    (GCAP*cpr, rpp) output must equal the unfused lane sums reduced by the
    caller-side selector matmul, including under trimming."""
    import jax
    import jax.numpy as jnp

    from qadc_tpu.kernels.lut_scan import rows_adc_grouped_prefetch

    for cb in (8, 16):
        cpr = 128 // cb
        parts, gcap, rpp = 6, 4, 2048  # nblocks=4: real trimming
        codes = jnp.asarray(
            rng.integers(0, 256, size=(parts * rpp, 128), dtype=np.uint8)
        )
        gp = jnp.asarray(rng.permutation(parts)[:gcap].astype(np.int32))
        tlo = jnp.asarray(rng.normal(size=(gcap, 16 * cb)).astype(np.float32))
        thi = jnp.asarray(rng.normal(size=(gcap, 16 * cb)).astype(np.float32))
        gnb = jnp.asarray([1, gcap, 2, gcap], jnp.int32)  # trimming mix

        acc = rows_adc_grouped_prefetch(
            codes, gp, tlo, thi, rpp, cb=cb, interpret=True, group_nblk=gnb
        )                                                 # (GCAP*rpp, 128)
        s_mat = jnp.asarray(
            (np.arange(128)[:, None] // cb) == np.arange(cpr)[None, :],
            jnp.float32,
        )
        want = jnp.dot(acc, s_mat, precision=jax.lax.Precision.HIGHEST)
        want = np.asarray(want).reshape(gcap, rpp, cpr).transpose(0, 2, 1)

        got = rows_adc_grouped_prefetch(
            codes, gp, tlo, thi, rpp, cb=cb, interpret=True, group_nblk=gnb,
            compact_out=True,
        )                                                 # (GCAP*cpr, rpp)
        got = np.asarray(got).reshape(gcap, cpr, rpp)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_int8c_variant_parity(rng):
    """variant='int8c' (int8 compares in the one-hot build) == 'int8'."""
    import jax.numpy as jnp

    from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_reduce

    codes = jnp.asarray(
        rng.integers(0, 256, size=(8192 // 16, 128), dtype=np.uint8)
    )
    qt = jnp.asarray(rng.integers(-30, 120, size=(32, 16, 16)).astype(np.int8))
    tlo, thi = build_scan_tables(qt)
    a, ra = lut_scan_reduce(codes, tlo, thi, cb=8, block_n=1024,
                            interpret=True, variant="int8", with_rows=True)
    b, rb = lut_scan_reduce(codes, tlo, thi, cb=8, block_n=1024,
                            interpret=True, variant="int8c", with_rows=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


@pytest.mark.parametrize("m,window", [(16, 16), (32, 8)])
def test_tq_scan_bitexact_vs_row128(rng, m, window):
    """tq (plane-major) kernel == lut_scan_reduce: same window ids, same
    minima, bit-exact — int32 and float32 accumulation alike."""
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables_tq, lut_scan_tq, to_planes,
    )

    cb = m // 2
    n = 8192
    packed, qt = _setup(rng, n=n, m=m, q=7)
    rows = jnp.asarray(to_row128(packed))
    qt_j = jnp.asarray(qt)
    tlo, thi = build_scan_tables(qt_j)
    tcat = build_scan_tables_tq(qt_j)
    bn = 2048
    planes = to_planes(rows, cb, bn)
    a, _ = lut_scan_reduce(rows, tlo, thi, cb=cb, block_n=bn, window=window,
                           interpret=True, transpose_out=True)
    b = lut_scan_tq(planes, tcat, cb=cb, block_n=bn, window=window,
                    interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    af, _ = lut_scan_reduce(
        rows, tlo.astype(jnp.float32), thi.astype(jnp.float32), cb=cb,
        block_n=bn, window=window, interpret=True, transpose_out=True,
        acc_dtype_name="float32",
    )
    bf = lut_scan_tq(planes, tcat.astype(jnp.float32), cb=cb, block_n=bn,
                     window=window, interpret=True, acc_dtype_name="float32")
    np.testing.assert_array_equal(np.asarray(af), np.asarray(bf))


def test_tq_planes_roundtrip(rng):
    """to_planes: chunk w, lane c of block i holds code i*blk + c*cpr + w."""
    from qadc_tpu.kernels.lut_scan import to_planes

    cb, bn = 8, 2048
    cpr = 128 // cb
    n = 4096
    codes = rng.integers(0, 256, size=(n, cb), dtype=np.uint8)
    rows = jnp.asarray(to_row128(codes))
    planes = np.asarray(to_planes(rows, cb, bn))
    g = bn // cpr
    for (i, w, c) in [(0, 0, 0), (0, 3, 17), (1, 15, 127), (1, 7, 64)]:
        code = i * bn + c * cpr + w
        np.testing.assert_array_equal(planes[:, i * bn + w * g + c], codes[code])
