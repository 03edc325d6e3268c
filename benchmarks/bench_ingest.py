"""Streamed IVF ingest linearity (VERDICT r1 weak #6).

Builds an IVF index from K equal chunks through index.build.IVFBuilder and
reports per-chunk wall time. With per-partition append buffers the cost per
chunk must stay ~flat as the index grows (the round-1 `ivf.add` loop rebuilt
the whole index per chunk — per-chunk time grew linearly with chunk index).

Run: python -m benchmarks.bench_ingest [--chunks 16] [--chunk-size 100000]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--chunk-size", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--parts", type=int, default=1024)
    ap.add_argument("--m", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qadc_tpu.index.build import IVFBuilder
    from qadc_tpu.quantizers.pq import ProductQuantizer

    rng = np.random.default_rng(0)
    dim, m = args.dim, args.m
    pq = ProductQuantizer(
        centroids=jnp.asarray(rng.normal(size=(m, 16, dim // m)).astype(np.float32)),
        sq_bits=4,
    )
    coarse = rng.normal(size=(args.parts, dim)).astype(np.float32)
    b = IVFBuilder(pq, coarse)

    times = []
    for i in range(args.chunks):
        chunk = rng.normal(size=(args.chunk_size, dim)).astype(np.float32)
        t0 = time.time()
        b.add(chunk)
        times.append(time.time() - t0)
        print(f"chunk {i:3d}: {times[-1]:.2f}s  (n={b.n})")
    t0 = time.time()
    index = b.finalize()
    t_fin = time.time() - t0
    jax.block_until_ready(index.codes)

    first = float(np.mean(times[1:4]))
    last = float(np.mean(times[-3:]))
    print(
        json.dumps(
            {
                "metric": "ivf_ingest_per_chunk_s",
                "value": last,
                "unit": "s/chunk",
                "detail": {
                    "chunks": args.chunks,
                    "chunk_size": args.chunk_size,
                    "first_chunks_s": first,
                    "last_chunks_s": last,
                    "growth_ratio_last_over_first": last / max(first, 1e-9),
                    "finalize_s": t_fin,
                    "total_vectors": b.n,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
