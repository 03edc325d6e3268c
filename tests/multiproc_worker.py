"""Worker for the multi-process jax.distributed integration tests.

Run as: python multiproc_worker.py CKPT_DIR QUERIES_NPZ OUT_NPZ [PROGRESS_DIR]
with QADC_COORDINATOR / QADC_NUM_PROCESSES / QADC_PROCESS_ID set — the env
path through dist.mesh.maybe_init_distributed is exactly what a multi-host
launcher would use. Each process loads ONLY the partition rows it owns
(dist.sharded_ivf.load_sharded_index — resharding if the checkpoint was
written for a different host count) and runs the sharded search over the
global mesh.

QUERIES_NPZ may contain a 3-D `queries` array (batches, Q, dim): the worker
then runs one sharded search per batch and, if PROGRESS_DIR is given, writes
`p{PID}_b{i}.done` after each batch — the failure-injection test uses these
markers to SIGKILL a worker at a deterministic mid-run point.
"""

import os
import sys

import jax

# CPU with 2 local devices per process (jax.config, not env: sitecustomize
# already imported jax on this image).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
    ckpt, qfile, out = sys.argv[1:4]
    progress_dir = sys.argv[4] if len(sys.argv) > 4 else None

    from qadc_tpu.dist.mesh import make_mesh, maybe_init_distributed

    if not maybe_init_distributed():
        raise SystemExit("expected a multi-process group from QADC_* env vars")

    import numpy as np

    from qadc_tpu.dist.sharded_ivf import load_sharded_index, search_qadc_ivf_sharded

    mesh = make_mesh()
    index = load_sharded_index(ckpt, mesh)
    q = np.load(qfile)
    queries = q["queries"]
    batches = queries[None] if queries.ndim == 2 else queries
    ds, ls = [], []
    for i, batch in enumerate(batches):
        d, l = search_qadc_ivf_sharded(
            index,
            batch,
            r=int(q["r"]),
            ma=int(q["ma"]),
            keep=float(q["keep"]),
            mesh=mesh,
            interpret=True,
        )
        # Outputs are fully replicated (out_specs P()); read this process's copy.
        ds.append(np.asarray(jax.device_get(d.addressable_data(0))))
        ls.append(np.asarray(jax.device_get(l.addressable_data(0))))
        if progress_dir:
            pid = jax.process_index()
            with open(os.path.join(progress_dir, f"p{pid}_b{i}.done"), "w") as f:
                f.write("done")
    np.savez(out, d=np.concatenate(ds), l=np.concatenate(ls))
    print(f"process {jax.process_index()} done", flush=True)


if __name__ == "__main__":
    main()
