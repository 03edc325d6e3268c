"""Worker for the 2-process jax.distributed integration test.

Run as: python multiproc_worker.py CKPT_DIR QUERIES_NPZ OUT_NPZ
with QADC_COORDINATOR / QADC_NUM_PROCESSES / QADC_PROCESS_ID set — the env
path through dist.mesh.maybe_init_distributed is exactly what a multi-host
launcher would use. Each process loads ONLY its own checkpoint shard
(dist.sharded_ivf.load_sharded_index) and runs the sharded search over the
global 2-process mesh.
"""

import sys

import jax

# CPU with 2 local devices per process -> 4 global devices over 2 processes.
# (jax.config, not env: sitecustomize already imported jax on this image.)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
    ckpt, qfile, out = sys.argv[1:4]

    from qadc_tpu.dist.mesh import make_mesh, maybe_init_distributed

    if not maybe_init_distributed():
        raise SystemExit("expected a multi-process group from QADC_* env vars")
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np

    from qadc_tpu.dist.sharded_ivf import load_sharded_index, search_qadc_ivf_sharded

    mesh = make_mesh()
    index = load_sharded_index(ckpt, mesh)
    q = np.load(qfile)
    d, l = search_qadc_ivf_sharded(
        index,
        q["queries"],
        r=int(q["r"]),
        ma=int(q["ma"]),
        keep=float(q["keep"]),
        mesh=mesh,
        interpret=True,
    )
    # Outputs are fully replicated (out_specs P()); read this process's copy.
    np.savez(
        out,
        d=np.asarray(jax.device_get(d.addressable_data(0))),
        l=np.asarray(jax.device_get(l.addressable_data(0))),
    )
    print(f"process {jax.process_index()} done", flush=True)


if __name__ == "__main__":
    main()
