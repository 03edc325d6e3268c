"""End-to-end CLI tests: the reference's executable workflows."""

import numpy as np
import pytest

from qadc_tpu.cli.main import main
from qadc_tpu.io import save_vectors
from qadc_tpu.ops.knn import exact_knn


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    dim = 32
    centers = rng.normal(scale=3.0, size=(10, dim)).astype(np.float32)
    learn = (centers[rng.integers(0, 10, 2000)] + rng.normal(size=(2000, dim))).astype(np.float32)
    base = (centers[rng.integers(0, 10, 5000)] + rng.normal(size=(5000, dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 10, 20)] + rng.normal(size=(20, dim))).astype(np.float32)
    _, gt = exact_knn(queries, base, 10)
    paths = {
        "learn": str(tmp / "learn.fvecs"),
        "base": str(tmp / "base.fvecs"),
        "queries": str(tmp / "q.fvecs"),
        "gt": str(tmp / "gt.ivecs"),
        "tmp": tmp,
    }
    save_vectors(paths["learn"], learn)
    save_vectors(paths["base"], base)
    save_vectors(paths["queries"], queries)
    save_vectors(paths["gt"], np.asarray(gt, np.int32))
    return paths


def test_flat_workflow(dataset, capsys):
    idx = str(dataset["tmp"] / "flat_idx")
    main(["create-flat", idx, "--train", dataset["learn"], "--sq", "16x4"])
    main(["add", idx, dataset["base"], "--chunk-size", "2048"])
    main([
        "query", idx, dataset["queries"], dataset["gt"],
        "-r", "100", "-k", "5", "-b", "8",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-2] == "r,recall,ma,adc_type,keep,index_us,rotate_us,table_us,scan_us"
    fields = out[-1].split(",")
    assert fields[0] == "100" and fields[3] == "qadc"
    assert float(fields[1]) > 0.85  # recall


def test_ivf_workflow(dataset, capsys):
    idx = str(dataset["tmp"] / "ivf_idx")
    main(["create-index", dataset["learn"], idx, "--parts", "16", "--sq", "16x4"])
    main(["add", idx, dataset["base"]])
    main([
        "query", idx, dataset["queries"], dataset["gt"],
        "-r", "100", "-m", "8", "-k", "10", "-b", "8",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    fields = out[-1].split(",")
    assert float(fields[1]) > 0.8, fields
    # conventional ADC path on the same index
    main([
        "query", idx, dataset["queries"], dataset["gt"],
        "-r", "100", "-m", "8", "--adc-type", "adc", "-b", "8",
    ])
    out2 = capsys.readouterr().out.strip().splitlines()
    assert out2[-2] == "r,recall,ma,adc_type,index_us,rotate_us,table_us,scan_us"
    assert float(out2[-1].split(",")[1]) > 0.8


def test_split_cli(dataset):
    out = str(dataset["tmp"] / "chunk.fvecs")
    main(["split", "1", "1000", dataset["base"], out])
    from qadc_tpu.io import vecs_info

    assert vecs_info(out) == (32, 1000)


def test_convert_quantizer(dataset):
    import pickle

    rng = np.random.default_rng(1)
    cb = rng.normal(size=(4, 16, 8)).astype(np.float32)
    pin = str(dataset["tmp"] / "q.pickle")
    with open(pin, "wb") as f:
        pickle.dump(cb, f)
    out = str(dataset["tmp"] / "conv.pq.data")
    main(["convert-quantizer", "pq", pin, out])
    from qadc_tpu.io import load_quantizer_file

    pq = load_quantizer_file(out)
    np.testing.assert_allclose(np.asarray(pq.centroids), cb)

    rot = np.linalg.qr(rng.normal(size=(32, 32)))[0].astype(np.float32)
    pin2 = str(dataset["tmp"] / "q2.pickle")
    with open(pin2, "wb") as f:
        pickle.dump((cb, rot), f)
    out2 = str(dataset["tmp"] / "conv.opq.data")
    main(["convert-quantizer", "opq", pin2, out2])
    opq = load_quantizer_file(out2)
    np.testing.assert_allclose(np.asarray(opq.rotation), rot)


def test_info_and_residuals_out(dataset, capsys):
    idx = str(dataset["tmp"] / "ivf_idx2")
    res = str(dataset["tmp"] / "residuals.fvecs")
    main(["create-index", dataset["learn"], idx, "--parts", "8", "--sq", "16x4",
          "--residuals-out", res])
    capsys.readouterr()
    from qadc_tpu.io import vecs_info, load_vectors

    assert vecs_info(res) == (32, 2000)
    main(["info", idx])
    out = capsys.readouterr().out
    assert "type: ivf" in out and "sq=16x4" in out and "partitions: 8" in out
    # Residuals round-trip: vec = centroid + residual (reference check).
    import numpy as np
    from qadc_tpu.io import load_index
    from qadc_tpu.ops.knn import assign_nearest

    index = load_index(idx)
    learn = load_vectors(dataset["learn"])
    a = np.asarray(assign_nearest(learn, index.coarse_centroids))
    recon = np.asarray(index.coarse_centroids)[a] + load_vectors(res)
    np.testing.assert_allclose(recon, learn, atol=1e-4)


def test_external_training_round_trip(dataset, capsys):
    """The reference's 3-step workflow (README.md:166-260): indexdb_create1
    (create-index --residuals-out) -> external PQ/OPQ training on the
    residuals -> indexdb_create2 (set-quantizer) -> db_add -> db_query_4."""
    import jax

    from qadc_tpu.io import load_index, load_vectors, save_quantizer_file
    from qadc_tpu.quantizers.opq import train_opq

    idx = str(dataset["tmp"] / "ext_idx")
    res = str(dataset["tmp"] / "ext_residuals.fvecs")
    main(["create-index", dataset["learn"], idx, "--parts", "8",
          "--sq", "4x4", "--residuals-out", res])

    # "External" training: an OPQ trained outside the index-creation step on
    # the residuals file, saved in the reference's .opq.data format.
    residuals = load_vectors(res)
    opq = train_opq(jax.random.PRNGKey(9), residuals, 16, 4, opq_iters=3,
                    kmeans_iters=8)
    qfile = str(dataset["tmp"] / "ext.opq.data")
    save_quantizer_file(qfile, opq)

    main(["set-quantizer", idx, qfile])
    index = load_index(idx)
    assert index.pq.sq_count == 16 and index.pq.sq_bits == 4  # swapped in
    assert index.n == 0

    main(["add", idx, dataset["base"]])
    main(["query", idx, dataset["queries"], dataset["gt"],
          "-r", "100", "-m", "4", "-k", "10", "-b", "8"])
    out = capsys.readouterr().out.strip().splitlines()
    assert float(out[-1].split(",")[1]) > 0.8  # recall

    # Swapping into a non-empty index must fail.
    with pytest.raises(SystemExit, match="non-empty"):
        main(["set-quantizer", idx, qfile])
