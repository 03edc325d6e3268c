import numpy as np
import jax.numpy as jnp

from qadc_tpu.index.routing import group_capacity, route_queries


def _check_routing(parts, part_count, g):
    routed = route_queries(jnp.asarray(parts), part_count, g)
    q, ma = parts.shape
    group_part = np.asarray(routed.group_part)
    qa_group = np.asarray(routed.qa_group)
    qa_slot = np.asarray(routed.qa_slot)
    n_groups = int(routed.n_groups)
    assert n_groups <= routed.gcap == group_capacity(q, ma, part_count, g)

    seen = {}
    for qi in range(q):
        for ai in range(ma):
            gi, si = qa_group[qi, ai], qa_slot[qi, ai]
            # pair's group scans the pair's partition
            assert group_part[gi] == parts[qi, ai], (qi, ai)
            assert 0 <= si < g
            # slots unique within a group
            assert (gi, si) not in seen, (qi, ai, gi, si)
            seen[(gi, si)] = (qi, ai)
    # groups are dense 0..n_groups-1
    used = sorted({gi for gi, _ in seen})
    assert used == list(range(n_groups))


def test_routing_basic(rng):
    parts = rng.integers(0, 16, size=(8, 4)).astype(np.int32)
    _check_routing(parts, 16, 4)


def test_routing_overflowing_groups(rng):
    # All queries probe the same partition -> many groups per run.
    parts = np.zeros((20, 3), np.int32)
    _check_routing(parts, 4, 8)


def test_routing_large(rng):
    parts = rng.integers(0, 64, size=(64, 12)).astype(np.int32)
    # Make per-query partitions distinct (as top-k assignment produces).
    for i in range(64):
        parts[i] = rng.choice(64, size=12, replace=False)
    _check_routing(parts, 64, 16)


def test_routing_single_pair():
    parts = np.array([[3]], np.int32)
    _check_routing(parts, 8, 4)
