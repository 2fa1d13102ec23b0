import jax.numpy as jnp
import numpy as np

from gapartnet_tpu.ops.hash_ccl import hash_connected_components


def _radius_graph_components(xyz, sem, valid, radius):
    """Uncapped radius-graph components oracle (min point index labels)."""
    n = len(xyz)
    labels = np.arange(n)
    idx = np.nonzero(valid)[0]
    r2 = radius * radius
    # union-find
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for ii, i in enumerate(idx):
        for j in idx[ii + 1:]:
            if sem[i] != sem[j]:
                continue
            d = xyz[i] - xyz[j]
            if (d * d).sum() <= r2:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    for i in idx:
        labels[i] = find(i)
    return labels


def _partition(labels, valid):
    groups = {}
    for i in np.nonzero(valid)[0]:
        groups.setdefault(int(labels[i]), []).append(int(i))
    return sorted(tuple(sorted(v)) for v in groups.values())


def test_hash_ccl_matches_radius_graph(rng):
    n = 200
    xyz = rng.rand(n, 3).astype(np.float32) * 0.5
    sem = rng.randint(0, 3, n).astype(np.int32)
    valid = sem > 0
    r = 0.04
    got = np.asarray(
        hash_connected_components(
            jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid), r
        )[0]
    )
    want = _radius_graph_components(xyz, sem, valid, r)
    assert _partition(got, valid) == _partition(want, valid)
    # labels are the min point index of each component
    for comp in _partition(got, valid):
        assert got[comp[0]] == comp[0]
        assert all(got[i] == comp[0] for i in comp)


def test_hash_ccl_dense_blobs(rng):
    """Blob-shaped clusters (the shifted-set regime: points collapse to

    centroids) must come out as single components even beyond the rep cap."""
    blobs = []
    sems = []
    for k, center in enumerate([[0, 0, 0], [1, 1, 1], [0.05, 0, 0]]):
        blobs.append(center + rng.randn(300, 3).astype(np.float32) * 0.005)
        sems.append(np.full(300, 1 + (k % 2), np.int32))
    xyz = np.concatenate(blobs)
    sem = np.concatenate(sems)
    valid = np.ones(len(xyz), bool)
    got = np.asarray(
        hash_connected_components(
            jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid), 0.04, reps=8
        )[0]
    )
    want = _radius_graph_components(xyz, sem, valid, 0.04)
    assert _partition(got, valid) == _partition(want, valid)


def test_hash_ccl_invalid_points_isolated(rng):
    xyz = np.zeros((10, 3), np.float32)  # all identical positions
    sem = np.ones(10, np.int32)
    valid = np.arange(10) < 5
    got = np.asarray(
        hash_connected_components(
            jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid), 0.04
        )[0]
    )
    np.testing.assert_array_equal(got[:5], 0)     # one component
    np.testing.assert_array_equal(got[5:], np.arange(5, 10))  # isolated selves


def test_dual_set_merged_call_matches_two_calls(rng):
    """set_mask mode: one merged call == two independent calls per set."""
    n = 300
    xyz = rng.rand(n, 3).astype(np.float32) * 0.5
    offsets = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.2
    sem = rng.randint(0, 3, n).astype(np.int32)
    valid = sem > 0
    r = 0.04

    lab1, ovf1, _ = hash_connected_components(
        jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid), r
    )
    lab2, ovf2, _ = hash_connected_components(
        jnp.asarray(xyz + offsets), jnp.asarray(sem), jnp.asarray(valid), r
    )

    both = jnp.concatenate([jnp.asarray(xyz), jnp.asarray(xyz + offsets)])
    lab, ovf, _ = hash_connected_components(
        both,
        jnp.concatenate([jnp.asarray(sem)] * 2),
        jnp.concatenate([jnp.asarray(valid)] * 2),
        r,
        set_mask=jnp.arange(2 * n) >= n,
    )
    np.testing.assert_array_equal(np.asarray(lab)[:n], np.asarray(lab1))
    np.testing.assert_array_equal(np.asarray(lab)[n:] - n, np.asarray(lab2))
    assert int(ovf) == int(ovf1) + int(ovf2)


def test_probe_impls_agree(rng):
    """The sort-membership and dense-table probes are two lookups of the

    same (cell, label) key set — identical components must come out."""
    import jax.numpy as jnp

    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    n = 600
    xyz = rng.rand(n, 3).astype(np.float32) * 0.5
    sem = rng.randint(0, 5, n).astype(np.int32)
    valid = rng.rand(n) > 0.1
    outs = {}
    for impl in ("sort", "table", "window"):
        lab, ovf, _ = hash_connected_components(
            jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid),
            0.06, node_capacity=0, probe_impl=impl,
        )
        outs[impl] = np.asarray(lab)
        assert int(ovf) == 0
    np.testing.assert_array_equal(outs["sort"], outs["table"])
    np.testing.assert_array_equal(outs["sort"], outs["window"])


def test_window_probe_agrees_dual_set_and_boundaries(rng):
    """The windowed-rank probe must match the sort probe in dual-set mode
    and with clouds pushed into the grid's corner cells (where the 5-wide
    slice window hits the clipped/padded table rows)."""
    import jax.numpy as jnp

    from gapartnet_tpu.ops.hash_ccl import CELL_BITS, hash_connected_components

    n = 800
    radius = 0.06
    s = radius / np.sqrt(3.0)
    extent = (1 << CELL_BITS) * s
    # spread across the full grid, with clusters hugging both corners
    xyz = rng.rand(n, 3).astype(np.float32) * (extent * 0.98)
    xyz[:60] = xyz[:60] * 0.01                      # min-corner clump
    xyz[60:120] = extent * 0.995 - xyz[60:120] * 0.01   # max-corner clump
    sem = rng.randint(0, 8, n).astype(np.int32)
    valid = rng.rand(n) > 0.05
    set_mask = jnp.asarray(rng.rand(n) > 0.5)
    outs = {}
    for impl in ("sort", "window"):
        lab, ovf, _ = hash_connected_components(
            jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid),
            radius, node_capacity=0, probe_impl=impl, set_mask=set_mask,
        )
        outs[impl] = np.asarray(lab)
    np.testing.assert_array_equal(outs["sort"], outs["window"])


def test_per_set_capacity_protects_set2():
    """Dual-set mode: set-2 keys sort after set 1, so a GLOBAL node cap would
    starve set 2 whenever set 1 overflows — but set 2 (offset-shifted) is
    what recovers small parts.  Per-set caps must keep set 2 clustered."""
    import jax.numpy as jnp
    import numpy as np

    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    rng = np.random.RandomState(3)
    n = 512
    # set 1: spread over many cells (many nodes); set 2: one tight blob
    xyz1 = rng.rand(n, 3).astype(np.float32)            # ~hundreds of nodes
    xyz2 = (rng.rand(n, 3) * 0.02).astype(np.float32)   # a few nodes
    both = jnp.asarray(np.concatenate([xyz1, xyz2]))
    sem = jnp.ones((2 * n,), jnp.int32)
    valid = jnp.ones((2 * n,), bool)
    set_mask = jnp.arange(2 * n) >= n

    m = 128  # far below set-1 occupancy, ample for set 2 (64 slots each)
    lab, overflow, _ = hash_connected_components(
        both, sem, valid, 0.04, node_capacity=m, set_mask=set_mask
    )
    lab = np.asarray(lab)
    assert int(overflow) > 0  # set 1 genuinely overflows
    # set 2 must still cluster into ONE component (min point index = n)
    lab2 = lab[n:]
    assert (lab2 == n).all(), np.unique(lab2)[:5]


def test_cand_cap_64_structurally_untruncated(rng):
    """cand_cap >= the 62-offset probe width (eval_capacity_config asks for
    64) must make candidate truncation IMPOSSIBLE, and components must match
    the capped run's graph semantics on a dense cloud where a small cap
    genuinely truncates."""
    import jax.numpy as jnp

    from gapartnet_tpu.ops.hash_ccl import hash_connected_components

    n = 1200
    # one dense blob: every (cell, label) node sees many same-label
    # candidates, so a small cand cap truncates
    xyz = (rng.rand(n, 3) * 0.12).astype(np.float32)
    sem = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    args = (jnp.asarray(xyz), jnp.asarray(sem), jnp.asarray(valid), 0.06)
    _, _, trunc_small = hash_connected_components(
        *args, node_capacity=0, cand_cap=8, max_degree=8
    )
    assert int(trunc_small) > 0  # the fixture really is dense enough
    lab64, ovf, trunc64 = hash_connected_components(
        *args, node_capacity=0, cand_cap=64, max_degree=64
    )
    assert int(trunc64) == 0 and int(ovf) == 0
    # uncapped default on the same cloud agrees on the components
    lab_ref, _, _ = hash_connected_components(
        *args, node_capacity=0, cand_cap=60, max_degree=60
    )
    np.testing.assert_array_equal(np.asarray(lab64), np.asarray(lab_ref))
