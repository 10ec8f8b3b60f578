"""Multi-chip scene partitioning — STRUCTURAL tests (no traced meshes).

The trace-equivalence and render-level partition tests live in
test_partition_trace.py / test_partition_render.py (marked slow); this
file is the quick-tier slice: host-side partition builder invariants.
"""

import numpy as np
import pytest

from gpupathtracer_tpu.bvh.partition import build_partition

from partition_util import leaf_rows_of, load_bunny


@pytest.fixture(scope="module")
def bunny():
    return load_bunny()


def test_partition_covers_all_triangles(bunny):
    """Every triangle id of the full tree appears in exactly the union of
    the per-device tables (duplication across devices allowed only via
    SBVH reference duplication, which shares prim ids)."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)

    def prims_of(table, leaf_rows):
        prims = set()
        for row, count in leaf_rows:
            for k in range(count):
                pid = table[row, k * 12 + 9:k * 12 + 10].view(np.int32)[0]
                prims.add(int(pid))
        return prims

    full = prims_of(rows, leaf_rows_of(rows))
    union = set()
    for gg in range(8):
        tbl = part.tables[gg]
        union |= prims_of(tbl, leaf_rows_of(tbl))
    assert union == full
    # The partition actually splits: no device holds the whole tree.
    assert int(part.num_rows.max()) < rows.shape[0]
    assert int(part.num_rows.sum()) >= rows.shape[0]  # + D synthetic roots


def test_replicate_hot_structure(bunny):
    """Hot-subtree replication layout invariants: a steady root exists
    past the hop-0 root, tables grew by the replicated rows, the hop-0
    forest union covers the steady bounds, and steady roots reach a
    subset of the hop-0 leaves."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8, replicate_hot=2)
    base = build_partition(rows, W, 8, replicate_hot=0)

    assert (part.steady_root > 0).all()
    assert int(part.num_rows.sum()) > int(base.num_rows.sum())
    assert (part.dev_bounds0[:, 0:3] <= part.dev_bounds[:, 0:3] + 1e-6).all()

    for g in range(8):
        # Steady root reaches a strict subset of the hop-0 root's leaves
        # (row indices are table-local, so subset checks stay per-table).
        hop0 = leaf_rows_of(part.tables[g], root_entry=0)
        steady = leaf_rows_of(part.tables[g],
                              root_entry=int(part.steady_root[g]))
        assert steady < hop0


def test_hot_entries_dedup(bunny):
    """Duplicate explicit hot_entries must build the identical partition
    as the deduped list — a duplicate would otherwise emit the same
    subtree twice into every hop-0 root, doubling its pops per ray."""
    scene, _ = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    a = build_partition(rows, W, 4, hot_entries=[1, 1, 2, 2, 1])
    b = build_partition(rows, W, 4, hot_entries=[1, 2])
    np.testing.assert_array_equal(a.tables, b.tables)
    np.testing.assert_array_equal(a.steady_root, b.steady_root)
    np.testing.assert_array_equal(a.num_rows, b.num_rows)


def test_group_cap_repair():
    """The two-level synthetic root caps a group at 64 - len(hot) steady
    entries; the kd/LPT grouping balances by weight, not count, so a
    skewed cut can overfill one group. _repair_group_caps must move the
    smallest members to the emptiest groups instead of crashing, and
    must raise only when the cap is genuinely infeasible."""
    from gpupathtracer_tpu.bvh.partition import _repair_group_caps

    sizes = {i: i + 1 for i in range(80)}
    groups = [list(range(70)), list(range(70, 75)), list(range(75, 80))]
    _repair_group_caps(groups, sizes, cap=30)
    assert sorted(i for g in groups for i in g) == list(range(80))
    assert all(len(g) <= 30 for g in groups)

    with pytest.raises(ValueError, match="exceed"):
        _repair_group_caps([list(range(10)), []], {i: 1 for i in range(10)},
                           cap=4)


def test_node_bucket_map(bunny):
    """node_bucket_map covers the tree below the cut: buckets land only
    in real cut entries, the root sits above the cut."""
    from gpupathtracer_tpu.bvh.partition import (node_bucket_map,
                                                 partition_cut)

    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    cut_e, _ = partition_cut(rows, W, 8)
    C = len(cut_e)
    bucket = node_bucket_map(rows, W, cut_e)
    assert bucket.shape == (W,)
    assert int(bucket[0]) == C  # root sits above the cut
    assert (bucket <= C).all() and (bucket >= 0).all()
    assert (bucket < C).sum() > 0  # the cut covers real nodes
