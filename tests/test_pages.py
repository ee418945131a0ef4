"""Two-level page partition invariants (snail_tpu/bvh/pages.py).

A host-side walker over the paged layout must reach exactly the same
leaves (same global triangle ranges) as a walk of the flat BVH.
"""

import numpy as np


def _flat_leaves(bvh):
    out = []
    st = [0]
    while st:
        n = st.pop()
        if bvh.count[n] > 0:
            out.append((int(bvh.child[n]), int(bvh.count[n])))
        else:
            st.append(int(bvh.child[n]))
            st.append(int(bvh.child[n]) + 1)
    return sorted(out)


def _paged_leaves(pl):
    out = []

    def walk_page(pid):
        st = [0]
        while st:
            li = st.pop()
            w0 = np.uint32(pl.pg_meta[pid, 2 * li])
            child = int(w0 >> np.uint32(9))
            count = int((w0 >> np.uint32(2)) & np.uint32(0x7F))
            if count > 0:
                first = int(np.uint32(pl.pg_meta[pid, 2 * li + 1]))
                out.append((first, count))
            else:
                st.append(child)
                st.append(child + 1)

    st = [0]
    while st:
        n = st.pop()
        w0 = np.uint32(pl.top_meta[2 * n])
        child = int(w0 >> np.uint32(9))
        count = int((w0 >> np.uint32(2)) & np.uint32(0x7F))
        axis = int(w0 & np.uint32(3))
        if axis == 3:
            walk_page(child)
        elif count > 0:
            out.append((child, count))
        else:
            st.append(child)
            st.append(child + 1)
    return sorted(out)


def test_partition_covers_all_leaves():
    from snail_tpu.bvh import build_bvh
    from snail_tpu.bvh.pages import partition_pages
    from snail_tpu.scene.procedural import city_scene

    g = city_scene(10).flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=16)
    pl = partition_pages(bvh, page_cap=64)
    assert pl.n_pages > 1, "test scene too small for paging"
    assert pl.n_top >= 1
    assert _flat_leaves(bvh) == _paged_leaves(pl)

    # page boxes must match the original nodes (root box via top pointer)
    flat_root_lo = bvh.node_lo[0]
    assert np.allclose(pl.top_box[0:3], flat_root_lo)


def test_partition_single_page():
    from snail_tpu.bvh import build_bvh
    from snail_tpu.bvh.pages import partition_pages
    from snail_tpu.scene.procedural import cornell_scene

    g = cornell_scene().flatten()
    lo, hi = g.bounds()
    bvh = build_bvh(lo, hi, leaf_size=8)
    pl = partition_pages(bvh, page_cap=4096)
    assert pl.n_pages == 1 and pl.n_top == 1
    assert _flat_leaves(bvh) == _paged_leaves(pl)
