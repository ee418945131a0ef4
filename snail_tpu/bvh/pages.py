"""Two-level BVH page partition — the large-scene layout for the Pallas
traversal kernels.

The kernels walk the tree on the TPU scalar core, which can only randomly
index SMEM (~1 MB), capping a single-level tree at ~24k nodes
(traverse_pallas.SMEM_NODE_CAP). The reference faces the same shape of
problem on the Cell SPU (256 KB local store) and solves it with software
caches that DMA BVH nodes from main memory on demand
(src/spu/base.h:85-135); its DBVH is the two-level precedent
(src/dbvh/tree.h:189-252). Here the split is explicit and page-granular:

- the TOP tree (every subtree larger than ``page_cap`` nodes, plus one
  *page-pointer* node per maximal small subtree) stays resident in SMEM;
- each maximal subtree with <= ``page_cap`` nodes becomes a fixed-capacity
  PAGE in HBM, DMA'd into an SMEM page slot when a packet's walk reaches
  its pointer node (leaf triangle indices stay global, so the existing
  leaf DMA ring is untouched).

A 10 Mtri scene (~2 M nodes) partitions into ~1k pages with a ~2-4k-node
top tree: SMEM holds top + one page slot comfortably, and packet coherence
keeps page faults to a handful per packet.

Encoding (mirrors traverse_pallas.pack_scene_arrays):
  w0 = child<<9 | count<<2 | axis      (leaf: count>0)
  top page pointer:  axis == 3, child = page id, count = 0
  page-local children: child is page-LOCAL (kernel adds its page base)
  page leaves: w1 = global first-triangle row (32 bits — frees the 22-bit
  child field from capping triangle counts); inner page nodes: w1 = fnode
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .build import BVH

PAGE_CAP = 2048  # nodes per page; meta 16 KB + box 48 KB per page slot


@dataclasses.dataclass
class PagedLayout:
    """Packed two-level kernel tables.

    top_meta : int32[2 * Ntop]      SMEM-resident top tree
    top_box  : float32[6 * Ntop]
    pg_meta  : int32[NP, 2 * page_cap]   one row per page (HBM)
    pg_box   : float32[NP, 6 * page_cap]
    """

    top_meta: np.ndarray
    top_box: np.ndarray
    pg_meta: np.ndarray
    pg_box: np.ndarray
    page_cap: int
    n_top: int
    n_pages: int


def partition_pages(bvh: BVH, page_cap: int = PAGE_CAP) -> PagedLayout:
    """Cut a flat BVH into top tree + pages (maximal <=page_cap subtrees)."""
    n = bvh.num_nodes
    child = bvh.child
    count = bvh.count
    inner = count == 0

    # subtree sizes, level-synchronous: gather the levels root-down
    # (children are allocated after their parent, so levels are well
    # defined), then size them deepest-first with vectorized gathers —
    # the per-node Python reverse scan was O(nodes) interpreter time
    # (minutes at thai-class 2M nodes)
    size = np.ones(n, np.int64)
    levels = []
    cur = np.array([0], np.int64)
    while len(cur):
        levels.append(cur)
        ci = cur[inner[cur]]
        cur = np.concatenate([child[ci], child[ci] + 1]) if len(ci) \
            else np.empty(0, np.int64)
    for cur in reversed(levels):
        ci = cur[inner[cur]]
        if len(ci):
            size[ci] = 1 + size[child[ci]] + size[child[ci] + 1]

    top_ids = []  # old ids in new-top order (children adjacent)
    new_top = {}
    pages = []  # list of page-root old ids

    def alloc_top(old):
        new_top[old] = len(top_ids)
        top_ids.append(old)

    # DFS: a node is a page root iff its subtree fits; its pointer node
    # still occupies a top slot so sibling adjacency holds
    alloc_top(0)
    stack = [0]
    page_of = {}
    while stack:
        old = stack.pop()
        if size[old] <= page_cap:
            page_of[old] = len(pages)
            pages.append(old)
            continue
        # inner top node (a leaf always has size 1 <= page_cap)
        l, r = int(child[old]), int(child[old]) + 1
        alloc_top(l)
        alloc_top(r)
        stack.append(r)
        stack.append(l)

    n_top = len(top_ids)
    top_meta = np.zeros(2 * n_top, np.int32)
    top_box = np.zeros(6 * n_top, np.float32)
    u = lambda x: np.uint32(x).view(np.int32)
    for new, old in enumerate(top_ids):
        top_box[6 * new : 6 * new + 3] = bvh.node_lo[old]
        top_box[6 * new + 3 : 6 * new + 6] = bvh.node_hi[old]
        if old in page_of:
            top_meta[2 * new] = u((page_of[old] << 9) | 3)  # axis=3 marker
            top_meta[2 * new + 1] = 0
        else:
            nl = new_top[int(child[old])]
            top_meta[2 * new] = u((nl << 9) | (int(bvh.axis[old]) & 3))
            top_meta[2 * new + 1] = int(bvh.first_node[old]) & 1

    n_pages = len(pages)
    pg_meta = np.zeros((n_pages, 2 * page_cap), np.int32)
    pg_box = np.zeros((n_pages, 6 * page_cap), np.float32)
    for pid, root in enumerate(pages):
        # local DFS renumber, children adjacent
        local_ids = [root]
        lmap = {root: 0}
        st = [root]
        while st:
            old = st.pop()
            if inner[old]:
                l, r = int(child[old]), int(child[old]) + 1
                lmap[l] = len(local_ids)
                local_ids.append(l)
                lmap[r] = len(local_ids)
                local_ids.append(r)
                st.append(r)
                st.append(l)
        assert len(local_ids) == size[root] <= page_cap
        for li, old in enumerate(local_ids):
            pg_box[pid, 6 * li : 6 * li + 3] = bvh.node_lo[old]
            pg_box[pid, 6 * li + 3 : 6 * li + 6] = bvh.node_hi[old]
            if inner[old]:
                lc = lmap[int(child[old])]
                pg_meta[pid, 2 * li] = u((lc << 9) | (int(bvh.axis[old]) & 3))
                pg_meta[pid, 2 * li + 1] = int(bvh.first_node[old]) & 1
            else:
                c = int(count[old])
                pg_meta[pid, 2 * li] = u(c << 2)
                pg_meta[pid, 2 * li + 1] = int(child[old])  # global first tri

    return PagedLayout(
        top_meta=top_meta,
        top_box=top_box,
        pg_meta=pg_meta,
        pg_box=pg_box,
        page_cap=page_cap,
        n_top=n_top,
        n_pages=n_pages,
    )
