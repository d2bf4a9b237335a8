"""Hand-laid LMDB page images for authenticity testing.

Authentic liblmdb artifacts are unobtainable in this image (no py-lmdb, no
liblmdb source/binaries anywhere on disk, tensorflow's LMDB ops are removed
stubs, zero network egress — verified round 3). This module is the closest
available substitute: it lays out LMDB 0.9.x data files BYTE BY BYTE from
the mdb.c struct layout (MDB_meta / MDB_page / MDB_node), deliberately NOT
through `coclr_tpu.data.lmdb_format.LMDBWriter`, and deliberately
reproducing the messiness real multi-commit liblmdb files have that our
bulk writer never produces:

  - non-contiguous page allocation (root at a lower pgno than its children,
    gaps where freed pages hold stale garbage that must never be followed)
  - a live FREE_DBI freelist B+tree with entries (readers must ignore it)
  - a stale meta0 with an older txnid pointing at an old root whose leaf
    holds DIFFERENT values — readers must select the newer meta1
  - branch pages whose node 0 carries a REAL key (liblmdb retains it after
    splits; search must skip it, mdb.c mdb_node_search: low = IS_BRANCH ? 1)
  - DUPSORT / LEAF2 layouts, which readers must REJECT loudly

Reference contract exercised: dataset/lmdb_dataset.py:68-74 (readonly open +
get), convert_video_to_lmdb.py:50-57 (plain put-only databases).
"""

import struct

PAGEHDRSZ = 16
MAGIC = 0xBEEFC0DE
VERSION = 1
P_BRANCH, P_LEAF, P_OVERFLOW, P_META, P_LEAF2 = 0x01, 0x02, 0x04, 0x08, 0x20
F_BIGDATA, F_SUBDATA, F_DUPDATA = 0x01, 0x02, 0x04
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _even(n):
    return (n + 1) & ~1


def nodemax(psize):
    return ((psize - PAGEHDRSZ) // 2) & ~1


def leaf_page(psize, pgno, items, node_flags=None, page_flags=P_LEAF):
    """items: list of (key, value) for inline nodes, or
    (key, ('big', ovpgno, dsize)) for overflow references.
    Nodes are packed top-down from the page end (mdb_node_add order)."""
    buf = bytearray(psize)
    n = len(items)
    upper = psize
    ptrs = []
    rendered = []
    for i, (key, val) in enumerate(items):
        nfl = (node_flags or {}).get(i, 0)
        if isinstance(val, tuple) and val[0] == "big":
            _, ovpgno, dsize = val
            payload = struct.pack("<Q", ovpgno)
            nfl |= F_BIGDATA
        else:
            payload = val
            dsize = len(val)
        node = struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                           nfl, len(key)) + key + payload
        upper -= _even(len(node))
        ptrs.append(upper)
        rendered.append(node)
    lower = PAGEHDRSZ + 2 * n
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, page_flags, lower, upper)
    for i, (p, node) in enumerate(zip(ptrs, rendered)):
        struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, p)
        buf[p:p + len(node)] = node
    return bytes(buf)


def branch_page(psize, pgno, entries):
    """entries: list of (key, child_pgno); entry 0's key MAY be real bytes
    (kept, as liblmdb does) — search must never read it."""
    buf = bytearray(psize)
    n = len(entries)
    upper = psize
    ptrs = []
    rendered = []
    for key, child in entries:
        node = struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                           (child >> 32) & 0xFFFF, len(key)) + key
        upper -= _even(len(node))
        ptrs.append(upper)
        rendered.append(node)
    lower = PAGEHDRSZ + 2 * n
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_BRANCH, lower, upper)
    for i, (p, node) in enumerate(zip(ptrs, rendered)):
        struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, p)
        buf[p:p + len(node)] = node
    return bytes(buf)


def overflow_pages(psize, pgno, value):
    """P_OVERFLOW run: header with pb_pages = OVPAGES(len, psize)."""
    npg = (len(value) + PAGEHDRSZ - 1) // psize + 1
    buf = bytearray(npg * psize)
    struct.pack_into("<QHHI", buf, 0, pgno, 0, P_OVERFLOW, npg)
    buf[PAGEHDRSZ:PAGEHDRSZ + len(value)] = value
    return bytes(buf), npg


def meta_page(psize, pgno, txnid, *, root, depth, branch, leaf, ovf, entries,
              last_pg, free_root=P_INVALID, free_depth=0, free_leaf=0,
              free_entries=0, mapsize=None):
    buf = bytearray(psize)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
    fmt = "<IIQQ" + "IHHQQQQQ" * 2 + "QQ"
    free_db = (psize, 0, free_depth, 0, free_leaf, 0, free_entries, free_root)
    main_db = (0, 0, depth, branch, leaf, ovf, entries, root)
    struct.pack_into(fmt, buf, PAGEHDRSZ, MAGIC, VERSION, 0,
                     mapsize or max((last_pg + 1) * psize, 1 << 20),
                     *free_db, *main_db, last_pg, txnid)
    return bytes(buf)


def assemble(path, psize, pages, n_pages, filler=b"\xaa"):
    """Write the file: `pages` maps pgno -> page image (multi-page images
    occupy consecutive pgnos); everything else is garbage filler, standing
    in for freed pages whose stale bytes must never be interpreted."""
    img = bytearray(filler * (n_pages * psize // len(filler) + 1))[
        :n_pages * psize]
    for pgno, page in pages.items():
        img[pgno * psize:pgno * psize + len(page)] = page
    with open(path, "wb") as f:
        f.write(img)
    return path


def freelist_leaf(psize, pgno, txn_to_pages):
    """A FREE_DBI leaf as liblmdb lays it out: key = native txnid_t (8B),
    value = MDB_IDL (count-prefixed pgno array). Opaque to data readers —
    present so fixtures carry a live freelist like real files do."""
    items = []
    for txnid, pgnos in sorted(txn_to_pages.items()):
        key = struct.pack("<Q", txnid)
        val = struct.pack("<Q", len(pgnos)) + b"".join(
            struct.pack("<Q", p) for p in pgnos)
        items.append((key, val))
    return leaf_page(psize, pgno, items)


def messy_fixture(path, psize=4096):
    """A file shaped like a real multi-commit liblmdb env.

    Layout (pgno: content):
      0: meta0  txnid=3, OLD root -> old leaf at pg 2 (stale values!)
      1: meta1  txnid=4, live root -> branch at pg 5, freelist at pg 3
      2: OLD leaf (reachable only via stale meta0; holds different values)
      3: freelist leaf with entries (txn 4 freed pages 2 and 4)
      4: garbage (a freed page)
      5: live root BRANCH — node 0 has a REAL key; children 6, 9, 10
         (child pgnos both above and below the root)
      6: leaf A (keys a*)
      7-8: overflow run for one big value in leaf B
      9: leaf B (keys b*, one F_BIGDATA node -> pg 7)
      10: leaf C (keys c*)

    Returns (path, expected: dict key->value, stale: dict key->value).
    """
    big_val = bytes((i * 7 + 3) % 251 for i in range(psize + 100))
    leaf_a = [(b"a01", b"alpha-1"), (b"a02", b"alpha-2"), (b"a07", b"alpha-7")]
    leaf_b = [(b"b01", b"beta-1"), (b"b05", ("big", 7, len(big_val))),
              (b"b09", b"beta-9")]
    leaf_c = [(b"c03", b"gamma-3"), (b"c04", b"gamma-4")]
    stale = {b"a01": b"STALE-old-value", b"zz": b"STALE-gone"}

    ov, npg = overflow_pages(psize, 7, big_val)
    assert npg == 2
    pages = {
        2: leaf_page(psize, 2, sorted(stale.items())),
        3: freelist_leaf(psize, 3, {4: [2, 4]}),
        5: branch_page(psize, 5, [(b"a01", 6), (b"b01", 9), (b"c03", 10)]),
        6: leaf_page(psize, 6, leaf_a),
        7: ov,
        9: leaf_page(psize, 9, leaf_b),
        10: leaf_page(psize, 10, leaf_c),
    }
    entries = len(leaf_a) + len(leaf_b) + len(leaf_c)
    pages[0] = meta_page(psize, 0, 3, root=2, depth=1, branch=0, leaf=1,
                         ovf=0, entries=len(stale), last_pg=10)
    pages[1] = meta_page(psize, 1, 4, root=5, depth=2, branch=1, leaf=3,
                         ovf=2, entries=entries, last_pg=10,
                         free_root=3, free_depth=1, free_leaf=1,
                         free_entries=1)
    assemble(path, psize, pages, 11)
    expected = dict(leaf_a + leaf_c)
    expected[b"b01"] = b"beta-1"
    expected[b"b05"] = big_val
    expected[b"b09"] = b"beta-9"
    return path, expected, stale


def deep_fixture(path, psize, n_keys=None):
    """A depth-3 tree at an arbitrary page size, with inline nodes sized
    exactly AT nodemax (largest legal inline) and one byte OVER (must be
    F_BIGDATA), child pages allocated in shuffled order.

    Returns (path, expected dict).
    """
    import random

    rnd = random.Random(psize)
    nm = nodemax(psize)
    # values sized so each leaf holds ~3 nodes
    val_len = (psize - PAGEHDRSZ) // 4 - 32
    val_len = min(val_len, nm - 8 - 8)  # keep inline
    n_leaves = 9
    keys_per_leaf = 3
    expected = {}
    leaves = []
    for li in range(n_leaves):
        items = []
        for ki in range(keys_per_leaf):
            key = b"k%03d-%03d" % (li, ki)
            val = bytes((li * 31 + ki * 7 + j) % 256 for j in range(val_len))
            items.append((key, val))
            expected[key] = val
        leaves.append(items)

    # boundary nodes in the LAST leaf: inline at exactly nodemax, and
    # bigdata one byte over
    k_edge, k_over = b"x-edge", b"x-over"
    v_edge = bytes(range(256)) * 64
    v_edge = (v_edge * ((nm // len(v_edge)) + 1))[:nm - 8 - len(k_edge)]
    assert 8 + len(k_edge) + len(v_edge) == nm
    v_over = bytes(reversed(v_edge)) + b"!"
    boundary = [(k_edge, v_edge), (k_over, None)]  # over filled below
    expected[k_edge] = v_edge
    expected[k_over] = v_over

    # page allocation: shuffled among pgnos 2.., overflow run contiguous
    n_branch_l1 = 3
    total_tree = n_leaves + 1 + n_branch_l1 + 1 + 1  # +boundary leaf +root
    pgnos = list(range(2, 2 + total_tree))
    rnd.shuffle(pgnos)
    it = iter(pgnos)
    leaf_pgs = [next(it) for _ in range(n_leaves)]
    bleaf_pg = next(it)
    l1_pgs = [next(it) for _ in range(n_branch_l1)]
    root_pg = next(it)
    ov_pg = 2 + total_tree
    n_ov = (len(v_over) + PAGEHDRSZ - 1) // psize + 1

    pages = {}
    for items, pg in zip(leaves, leaf_pgs):
        pages[pg] = leaf_page(psize, pg, items)
    ov_img, npg = overflow_pages(psize, ov_pg, v_over)
    assert npg == n_ov
    pages[ov_pg] = ov_img
    pages[bleaf_pg] = leaf_page(
        psize, bleaf_pg,
        [(k_edge, v_edge), (k_over, ("big", ov_pg, len(v_over)))])

    # level-1 branches over (leaves + boundary leaf), 10 children / 3-3-4
    children = [(leaves[i][0][0], leaf_pgs[i]) for i in range(n_leaves)]
    children.append((k_edge, bleaf_pg))
    split = [children[0:3], children[3:6], children[6:10]]
    for grp, pg in zip(split, l1_pgs):
        pages[pg] = branch_page(psize, pg, grp)
    pages[root_pg] = branch_page(
        psize, root_pg, [(grp[0][0], pg) for grp, pg in zip(split, l1_pgs)])

    last_pg = ov_pg + n_ov - 1
    pages[0] = meta_page(psize, 0, 0, root=P_INVALID, depth=0, branch=0,
                         leaf=0, ovf=0, entries=0, last_pg=last_pg)
    pages[1] = meta_page(psize, 1, 7, root=root_pg, depth=3,
                         branch=1 + n_branch_l1, leaf=n_leaves + 1,
                         ovf=n_ov, entries=len(expected), last_pg=last_pg)
    assemble(path, psize, pages, last_pg + 1)
    return path, expected
