"""LMDB file format, from scratch (no liblmdb dependency).

The reference's datasets live in LMDB files written by py-lmdb 0.98 / liblmdb
0.9.x (/root/reference/dataset/convert_video_to_lmdb.py,
dataset/lmdb_dataset.py:68-74). This image ships neither python-lmdb nor
liblmdb, so this module implements the on-disk format directly:

  - `LMDBReader`: mmap-based read-only access (get / items / len) to any
    liblmdb 0.9.x data file (the only thing the reference ever does at train
    time: `readonly=True, lock=False`).
  - `write_lmdb`: a bulk writer for write-once datasets. It builds the B+tree
    bottom-up over sorted keys — exactly the shape liblmdb produces for an
    append-only load — and emits both meta pages. Files round-trip through
    LMDBReader and follow the same page/node layout rules (overflow pages for
    values larger than nodemax, nodes packed from the page top downward).

Format facts encoded here (from the LMDB 0.9 on-disk layout):
  page header: pgno u64 | pad u16 | flags u16 | (lower u16, upper u16 | pages u32)
  meta (after header on pages 0/1): magic 0xBEEFC0DE, version 1, address,
  mapsize, dbs[2] (FREE: md_pad holds the page size), last_pg, txnid
  node: lo u16 | hi u16 | flags u16 | ksize u16 | key | data
    leaf datasize = lo | hi<<16 ; branch child pgno = lo | hi<<16 | flags<<32
    F_BIGDATA(0x01): data is a u64 overflow pgno; value lives on P_OVERFLOW
    pages, contiguous, `pages` of them.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Iterable, Iterator, List, Optional, Tuple

MAGIC = 0xBEEFC0DE
DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08

F_BIGDATA = 0x01

PAGEHDRSZ = 16
P_INVALID = 0xFFFFFFFFFFFFFFFF

_META = struct.Struct("<IIQQ" + "IHHQQQQQ" * 2 + "QQ")
_NODEHDR = struct.Struct("<HHHH")


def _nodemax(psize: int) -> int:
    # me_nodemax = ((psize - PAGEHDRSZ) / MDB_MINKEYS) & -2, MDB_MINKEYS = 2
    return ((psize - PAGEHDRSZ) // 2) & ~1


def resolve_db_file(path: str) -> str:
    """lmdb.open(path, subdir=os.path.isdir(path)) semantics."""
    if os.path.isdir(path):
        return os.path.join(path, "data.mdb")
    return path


class LMDBReader:
    """Read-only LMDB access over mmap. Thread-safe (stateless reads)."""

    def __init__(self, path: str):
        self.path = resolve_db_file(path)
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        meta = self._pick_meta()
        (self.psize, self.main_root, self.entries, self.depth,
         self.last_pg) = meta

    def _read_meta(self, pageno: int):
        mm = self._mm
        # page sizes are unknown before reading meta; metas sit at 0 and 4096
        # only if psize==4096. liblmdb reads meta0 at offset 0 and uses its
        # psize to find meta1; we do the same.
        off = pageno * (self._psize_guess if pageno else 4096)
        off = pageno * self._psize_guess
        vals = _META.unpack_from(mm, off + PAGEHDRSZ)
        magic, version = vals[0], vals[1]
        if magic != MAGIC or version != DATA_VERSION:
            return None
        # dbs[0] (FREE): pad flags depth branch leaf overflow entries root
        psize = vals[4]
        main = vals[12:20]  # pad flags depth branch leaf ovf entries root
        last_pg, txnid = vals[20], vals[21]
        return dict(psize=psize, depth=main[2], entries=main[6], root=main[7],
                    last_pg=last_pg, txnid=txnid)

    def _pick_meta(self):
        self._psize_guess = 4096
        m0 = self._read_meta(0)
        if m0 is None:
            raise ValueError(f"{self.path}: not an LMDB data file")
        self._psize_guess = m0["psize"]
        m1 = self._read_meta(1)
        metas = [m for m in (m0, m1) if m is not None]
        m = max(metas, key=lambda d: d["txnid"])
        return (m["psize"], m["root"], m["entries"], m["depth"], m["last_pg"])

    # -- page access ---------------------------------------------------------

    def _page(self, pgno: int) -> int:
        return pgno * self.psize

    def _page_flags(self, off: int) -> int:
        return struct.unpack_from("<H", self._mm, off + 10)[0]

    def _nkeys(self, off: int) -> int:
        lower = struct.unpack_from("<H", self._mm, off + 12)[0]
        return (lower - PAGEHDRSZ) >> 1

    def _node_off(self, off: int, i: int) -> int:
        ptr = struct.unpack_from("<H", self._mm, off + PAGEHDRSZ + 2 * i)[0]
        return off + ptr

    def _node(self, off: int, i: int):
        noff = self._node_off(off, i)
        lo, hi, fl, ksize = _NODEHDR.unpack_from(self._mm, noff)
        key = bytes(self._mm[noff + 8: noff + 8 + ksize])
        return lo, hi, fl, ksize, key, noff

    def _leaf_value(self, lo, hi, fl, ksize, noff) -> bytes:
        dsize = lo | (hi << 16)
        if fl & F_BIGDATA:
            ovpgno = struct.unpack_from("<Q", self._mm, noff + 8 + ksize)[0]
            ovoff = self._page(ovpgno)
            return bytes(self._mm[ovoff + PAGEHDRSZ: ovoff + PAGEHDRSZ + dsize])
        return bytes(self._mm[noff + 8 + ksize: noff + 8 + ksize + dsize])

    # -- public API ----------------------------------------------------------

    def get(self, key: bytes) -> Optional[bytes]:
        if self.main_root == P_INVALID:
            return None
        pgno = self.main_root
        while True:
            off = self._page(pgno)
            flags = self._page_flags(off)
            n = self._nkeys(off)
            if flags & P_BRANCH:
                # rightmost child whose (separator) key <= key; child 0 has
                # an implicit -inf key (ksize 0)
                lor, hir = 1, n - 1
                pick = 0
                while lor <= hir:
                    mid = (lor + hir) // 2
                    _, _, _, _, k, _ = self._node(off, mid)
                    if k <= key:
                        pick = mid
                        lor = mid + 1
                    else:
                        hir = mid - 1
                lo, hi, fl, _, _, _ = self._node(off, pick)
                pgno = lo | (hi << 16) | (fl << 32)
            elif flags & P_LEAF:
                lor, hir = 0, n - 1
                while lor <= hir:
                    mid = (lor + hir) // 2
                    lo, hi, fl, ksize, k, noff = self._node(off, mid)
                    if k == key:
                        return self._leaf_value(lo, hi, fl, ksize, noff)
                    if k < key:
                        lor = mid + 1
                    else:
                        hir = mid - 1
                return None
            else:
                raise ValueError(f"unexpected page flags {flags:#x}")

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        if self.main_root == P_INVALID:
            return
        stack = [(self.main_root, 0)]
        while stack:
            pgno, i = stack.pop()
            off = self._page(pgno)
            flags = self._page_flags(off)
            n = self._nkeys(off)
            if flags & P_BRANCH:
                if i + 1 < n:
                    stack.append((pgno, i + 1))
                lo, hi, fl, _, _, _ = self._node(off, i)
                stack.append((lo | (hi << 16) | (fl << 32), 0))
            else:
                for j in range(n):
                    lo, hi, fl, ksize, k, noff = self._node(off, j)
                    yield k, self._leaf_value(lo, hi, fl, ksize, noff)

    def keys(self) -> Iterator[bytes]:
        for k, _ in self.items():
            yield k

    def __len__(self) -> int:
        return self.entries

    def close(self):
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# bulk writer
# ---------------------------------------------------------------------------

def _align2(n: int) -> int:
    return (n + 1) & ~1


class _PageBuilder:
    """Accumulates (key, payload, flags) nodes into one page image."""

    def __init__(self, psize: int, flags: int):
        self.psize = psize
        self.flags = flags
        self.nodes: List[Tuple[bytes, bytes, int]] = []
        self.used = 0  # node bytes + ptr bytes

    def node_size(self, key: bytes, payload: bytes) -> int:
        return _align2(8 + len(key) + len(payload))

    def fits(self, key: bytes, payload: bytes) -> bool:
        need = self.node_size(key, payload) + 2
        return PAGEHDRSZ + self.used + need <= self.psize

    def add(self, key: bytes, payload: bytes, nflags: int = 0):
        self.nodes.append((key, payload, nflags))
        self.used += self.node_size(key, payload) + 2

    def render(self, pgno: int) -> bytes:
        buf = bytearray(self.psize)
        n = len(self.nodes)
        ptrs = []
        upper = self.psize
        # place nodes from the page end downward, like mdb_node_add
        for key, payload, _ in self.nodes:
            upper -= self.node_size(key, payload)
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * n
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, self.flags, lower, upper)
        for i, ((key, payload, nflags), ptr) in enumerate(zip(self.nodes, ptrs)):
            struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, ptr)
            if self.flags & P_LEAF:
                dsize = (len(payload) - 8 if nflags & F_BIGDATA else len(payload))
                # for BIGDATA payload = 8-byte pgno; dsize must carry the
                # *value* size, which the caller smuggles in via key ordering —
                # handled by caller passing dsize explicitly instead.
                raise AssertionError("leaf nodes rendered by _render_leaf")
            else:
                child = nflags  # branch: caller passes child pgno via nflags
                lo = child & 0xFFFF
                hi = (child >> 16) & 0xFFFF
                fl = (child >> 32) & 0xFFFF
                _NODEHDR.pack_into(buf, ptr, lo, hi, fl, len(key))
                buf[ptr + 8: ptr + 8 + len(key)] = key
        return bytes(buf)


def _render_leaf(psize: int, pgno: int,
                 nodes: List[Tuple[bytes, bytes, int, int]]) -> bytes:
    """nodes: (key, inline_payload, nflags, value_size)."""
    buf = bytearray(psize)
    n = len(nodes)
    upper = psize
    ptrs = []
    for key, payload, _, _ in nodes:
        upper -= _align2(8 + len(key) + len(payload))
        ptrs.append(upper)
    lower = PAGEHDRSZ + 2 * n
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_LEAF, lower, upper)
    for i, ((key, payload, nflags, vsize), ptr) in enumerate(zip(nodes, ptrs)):
        struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, ptr)
        lo = vsize & 0xFFFF
        hi = (vsize >> 16) & 0xFFFF
        _NODEHDR.pack_into(buf, ptr, lo, hi, nflags, len(key))
        buf[ptr + 8: ptr + 8 + len(key)] = key
        buf[ptr + 8 + len(key): ptr + 8 + len(key) + len(payload)] = payload
    return bytes(buf)


def write_lmdb(path: str, items: Iterable[Tuple[bytes, bytes]],
               psize: int = 4096, subdir: Optional[bool] = None) -> str:
    """Write a read-optimized LMDB data file containing `items`.

    Keys are sorted (memcmp order) as liblmdb requires. Returns the data file
    path. If `subdir` (default: path has no extension and exists as a dir or
    endswith '.lmdb' like the reference naming), writes path/data.mdb.
    """
    if subdir is None:
        subdir = not os.path.splitext(path)[1] or os.path.isdir(path)
    if subdir:
        os.makedirs(path, exist_ok=True)
        out = os.path.join(path, "data.mdb")
    else:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        out = path

    data = sorted(items, key=lambda kv: kv[0])
    for k, _ in data:
        if len(k) > 511:
            raise ValueError("key longer than LMDB maxkeysize (511)")

    nodemax = _nodemax(psize)
    pages: List[bytes] = []  # built data pages, pgno = 2 + index

    def alloc(n: int) -> int:
        pgno = 2 + len(pages)
        pages.extend([b""] * n)
        return pgno

    def put_page(pgno: int, img: bytes):
        pages[pgno - 2] = img

    # ---- leaves (+ overflow) ----
    leaf_specs: List[List[Tuple[bytes, bytes, int, int]]] = [[]]
    leaf_used = [0]
    n_overflow = 0
    overflow_jobs = []  # (key index in spec, leaf index, value)

    for key, value in data:
        if 8 + len(key) + len(value) > nodemax:
            payload_len = 8  # u64 overflow pgno, patched later
            nflags = F_BIGDATA
        else:
            payload_len = len(value)
            nflags = 0
        need = _align2(8 + len(key) + payload_len) + 2
        if PAGEHDRSZ + leaf_used[-1] + need > psize and leaf_specs[-1]:
            leaf_specs.append([])
            leaf_used.append(0)
        if nflags:
            # liblmdb: OVPAGES(size, psize) = ((size + PAGEHDRSZ - 1) / psize) + 1
            npg = (len(value) + PAGEHDRSZ - 1) // psize + 1
            overflow_jobs.append((len(leaf_specs) - 1, len(leaf_specs[-1]),
                                  value, npg))
            leaf_specs[-1].append((key, b"\0" * 8, nflags, len(value)))
        else:
            leaf_specs[-1].append((key, value, 0, len(value)))
        leaf_used[-1] += need

    # allocate leaf pages first (contiguous), then overflow pages
    leaf_pgnos = [alloc(1) for _ in leaf_specs]
    for li, ni, value, npg in overflow_jobs:
        ovpgno = alloc(npg)
        n_overflow += npg
        key, _, nflags, vsize = leaf_specs[li][ni]
        leaf_specs[li][ni] = (key, struct.pack("<Q", ovpgno), nflags, vsize)
        # overflow page images
        blob = bytearray(npg * psize)
        struct.pack_into("<QHHI", blob, 0, ovpgno, 0, P_OVERFLOW, npg)
        blob[PAGEHDRSZ: PAGEHDRSZ + len(value)] = value
        for j in range(npg):
            put_page(ovpgno + j, bytes(blob[j * psize: (j + 1) * psize]))

    for pgno, spec in zip(leaf_pgnos, leaf_specs):
        put_page(pgno, _render_leaf(psize, pgno, spec))

    n_leaf = len(leaf_pgnos)

    # ---- branches bottom-up ----
    level = [(leaf_pgnos[i], leaf_specs[i][0][0] if leaf_specs[i] else b"")
             for i in range(n_leaf)]
    depth = 1
    n_branch = 0
    while len(level) > 1:
        next_level = []
        i = 0
        while i < len(level):
            pb = _PageBuilder(psize, P_BRANCH)
            first_sep = level[i][1]
            while i < len(level):
                child_pgno, sep = level[i]
                key = b"" if not pb.nodes else sep
                if not pb.fits(key, b""):
                    break
                pb.add(key, b"", nflags=child_pgno)
                i += 1
            pgno = alloc(1)
            put_page(pgno, pb.render(pgno))
            n_branch += 1
            next_level.append((pgno, first_sep))
        level = next_level
        depth += 1

    if data:
        root = level[0][0]
    else:
        root = P_INVALID
        depth = 0

    last_pg = 1 + len(pages)
    mapsize = max((last_pg + 1) * psize, 1 << 20)

    def meta_page(pgno: int, txnid: int) -> bytes:
        buf = bytearray(psize)
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
        free_db = (psize, 0, 0, 0, 0, 0, 0, P_INVALID)
        main_db = (0, 0, depth, n_branch, n_leaf, n_overflow, len(data), root)
        _META.pack_into(buf, PAGEHDRSZ, MAGIC, DATA_VERSION, 0, mapsize,
                        *free_db, *main_db, last_pg, txnid)
        return bytes(buf)

    with open(out, "wb") as f:
        f.write(meta_page(0, 1))
        f.write(meta_page(1, 0))
        for img in pages:
            assert img, "unrendered page"
            f.write(img)
    return out
