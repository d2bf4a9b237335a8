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
P_LEAF2 = 0x20   # MDB_DUPFIXED sub-layout — never produced by the reference

F_BIGDATA = 0x01
F_SUBDATA = 0x02  # DUPSORT sub-database node
F_DUPDATA = 0x04  # DUPSORT duplicate-list node

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
        # meta0 is at offset 0; meta1 at psize, which meta0 tells us
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
        if fl & (F_SUBDATA | F_DUPDATA):
            # loud failure beats silent misparse: a DUPSORT database stores
            # sub-pages/sub-trees in the data area, which this reader (like
            # the reference's datasets, plain MDB_create puts only —
            # convert_video_to_lmdb.py:50-57) never needs
            raise ValueError(
                f"{self.path}: DUPSORT node (flags {fl:#x}) — not a "
                "reference-style dataset; this reader supports plain "
                "key/value databases only")
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
                if flags & P_LEAF2:
                    raise ValueError(
                        f"{self.path}: LEAF2 (MDB_DUPFIXED) page — not a "
                        "reference-style dataset")
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
                if flags & P_LEAF2:
                    raise ValueError(
                        f"{self.path}: LEAF2 (MDB_DUPFIXED) page — not a "
                        "reference-style dataset")
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
    """Accumulates branch nodes (key -> child pgno) into one page image."""

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
        for i, ((key, _payload, child), ptr) in enumerate(zip(self.nodes, ptrs)):
            struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, ptr)
            # branch node: child pgno split across lo | hi<<16 | flags<<32
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


class LMDBWriter:
    """Streaming bulk writer. `add(key, value)` must be called in strictly
    increasing key order (memcmp); pages are flushed to disk as they fill, so
    memory stays O(#leaf pages) (branch separators only) no matter how large
    the dataset is. `close()` builds the branch levels and both meta pages.
    """

    def __init__(self, path: str, psize: int = 4096,
                 subdir: Optional[bool] = None):
        if subdir is None:
            # reference converter: lmdb.open(path, subdir=os.path.isdir(path))
            # (convert_video_to_lmdb.py:48-50) -> fresh paths are plain files
            subdir = os.path.isdir(path)
        if subdir:
            os.makedirs(path, exist_ok=True)
            self.out = os.path.join(path, "data.mdb")
        else:
            parent = os.path.dirname(os.path.abspath(path))
            os.makedirs(parent, exist_ok=True)
            self.out = path
        self.psize = psize
        self.nodemax = _nodemax(psize)
        self._f = open(self.out, "wb")
        self._f.write(b"\0" * (2 * psize))  # meta placeholders
        self._next_pg = 2
        self._leaf: List[Tuple[bytes, bytes, int, int]] = []
        self._leaf_used = 0
        self._leaf_index: List[Tuple[int, bytes]] = []  # (pgno, first key)
        self._last_key: Optional[bytes] = None
        self.n_leaf = self.n_branch = self.n_overflow = 0
        self.entries = 0

    def _alloc(self, n: int) -> int:
        pg = self._next_pg
        self._next_pg += n
        return pg

    def _write_page_at(self, pgno: int, img: bytes):
        self._f.seek(pgno * self.psize)
        self._f.write(img)

    def _flush_leaf(self):
        if not self._leaf:
            return
        pgno = self._alloc(1)
        self._write_page_at(pgno, _render_leaf(self.psize, pgno, self._leaf))
        self._leaf_index.append((pgno, self._leaf[0][0]))
        self.n_leaf += 1
        self._leaf = []
        self._leaf_used = 0

    def add(self, key: bytes, value: bytes):
        if len(key) > 511:
            raise ValueError("key longer than LMDB maxkeysize (511)")
        if self._last_key is not None and key <= self._last_key:
            raise ValueError("keys must be added in strictly increasing order")
        self._last_key = key

        big = 8 + len(key) + len(value) > self.nodemax
        payload_len = 8 if big else len(value)
        need = _align2(8 + len(key) + payload_len) + 2
        if PAGEHDRSZ + self._leaf_used + need > self.psize and self._leaf:
            self._flush_leaf()

        if big:
            # OVPAGES(size, psize) = ((size + PAGEHDRSZ - 1) / psize) + 1
            npg = (len(value) + PAGEHDRSZ - 1) // self.psize + 1
            ovpgno = self._alloc(npg)
            blob = bytearray(npg * self.psize)
            struct.pack_into("<QHHI", blob, 0, ovpgno, 0, P_OVERFLOW, npg)
            blob[PAGEHDRSZ: PAGEHDRSZ + len(value)] = value
            self._write_page_at(ovpgno, bytes(blob))
            self.n_overflow += npg
            self._leaf.append((key, struct.pack("<Q", ovpgno), F_BIGDATA,
                               len(value)))
        else:
            self._leaf.append((key, value, 0, len(value)))
        self._leaf_used += need
        self.entries += 1

    def close(self):
        self._flush_leaf()
        level = self._leaf_index
        depth = 1
        while len(level) > 1:
            next_level = []
            i = 0
            while i < len(level):
                pb = _PageBuilder(self.psize, P_BRANCH)
                first_sep = level[i][1]
                while i < len(level):
                    child_pgno, sep = level[i]
                    key = b"" if not pb.nodes else sep
                    if not pb.fits(key, b""):
                        break
                    pb.add(key, b"", nflags=child_pgno)
                    i += 1
                pgno = self._alloc(1)
                self._write_page_at(pgno, pb.render(pgno))
                self.n_branch += 1
                next_level.append((pgno, first_sep))
            level = next_level
            depth += 1

        if self.entries:
            root = level[0][0]
        else:
            root, depth = P_INVALID, 0

        last_pg = self._next_pg - 1
        mapsize = max((last_pg + 1) * self.psize, 1 << 20)

        def meta_page(pgno: int, txnid: int) -> bytes:
            buf = bytearray(self.psize)
            struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
            free_db = (self.psize, 0, 0, 0, 0, 0, 0, P_INVALID)
            main_db = (0, 0, depth, self.n_branch, self.n_leaf,
                       self.n_overflow, self.entries, root)
            _META.pack_into(buf, PAGEHDRSZ, MAGIC, DATA_VERSION, 0, mapsize,
                            *free_db, *main_db, last_pg, txnid)
            return bytes(buf)

        self._write_page_at(0, meta_page(0, 1))
        self._write_page_at(1, meta_page(1, 0))
        self._f.close()
        return self.out

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_lmdb(path: str, items: Iterable[Tuple[bytes, bytes]],
               psize: int = 4096, subdir: Optional[bool] = None) -> str:
    """Write a read-optimized LMDB data file containing `items` (sorted here).
    Returns the data file path."""
    w = LMDBWriter(path, psize=psize, subdir=subdir)
    for k, v in sorted(items, key=lambda kv: kv[0]):
        w.add(k, v)
    return w.close()
