"""S5 ``LMDBDataSet`` source: pure-Python LMDB file format + Spark scan.

The reference trains recognizers out of LMDB environments
(``ppocr/data/lmdb_dataset.py:27-160``): every LEAF directory under
``data_dir`` is one environment; ``num-samples`` holds the sample count;
sample ``i`` (1-based — ``dataset_traversal`` adds 1,
lmdb_dataset.py:88-91) lives under ``label-%09d`` / ``image-%09d``; a
missing label skips the sample (``get_lmdb_sample_info`` → None).

This module implements the LMDB **data.mdb file format itself** from the
public LMDB specification (lmdb.h / mdb.c, OpenLDAP, BSD-licensed — the
struct layouts below are public knowledge; no LMDB code is copied):

* 4096-byte pages; 16-byte page header ``(pgno u64, pad u16, flags u16,
  lower u16, upper u16)``; flags BRANCH=0x01 LEAF=0x02 OVERFLOW=0x04
  META=0x08.
* meta pages 0 and 1: ``MDB_meta`` at page offset 16 — magic 0xBEEFC0DE,
  version 1, address, mapsize, two 48-byte ``MDB_db`` slots (the FREE
  db's ``md_pad`` doubles as the env page size), last_pg, txnid.  A
  reader picks the valid meta with the larger txnid.
* nodes: 8-byte header ``(lo u16, hi u16, flags u16, ksize u16)``; on a
  LEAF, lo|hi<<16 is the data size and F_BIGDATA=0x01 means the node
  body carries the u64 pgno of a contiguous overflow chain; on a
  BRANCH, lo|hi<<16|flags<<32 is the child pgno and node 0's key is
  ignored (-inf).  Node slots are even-sized; a value larger than
  nodemax ``((psize-16)/2) & ~1 = 2040`` goes to overflow pages.

``write_mdb`` is bulk-load-style test/fixture scaffolding (sorted keys,
packed leaves, single committed txn in meta page 1); ``MdbFile`` is the
read path the Spark source uses.  ``lmdb_shim`` mimics the tiny slice of
the ``lmdb`` package API the reference touches, so
tests/test_reference_exec.py can execute the reference's OWN
``LMDBDataSet`` discovery/traversal/key logic against our files.

Scale shape: ``read_lmdb_dataset`` lists environments driver-side (one
bounded meta read per env — the same bounded-driver-list contract as
lineage.py), then fans the 1-based index ranges out as a DataFrame;
every executor mmaps only the environments its rows touch and walks
O(log n) B+tree pages per key.  That is exactly LMDB's intended
shared-storage multi-reader deployment, so the scan parallelizes with
no shuffle and no driver materialization of sample data.
"""

from __future__ import annotations

import os
import struct

PAGESIZE = 4096
PAGEHDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
MDB_MAGIC = 0xBEEFC0DE
MDB_VERSION = 1
P_INVALID = 0xFFFFFFFFFFFFFFFF
NODESZ = 8
NODEMAX = ((PAGESIZE - PAGEHDRSZ) // 2) & ~1          # 2040


def _even(n: int) -> int:
    return (n + 1) & ~1


# ---------------------------------------------------------------------------
# struct packing
# ---------------------------------------------------------------------------

_PAGEHDR = struct.Struct("<QHHHH")        # pgno, pad, flags, lower, upper
_OVHDR = struct.Struct("<QHHI")           # pgno, pad, flags, pb_pages
_NODEHDR = struct.Struct("<HHHH")         # lo, hi, flags, ksize
_DB = struct.Struct("<IHHQQQQQ")          # pad, flags, depth, branch, leaf,
                                          # overflow, entries, root
_META = struct.Struct("<IIQQ")            # magic, version, address, mapsize


def _pack_db(pad=0, flags=0, depth=0, branch=0, leaf=0, overflow=0,
             entries=0, root=P_INVALID) -> bytes:
    return _DB.pack(pad, flags, depth, branch, leaf, overflow, entries, root)


def _meta_page(pgno: int, txnid: int, main_db: bytes, last_pg: int,
               mapsize: int) -> bytes:
    page = bytearray(PAGESIZE)
    _PAGEHDR.pack_into(page, 0, pgno, 0, P_META, 0, 0)
    body = (_META.pack(MDB_MAGIC, MDB_VERSION, 0, mapsize)
            + _pack_db(pad=PAGESIZE)      # FREE db; md_pad = env psize
            + main_db
            + struct.pack("<QQ", last_pg, txnid))
    page[PAGEHDRSZ:PAGEHDRSZ + len(body)] = body
    return bytes(page)


class _PageBuilder:
    """Packs nodes into one branch/leaf page image."""

    def __init__(self, pgno: int, flags: int):
        self.pgno, self.flags = pgno, flags
        self.nodes: list[bytes] = []
        self.used = 0                      # ptr slots + node bytes

    def fits(self, node_bytes: int) -> bool:
        return (PAGEHDRSZ + self.used + 2 + _even(node_bytes)) <= PAGESIZE

    def add(self, node: bytes) -> None:
        self.nodes.append(node)
        self.used += 2 + _even(len(node))

    def render(self) -> bytes:
        page = bytearray(PAGESIZE)
        upper = PAGESIZE
        ptrs = []
        for node in self.nodes:
            upper -= _even(len(node))
            page[upper:upper + len(node)] = node
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(ptrs)
        _PAGEHDR.pack_into(page, 0, self.pgno, 0, self.flags, lower, upper)
        page[PAGEHDRSZ:lower] = struct.pack(f"<{len(ptrs)}H", *ptrs)
        return bytes(page)


def _leaf_node(key: bytes, data: bytes, big_pgno: int | None) -> bytes:
    if big_pgno is None:
        return (_NODEHDR.pack(len(data) & 0xFFFF, len(data) >> 16, 0,
                              len(key)) + key + data)
    return (_NODEHDR.pack(len(data) & 0xFFFF, len(data) >> 16, F_BIGDATA,
                          len(key)) + key + struct.pack("<Q", big_pgno))


def _branch_node(key: bytes, child: int) -> bytes:
    return (_NODEHDR.pack(child & 0xFFFF, (child >> 16) & 0xFFFF,
                          (child >> 32) & 0xFFFF, len(key)) + key)


def write_mdb(dirpath: str, items: dict[bytes, bytes]) -> str:
    """Write ``dirpath/data.mdb`` holding ``items`` as one committed txn.

    Bulk-load layout: meta pages 0 (genesis, txnid 0, empty root) and 1
    (txnid 1, the real root), then overflow chains, packed leaves, and
    branch levels bottom-up.  Returns the data.mdb path.
    """
    os.makedirs(dirpath, exist_ok=True)
    kvs = sorted(items.items())
    pages: dict[int, bytes] = {}
    next_pg = 2

    # overflow chains first (so leaf nodes know their pgnos)
    ov_pgno: dict[bytes, int] = {}
    n_ov = 0
    for k, v in kvs:
        if NODESZ + len(k) + len(v) > NODEMAX:
            npages = (len(v) + PAGEHDRSZ + PAGESIZE - 1) // PAGESIZE
            first = next_pg
            chain = bytearray(npages * PAGESIZE)
            _OVHDR.pack_into(chain, 0, first, 0, P_OVERFLOW, npages)
            chain[PAGEHDRSZ:PAGEHDRSZ + len(v)] = v
            for i in range(npages):
                pages[first + i] = bytes(chain[i * PAGESIZE:
                                               (i + 1) * PAGESIZE])
            ov_pgno[k] = first
            next_pg += npages
            n_ov += npages

    # leaves
    leaves: list[tuple[bytes, int]] = []   # (first key, pgno)
    builder: _PageBuilder | None = None
    for k, v in kvs:
        big = ov_pgno.get(k)
        node = _leaf_node(k, v, big)
        if builder is None or not builder.fits(len(node)):
            if builder is not None:
                pages[builder.pgno] = builder.render()
            builder = _PageBuilder(next_pg, P_LEAF)
            leaves.append((k, next_pg))
            next_pg += 1
        builder.add(node)
    if builder is not None:
        pages[builder.pgno] = builder.render()

    # branch levels bottom-up until a single root
    depth, n_branch = (1, 0) if leaves else (0, 0)
    level = leaves
    while len(level) > 1:
        nxt: list[tuple[bytes, int]] = []
        builder = None
        for i, (k, pgno) in enumerate(level):
            key = b"" if builder is None else k
            node = _branch_node(key, pgno)
            if builder is not None and not builder.fits(len(node)):
                pages[builder.pgno] = builder.render()
                builder = None
                node = _branch_node(b"", pgno)
            if builder is None:
                builder = _PageBuilder(next_pg, P_BRANCH)
                nxt.append((k, next_pg))
                next_pg += 1
            builder.add(node)
        pages[builder.pgno] = builder.render()
        level = nxt
        n_branch += len(nxt)
        depth += 1

    root = level[0][1] if level else P_INVALID
    last_pg = next_pg - 1
    mapsize = max(10 * 1024 * 1024, (last_pg + 1) * PAGESIZE)
    main = _pack_db(depth=depth, branch=n_branch, leaf=len(leaves),
                    overflow=n_ov, entries=len(kvs), root=root)
    empty = _pack_db()

    path = os.path.join(dirpath, "data.mdb")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(_meta_page(0, 0, empty, 1, mapsize))
        fh.write(_meta_page(1, 1, main, last_pg, mapsize))
        for pg in range(2, next_pg):
            fh.write(pages[pg])
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------

class MdbFile:
    """Read-only LMDB environment over ``<dir>/data.mdb`` (or a direct
    file path).  Thread-compatible: every call re-slices the mmap."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._fh = open(path, "rb")
        import mmap
        self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        best = None
        for pg in (0, 1):
            off = pg * PAGESIZE + PAGEHDRSZ
            magic, version, _addr, _maps = _META.unpack_from(self._mm, off)
            if magic != MDB_MAGIC or version != MDB_VERSION:
                continue
            main = _DB.unpack_from(self._mm, off + _META.size + _DB.size)
            last_pg, txnid = struct.unpack_from(
                "<QQ", self._mm, off + _META.size + 2 * _DB.size)
            if best is None or txnid > best[0]:
                best = (txnid, main, last_pg)
        if best is None:
            raise ValueError(f"not an LMDB data file: {path}")
        self._main = best[1]
        self.entries = self._main[6]
        self.root = self._main[7]

    def close(self) -> None:
        self._mm.close()
        self._fh.close()

    def _page(self, pgno: int) -> tuple[int, int, int, int]:
        _pg, _pad, flags, lower, upper = _PAGEHDR.unpack_from(
            self._mm, pgno * PAGESIZE)
        return flags, lower, upper, pgno * PAGESIZE

    def _node(self, base: int, ptr: int) -> tuple[int, int, int, bytes, int]:
        lo, hi, flags, ksize = _NODEHDR.unpack_from(self._mm, base + ptr)
        key = bytes(self._mm[base + ptr + NODESZ:
                             base + ptr + NODESZ + ksize])
        return lo, hi, flags, key, base + ptr + NODESZ + ksize

    def _nkeys(self, lower: int) -> int:
        return (lower - PAGEHDRSZ) >> 1

    def _ptr(self, base: int, i: int) -> int:
        return struct.unpack_from("<H", self._mm, base + PAGEHDRSZ + 2 * i)[0]

    def _leaf_value(self, lo: int, hi: int, flags: int, doff: int) -> bytes:
        dsize = lo | (hi << 16)
        if flags & F_BIGDATA:
            ovpg = struct.unpack_from("<Q", self._mm, doff)[0]
            start = ovpg * PAGESIZE + PAGEHDRSZ
            return bytes(self._mm[start:start + dsize])
        return bytes(self._mm[doff:doff + dsize])

    def get(self, key: bytes) -> bytes | None:
        if self.root == P_INVALID:
            return None
        pgno = self.root
        while True:
            flags, lower, upper, base = self._page(pgno)
            n = self._nkeys(lower)
            if flags & P_BRANCH:
                # node 0's key is -inf; pick last child whose key <= target
                lot, hit = 1, n - 1
                child_i = 0
                while lot <= hit:
                    mid = (lot + hit) // 2
                    lo, hi, nfl, k, _ = self._node(base, self._ptr(base, mid))
                    if k <= key:
                        child_i, lot = mid, mid + 1
                    else:
                        hit = mid - 1
                lo, hi, nfl, _k, _ = self._node(
                    base, self._ptr(base, child_i))
                pgno = lo | (hi << 16) | (nfl << 32)
            elif flags & P_LEAF:
                lot, hit = 0, n - 1
                while lot <= hit:
                    mid = (lot + hit) // 2
                    lo, hi, nfl, k, doff = self._node(
                        base, self._ptr(base, mid))
                    if k == key:
                        return self._leaf_value(lo, hi, nfl, doff)
                    if k < key:
                        lot = mid + 1
                    else:
                        hit = mid - 1
                return None
            else:
                raise ValueError(f"unexpected page flags 0x{flags:x}")

    def items(self):
        """In-order (key-sorted) traversal of every entry."""
        if self.root == P_INVALID:
            return
        stack = [(self.root, 0)]
        while stack:
            pgno, i = stack.pop()
            flags, lower, upper, base = self._page(pgno)
            n = self._nkeys(lower)
            if flags & P_BRANCH:
                if i + 1 < n:
                    stack.append((pgno, i + 1))
                lo, hi, nfl, _k, _ = self._node(base, self._ptr(base, i))
                stack.append((lo | (hi << 16) | (nfl << 32), 0))
            else:
                for j in range(n):
                    lo, hi, nfl, k, doff = self._node(base, self._ptr(base, j))
                    yield k, self._leaf_value(lo, hi, nfl, doff)


# ---------------------------------------------------------------------------
# lmdb-package API shim (exactly the slice LMDBDataSet touches)
# ---------------------------------------------------------------------------

class _Txn:
    def __init__(self, mdb: MdbFile):
        self._mdb = mdb

    def get(self, key: bytes):
        return self._mdb.get(key)

    def stat(self):
        return {"entries": self._mdb.entries}


class _Env:
    def __init__(self, path: str):
        self._mdb = MdbFile(path)

    def begin(self, write: bool = False):
        return _Txn(self._mdb)

    def close(self):
        self._mdb.close()


class lmdb_shim:
    """Stands in for ``import lmdb`` when executing the reference's
    LMDBDataSet against our environments (kwargs like max_readers /
    readonly / lock are accepted and ignored — read-only by design)."""

    @staticmethod
    def open(path: str, **_kw) -> _Env:
        return _Env(path)


# ---------------------------------------------------------------------------
# reference dataset semantics over Spark
# ---------------------------------------------------------------------------

def discover_envs(data_dir: str) -> list[tuple[int, str, int]]:
    """Hierarchical env discovery (lmdb_dataset.py:50-68): every leaf
    directory is an environment; returns (lmdb_idx, dirpath,
    num_samples).  The reference walks in os.walk order, which is
    filesystem-dependent; we pin lexicographic order for determinism."""
    out = []
    idx = 0
    for dirpath, dirnames, _files in sorted(os.walk(data_dir + "/")):
        dirnames.sort()
        if not dirnames:
            mdb = MdbFile(dirpath)
            num = int(mdb.get(b"num-samples"))
            mdb.close()
            out.append((idx, dirpath.rstrip("/"), num))
            idx += 1
    return out


def read_lmdb_dataset(spark, data_dir: str):
    """S4-shape DataFrame over hierarchical LMDB envs: (lmdb_idx,
    file_idx, label, image).  file_idx is 1-based (dataset_traversal's
    +1); samples with a missing label drop out (get_lmdb_sample_info →
    None — the reference resamples randomly; relationally the row just
    disappears)."""
    import pandas as pd
    from pyspark.sql import functions as F

    envs = discover_envs(data_dir)
    env_df = spark.createDataFrame(
        [(i, p, n) for i, p, n in envs],
        "lmdb_idx int, dirpath string, num_samples int")
    idx = env_df.select(
        "lmdb_idx", "dirpath",
        F.explode(F.sequence(F.lit(1), F.col("num_samples")))
        .alias("file_idx"))
    # spread each env's index range across the cluster before the fetch
    idx = idx.repartition(max(spark.sparkContext.defaultParallelism, 2),
                          "lmdb_idx", "file_idx")

    def fetch(batches):
        open_envs: dict[str, MdbFile] = {}
        try:
            for pdf in batches:
                rows = []
                for lmdb_idx, dirpath, file_idx in zip(
                        pdf["lmdb_idx"], pdf["dirpath"], pdf["file_idx"]):
                    mdb = open_envs.get(dirpath)
                    if mdb is None:
                        mdb = open_envs[dirpath] = MdbFile(dirpath)
                    label = mdb.get(b"label-%09d" % file_idx)
                    if label is None:
                        continue
                    img = mdb.get(b"image-%09d" % file_idx)
                    rows.append((int(lmdb_idx), int(file_idx),
                                 label.decode("utf-8"), img))
                yield pd.DataFrame(
                    rows, columns=["lmdb_idx", "file_idx", "label", "image"])
        finally:
            for mdb in open_envs.values():
                mdb.close()

    return idx.mapInPandas(
        fetch, schema="lmdb_idx int, file_idx int, label string, image binary")
