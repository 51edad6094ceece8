"""S5 LMDB source: file-format structure, roundtrip, and distributed scan.

The container ships no ``lmdb`` package, so the format cannot be
differential-tested against the C library here; instead these tests pin
the on-disk layout to the PUBLIC lmdb.h/mdb.c struct constants
byte-for-byte (meta magic/version/psize offsets, page headers, node
headers, overflow chains), and the exec-reference differential
(tests/test_reference_exec.py) runs the reference's own LMDBDataSet over
our files through the API shim.
"""

from __future__ import annotations

import os
import random
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from paddleocr_spark.sources import lmdbfile as LF


def test_on_disk_layout_matches_lmdb_spec(tmp_path):
    p = LF.write_mdb(str(tmp_path / "e"), {b"k": b"v", b"big": b"x" * 5000})
    raw = open(p, "rb").read()
    assert len(raw) % LF.PAGESIZE == 0

    # meta page 0: pgno 0, P_META, magic/version at page offset 16
    assert struct.unpack_from("<Q", raw, 0)[0] == 0
    assert struct.unpack_from("<H", raw, 10)[0] == LF.P_META
    magic, version = struct.unpack_from("<II", raw, 16)
    assert magic == 0xBEEFC0DE and version == 1
    # FREE db's md_pad doubles as the env page size (mdb.c mm_psize)
    assert struct.unpack_from("<I", raw, 16 + 24)[0] == LF.PAGESIZE
    # genesis meta: txnid 0, main root P_INVALID
    db1 = struct.unpack_from("<IHHQQQQQ", raw, 16 + 24 + 48)
    assert db1[7] == LF.P_INVALID
    assert struct.unpack_from("<Q", raw, 16 + 24 + 96 + 8)[0] == 0

    # meta page 1: txnid 1, live root, correct entry count
    off = LF.PAGESIZE + 16
    db1 = struct.unpack_from("<IHHQQQQQ", raw, off + 24 + 48)
    assert db1[6] == 2 and db1[7] != LF.P_INVALID
    assert struct.unpack_from("<Q", raw, off + 24 + 96 + 8)[0] == 1

    # overflow chain: P_OVERFLOW flag + pb_pages count at offset 12
    mdb = LF.MdbFile(p)
    assert mdb.get(b"big") == b"x" * 5000
    found = False
    for pg in range(2, len(raw) // LF.PAGESIZE):
        flags = struct.unpack_from("<H", raw, pg * LF.PAGESIZE + 10)[0]
        if flags & LF.P_OVERFLOW:
            npages = struct.unpack_from(
                "<I", raw, pg * LF.PAGESIZE + 12)[0]
            assert npages == (5000 + 16 + LF.PAGESIZE - 1) // LF.PAGESIZE
            found = True
            break
    assert found
    mdb.close()


def test_node_threshold_is_mdb_nodemax(tmp_path):
    # nodemax = ((psize - 16) / MDB_MINKEYS) & ~1 = 2040: a node of
    # exactly 2040 bytes stays inline, 2041 spills to overflow
    assert LF.NODEMAX == 2040
    k = b"key"
    inline = b"a" * (LF.NODEMAX - LF.NODESZ - len(k))
    spill = inline + b"b"
    p = LF.write_mdb(str(tmp_path / "e"), {k: spill, b"j": inline})
    raw = open(p, "rb").read()
    flags = [struct.unpack_from("<H", raw, pg * LF.PAGESIZE + 10)[0]
             for pg in range(2, len(raw) // LF.PAGESIZE)]
    assert sum(1 for f in flags if f & LF.P_OVERFLOW) == 1
    mdb = LF.MdbFile(p)
    assert mdb.get(k) == spill and mdb.get(b"j") == inline
    mdb.close()


def test_empty_and_missing(tmp_path):
    p = LF.write_mdb(str(tmp_path / "e"), {})
    mdb = LF.MdbFile(p)
    assert mdb.entries == 0 and mdb.get(b"x") is None
    assert list(mdb.items()) == []
    mdb.close()


def test_deep_tree_roundtrip(tmp_path):
    rng = random.Random(23)
    items = {b"k%08d" % i: bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(0, 100)))
             for i in range(20000)}
    mdb = LF.MdbFile(LF.write_mdb(str(tmp_path / "e"), items))
    assert mdb.entries == len(items)
    for k in rng.sample(sorted(items), 500):
        assert mdb.get(k) == items[k]
    assert mdb.get(b"k99999999x") is None
    assert list(mdb.items()) == sorted(items.items())
    mdb.close()


@settings(max_examples=25, deadline=None)
@given(st.dictionaries(
    st.binary(min_size=1, max_size=40),
    st.binary(min_size=0, max_size=4000), max_size=60))
def test_roundtrip_property(tmp_path_factory, items):
    d = tmp_path_factory.mktemp("mdb")
    mdb = LF.MdbFile(LF.write_mdb(str(d / "e"), items))
    for k, v in items.items():
        assert mdb.get(k) == v
    assert list(mdb.items()) == sorted(items.items())
    mdb.close()


def test_read_lmdb_dataset_distributed(spark, tmp_path):
    """The Spark scan returns exactly the reference traversal's rows:
    1-based file_idx per env, missing labels dropped, bytes intact."""
    rng = random.Random(5)
    exp = []
    for e, name in enumerate(["env_a", "nest/env_b"]):
        n = 40
        items = {b"num-samples": str(n).encode()}
        for i in range(1, n + 1):
            img = bytes(rng.randrange(256)
                        for _ in range(rng.choice([20, 2500])))
            items[b"image-%09d" % i] = img
            if i % 7 != 0:
                items[b"label-%09d" % i] = b"t%d" % i
                exp.append((e, i, "t%d" % i, img))
        LF.write_mdb(str(tmp_path / name), items)

    df = LF.read_lmdb_dataset(spark, str(tmp_path))
    got = sorted((r["lmdb_idx"], r["file_idx"], r["label"], bytes(r["image"]))
                 for r in df.collect())
    assert got == sorted(exp)
