"""LMDB format roundtrip: our writer <-> native C++ reader <-> python reader,
plus the dataset layer over it."""

import io
import os

import numpy as np
import pytest

from gangealing_tpu.data.lmdb_io import LMDBReader, write_lmdb, _PyReader
from gangealing_tpu.data.dataset import (
    MultiResolutionDataset, DataLoader, Subset, img_dataloader)


def _make_kv(n=300, rng=None):
    rng = rng or np.random.RandomState(0)
    items = {}
    for i in range(n):
        # mix of small and overflow-sized values
        size = int(rng.choice([10, 100, 3000, 5000, 20000]))
        items[f"key-{i:05d}".encode()] = bytes(
            rng.randint(0, 256, size, dtype=np.uint8))
    items[b"length"] = str(n).encode()
    return items


def test_write_read_roundtrip(tmp_path, rng):
    items = _make_kv(rng=rng)
    path = str(tmp_path / "env")
    write_lmdb(path, items)
    for reader in (LMDBReader(path), _PyReader(path)):
        get = reader.get
        for k, v in items.items():
            got = get(k)
            assert got == v, f"mismatch for {k!r}"
        assert get(b"nonexistent") is None
        assert get(b"key-99999") is None


def test_native_reader_is_used(tmp_path):
    items = {b"a": b"1", b"length": b"0"}
    path = str(tmp_path / "env")
    write_lmdb(path, items)
    r = LMDBReader(path)
    assert r._h is not None, "native reader failed to build/load"
    assert r.entries == len(items)


def test_large_values_multi_page(tmp_path, rng):
    big = bytes(rng.randint(0, 256, 1_000_000, dtype=np.uint8))
    path = str(tmp_path / "env")
    write_lmdb(path, {b"big": big, b"small": b"x", b"length": b"1"})
    r = LMDBReader(path)
    assert r.get(b"big") == big
    assert r.get(b"small") == b"x"


def test_many_keys_multilevel_tree(tmp_path, rng):
    """Enough keys to force >1 branch level."""
    items = {f"k{i:08d}".encode(): f"v{i}".encode() for i in range(20000)}
    items[b"length"] = b"0"
    path = str(tmp_path / "env")
    write_lmdb(path, items)
    r = LMDBReader(path)
    for i in [0, 1, 9999, 19998, 19999]:
        assert r.get(f"k{i:08d}".encode()) == f"v{i}".encode()


def _encode_png(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def image_lmdb(tmp_path, rng):
    n, res = 12, 16
    imgs = (rng.rand(n, res, res, 3) * 255).astype(np.uint8)
    items = {b"length": str(n).encode()}
    for i in range(n):
        items[f"{res}-{str(i).zfill(5)}".encode()] = _encode_png(imgs[i])
    path = str(tmp_path / "imgs")
    write_lmdb(path, items)
    return path, imgs, res


def test_multiresolution_dataset(image_lmdb):
    path, imgs, res = image_lmdb
    ds = MultiResolutionDataset(path, resolution=res)
    assert len(ds) == 12
    x = ds[3]
    assert x.shape == (3, res, res)
    expect = imgs[3].astype(np.float32).transpose(2, 0, 1) / 255 * 2 - 1
    np.testing.assert_allclose(x, expect, atol=1e-6)


def test_dataloader_sharding(image_lmdb):
    path, imgs, res = image_lmdb
    ds = MultiResolutionDataset(path, resolution=res, return_indices=True)
    seen = []
    for shard in range(3):
        loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                            num_shards=3, shard_index=shard)
        for _, idx in loader:
            seen.extend(idx.tolist())
    assert sorted(seen) == list(range(12))


def test_infinite_loader(image_lmdb):
    path, imgs, res = image_lmdb
    it = img_dataloader(path, resolution=res, batch_size=4, seed=0,
                        infinite=True)
    batches = [next(it) for _ in range(7)]  # crosses an epoch boundary
    assert all(b.shape == (4, 3, res, res) for b in batches)


def test_parallel_builder_matches_sequential(tmp_path):
    """create_dataset with a worker pool must produce byte-identical LMDBs
    to the sequential build, including skip/compaction semantics for corrupt
    images (reference prepare_data.py:253-314 parallel workers + :308 skip).
    NB: this CI box has 1 CPU so only correctness (not wall-clock) is
    asserted; on multi-core hosts the pool parallelizes decode/encode."""
    import numpy as np
    from PIL import Image
    from gangealing_tpu.data.prepare import create_dataset
    from gangealing_tpu.data.lmdb_io import LMDBReader

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(20):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            str(src / f"{i:05d}.png"))
    # one corrupt file in the middle: must be skipped and indices compacted
    (src / "00010.png").write_bytes(b"not an image")

    n1 = create_dataset(str(tmp_path / "seq"), str(src), "64,32",
                        workers=1, progress=False)
    n2 = create_dataset(str(tmp_path / "par"), str(src), "64,32",
                        workers=8, progress=False)
    assert n1 == n2 == 19
    r1 = LMDBReader(str(tmp_path / "seq"))
    r2 = LMDBReader(str(tmp_path / "par"))
    for s in (64, 32):
        for i in range(19):
            k = f"{s}-{str(i).zfill(5)}".encode()
            assert r1.get(k) == r2.get(k)


def test_create_dataset_from_lmdb_input(tmp_path, rng):
    """--input_is_lmdb: build the project LMDB from an LSUN-style LMDB of
    encoded images (prepare_data.py:292-331 path)."""
    from gangealing_tpu.data.prepare import create_dataset
    from gangealing_tpu.data.dataset import MultiResolutionDataset
    n = 5
    src = {}
    for i in range(n):
        img = (rng.rand(40, 52, 3) * 255).astype(np.uint8)
        src[f"lsunkey{i}".encode()] = _encode_png(img)
    src_path = str(tmp_path / "src")
    write_lmdb(src_path, src)
    out = str(tmp_path / "built")
    total = create_dataset(out, src_path, "32", pad="center", format="png",
                           input_is_lmdb=True, progress=False)
    assert total == n
    ds = MultiResolutionDataset(out, resolution=32)
    assert len(ds) == n
    assert ds[0].shape == (3, 32, 32)


# ---------------------------------------------------------------------------
# Defensive format validation (VERDICT r2 item 7): clear errors instead of
# silent misreads; reader-vs-writer fuzz over page sizes + overflow boundary
# ---------------------------------------------------------------------------

from gangealing_tpu.data.lmdb_io import (  # noqa: E402
    LMDBFormatError, PAGEHDRSZ, NODESZ)


@pytest.mark.parametrize("psize", [512, 1024, 8192])
def test_roundtrip_at_page_size(tmp_path, rng, psize):
    """Fuzz reader-vs-writer at non-default page sizes, with value sizes
    spanning the inline/overflow boundary and multi-page overflows."""
    max_inline = (psize - PAGEHDRSZ) // 2 - NODESZ - 64
    sizes = sorted({1, 7, max_inline - 1, max_inline, max_inline + 1,
                    psize - PAGEHDRSZ, psize - PAGEHDRSZ + 1,
                    3 * psize + 13})
    items = {}
    for i, sz in enumerate(sizes):
        items[f"key-{i:04d}".encode()] = bytes(
            rng.randint(0, 256, sz, dtype=np.uint8))
    # plus a spread of random sizes
    for i in range(40):
        sz = int(rng.randint(1, 4 * psize))
        items[f"rnd-{i:04d}".encode()] = bytes(
            rng.randint(0, 256, sz, dtype=np.uint8))
    path = str(tmp_path / f"ps{psize}")
    write_lmdb(path, items, psize=psize)
    for reader in (LMDBReader(path), _PyReader(path)):
        assert reader.entries == len(items)
        for k, v in items.items():
            assert reader.get(k) == v, (psize, k, len(v))
        assert reader.get(b"absent") is None


def test_write_rejects_bad_psize(tmp_path):
    with pytest.raises(ValueError):
        write_lmdb(str(tmp_path / "x"), {b"a": b"b"}, psize=3000)
    with pytest.raises(ValueError):
        write_lmdb(str(tmp_path / "y"), {b"a": b"b"}, psize=256)


def _corrupt(path_dir, tmp_path, name, offsets_values):
    """Copy data.mdb and patch bytes at given (offset, bytes) pairs."""
    src = os.path.join(path_dir, "data.mdb")
    dst_dir = str(tmp_path / name)
    os.makedirs(dst_dir, exist_ok=True)
    buf = bytearray(open(src, "rb").read())
    for off, val in offsets_values:
        buf[off:off + len(val)] = val
    open(os.path.join(dst_dir, "data.mdb"), "wb").write(bytes(buf))
    return dst_dir


@pytest.fixture
def valid_lmdb(tmp_path, rng):
    items = {f"k{i}".encode(): bytes(rng.randint(0, 256, 100, dtype=np.uint8))
             for i in range(10)}
    path = str(tmp_path / "valid")
    write_lmdb(path, items)
    return path


def test_reject_bad_magic(valid_lmdb, tmp_path):
    import struct
    bad = _corrupt(valid_lmdb, tmp_path, "badmagic",
                   [(PAGEHDRSZ, struct.pack("<I", 0xDEADBEEF)),
                    (4096 + PAGEHDRSZ, struct.pack("<I", 0xDEADBEEF))])
    with pytest.raises((LMDBFormatError, IOError)):
        LMDBReader(bad)
    with pytest.raises(LMDBFormatError):
        _PyReader(bad)


def test_reject_bad_version(valid_lmdb, tmp_path):
    import struct
    bad = _corrupt(valid_lmdb, tmp_path, "badver",
                   [(PAGEHDRSZ + 4, struct.pack("<I", 999)),
                    (4096 + PAGEHDRSZ + 4, struct.pack("<I", 999))])
    with pytest.raises(LMDBFormatError, match="version"):
        LMDBReader(bad)
    with pytest.raises(LMDBFormatError, match="version"):
        _PyReader(bad)


def test_reject_dupsort_main_db(valid_lmdb, tmp_path):
    import struct
    # main DB flags live at meta + 24 (free db) + 48 + 4
    off = PAGEHDRSZ + 24 + 48 + 4
    bad = _corrupt(valid_lmdb, tmp_path, "dupsort",
                   [(off, struct.pack("<H", 0x04)),
                    (4096 + off, struct.pack("<H", 0x04))])
    with pytest.raises(LMDBFormatError, match="[Uu]nsupported"):
        LMDBReader(bad)
    with pytest.raises(LMDBFormatError, match="[Uu]nsupported"):
        _PyReader(bad)


def test_reject_bad_psize_on_read(valid_lmdb, tmp_path):
    import struct
    off = PAGEHDRSZ + 24  # free DB pad == mm_psize
    bad = _corrupt(valid_lmdb, tmp_path, "badpsize",
                   [(off, struct.pack("<I", 3000)),
                    (4096 + off, struct.pack("<I", 3000))])
    with pytest.raises(LMDBFormatError, match="page size"):
        LMDBReader(bad)
    with pytest.raises(LMDBFormatError, match="page size"):
        _PyReader(bad)


def test_reject_truncated_file(tmp_path):
    d = str(tmp_path / "trunc")
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, "data.mdb"), "wb").write(b"\x00" * 64)
    with pytest.raises((LMDBFormatError, IOError)):
        LMDBReader(d)
    with pytest.raises(LMDBFormatError):
        _PyReader(d)


def test_truncated_mid_meta_and_mid_tree(tmp_path, rng):
    """Truncation INSIDE meta-1 (passes the min-size guard, cuts the txnid
    field) and past the metas but before the tree pages must both surface
    as clean LMDBFormatError, never struct.error / silent short reads."""
    import struct
    items = {f"k{i}".encode(): bytes(rng.randint(0, 256, 80, dtype=np.uint8))
             for i in range(10)}
    path = str(tmp_path / "ps512")
    write_lmdb(path, items, psize=512)
    full = open(os.path.join(path, "data.mdb"), "rb").read()

    # cut inside meta-1: off(meta1 fields) = 512 + 16, txnid needs byte 664
    d1 = str(tmp_path / "midmeta")
    os.makedirs(d1, exist_ok=True)
    open(os.path.join(d1, "data.mdb"), "wb").write(full[:640])
    try:
        r = _PyReader(d1)  # meta-0 alone may still be consistent...
        with pytest.raises(LMDBFormatError):  # ...but the tree is gone
            for k in items:
                r.get(k)
    except LMDBFormatError:
        pass  # rejecting at open is equally acceptable
    except struct.error as e:  # pragma: no cover - the bug this guards
        pytest.fail(f"truncated meta crashed with struct.error: {e}")

    # cut after both metas but before/inside the tree pages
    d2 = str(tmp_path / "midtree")
    os.makedirs(d2, exist_ok=True)
    open(os.path.join(d2, "data.mdb"), "wb").write(full[:1536])
    try:
        r = _PyReader(d2)
        with pytest.raises(LMDBFormatError):
            got = [r.get(k) for k in items]
            # if every key "succeeded", the reads must at least be complete
            assert all(g is not None and len(g) == 80 for g in got)
    except LMDBFormatError:
        pass


def test_native_truncated_overflow_extent(tmp_path, rng):
    """A data.mdb whose overflow chain is cut (partial copy) must raise
    LMDBFormatError from the NATIVE reader's zero-copy get — never read
    past the mmap (the Python fallback got this guard in r3; the native
    hot path needs it too)."""
    big = bytes(rng.randint(0, 256, 64_000, dtype=np.uint8))
    path = str(tmp_path / "ovtrunc")
    write_lmdb(path, {b"big": big, b"small": b"x", b"length": b"1"})
    fpath = os.path.join(path, "data.mdb")
    full = open(fpath, "rb").read()
    # overflow pages are allocated AFTER the leaves, so cutting the tail
    # keeps metas+tree valid while the big value's extent runs off the end
    open(fpath, "wb").write(full[:len(full) - 40_000])

    r = LMDBReader(path)
    assert r._h is not None, "native reader failed to build/load"
    assert r.get(b"small") == b"x"  # inline values still fine
    with pytest.raises(LMDBFormatError, match="overflow|beyond|truncated"):
        r.get(b"big")
    rp = _PyReader(path)  # the Python fallback agrees
    with pytest.raises(LMDBFormatError):
        rp.get(b"big")


def test_iterate_keys_empty_and_ordering(tmp_path):
    from gangealing_tpu.data.lmdb_io import iterate_keys
    empty = str(tmp_path / "empty")
    write_lmdb(empty, {})
    assert iterate_keys(empty) == []  # not None (builder iterates it)
    some = str(tmp_path / "some")
    write_lmdb(some, {b"b": b"2", b"a": b"1", b"c": b"3"})
    assert iterate_keys(some) == [b"a", b"b", b"c"]


def test_dataloader_tiny_dataset_equal_shards(image_lmdb):
    """n < num_shards (DistributedSampler parity): every shard must get
    the SAME batch count by tiling indices, or lock-step multi-host loops
    enter collectives a different number of times and deadlock."""
    path, imgs, res = image_lmdb
    ds = MultiResolutionDataset(path, resolution=res, return_indices=True)
    tiny = Subset(ds, [5])  # 1 image, 4 shards
    lens, seen = [], []
    for shard in range(4):
        loader = DataLoader(tiny, batch_size=2, shuffle=False,
                            drop_last=False, num_shards=4, shard_index=shard)
        batches = list(loader)
        lens.append(len(batches))
        assert len(loader) == len(batches)
        for _, idx in batches:
            seen.extend(idx.tolist())
    assert lens == [1, 1, 1, 1], lens
    assert set(seen) == {5}
