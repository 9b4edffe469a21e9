"""Native C++ image loader: decode parity with PIL + throughput sanity."""

import io
import time

import numpy as np
import pytest

from gangealing_tpu.data.lmdb_io import write_lmdb
from gangealing_tpu.data.dataset import MultiResolutionDataset


def _make_dataset(tmp_path, rng, n=32, res=32, fmt="PNG"):
    from PIL import Image
    imgs = (rng.rand(n, res, res, 3) * 255).astype(np.uint8)
    items = {b"length": str(n).encode()}
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(imgs[i]).save(buf, format=fmt, quality=95)
        items[f"{res}-{str(i).zfill(5)}".encode()] = buf.getvalue()
    path = str(tmp_path / f"ds_{fmt}")
    write_lmdb(path, items)
    return path, imgs


@pytest.mark.parametrize("fmt", ["PNG", "JPEG"])
def test_native_loader_decode_parity(tmp_path, rng, fmt):
    from gangealing_tpu.data.native_loader import NativeImageLoader
    path, imgs = _make_dataset(tmp_path, rng, fmt=fmt)
    loader = NativeImageLoader(path, resolution=32, batch=8, num_threads=2,
                               shuffle=False, seed=0)
    assert len(loader) == 32
    ref = MultiResolutionDataset(path, resolution=32)
    seen = {}
    for _ in range(4):
        batch, idx = loader.next()
        for b, i in zip(batch, idx):
            seen[int(i)] = b
    loader.close()
    assert len(seen) == 32
    for i in [0, 7, 31]:
        expect = ref[i]  # PIL decode path
        np.testing.assert_allclose(seen[i], expect, atol=1e-5,
                                   err_msg=f"decode mismatch idx={i}")


def test_native_loader_shuffles(tmp_path, rng):
    from gangealing_tpu.data.native_loader import NativeImageLoader
    path, _ = _make_dataset(tmp_path, rng)
    loader = NativeImageLoader(path, resolution=32, batch=32, num_threads=1,
                               shuffle=True, seed=1)
    _, idx = loader.next()
    loader.close()
    assert sorted(idx.tolist()) == list(range(32))
    assert idx.tolist() != list(range(32))  # shuffled order


def test_native_loader_epochs(tmp_path, rng):
    """Crossing an epoch boundary reshuffles and keeps streaming."""
    from gangealing_tpu.data.native_loader import NativeImageLoader
    path, _ = _make_dataset(tmp_path, rng, n=8)
    loader = NativeImageLoader(path, resolution=32, batch=8, num_threads=1,
                               shuffle=True, seed=0)
    orders = [tuple(loader.next()[1].tolist()) for _ in range(4)]
    loader.close()
    for o in orders:
        assert sorted(o) == list(range(8))
    assert len(set(orders)) > 1  # different epoch orders


def test_native_loader_rejects_empty_dataset(tmp_path):
    """length=0 datasets error at create instead of hanging the consumer
    (workers would dispense empty chunks forever)."""
    from gangealing_tpu.data.native_loader import NativeImageLoader
    path = str(tmp_path / "empty")
    write_lmdb(path, {b"length": b"0"})
    with pytest.raises(IOError):
        NativeImageLoader(path, resolution=32, batch=4, num_threads=2)


def test_native_loader_errors_on_wrong_resolution(tmp_path, rng):
    """A resolution with no keys in the LMDB must raise (like the Python
    loader's KeyError), not block forever on all-failed decode chunks."""
    from gangealing_tpu.data.native_loader import NativeImageLoader
    path, _ = _make_dataset(tmp_path, rng, n=8, res=32)
    loader = NativeImageLoader(path, resolution=64, batch=4, num_threads=2)
    try:
        with pytest.raises(RuntimeError, match="resolution"):
            loader.next()
    finally:
        loader.close()
