"""Native prefetching npy loader: parity with np.load and integration
with OfflineDataset."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu.native import NativeNpyStream, native_available


@pytest.mark.skipif(not native_available(),
                    reason="no C++ toolchain available")
def test_native_stream_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((37, 5)),
              rng.standard_normal((12, 5)).astype(np.float32),
              rng.integers(0, 100, size=(9, 5)).astype(np.int64)]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"a{i}.npy"
        np.save(p, a)
        paths.append(str(p))
    got = list(NativeNpyStream(paths))
    assert len(got) == 3
    for a, g in zip(arrays, got):
        assert g.dtype == a.dtype
        assert np.array_equal(g, a)


@pytest.mark.skipif(not native_available(),
                    reason="no C++ toolchain available")
def test_native_stream_3d(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 6, 4))
    p = tmp_path / "x.npy"
    np.save(p, a)
    got = list(NativeNpyStream([str(p)], trailing_shape=(6, 4)))
    assert np.array_equal(got[0], a)


@pytest.mark.skipif(not native_available(),
                    reason="no C++ toolchain available")
def test_native_stream_bad_file(tmp_path):
    p = tmp_path / "bad.npy"
    p.write_bytes(b"not an npy file at all")
    with pytest.raises(RuntimeError):
        list(NativeNpyStream([str(p)]))


@pytest.mark.skipif(not native_available(),
                    reason="no C++ toolchain available")
def test_offline_dataset_uses_native(tmp_path):
    from xgpr_tpu import build_regression_dataset
    rng = np.random.default_rng(2)
    xfiles, yfiles = [], []
    xs, ys = [], []
    for i in range(4):
        x = rng.standard_normal((50, 7))
        y = rng.standard_normal(50)
        xp, yp = tmp_path / f"x{i}.npy", tmp_path / f"y{i}.npy"
        np.save(xp, x)
        np.save(yp, y)
        xfiles.append(str(xp))
        yfiles.append(str(yp))
        xs.append(x)
        ys.append(y)
    dset = build_regression_dataset(xfiles, yfiles, chunk_size=50)
    chunks = list(dset.get_chunked_data())
    assert len(chunks) == 4
    for (xc, yc, lc), x, y in zip(chunks, xs, ys):
        assert np.allclose(np.asarray(xc), x)
        expect = (y - dset.get_ymean()) / dset.get_ystd()
        assert np.allclose(np.asarray(yc), expect)
