"""Native data-pipeline tests: build the C++ cache library, verify batch
assembly matches the numpy semantics bit-for-bit, and exercise the fallback."""

import numpy as np
import pytest

from gan2shape_tpu import native


def test_native_builds():
    assert native.is_available(), "g++ build of the native cache failed"


def test_cache_roundtrip_uint8(tmp_path, rng):
    n, shape = 7, (3, 16, 16)
    data = rng.integers(0, 256, (n,) + shape, dtype=np.uint8)
    p = str(tmp_path / "cache.bin")
    with open(p, "wb") as f:
        f.write(data.tobytes())

    cache = native.TensorCache(p, n, shape, "uint8")
    idx = [3, 0, 6, 3]
    got = cache.get_batch(idx)
    want = data[np.asarray(idx)].astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    cache.prefetch([0, 1, 2])
    cache.close()


def test_cache_roundtrip_float32(tmp_path, rng):
    n, shape = 4, (2, 8, 8)
    data = rng.standard_normal((n,) + shape).astype(np.float32)
    p = str(tmp_path / "cache32.bin")
    with open(p, "wb") as f:
        f.write(data.tobytes())
    cache = native.TensorCache(p, n, shape, "float32")
    got = cache.get_batch([1, 2])
    np.testing.assert_array_equal(got, data[[1, 2]])
    cache.close()


def test_cache_out_of_range(tmp_path):
    p = str(tmp_path / "c.bin")
    with open(p, "wb") as f:
        f.write(b"\0" * 3 * 4 * 4)
    cache = native.TensorCache(p, 1, (3, 4, 4), "uint8")
    if native.is_available():
        with pytest.raises(IndexError):
            cache.get_batch([5])
    cache.close()


def test_build_image_cache(tmp_path, rng):
    class FakeDataset:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return r.uniform(-1, 1, (3, 8, 8)).astype(np.float32)

    cache = native.build_image_cache(FakeDataset(), str(tmp_path / "im.bin"),
                                     8)
    batch = cache.get_batch([0, 1, 2])
    assert batch.shape == (3, 3, 8, 8)
    # quantization roundtrip is within one uint8 step
    np.testing.assert_allclose(batch[1], FakeDataset()[1], atol=2.1 / 255)
    cache.close()
