import numpy as np
import pytest
from PIL import Image

from harp_tpu.native import load_frameloader, decode_jpeg_batch, erode_masks

pytestmark = pytest.mark.skipif(
    load_frameloader() is None, reason="native frameloader unavailable"
)


def _write_jpegs(tmp_path, n=3, size=32):
    rng = np.random.RandomState(0)
    paths = []
    arrays = []
    for i in range(n):
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i:04d}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_decode_matches_pil(tmp_path):
    paths, _ = _write_jpegs(tmp_path)
    native = decode_jpeg_batch(paths)
    assert native.shape == (3, 32, 32, 3)
    for i, p in enumerate(paths):
        pil = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        # libjpeg and PIL use the same decoder; allow tiny rounding slack.
        assert np.abs(native[i] - pil).max() < 2.5 / 255.0


def test_decode_gray(tmp_path):
    paths, _ = _write_jpegs(tmp_path)
    g = decode_jpeg_batch(paths, gray=True)
    assert g.shape == (3, 32, 32)
    assert 0 <= g.min() and g.max() <= 1


def test_decode_missing_file_raises(tmp_path):
    paths, _ = _write_jpegs(tmp_path, n=1)
    with pytest.raises(IOError):
        decode_jpeg_batch(paths + [str(tmp_path / "nope.jpg")])


def test_erode_matches_jax_reference():
    import jax.numpy as jnp
    from harp_tpu.data.synthetic import erode_mask

    rng = np.random.RandomState(1)
    masks = (rng.rand(2, 24, 24) > 0.4).astype(np.float32)
    native = erode_masks(masks, iterations=2)
    ref = np.asarray(erode_mask(jnp.asarray(masks), iterations=2))
    np.testing.assert_allclose(native, ref, atol=1e-6)
