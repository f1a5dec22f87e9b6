import numpy as np

from simvg_tpu.ops import rle


def _rand_mask(h, w, seed):
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), np.uint8)
    for _ in range(3):
        y, x = r.integers(0, h), r.integers(0, w)
        hh, ww = r.integers(1, h // 2 + 1), r.integers(1, w // 2 + 1)
        m[y:y + hh, x:x + ww] = 1
    return m


def test_encode_decode_roundtrip():
    for seed in range(10):
        m = _rand_mask(37, 53, seed)
        np.testing.assert_array_equal(rle.decode(rle.encode(m)), m)
    # edge cases: all zeros / all ones
    z = np.zeros((8, 8), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    o = np.ones((8, 8), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(o)), o)


def test_counts_codec_known_vector():
    """COCO varint property checks: decode(encode(x)) == x including
    the difference coding for runs beyond index 2."""
    from simvg_tpu.ops.rle import _decode_counts, _encode_counts

    for counts in ([0, 5, 3, 2, 7], [10], [0, 1, 1, 1, 1, 1],
                   [100000, 3, 99999, 5]):
        enc = _encode_counts(np.asarray(counts))
        np.testing.assert_array_equal(_decode_counts(enc), counts)
        assert all(48 <= b < 48 + 64 for b in enc)  # printable range


def test_uncompressed_counts_accepted():
    m = rle.decode({"size": [4, 3], "counts": [2, 3, 7]})
    flat = m.reshape(-1, order="F")
    np.testing.assert_array_equal(flat, [0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0,
                                         0])


def test_merge_and_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ra, rb = rle.encode(a), rle.encode(b)
    merged = rle.decode(rle.merge([ra, rb]))
    np.testing.assert_array_equal(merged, np.logical_or(a, b))
    got = rle.iou([ra], [rb])[0, 0]
    np.testing.assert_allclose(got, 20 / 80)
    # crowd: denominator is dt area
    got = rle.iou([ra], [rb], iscrowd=[1])[0, 0]
    np.testing.assert_allclose(got, 20 / 50)


def test_polygon_rasterisation():
    polys = [[1, 1, 6, 1, 6, 6, 1, 6]]
    (r,) = rle.frPyObjects(polys, 8, 8)
    m = rle.decode(r)
    assert m[3, 3] == 1 and m[0, 0] == 0
    assert m.sum() >= 25


def test_native_matches_numpy_codec():
    """The C extension and the numpy fallback must produce identical
    bytes and masks."""
    from simvg_tpu.native import get_rle_ext
    from simvg_tpu.ops.rle import _decode_counts, _encode_counts

    ext = get_rle_ext()
    if ext is None:
        import pytest

        pytest.skip("native extension unavailable")
    r = np.random.default_rng(3)
    for _ in range(5):
        m = (r.random((64, 48)) > 0.7).astype(np.uint8)
        flat = np.asfortranarray(m).reshape(-1, order="F")
        changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        bounds = np.concatenate([[0], changes, [flat.size]])
        runs = np.diff(bounds)
        if flat[0]:
            runs = np.concatenate([[0], runs])
        native_runs = ext.runs_from_mask(
            np.ascontiguousarray(flat).tobytes())
        np.testing.assert_array_equal(native_runs, runs)
        assert ext.encode_counts([int(x) for x in runs]) == \
            _encode_counts(runs)
        enc = _encode_counts(runs)
        np.testing.assert_array_equal(ext.decode_counts(enc),
                                      _decode_counts(enc))
