import numpy as np

from gpupathtracer_tpu.utils.morton import pixel_to_ray_index, ray_index_to_pixel


def test_morton_is_permutation():
    fwd = ray_index_to_pixel(64, 32)
    assert sorted(fwd.tolist()) == list(range(64 * 32))


def test_morton_first_block():
    # Ray indices 0..63 must map into the first 8x8 block, starting with the
    # canonical Z-order: 0->(0,0), 1->(1,0), 2->(0,1), 3->(1,1).
    fwd = ray_index_to_pixel(16, 16)
    w = 16
    xy = [(int(p % w), int(p // w)) for p in fwd[:4]]
    assert xy == [(0, 0), (1, 0), (0, 1), (1, 1)]
    assert all(p % w < 8 and p // w < 8 for p in fwd[:64])


def test_inverse():
    fwd = ray_index_to_pixel(32, 16)
    inv = pixel_to_ray_index(32, 16)
    np.testing.assert_array_equal(fwd[inv], np.arange(32 * 16))
