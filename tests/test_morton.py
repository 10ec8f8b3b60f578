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


def test_hilbert_is_permutation():
    from gpupathtracer_tpu.utils.morton import ray_index_to_pixel_hilbert
    fwd = ray_index_to_pixel_hilbert(32, 16)
    assert sorted(fwd.tolist()) == list(range(32 * 16))
    # First 64 rays fill the first 8x8 block, each pixel once.
    first = sorted((int(p % 32), int(p // 32)) for p in fwd[:64])
    assert first == sorted((x, y) for x in range(8) for y in range(8))
    # Hilbert curve: consecutive rays are adjacent pixels within a block.
    xy = [(int(p % 32), int(p // 32)) for p in fwd[:64]]
    for (x0, y0), (x1, y1) in zip(xy, xy[1:]):
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_sampler_viz(tmp_path):
    from gpupathtracer_tpu.utils.sampler_viz import (golden_ratio_set,
                                                     halton_set, plot_points)
    pts = golden_ratio_set(512)
    assert pts.shape == (512, 2) and (pts >= 0).all() and (pts < 1).all()
    h = halton_set(256)
    assert (h >= 0).all() and (h < 1).all()
    # Halton base-2 first coords: 0, 1/2, 1/4, 3/4...
    np.testing.assert_allclose(h[:4, 0], [0.0, 0.5, 0.25, 0.75], atol=1e-6)
    p = plot_points(pts, 64, str(tmp_path / "viz.png"))
    import os
    assert os.path.exists(p)
