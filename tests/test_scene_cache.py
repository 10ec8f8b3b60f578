"""Scene/BVH disk cache (scene/cache.py): the fingerprint must separate
every build-relevant config knob, or two configs alias one cached tree
(the role of the reference's decoded-texture cache keying,
src/core/Texture.cpp:35-88 — there the key is the file path; here the
"file" is the whole build parameterization)."""

import dataclasses

import numpy as np

from gpupathtracer_tpu.config import RenderConfig
from gpupathtracer_tpu.scene.cache import (cache_path, load_scene_cache,
                                           save_scene_cache)


def _cfg(**kw):
    return RenderConfig(scene_path="proc:cornell",
                        skybox="GENERATE COLOR BLACK",
                        width=16, height=16, **kw)


def test_fingerprint_separates_build_knobs(tmp_path):
    base = _cfg(cache_dir=str(tmp_path))
    seen = {cache_path(base)}
    for field, value in [("leaf_size", 4), ("wide_arity", 16),
                         ("spatial_splits", False), ("force_leaf", False),
                         ("reinsert_rounds", 3), ("mip_levels", 4),
                         ("bvh_builder", "numpy")]:
        cfg = dataclasses.replace(base, **{field: value})
        p = cache_path(cfg)
        assert p not in seen, f"{field}={value} aliases another cache entry"
        seen.add(p)
    # ...and knobs that do NOT affect the packed scene share the entry.
    for field, value in [("width", 64), ("seed", 7), ("packet_size", 256),
                         ("max_bounces", 3)]:
        cfg = dataclasses.replace(base, **{field: value})
        assert cache_path(cfg) == cache_path(base), f"{field} churns the key"


def test_cache_roundtrip_restores_the_tree(tmp_path):
    from gpupathtracer_tpu.scene import load_scene

    cfg = _cfg(cache_dir=str(tmp_path), cache_enabled=True)
    assert load_scene_cache(cfg) is None       # cold
    scene, meta = load_scene(cfg)              # populates the cache
    z = load_scene_cache(cfg)
    assert z is not None                       # warm
    np.testing.assert_array_equal(z["child_entry"],
                                  np.asarray(scene.bvh.child_entry))
    np.testing.assert_array_equal(z["refs"], np.asarray(scene.bvh.refs))
    # The cached load must reproduce the same scene arrays.
    scene2, meta2 = load_scene(cfg)
    np.testing.assert_array_equal(np.asarray(scene.tri_geom),
                                  np.asarray(scene2.tri_geom))
    np.testing.assert_array_equal(np.asarray(scene.bvh.child_bounds),
                                  np.asarray(scene2.bvh.child_bounds))
    assert meta2.num_triangles == meta.num_triangles


def test_corrupt_cache_falls_back_to_rebuild(tmp_path):
    from gpupathtracer_tpu.scene import load_scene

    cfg = _cfg(cache_dir=str(tmp_path), cache_enabled=True)
    load_scene(cfg)
    path = cache_path(cfg)
    with open(path, "wb") as f:
        f.write(b"not a npz")
    assert load_scene_cache(cfg) is None       # unreadable -> miss
    scene, meta = load_scene(cfg)              # rebuild, no crash
    assert meta.num_triangles > 0
