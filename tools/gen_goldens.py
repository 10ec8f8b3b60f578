#!/usr/bin/env python
"""Regenerate the golden-image regression corpus (tests/golden/*.npz).

Run ONLY after a VERIFIED intentional estimator change; renders the exact
configs in tests/test_golden.py on CPU (the test platform) and overwrites
the npz files. Review the per-channel deltas it prints before committing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.test_golden import CORPUS, GOLDEN_DIR, render_golden  # noqa: E402


def gen_hits():
    """Exact-hit golden channel (tests/test_golden_hits.py)."""
    from tests.test_golden_hits import HIT_CORPUS, render_hits
    for name in sorted(HIT_CORPUS):
        prim, t = render_hits(name)
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if os.path.exists(path):
            old = np.load(path)
            ch = int((old["prim"] != prim).sum())
            print(f"{name}: {ch} changed prim(s) vs previous golden")
        else:
            print(f"{name}: new hit golden")
        np.savez_compressed(path, prim=prim, t=t)
        print(f"  wrote {path} (hit rate {float((prim >= 0).mean()):.3f})")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if "--hits" in sys.argv or "--all" in sys.argv:
        gen_hits()
        if "--all" not in sys.argv:
            return
    for name in sorted(CORPUS):
        img = render_golden(name)
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if os.path.exists(path):
            old = np.load(path)["hdr"]
            if old.shape == img.shape:
                d = float(np.mean(np.abs(img - old)) /
                          max(float(np.mean(np.abs(old))), 1e-12))
                print(f"{name}: mean |delta| {d:.2e} vs previous golden")
            else:
                print(f"{name}: shape change {old.shape} -> {img.shape}")
        else:
            print(f"{name}: new golden")
        np.savez_compressed(path, hdr=img.astype(np.float32))
        print(f"  wrote {path} (mean {float(img.mean()):.5f})")


if __name__ == "__main__":
    main()
