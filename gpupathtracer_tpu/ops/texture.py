"""Texture atlas sampling.

The reference samples per-material bindless textures (Material.glsl:43-44,
GL_ARB_bindless_texture); TPUs have no texture units or bindless handles, so
all material images are packed into ONE atlas array at load time (reviving
the reference's abandoned rectpack texture-atlas experiment,
Scene.cpp:431-577) and sampled with bilinear gathers. Wrap mode is REPEAT
within each sub-rectangle (Texture.cpp:127-130 behavior).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_atlas(atlas_image, atlas_rects, tex_id, uv,
                 mips=None, lod=None):
    """Bilinear atlas lookup; trilinear when a mip table + lod is given.

    atlas_image: [H, W, 3] f32; atlas_rects: [R, 4] i32 (x, y, w, h);
    tex_id: [N] i32 (invalid ids must be pre-masked by the caller);
    uv: [N, 2] f32, REPEAT-wrapped per sub-rect. Returns [N, 3].

    mips: [S, L] i32 per-texture level->rect table (scene.atlas_mips,
    built by scene/textures.py); lod: [N] f32 mip level — blends the two
    bracketing levels (trilinear; the reference samples level 0 only,
    Texture.cpp:127-130)."""
    if mips is not None and lod is not None and mips.shape[1] > 1:
        L = mips.shape[1]
        lod = jnp.clip(lod, 0.0, float(L - 1))
        l0 = jnp.floor(lod)
        f = (lod - l0)[:, None]
        row = mips[jnp.maximum(tex_id, 0)]           # [N, L]
        l0i = l0.astype(jnp.int32)
        r0 = jnp.take_along_axis(row, l0i[:, None], axis=1)[:, 0]
        r1 = jnp.take_along_axis(row, jnp.minimum(l0i + 1, L - 1)[:, None],
                                 axis=1)[:, 0]
        c0 = _bilinear(atlas_image, atlas_rects, r0, uv)
        c1 = _bilinear(atlas_image, atlas_rects, r1, uv)
        return c0 * (1.0 - f) + c1 * f
    return _bilinear(atlas_image, atlas_rects, jnp.maximum(tex_id, 0), uv)


def _bilinear(atlas_image, atlas_rects, rect_id, uv):
    """Bilinear lookup of rect rows `rect_id` [N] (REPEAT wrap)."""
    rect = atlas_rects[rect_id]                      # [N, 4]
    rx = rect[:, 0].astype(jnp.float32)
    ry = rect[:, 1].astype(jnp.float32)
    rw = rect[:, 2].astype(jnp.float32)
    rh = rect[:, 3].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])               # REPEAT
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * rw - 0.5
    y = v * rh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def texel(xi, yi):
        # wrap bilinear neighbors within the sub-rect
        xi = jnp.mod(xi, jnp.maximum(rw, 1.0))
        yi = jnp.mod(yi, jnp.maximum(rh, 1.0))
        gx = (rx + xi).astype(jnp.int32)
        gy = (ry + yi).astype(jnp.int32)
        return atlas_image[gy, gx]

    c00 = texel(x0, y0)
    c01 = texel(x0 + 1.0, y0)
    c10 = texel(x0, y0 + 1.0)
    c11 = texel(x0 + 1.0, y0 + 1.0)
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)
