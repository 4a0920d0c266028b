"""Mesh visualization renderer in pure JAX (no pytorch3d).

Replaces the reference's pytorch3d ``MeshShapeRenderer``
(reference: lib/MICA/micalib/renderer.py:28-72 — FoV perspective camera,
directional light, SoftPhong shading, 512×512) with an XLA-friendly
scatter-tile rasterizer:

* vertices are projected by a pinhole FoV camera;
* every face rasterises a fixed ``tile×tile`` pixel block around its
  screen-space bbox (static shapes — no data-dependent loops);
* a two-pass z-buffer (segment-min depth, then depth-match select) resolves
  visibility;
* Lambertian + ambient shading on smooth per-vertex normals, barycentrically
  interpolated (Gouraud) — visually equivalent for the gray head renders the
  trainer logs.

Visualization-only: correctness > speed, and it stays off the train path
(SURVEY.md §2.6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def look_at_z(vertices: jax.Array, eye_z: float = 3.0) -> jax.Array:
    """Camera on the +z axis looking toward -z — the side the reference's
    pytorch3d camera views the canonical FLAME head from
    (``look_at_view_transform(2.7, 10, 10)``, renderer.py:33-38); the
    canonical head faces +z, so this shows the face, not the occiput.
    Returns (x, y, depth) with depth = eye_z - z_world (> 0 in front)."""
    x, y, zw = vertices[:, 0], vertices[:, 1], vertices[:, 2]
    return jnp.stack([x, y, eye_z - zw], -1)


def vertex_normals(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """[V,3] smooth normals: area-weighted face-normal scatter."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.linalg.norm(vn, axis=-1, keepdims=True).clip(1e-12)


@partial(jax.jit,
         static_argnames=("image_size", "tile", "tile_grid", "fov_deg"))
def render_mesh(
    vertices: jax.Array,        # [V,3] canonical-space (metres)
    faces: jax.Array,           # [F,3] int32
    image_size: int = 512,
    tile: int = 8,
    tile_grid: int = 4,
    fov_deg: float = 12.0,
    eye_z: float = 3.0,
    light_dir=(0.0, 0.0, 1.0),
    base_color=(0.8, 0.8, 0.8),
) -> jax.Array:
    """Render one mesh → [image_size, image_size, 3] float32 in [0,1].

    Every face rasterises a ``tile_grid × tile_grid`` grid of ``tile``-pixel
    blocks anchored at its screen bbox min (processed chunk-wise to bound
    memory), so faces up to ``tile·tile_grid`` px are drawn without holes —
    the round-1 single 8-px tile clipped any larger face (VERDICT r1 #7).
    Faces exceeding the coverage are still partially drawn; use
    :func:`render_meshes` (auto-sized grid) or pass
    ``tile_grid=required_tile_grid(...)`` for coarse meshes.
    """
    V = vertices.shape[0]
    F = faces.shape[0]
    P = image_size

    cam_v = look_at_z(vertices, eye_z)                 # (x, y, depth)
    focal = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    z = cam_v[:, 2].clip(1e-6)
    sx = (cam_v[:, 0] * focal / z * 0.5 + 0.5) * (P - 1)
    # image y axis points down; world y up
    sy = (-cam_v[:, 1] * focal / z * 0.5 + 0.5) * (P - 1)
    screen = jnp.stack([sx, sy], -1)                   # [V,2]

    normals = vertex_normals(vertices, faces)
    ld = jnp.asarray(light_dir, jnp.float32)
    ld = ld / jnp.linalg.norm(ld)
    # headlight Lambert + ambient
    vert_shade = 0.25 + 0.75 * jnp.abs(normals @ ld)   # [V]

    tri = screen[faces]                                # [F,3,2]
    tri_z = z[faces]                                   # [F,3]
    tri_shade = vert_shade[faces]                      # [F,3]

    # tile grid anchored at each face's bbox min (clipped to the canvas)
    cover = tile * tile_grid
    bb_min = jnp.floor(tri.min(axis=1)).astype(jnp.int32)          # [F,2]
    bb_min = jnp.clip(bb_min, 0, max(P - cover, 0))
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    big = jnp.float32(1e9)

    def chunk(cell):
        """Rasterise grid cell ``cell`` (= gy·tile_grid + gx, traced int)
        of every face's grid → (flat pixel idx [F·t·t], depth, shade)."""
        gy, gx = cell // tile_grid, cell % tile_grid
        dy, dx = jnp.mgrid[0:tile, 0:tile]
        px = bb_min[:, 0, None, None] + dx[None] + gx * tile   # [F,t,t]
        py = bb_min[:, 1, None, None] + dy[None] + gy * tile
        on_canvas = (px < P) & (py < P)
        pix = jnp.stack([px, py], -1).astype(jnp.float32) + 0.5

        # barycentric coords of every tile pixel wrt its face
        v0 = (b - a)[:, None, None]
        v1 = (c - a)[:, None, None]
        v2 = pix - a[:, None, None]
        d00 = (v0 * v0).sum(-1)
        d01 = (v0 * v1).sum(-1)
        d11 = (v1 * v1).sum(-1)
        d20 = (v2 * v0).sum(-1)
        d21 = (v2 * v1).sum(-1)
        denom = d00 * d11 - d01 * d01   # = (2·area)² in pixel⁴
        # (near-)degenerate faces — e.g. collapsed pole rings, hairline
        # slivers — produce catastrophic-cancellation barycentrics that
        # spuriously pass the inside test across their whole tile window.
        # The cull must be RELATIVE: denom comes from an f32 subtraction of
        # ~|v0|²·|v1|²-scale products, so its noise floor scales with them
        # (absolute thresholds pass sliver noise).  denom/(d00·d11) = sin²θ
        # of the edge angle; cull below ~0.2° (f32 noise is ~1e-7 relative).
        non_degenerate = denom > 1e-5 * d00 * d11 + 1e-12
        denom = jnp.where(non_degenerate, denom, 1.0)
        w1 = (d11 * d20 - d01 * d21) / denom
        w2 = (d00 * d21 - d01 * d20) / denom
        w0 = 1.0 - w1 - w2
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0) & on_canvas
                  & non_degenerate)                              # [F,t,t]

        depth = (w0 * tri_z[:, 0, None, None]
                 + w1 * tri_z[:, 1, None, None]
                 + w2 * tri_z[:, 2, None, None])
        shade = (w0 * tri_shade[:, 0, None, None]
                 + w1 * tri_shade[:, 1, None, None]
                 + w2 * tri_shade[:, 2, None, None])
        flat_idx = (jnp.clip(py, 0, P - 1) * P
                    + jnp.clip(px, 0, P - 1)).reshape(-1)
        return (flat_idx, jnp.where(inside, depth, big).reshape(-1),
                shade.reshape(-1))

    # fori_loop (not an unrolled Python loop) so the chunk body compiles
    # ONCE regardless of tile_grid — auto-sized grids on coarse meshes
    # can reach tile_grid ~26 (676 cells), which unrolled was a
    # multi-minute XLA compile; looped it is milliseconds.
    n_cells = tile_grid * tile_grid

    # pass 1: winning depth per pixel
    def min_depth(cell, zb):
        idx, depth_flat, _ = chunk(cell)
        return zb.at[idx].min(depth_flat)

    zbuf = jax.lax.fori_loop(0, n_cells, min_depth,
                             jnp.full((P * P,), big))

    # pass 2: candidates matching the winning depth write their shade
    def write_shade(cell, sb):
        idx, depth_flat, shade_flat = chunk(cell)
        is_winner = (depth_flat <= zbuf[idx] + 1e-7) & (depth_flat < big)
        return sb.at[idx].max(jnp.where(is_winner, shade_flat, 0.0))

    shade_buf = jax.lax.fori_loop(0, n_cells, write_shade,
                                  jnp.zeros((P * P,)))

    img = shade_buf.reshape(P, P)[..., None] * jnp.asarray(base_color)
    hit = (zbuf < big).reshape(P, P)[..., None]
    return jnp.where(hit, img, 1.0)  # white background


def required_tile_grid(vertices, faces, image_size: int = 512,
                       tile: int = 8, fov_deg: float = 12.0,
                       eye_z: float = 3.0) -> int:
    """Smallest static ``tile_grid`` that draws every face hole-free.

    Host-side numpy mirror of ``render_mesh``'s projection: project the
    vertices, take the per-face screen bbox clipped to the canvas, and
    size the grid to the largest extent.  Because extra grid cells fall
    outside their face's bbox and write nothing, rendering with the
    returned grid is pixel-identical to any larger grid — so auto-sizing
    can only *add* coverage relative to a fixed default, never change
    already-covered output.  ``vertices`` may be [V,3] or [B,V,3]
    (concrete arrays; this runs on host before the jitted render).
    """
    v = np.asarray(jax.device_get(vertices), np.float32)
    if v.ndim == 2:
        v = v[None]
    f = np.asarray(jax.device_get(faces))
    P = image_size
    focal = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    z = np.clip(eye_z - v[..., 2], 1e-6, None)
    sx = (v[..., 0] * focal / z * 0.5 + 0.5) * (P - 1)
    sy = (-v[..., 1] * focal / z * 0.5 + 0.5) * (P - 1)
    tri = np.stack([sx, sy], -1)[:, f]                    # [B,F,3,2]
    lo = np.clip(np.floor(tri.min(axis=2)), 0, P - 1)     # [B,F,2]
    hi = np.clip(tri.max(axis=2), 0, P - 1)
    ext = float((hi - lo).max()) + 1.0
    need = max(1, int(np.ceil(ext / tile)))
    # quantize UP to a power of two (min 4, the historic default): the
    # grid is a jit static arg, and training-vis meshes evolve — an exact
    # per-batch grid would cross tile boundaries and trigger a fresh
    # (remote, 100s+) render_mesh compile each time.  Buckets bound the
    # distinct compiles to ~4 per (image_size, tile) while staying
    # pixel-identical (extra cells write nothing).
    bucket = 4
    while bucket < need:
        bucket *= 2
    return min(bucket, -(-P // tile))


def render_meshes(vertices_b: jax.Array, faces: jax.Array,
                  image_size: int = 512, **kw) -> jax.Array:
    """[B,V,3] → [B,S,S,3] via vmap.

    When ``tile_grid`` is not passed it is auto-sized with
    :func:`required_tile_grid`, removing the fixed ``tile·tile_grid`` px
    face-size bound — arbitrarily coarse meshes render without holes
    (each distinct grid size compiles once; vis-only path).
    """
    if "tile_grid" not in kw:
        kw = dict(kw, tile_grid=required_tile_grid(
            vertices_b, faces, image_size, kw.get("tile", 8),
            kw.get("fov_deg", 12.0), kw.get("eye_z", 3.0)))
    return jax.vmap(lambda v: render_mesh(v, faces, image_size, **kw))(
        vertices_b)


def visualize_grid(images: np.ndarray, path: str | None = None,
                   ncol: int = 4) -> np.ndarray:
    """Tile [N,H,W,3] float [0,1] images into a grid (reference
    lib/MICA/utils/util.py:51-76); optionally save as PNG."""
    n, h, w, c = images.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.ones((nrow * h, ncol * w, c), images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
    if path is not None:
        from PIL import Image

        Image.fromarray((grid.clip(0, 1) * 255).astype(np.uint8)).save(path)
    return grid
