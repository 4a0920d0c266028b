"""Rasterizer correctness: full-bbox coverage (no holes) + golden render.

VERDICT r1 #7: the round-1 renderer drew a single 8-px tile per face,
leaving holes in any face whose screen bbox exceeded 8 px.
"""

import numpy as np
import pytest

from sr3d_tpu.eval.renderer import (
    render_mesh,
    render_meshes,
    required_tile_grid,
    visualize_grid,
)


def make_sphere(n_theta=12, n_phi=16, radius=0.12):
    """Coarse UV sphere — faces span tens of pixels at 512² (the regression
    case).  Convex: every pixel between a row's first/last hit must be hit."""
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append([radius * np.sin(t) * np.cos(p),
                          radius * np.cos(t),
                          radius * np.sin(t) * np.sin(p)])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces += [[a, b, c], [b, d, c]]
    return verts, np.asarray(faces, np.int32)


def interior_hole_fraction(img: np.ndarray) -> float:
    """Fraction of background pixels strictly between each row's first and
    last foreground pixel."""
    fg = img[..., 0] < 0.999  # white background
    holes = total = 0
    for row in fg:
        idx = np.nonzero(row)[0]
        if len(idx) < 2:
            continue
        span = row[idx[0]:idx[-1] + 1]
        holes += int((~span).sum())
        total += len(span)
    return holes / max(total, 1)


def test_no_holes_on_large_faces():
    verts, faces = make_sphere()
    img = np.asarray(render_mesh(verts, faces, image_size=512,
                                 tile=16, tile_grid=4))
    assert img.shape == (512, 512, 3)
    fg_frac = float((img[..., 0] < 0.999).mean())
    assert fg_frac > 0.02, "sphere must be visible"
    assert interior_hole_fraction(img) < 0.002


def test_single_tile_regression_would_hole():
    """Documents the round-1 bug: with tile_grid=1 (the old behavior) the
    same sphere holes out."""
    verts, faces = make_sphere()
    img = np.asarray(render_mesh(verts, faces, image_size=512,
                                 tile=8, tile_grid=1))
    assert interior_hole_fraction(img) > 0.05


def test_camera_views_front_not_back():
    """A tilted near (+z) quad must occlude a far (-z) quad at the image
    center — a review found the camera sat on -z, so renders showed the
    BACK of the FLAME head (canonical heads face +z)."""
    c, s = np.cos(np.deg2rad(60)), np.sin(np.deg2rad(60))
    front = np.array([[x * c, y, -x * s + 0.1]
                      for x, y in [(-0.1, -0.1), (0.1, -0.1),
                                   (0.1, 0.1), (-0.1, 0.1)]], np.float32)
    back = np.array([[x, y, -0.1]
                     for x, y in [(-0.2, -0.2), (0.2, -0.2),
                                  (0.2, 0.2), (-0.2, 0.2)]], np.float32)
    verts = np.concatenate([front, back])
    faces = np.array([[0, 1, 2], [0, 2, 3],
                      [4, 5, 6], [4, 6, 7]], np.int32)
    img = np.asarray(render_mesh(verts, faces, image_size=128))
    center = float(img[64, 64, 0])
    # tilted front quad: shade = 0.25+0.75·cos60 = 0.625 → 0.5 grey;
    # the back quad (shade 1.0 → 0.8) would win under the -z camera bug
    assert center < 0.6, f"far quad visible through near quad ({center})"
    assert center > 0.3, "nothing rendered at center"


def test_golden_flame_render(tmp_path):
    """Golden render of the synthetic FLAME mean head (256², fixed camera).
    Regenerate tests/golden/flame_render_256.npy ONLY for deliberate
    renderer changes and justify in the commit message."""
    from pathlib import Path

    from sr3d_tpu.models.flame import flame_forward, synthetic_flame
    import jax.numpy as jnp

    fl = synthetic_flame(n_shape=16, n_exp=8, seed=0)
    verts, _, _ = flame_forward(fl, jnp.zeros((1, 16)))
    img = np.asarray(render_mesh(np.asarray(verts[0]),
                                 np.asarray(fl.faces), image_size=256))
    u8 = (img.clip(0, 1) * 255).astype(np.uint8)
    golden_path = Path(__file__).parent / "golden" / "flame_render_256.npy"
    if not golden_path.exists():  # first run: write the golden
        golden_path.parent.mkdir(exist_ok=True)
        np.save(golden_path, u8)
    golden = np.load(golden_path)
    assert u8.shape == golden.shape
    # quantised tolerance: identical up to float noise
    assert float(np.mean(np.abs(u8.astype(int) - golden.astype(int)))) < 1.0
    assert float((np.abs(u8.astype(int) - golden.astype(int)) > 8).mean()) \
        < 0.005


def test_auto_tile_grid_covers_coarse_mesh():
    """VERDICT r2 weak #5: faces wider than tile·tile_grid=32 px used to
    stay partially drawn.  An 8-face octahedron at 256² (faces span ~100
    px) must render hole-free through the auto-sized render_meshes path,
    while the old fixed grid (tile_grid=4) demonstrably holes out."""
    verts = np.array([[0.15, 0, 0], [-0.15, 0, 0], [0, 0.15, 0],
                      [0, -0.15, 0], [0, 0, 0.15], [0, 0, -0.15]],
                     np.float32)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                     np.int32)
    need = required_tile_grid(verts, faces, image_size=256)
    assert need > 4, "test mesh must exceed the old fixed coverage"
    holed = np.asarray(render_mesh(verts, faces, image_size=256,
                                   tile_grid=4))
    assert interior_hole_fraction(holed) > 0.05, \
        "old fixed grid should hole out on this mesh"
    auto = np.asarray(render_meshes(verts[None], faces,
                                    image_size=256))[0]
    # ~0.2% residual comes from shared-edge pixels failing the inside
    # test on both faces (rasterisation artifact, identical at any
    # sufficient grid) — not coverage; the equality check below is the
    # actual full-coverage proof.
    assert interior_hole_fraction(auto) < 0.005
    # auto-sized grid is pixel-identical to an over-provisioned one
    big = np.asarray(render_mesh(verts, faces, image_size=256,
                                 tile_grid=need + 3))
    np.testing.assert_array_equal(auto, big)


def test_required_tile_grid_quantized():
    """The auto grid is a jit STATIC arg: it must land on power-of-two
    buckets (min 4) so evolving training-vis meshes don't trigger a fresh
    remote compile every time their bbox crosses a tile boundary."""
    verts, faces = make_sphere(6, 8)
    for scale in (0.1, 0.4, 0.8, 1.2):
        g = required_tile_grid(verts * scale, faces, image_size=256)
        assert g >= 4 and (g & (g - 1)) == 0 or g == -(-256 // 8), g
    # slightly different meshes in the same bucket → same static value
    g1 = required_tile_grid(verts, faces, image_size=512)
    g2 = required_tile_grid(verts * 1.02, faces, image_size=512)
    assert g1 == g2


def test_render_meshes_batch_and_grid(tmp_path):
    verts, faces = make_sphere(6, 8)
    imgs = np.asarray(render_meshes(np.stack([verts, verts * 1.1]), faces,
                                    image_size=64))
    assert imgs.shape == (2, 64, 64, 3)
    grid = visualize_grid(imgs, path=str(tmp_path / "g.png"))
    assert grid.shape == (64, 128, 3)
    assert (tmp_path / "g.png").exists()
