"""Ops: FPS backend parity, warp-vs-reference-convention, region/residual."""

import jax
import jax.numpy as jnp
import numpy as np

from rdpn6d_tpu.ops import (
    crop_affine,
    crop_resize,
    crop_rois_from_frame,
    decode_coord_bins,
    fps_jax,
    fps_native,
    fps_numpy,
    gather_region_fps,
    quantize_coords,
    residual_coord_target,
    xyz_to_region,
)


def test_fps_backends_agree():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    k = 9
    i_np = fps_numpy(pts, k)
    i_cc = fps_native(pts, k)
    i_jx = np.asarray(fps_jax(jnp.asarray(pts), k))
    np.testing.assert_array_equal(i_np, i_cc)
    np.testing.assert_array_equal(i_np, i_jx)
    assert len(set(i_np.tolist())) == k  # distinct points


def test_fps_cube_corners():
    """FPS with 8 samples on a dense cube picks (approximately) the corners."""
    g = np.linspace(-1, 1, 7)
    pts = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3).astype(np.float32)
    idx = fps_numpy(pts, 8)
    chosen = np.sort([tuple(np.round(p)) for p in pts[idx]], axis=0)
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)])
    np.testing.assert_allclose(np.sort(np.abs(pts[idx]), axis=0),
                               np.sort(np.abs(corners), axis=0), atol=1e-6)


def test_fps_jax_respects_mask():
    pts = np.zeros((10, 3), np.float32)
    pts[:5] = np.random.RandomState(1).randn(5, 3)
    pts[5:] = 100.0  # far-away padding that must never be selected
    mask = jnp.arange(10) < 5
    idx = np.asarray(fps_jax(jnp.asarray(pts), 4, mask))
    assert (idx < 5).all()


def test_crop_affine_maps_center():
    center = jnp.array([300.0, 200.0])
    A = crop_affine(center, jnp.asarray(128.0), 64)
    p = A @ jnp.array([300.0, 200.0, 1.0])
    np.testing.assert_allclose(np.asarray(p), [32.0, 32.0], atol=1e-5)
    # corner of the src square -> corner of dst
    p2 = A @ jnp.array([300.0 - 64.0, 200.0 - 64.0, 1.0])
    np.testing.assert_allclose(np.asarray(p2), [0.0, 0.0], atol=1e-5)


def test_crop_resize_identity():
    """Cropping a window at the image center with scale == out_size is identity."""
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64, 3).astype(np.float32))
    out = crop_resize(img, jnp.array([32.0, 32.0]), 64.0, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_crop_resize_downscale_linear():
    """2x box downscale of a linear ramp stays a linear ramp (bilinear)."""
    ramp = jnp.broadcast_to(jnp.arange(128.0)[None, :, None], (128, 128, 1))
    out = crop_resize(ramp, jnp.array([64.0, 64.0]), 128.0, 64)
    # output pixel j samples src at 64 + (j - 32) * 2
    expect = 64.0 + (jnp.arange(64.0) - 32.0) * 2.0
    got = np.asarray(out[32, :, 0])
    expect = np.clip(np.asarray(expect), 0, 127)
    np.testing.assert_allclose(got[1:-1], expect[1:-1], atol=1e-3)


def test_crop_resize_nearest_zeros_outside():
    img = jnp.ones((32, 32))
    out = crop_resize(img, jnp.array([0.0, 0.0]), 32.0, 32, interp="nearest")
    # window centered at origin: ~3/4 falls outside -> zeros
    o = np.asarray(out)
    assert o[0, 0] == 0.0  # top-left corner samples (-16, -16)
    assert o[-1, -1] == 1.0  # bottom-right samples (15, 15), h=16+15-16


def test_crop_rois_from_frame_batch():
    img = jnp.asarray(np.random.RandomState(2).rand(48, 64, 3).astype(np.float32))
    centers = jnp.array([[32.0, 24.0], [10.0, 10.0]])
    scales = jnp.array([32.0, 16.0])
    rois = crop_rois_from_frame(img, centers, scales, 16)
    assert rois.shape == (2, 16, 16, 3)


def test_xyz_to_region_and_residual():
    fps = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    xyz = jnp.zeros((4, 4, 3))
    xyz = xyz.at[0, 0].set(jnp.array([0.9, 0.0, 0.0]))   # near fps[0]
    xyz = xyz.at[1, 1].set(jnp.array([-0.8, 0.1, 0.0]))  # near fps[1]
    region, delta = xyz_to_region(xyz, fps)
    r = np.asarray(region)
    assert r[0, 0] == 1 and r[1, 1] == 2
    assert r[2, 2] == 0  # background
    np.testing.assert_allclose(np.asarray(delta[0, 0]), [-0.1, 0, 0], atol=1e-6)


def test_residual_coord_target_rotation():
    fps = jnp.array([[0.0, 0.0, 0.0]])
    xyz = jnp.zeros((2, 2, 3)).at[0, 0].set(jnp.array([0.1, 0.0, 0.0]))
    Rz90 = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    extent = jnp.array([1.0, 1.0, 1.0])
    region, coord = residual_coord_target(xyz, fps, Rz90, extent)
    # R @ (0.1,0,0) = (0,0.1,0); normalized -> +0.5
    np.testing.assert_allclose(np.asarray(coord[0, 0]), [0.5, 0.6, 0.5],
                               atol=1e-6)


def test_gather_region_fps():
    fps = jnp.array([[[1.0, 1, 1], [2.0, 2, 2], [3.0, 3, 3]]])  # [1, 3, 3]
    ids = jnp.array([[[0, 2], [1, 1]]])  # [1, 2, 2]
    out = gather_region_fps(fps, ids)
    np.testing.assert_allclose(np.asarray(out[0, 0, 1]), [3, 3, 3])
    np.testing.assert_allclose(np.asarray(out[0, 1, 0]), [2, 2, 2])


def test_binning_roundtrip():
    coord = jnp.asarray(np.random.RandomState(3).rand(8, 8, 3).astype(np.float32))
    mask = jnp.ones((8, 8))
    bins = quantize_coords(coord, mask, 64)
    onehot = jax.nn.one_hot(bins, 65) * 100.0
    dec = decode_coord_bins(onehot[..., 0, :], onehot[..., 1, :],
                            onehot[..., 2, :], 64)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(coord), atol=1.0 / 63)


def test_binning_background():
    coord = jnp.full((4, 4, 3), 0.7)
    mask = jnp.zeros((4, 4))
    bins = quantize_coords(coord, mask, 64)
    assert (np.asarray(bins) == 64).all()
