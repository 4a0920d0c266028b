"""On-device image ops: quantisation parity, blob transforms, degrade pairs.

Reference behaviors replaced: core/metrics.py:16-42 (tensor2img),
model/sr3d/model.py:105-131, :462-487 (cv2 detours).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.ops.image import (
    arcface_blob_differentiable,
    arcface_blob_from_uint8,
    bgr_swap,
    degrade_pair,
    resize,
    sr_to_mica_inputs,
    tensor_to_uint8,
    tensor_to_unit,
)


def test_tensor_to_uint8_matches_reference_rounding():
    """Replicates tensor2img: clamp → (x-lo)/(hi-lo) → (·255).round()."""
    x = jnp.asarray([[-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0]])
    out = np.asarray(tensor_to_uint8(x))
    ref = np.clip(np.asarray(x), -1, 1)
    ref = ((ref + 1) / 2 * 255).round()
    np.testing.assert_array_equal(out, ref)
    assert out.min() >= 0 and out.max() <= 255


def test_tensor_to_unit_range():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3)) * 3
    u = np.asarray(tensor_to_unit(x))
    assert u.min() >= 0.0 and u.max() <= 1.0


def test_bgr_swap_involution():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    np.testing.assert_array_equal(np.asarray(bgr_swap(bgr_swap(x))),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(bgr_swap(x)[..., 0]),
                                  np.asarray(x[..., 2]))


def test_arcface_blob_normalisation():
    img = jnp.full((1, 224, 224, 3), 255.0)
    blob = arcface_blob_from_uint8(img)
    assert blob.shape == (1, 112, 112, 3)
    np.testing.assert_allclose(np.asarray(blob), 1.0, atol=1e-6)
    img0 = jnp.zeros((1, 224, 224, 3))
    np.testing.assert_allclose(np.asarray(arcface_blob_from_uint8(img0)),
                               -1.0, atol=1e-6)


def test_blob_matches_cv2_dnn_when_available():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (224, 224, 3)).astype(np.uint8)
    ref = cv2.dnn.blobFromImages(
        [img], 1.0 / 127.5, (112, 112), (127.5, 127.5, 127.5), swapRB=True)
    # cv2 output is NCHW; ours NHWC
    ours = np.asarray(
        arcface_blob_from_uint8(jnp.asarray(img, jnp.float32)[None]))
    ours_nchw = ours.transpose(0, 3, 1, 2)
    # cv2 resize INTER_LINEAR vs jax linear: expect close, not bit-equal
    assert np.abs(ours_nchw - ref).mean() < 0.02


def test_differentiable_blob_has_gradient():
    def f(img):
        return jnp.sum(arcface_blob_differentiable(img))

    g = jax.grad(f)(jnp.full((1, 224, 224, 3), 100.0))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_sr_to_mica_handoff_shapes_and_grad():
    sr = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3),
                            minval=-1, maxval=1)
    img224, blob = sr_to_mica_inputs(sr)
    assert img224.shape == (2, 224, 224, 3)
    assert blob.shape == (2, 112, 112, 3)
    # quantized path blocks gradient (model2 semantics)
    g = jax.grad(lambda s: jnp.sum(sr_to_mica_inputs(s)[1]))(sr)
    assert float(jnp.sum(jnp.abs(g))) == 0.0
    # differentiable path passes gradient (model3 semantics)
    g2 = jax.grad(lambda s: jnp.sum(
        sr_to_mica_inputs(s, differentiable=True)[1]))(sr)
    assert float(jnp.sum(jnp.abs(g2))) > 0.0


def test_degrade_pair_shapes():
    hr = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    lr, cond = degrade_pair(hr, 8, 32)
    assert lr.shape == (2, 8, 8, 3)
    assert cond.shape == (2, 32, 32, 3)


def test_degrade_pair_preserves_dc():
    hr = jnp.full((1, 32, 32, 3), 0.37)
    lr, cond = degrade_pair(hr, 8, 32)
    np.testing.assert_allclose(np.asarray(lr), 0.37, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cond), 0.37, atol=1e-5)


def test_resize_bicubic_matches_pil_downsample():
    """Offline prep parity: PIL BICUBIC downsample ≈ jax cubic antialias
    (the prep tool uses PIL, reference datasets/tool/prepare_data.py:37-47)."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    ref = np.asarray(
        PIL.fromarray(img).resize((16, 16), PIL.BICUBIC), dtype=np.float32)
    ours = np.asarray(resize(jnp.asarray(img, jnp.float32), 16, 16,
                             "bicubic", antialias=True))
    assert np.abs(ours - ref).mean() < 1.5  # sub-LSB mean agreement
