"""ArcFace, MappingNetwork, EMA, config, export units."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg
from sr3d_tpu.diffusion.ema import ema_init, ema_update
from sr3d_tpu.eval.export import (
    export_prediction,
    landmarks_7,
    read_obj,
    write_obj,
)
from sr3d_tpu.models.arcface import IResNet, frozen_prefix_mask
from sr3d_tpu.models.mapping import MappingNetwork


def test_arcface_embedding_shape_and_input_grad():
    net = IResNet(layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 112, 112, 3))
    variables = net.init(jax.random.PRNGKey(1), x)
    emb = net.apply(variables, x)
    assert emb.shape == (2, 512)

    # input gradient flows through the whole net (model3 needs
    # ∂l_mica/∂blob; freezing is an optimizer concern, not an activation
    # stop_gradient — see arcface.py docstring)
    gx = jax.grad(lambda xx: jnp.sum(net.apply(variables, xx) ** 2))(x)
    assert float(jnp.sum(jnp.abs(gx))) > 0.0


def test_arcface_frozen_prefix_not_updated_by_optimizer():
    """The joint optimizer zeroes updates on the frozen prefix
    (reference freezer semantics, model/mica/arcface.py:171-176)."""
    import optax

    from sr3d_tpu.config.defaults import get_cfg_defaults
    from sr3d_tpu.train.joint import make_optimizer

    net = IResNet(layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    params = {"sr": {"w": jnp.ones((2,))},
              "arcface": variables["params"],
              "mapping": {"w": jnp.ones((2,))}}
    opt = make_optimizer(get_cfg_defaults())
    opt_state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, opt_state, params)
    frozen_leaves = [
        v for k in ("conv1", "bn1", "prelu", "layer1", "layer2", "layer3")
        if k in updates["arcface"]
        for v in jax.tree_util.tree_leaves(updates["arcface"][k])]
    trainable_leaves = [
        v for k in ("layer4", "bn2", "fc", "features")
        if k in updates["arcface"]
        for v in jax.tree_util.tree_leaves(updates["arcface"][k])]
    assert all(float(jnp.sum(jnp.abs(v))) == 0.0 for v in frozen_leaves)
    assert any(float(jnp.sum(jnp.abs(v))) > 0.0 for v in trainable_leaves)


def test_frozen_prefix_mask_structure():
    net = IResNet(layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 112, 112, 3)))
    mask = frozen_prefix_mask(variables["params"])
    assert mask["conv1"]["kernel"] is False
    assert mask["fc"]["kernel"] is True
    flat_leaves = jax.tree_util.tree_leaves(mask)
    assert any(flat_leaves) and not all(flat_leaves)


def test_mapping_network_output_scale():
    """0.25-scaled output init → small initial shape codes (reference
    model/mica/generator.py:52-58)."""
    net = MappingNetwork(z_dim=512, map_hidden_dim=300, map_output_dim=300)
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 512))
    out = net.apply(p, z)
    assert out.shape == (8, 300)
    assert float(jnp.std(out)) < 1.0


def test_mapping_skip_connection_deep():
    net = MappingNetwork(z_dim=32, map_hidden_dim=16, map_output_dim=8,
                         hidden=6)  # hidden>5 → skip concat mid-network
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    out = net.apply(p, jnp.ones((2, 32)))
    assert out.shape == (2, 8)


def test_ema_converges_to_params():
    params = {"w": jnp.ones((4,)) * 2.0}
    state = ema_init({"w": jnp.zeros((4,))})
    for _ in range(200):
        state = ema_update(state, params, decay=0.9, step_start_ema=0,
                           update_every=1)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 2.0, atol=1e-4)


def test_ema_copies_during_warmup():
    """Before step_start_ema the EMA tracks params exactly (warmup copy)."""
    params = {"w": jnp.zeros((2,))}
    state = ema_init({"w": jnp.ones((2,))})
    state = ema_update(state, params, decay=0.5, step_start_ema=100,
                       update_every=1)
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0)


def test_config_yaml_roundtrip(tmp_path):
    cfg = get_cfg_defaults()
    p = tmp_path / "o.yml"
    cfg.dump(str(p))
    cfg2 = get_cfg_defaults()
    cfg2.merge_from_file(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_config_reference_yaml_schema(tmp_path):
    """A reference-style experiment YAML merges cleanly."""
    y = tmp_path / "exp.yml"
    y.write_text("""
name: sr_sr3_VGGF2_16_128_model3
model: model3
sr:
  model:
    beta_schedule:
      train: {schedule: linear, n_timestep: 600, linear_start: 1.0e-6, linear_end: 1.0e-2}
  datasets:
    train: {l_resolution: 16, r_resolution: 128, batch_size: 4}
mica:
  train: {max_steps: 200000}
""")
    cfg = update_cfg(get_cfg_defaults(), str(y))
    assert cfg.model == "model3"
    assert cfg.sr.model.beta_schedule.train.n_timestep == 600
    assert cfg.sr.datasets.train.l_resolution == 16
    assert cfg.sr.datasets.train.use_shuffle is True  # default preserved
    assert cfg.mica.train.max_steps == 200000


def test_export_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(32, 3).astype(np.float32)
    faces = rng.randint(0, 32, (40, 3)).astype(np.int32)
    lmk68 = rng.randn(68, 3).astype(np.float32)
    code = rng.randn(16).astype(np.float32)
    export_prediction(tmp_path, verts, faces, code, lmk68)
    assert sorted(os.listdir(tmp_path)) == [
        "identity.npy", "kpt68.npy", "kpt7.npy", "mesh.obj", "mesh.ply"]
    v, f = read_obj(tmp_path / "mesh.obj")
    np.testing.assert_allclose(v, verts * 1000.0, atol=1e-3)
    np.testing.assert_array_equal(f, faces)
    k7 = np.load(tmp_path / "kpt7.npy")
    np.testing.assert_allclose(k7, landmarks_7(lmk68) * 1000.0, rtol=1e-6)


def test_landmarks_7_indexing():
    lmk68 = np.arange(68 * 3).reshape(68, 3).astype(np.float32)
    k7 = landmarks_7(lmk68)
    # 7-point = lmk51[[19,22,25,28,16,31,37]], lmk51 = lmk68[17:]
    expected_rows = np.array([19, 22, 25, 28, 16, 31, 37]) + 17
    np.testing.assert_array_equal(k7, lmk68[expected_rows])


def test_obj_write_read_identity(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    write_obj(tmp_path / "t.obj", verts, faces)
    v, f = read_obj(tmp_path / "t.obj")
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(f, faces)


def test_soft_ring_expansion_and_submesh():
    """Soft-ring mask growth (reference masking.py:131-145: ring r gets
    value/(r+2)) and the masked-submesh extraction."""
    import numpy as np

    from sr3d_tpu.models.masking import (
        binary_triangle_mask,
        make_soft,
        masked_submesh,
        vertex_neighbours,
        weights_with_soft_rings,
    )

    # a 1D chain 0-1-2-3-4-5 as degenerate triangles for known adjacency
    faces = np.array([[0, 1, 1], [1, 2, 2], [2, 3, 3], [3, 4, 4],
                      [4, 5, 5]])
    nbrs = vertex_neighbours(faces, 6)
    soft = make_soft(np.array([0]), 12.0, nbrs, degree=3)
    # ring 0 = {1} @ 12/2, ring 1 = {2} @ 12/3, ring 2 = {3} @ 12/4
    assert [list(r) for r, _ in soft] == [[1], [2], [3]]
    assert [v for _, v in soft] == [6.0, 4.0, 3.0]

    masks = {"face": np.array([0])}
    w = weights_with_soft_rings(masks, {"whole": 1.0, "face": 12.0},
                                faces, 6, soft_regions=("face",), degree=3)
    np.testing.assert_allclose(w[:, 0], [12.0, 6.0, 4.0, 3.0, 1.0, 1.0])

    # submesh: keep faces fully inside {0,1,2} and reindex
    tri_mask = binary_triangle_mask(faces, np.array([0, 1, 2]))
    np.testing.assert_array_equal(tri_mask, [True, True, False, False,
                                             False])
    verts = np.arange(18, dtype=np.float64).reshape(6, 3)
    sv, sf = masked_submesh(verts, faces, tri_mask)
    assert sv.shape == (3, 3) and sf.shape == (2, 3)
    np.testing.assert_array_equal(sf, [[0, 1, 1], [1, 2, 2]])
    np.testing.assert_array_equal(sv, verts[:3])
