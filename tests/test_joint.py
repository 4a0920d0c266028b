"""Joint model: train/val step semantics for model2/model3.

Reference behavior: model/sr3d/model.py:441-533 (forward), :280-325 (losses),
lib/trainer_temp.py:309-334 (dual optimizer update).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr3d_tpu.config.defaults import get_cfg_defaults
from sr3d_tpu.train.joint import (
    build_joint,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_val_step,
)


def tiny_cfg(variant="model2"):
    cfg = get_cfg_defaults()
    cfg.model = variant
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.sample_remat = False
    cfg.tpu.train_remat = False
    cfg.sr.model.unet.inner_channel = 16
    cfg.sr.model.unet.norm_groups = 8
    cfg.sr.model.unet.channel_multiplier = [1, 2]
    cfg.sr.model.unet.attn_res = [8]
    cfg.sr.model.unet.res_blocks = 1
    cfg.sr.model.unet.dropout = 0.0
    cfg.sr.model.diffusion.image_size = 16
    for ph in ("train", "val"):
        cfg.sr.model.beta_schedule[ph].n_timestep = 8
        cfg.sr.model.beta_schedule[ph].linear_start = 1e-4
        cfg.sr.model.beta_schedule[ph].linear_end = 5e-2
    cfg.mica.model.n_shape = 16
    cfg.mica.model.n_exp = 8
    cfg.mica.model.map_hidden_dim = 32
    cfg.mica.model.arcface_layers = [1, 1, 1, 1]
    return cfg


def batch_of(n=2, hr=16, n_shape=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "HR": jnp.asarray(rng.uniform(-1, 1, (n, hr, hr, 3)), jnp.float32),
        "SR": jnp.asarray(rng.uniform(-1, 1, (n, hr, hr, 3)), jnp.float32),
        "flame_shape": jnp.asarray(rng.randn(n, n_shape) * 0.3, jnp.float32),
    }


@pytest.fixture(scope="module", params=["model2", "model3"])
def joint_setup(request):
    cfg = tiny_cfg(request.param)
    modules = build_joint(cfg)
    opt = make_optimizer(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    return cfg, modules, opt, state


def test_train_step_runs_and_updates(joint_setup):
    cfg, modules, opt, state = joint_setup
    step = make_train_step(opt)
    new_state, metrics = step(modules, state, batch_of(), jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k in ("l_sr", "l_mica", "loss"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    old_leaves = jax.tree_util.tree_leaves(state.params)
    new_leaves = jax.tree_util.tree_leaves(new_state.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(old_leaves, new_leaves))


def test_loss_partition_semantics():
    """model2: l_mica must NOT produce grads on the UNet; model3 must."""
    for variant, expect_sr_grad in [("model2", False), ("model3", True)]:
        cfg = tiny_cfg(variant)
        modules = build_joint(cfg)
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
        batch = batch_of()

        from sr3d_tpu.diffusion.gaussian import p_sample_loop
        from sr3d_tpu.models import masking as masking_ops
        from sr3d_tpu.ops.image import sr_to_mica_inputs
        from sr3d_tpu.train.joint import (
            decode_mica,
            encode_mica,
            gt_flame_vertices,
        )

        differentiable = variant == "model3"

        def l_mica_only(sr_params):
            params = dict(state.params, sr=sr_params)
            denoise = lambda x, t: modules.unet.apply(sr_params, x, t)
            sample = p_sample_loop(denoise, modules.sched_train, batch["SR"],
                                   jax.random.PRNGKey(0),
                                   differentiable=differentiable, remat=False)
            _, blob = sr_to_mica_inputs(sample.final,
                                        differentiable=differentiable)
            emb, _ = encode_mica(modules, params, state.arcface_stats, blob,
                                 train=False)
            pred, _ = decode_mica(modules, params, emb)
            gt = gt_flame_vertices(modules, batch["flame_shape"])
            return masking_ops.masked_vertex_l1(pred, gt,
                                                modules.vertex_weights)

        g = jax.grad(l_mica_only)(state.params["sr"])
        gnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
        if expect_sr_grad:
            assert gnorm > 0.0, "model3 must backprop l_mica into the UNet"
        else:
            assert gnorm == 0.0, "model2 must sever l_mica → UNet gradient"


def test_handoff_source_control_arms():
    """train.handoff_source: "cond"/"hr" are the bicubic/HR-oracle control
    arms for the SR→reconstruction value-chain study (VERDICT r4 #2).
    They must (a) change what MICA sees (different l_mica) while leaving
    l_sr untouched, (b) carry NO θ_sr dependence even under model3
    flow-through (no sampling happens), and (c) reject unknown values."""
    from sr3d_tpu.train.joint import make_eval_step

    batch = batch_of()
    rng = jax.random.PRNGKey(3)
    out = {}
    for src in ("sampled", "cond", "hr"):
        cfg = tiny_cfg("model2")
        cfg.train.handoff_source = src
        modules = build_joint(cfg)
        assert modules.handoff_source == src
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
        out[src] = {k: float(v) for k, v in
                    make_eval_step()(modules, state, batch, rng).items()}
    # l_sr identical (hand-off never touches it); l_mica differs per source
    assert out["cond"]["l_sr"] == out["hr"]["l_sr"] == out["sampled"]["l_sr"]
    assert out["cond"]["l_mica"] != out["hr"]["l_mica"]
    assert out["sampled"]["l_mica"] != out["cond"]["l_mica"]

    # model3 flow-through + control source → still zero l_mica→UNet grad
    cfg = tiny_cfg("model3")
    cfg.train.handoff_source = "cond"
    modules = build_joint(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    from sr3d_tpu.models import masking as masking_ops
    from sr3d_tpu.ops.image import sr_to_mica_inputs
    from sr3d_tpu.train.joint import (
        _handoff_image,
        decode_mica,
        encode_mica,
        gt_flame_vertices,
    )

    def l_mica_only(sr_params):
        params = dict(state.params, sr=sr_params)
        img = _handoff_image(modules, sr_params, batch["SR"], batch["HR"],
                             jax.random.PRNGKey(0), differentiable=True)
        _, blob = sr_to_mica_inputs(img, differentiable=True)
        emb, _ = encode_mica(modules, params, state.arcface_stats, blob,
                             train=False)
        pred, _ = decode_mica(modules, params, emb)
        gt = gt_flame_vertices(modules, batch["flame_shape"])
        return masking_ops.masked_vertex_l1(pred, gt, modules.vertex_weights)

    g = jax.grad(l_mica_only)(state.params["sr"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
    assert gnorm == 0.0

    cfg = tiny_cfg("model2")
    cfg.train.handoff_source = "nope"
    modules = build_joint(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    with pytest.raises(ValueError, match="handoff_source"):
        make_eval_step()(modules, state, batch, rng)


@pytest.mark.parametrize("variant,sever", [("model2", False),
                                           ("model3", True),
                                           ("model3", False)])
def test_train_sampler_ddim_handoff(variant, sever):
    """train_sampler="ddim" (the fast in-step SR→MICA hand-off) must (a)
    run through the full jitted train step with finite losses and updated
    params, and (b) preserve the gradient-partition semantics: model2 and
    severed model3 keep l_mica→UNet severed, differentiable model3 keeps
    the (now 4-step) sampling chain on the tape."""
    cfg = tiny_cfg(variant)
    cfg.train.sever_sr_grad = sever
    cfg.sr.model.diffusion.train_sampler = "ddim"
    cfg.sr.model.diffusion.train_ddim_steps = 4
    modules = build_joint(cfg)
    assert modules.train_sampler == "ddim"
    opt = make_optimizer(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    batch = batch_of()

    step_fn = jax.jit(make_train_step(opt))
    new_state, metrics = step_fn(modules, state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_reduce(
        lambda a, pair: a + float(jnp.sum(jnp.abs(pair))),
        jax.tree_util.tree_map(lambda a, b: a - b,
                               new_state.params, state.params), 0.0)
    assert changed > 0.0

    # partition: l_mica alone → UNet grads iff differentiable model3
    from sr3d_tpu.models import masking as masking_ops
    from sr3d_tpu.ops.image import sr_to_mica_inputs
    from sr3d_tpu.train.joint import (
        _handoff_sample,
        decode_mica,
        encode_mica,
        gt_flame_vertices,
    )

    differentiable = variant == "model3" and not sever

    def l_mica_only(sr_params):
        params = dict(state.params, sr=sr_params)
        denoise = lambda x, t: modules.unet.apply(sr_params, x, t)
        final = _handoff_sample(modules, denoise, batch["SR"],
                                jax.random.PRNGKey(0), differentiable)
        if not differentiable:
            final = jax.lax.stop_gradient(final)
        _, blob = sr_to_mica_inputs(final, differentiable=differentiable)
        emb, _ = encode_mica(modules, params, state.arcface_stats, blob,
                             train=False)
        pred, _ = decode_mica(modules, params, emb)
        gt = gt_flame_vertices(modules, batch["flame_shape"])
        return masking_ops.masked_vertex_l1(pred, gt, modules.vertex_weights)

    g = jax.grad(l_mica_only)(state.params["sr"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
    if differentiable:
        assert gnorm > 0.0, "model3 must backprop l_mica through ddim"
    else:
        assert gnorm == 0.0, "quantized/severed hand-off must stay severed"


def test_train_handoff_int8():
    """train_handoff_int8: the in-step hand-off samples through the w8a8
    path while l_sr's p_losses term stays fp — with the same rng, l_sr must
    be BIT-IDENTICAL to the fp-hand-off step and l_mica must differ (the
    MICA branch saw an int8-sampled image).  Flow-through model3 must
    raise (int8 rounding has zero gradient), as must a missing
    quant_min_res."""
    batch = batch_of()

    def run(variant, sever=False, int8=False, qmr=0):
        cfg = tiny_cfg(variant)
        cfg.train.sever_sr_grad = sever
        cfg.sr.model.diffusion.train_sampler = "ddim"
        cfg.sr.model.diffusion.train_ddim_steps = 4
        cfg.sr.model.diffusion.train_handoff_int8 = int8
        cfg.sr.model.unet.quant_min_res = qmr
        modules = build_joint(cfg)
        opt = make_optimizer(cfg)
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
        step = jax.jit(make_train_step(opt))
        _, metrics = step(modules, state, batch, jax.random.PRNGKey(1))
        return metrics

    m_fp = run("model2")
    m_i8 = run("model2", int8=True, qmr=1)
    assert np.isfinite(float(m_i8["loss"]))
    # l_sr path is fp in both steps and consumes the same rng split
    assert float(m_fp["l_sr"]) == float(m_i8["l_sr"])
    # the hand-off image actually changed (int8 sampling fed MICA)
    assert float(m_fp["l_mica"]) != float(m_i8["l_mica"])

    # severed model3 is also a legal int8-hand-off variant
    m3 = run("model3", sever=True, int8=True, qmr=1)
    assert np.isfinite(float(m3["loss"]))

    # flow-through model3 must raise, as must quant_min_res unset
    with pytest.raises(ValueError, match="gradient-severed"):
        run("model3", int8=True, qmr=1)
    with pytest.raises(ValueError, match="quant_min_res"):
        run("model2", int8=True, qmr=0)


def test_use_mask_flag_controls_vertex_weights():
    """Reference default (use_mask=False) → PLAIN mean|diff|×1000; region
    weights apply only when cfg.mica.train.use_mask is set
    (model/sr3d/model.py:318-322 `if self.use_mask`)."""
    cfg = tiny_cfg()
    assert cfg.mica.train.use_mask is False  # the reference default
    plain = build_joint(cfg)
    np.testing.assert_array_equal(np.asarray(plain.vertex_weights), 1.0)

    cfg.mica.train.use_mask = True
    masked = build_joint(cfg)
    w = np.asarray(masked.vertex_weights)
    assert w.min() != w.max(), "use_mask=True must apply region weights"


def test_model3_sever_sr_grad_reference_literal():
    """cfg.train.sever_sr_grad=True reproduces the reference's literal
    model3: continuous (unquantised) blob hand-off, but ∂l_mica/∂θ_sr
    severed (.detach(), model/sr3d/model.py:483-490)."""
    from sr3d_tpu.diffusion.gaussian import p_sample_loop
    from sr3d_tpu.models import masking as masking_ops
    from sr3d_tpu.ops.image import sr_to_mica_inputs
    from sr3d_tpu.train.joint import (
        decode_mica,
        encode_mica,
        gt_flame_vertices,
    )

    cfg = tiny_cfg("model3")
    cfg.train.sever_sr_grad = True
    modules = build_joint(cfg)
    assert modules.sever_sr_grad is True
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    batch = batch_of()

    def l_mica_only(sr_params):
        params = dict(state.params, sr=sr_params)
        denoise = lambda x, t: modules.unet.apply(sr_params, x, t)
        sample = p_sample_loop(denoise, modules.sched_train, batch["SR"],
                               jax.random.PRNGKey(0),
                               differentiable=False, remat=False)
        final = jax.lax.stop_gradient(sample.final)
        # continuous blob (differentiable path), matching the train step
        _, blob = sr_to_mica_inputs(final, differentiable=True)
        emb, _ = encode_mica(modules, params, state.arcface_stats, blob,
                             train=False)
        pred, _ = decode_mica(modules, params, emb)
        gt = gt_flame_vertices(modules, batch["flame_shape"])
        return masking_ops.masked_vertex_l1(pred, gt,
                                            modules.vertex_weights)

    g = jax.grad(l_mica_only)(state.params["sr"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
    assert gnorm == 0.0

    # and the severed train step still runs end-to-end
    opt = make_optimizer(cfg)
    step = make_train_step(opt)
    s1, m = jax.jit(step)(modules, init_train_state(
        modules, cfg, jax.random.PRNGKey(1), 16), batch,
        jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_grad_accumulation_matches_big_batch():
    """cfg.tpu.grad_accum=k: k micro-batch steps average into ONE optimizer
    update that matches the big-batch step (optax.MultiSteps wrap in
    make_optimizer).  Uses the SR p_losses only (deterministic given rng);
    the joint step's sampled-MICA path would need identical noise across
    layouts, which batch splitting changes."""
    from sr3d_tpu.diffusion.gaussian import p_losses_continuous

    cfg = tiny_cfg()
    modules = build_joint(cfg)
    state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
    sr0 = state.params["sr"]
    rng = np.random.RandomState(7)
    hr = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)), jnp.float32)
    cond = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)), jnp.float32)
    # per-sample losses with per-sample keys so micro/big batches see the
    # SAME noise per image (vmap over the batch)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)

    def one(params, h, c, k):
        return p_losses_continuous(
            lambda x, t: modules.unet.apply(params, x, t),
            modules.sched_train, h[None], c[None], k) / h.size

    def mean_loss(params, h, c, ks):
        return jnp.mean(jax.vmap(one, in_axes=(None, 0, 0, 0))(
            params, h, c, ks))

    import optax

    # SGD: the update is linear in the gradient, so micro-mean == big-batch
    # holds tightly (Adam's m/√v normalisation amplifies ~1e-7 association
    # noise on near-zero grads into lone outliers)
    base = optax.sgd(1e-2)
    g_big = jax.grad(mean_loss)(sr0, hr, cond, keys)
    upd, _ = base.update(g_big, base.init(sr0), sr0)
    big = optax.apply_updates(sr0, upd)

    acc = optax.MultiSteps(base, every_k_schedule=2).gradient_transformation()
    acc_state = acc.init(sr0)
    params = sr0
    for i in range(2):
        sl = slice(2 * i, 2 * i + 2)
        g = jax.grad(mean_loss)(params, hr[sl], cond[sl], keys[sl])
        upd, acc_state = acc.update(g, acc_state, params)
        params = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)

    # and the joint trainer's optimizer honours the config knob end-to-end
    cfg.tpu.grad_accum = 2
    opt = make_optimizer(cfg)
    step = make_train_step(opt)
    st = init_train_state(modules, cfg, jax.random.PRNGKey(1), 16)
    batch = batch_of()
    st1, _ = jax.jit(step)(modules, st, batch, jax.random.PRNGKey(2))
    # first micro-step: update withheld, params unchanged
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    st2, _ = jax.jit(step)(modules, st1, batch, jax.random.PRNGKey(4))
    changed = any(
        np.any(np.asarray(a) != np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(st2.params["sr"]),
                        jax.tree_util.tree_leaves(st.params["sr"])))
    assert changed, "second micro-step must apply the accumulated update"


def test_mica_loss_zero_for_perfect_prediction():
    cfg = tiny_cfg()
    modules = build_joint(cfg)
    from sr3d_tpu.models import masking as masking_ops
    v = jnp.ones((2, modules.flame.n_vertices, 3))
    assert float(masking_ops.masked_vertex_l1(
        v, v, modules.vertex_weights)) == 0.0


def test_mica_loss_scale_is_mm():
    """1e-3 uniform vertex error × whole-weight 1 → loss ≈ 1.0 (mm scale,
    reference model/sr3d/model.py:323 ×1000)."""
    cfg = tiny_cfg()
    cfg.mica.mask_weights = {"whole": 1.0}
    modules = build_joint(cfg)
    import numpy as np
    v = jnp.zeros((1, modules.flame.n_vertices, 3))
    loss = float(__import__("sr3d_tpu.models.masking",
                            fromlist=["masked_vertex_l1"]).masked_vertex_l1(
        v + 1e-3, v, jnp.ones((modules.flame.n_vertices, 1))))
    assert loss == pytest.approx(1.0, rel=1e-4)


def test_val_step_outputs(joint_setup):
    cfg, modules, opt, state = joint_setup
    val = make_val_step()
    out = val(modules, state, batch_of(), jax.random.PRNGKey(0))
    assert out["sr"].shape == (2, 16, 16, 3)
    assert out["verts"].shape[0] == 2
    assert out["lmk68"].shape == (2, 68, 3)
    assert out["identity"].shape == (2, modules.flame.n_shape)
    assert np.isfinite(float(out["l_mica"]))


def test_train_step_jits(joint_setup):
    cfg, modules, opt, state = joint_setup
    step = jax.jit(make_train_step(opt))
    s1, m1 = step(modules, state, batch_of(), jax.random.PRNGKey(1))
    s2, m2 = step(modules, s1, batch_of(seed=1), jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["loss"]))


def test_val_step_use_ema_selects_ema_params(joint_setup):
    """make_val_step(use_ema=True) must sample with state.ema.params, not
    the live params (train.val_use_ema wiring)."""
    import jax
    import jax.numpy as jnp

    from sr3d_tpu.diffusion.ema import EmaState
    from sr3d_tpu.train.joint import make_val_step

    cfg, modules, opt, state = joint_setup
    batch = batch_of()
    # EMA params frozen at a DIFFERENT point: perturb live sr params
    bumped = jax.tree.map(lambda x: x + 0.05, state.params["sr"])
    st = state._replace(
        params={**state.params, "sr": bumped},
        ema=EmaState(params=state.params["sr"],
                     step=jnp.ones((), jnp.int32)))
    rng = jax.random.PRNGKey(0)
    vb = {"SR": batch["SR"]}
    out_live = make_val_step(use_ema=False)(modules, st, vb, rng)
    out_ema = make_val_step(use_ema=True)(modules, st, vb, rng)
    # ema path == sampling with the ORIGINAL params
    st_orig = st._replace(params={**st.params, "sr": st.ema.params})
    out_ref = make_val_step(use_ema=False)(modules, st_orig, vb, rng)
    import numpy as np
    np.testing.assert_allclose(np.asarray(out_ema["sr"]),
                               np.asarray(out_ref["sr"]), atol=1e-6)
    assert float(jnp.max(jnp.abs(out_ema["sr"] - out_live["sr"]))) > 1e-4


def test_freeze_arcface_prefix_knob():
    """Default True = reference semantics (model/mica/arcface.py:171-176:
    stem + stages 1-3 never update, prefix BN stays in running-average
    mode); ``mica.train.freeze_arcface_prefix: false`` trains the whole
    encoder (prefix params update, prefix BN stats move) — the random-init
    study regime (no pretrained backbone.pth in this environment)."""
    from sr3d_tpu.train.joint import make_train_step

    def one_step(freeze):
        cfg = tiny_cfg("model2")
        cfg.mica.train.freeze_arcface_prefix = freeze
        modules = build_joint(cfg)
        opt = make_optimizer(cfg)
        state = init_train_state(modules, cfg, jax.random.PRNGKey(0), 16)
        step = make_train_step(opt)
        new_state, _ = step(modules, state, batch_of(),
                            jax.random.PRNGKey(1))
        return state, new_state

    def prefix_delta(tree_old, tree_new, scope):
        a = jax.tree_util.tree_leaves(tree_old[scope])
        b = jax.tree_util.tree_leaves(tree_new[scope])
        return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                   for x, y in zip(a, b))

    st, st2 = one_step(True)
    assert prefix_delta(st.params["arcface"], st2.params["arcface"],
                        "layer1") == 0.0
    assert prefix_delta(st.params["arcface"], st2.params["arcface"],
                        "conv1") == 0.0
    assert prefix_delta(st.arcface_stats, st2.arcface_stats, "bn1") == 0.0
    # head still trains under the freeze
    assert prefix_delta(st.params["arcface"], st2.params["arcface"],
                        "layer4") > 0.0

    st, st2 = one_step(False)
    assert prefix_delta(st.params["arcface"], st2.params["arcface"],
                        "layer1") > 0.0
    assert prefix_delta(st.params["arcface"], st2.params["arcface"],
                        "conv1") > 0.0
    assert prefix_delta(st.arcface_stats, st2.arcface_stats, "bn1") > 0.0


def test_handoff_grad_scale():
    """train.handoff_grad_scale: forward values identical, the
    ∂l_mica/∂θ_sr stream scaled EXACTLY linearly (s=0 severs it like the
    reference's .detach() while keeping the continuous model3 blob)."""
    from sr3d_tpu.train.joint import scale_handoff_grad

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))

    def loss(x, s):
        return jnp.sum(jnp.sin(scale_handoff_grad(x, s)) ** 2)

    for s in (1.0, 0.3, 0.0):
        np.testing.assert_array_equal(np.asarray(scale_handoff_grad(x, s)),
                                      np.asarray(x))
        g = jax.grad(loss)(x, s)
        g1 = jax.grad(loss)(x, 1.0)
        np.testing.assert_allclose(np.asarray(g), s * np.asarray(g1),
                                   rtol=1e-6)

    # config wiring: cfg.train.handoff_grad_scale reaches the modules
    cfg = tiny_cfg("model3")
    cfg.train.handoff_grad_scale = 1e-3
    assert build_joint(cfg).handoff_grad_scale == 1e-3
