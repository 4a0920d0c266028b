"""Serving API: one compiled LR-face → (SR image, FLAME mesh, landmarks)
pipeline.

The reference has no serving story (its eval path is the val loop inside
the trainer); production deployment wants a trainer-less object that loads
a checkpoint once, compiles once, and serves arbitrary request sizes.

TPU-first choices:

* ONE jit for the whole request — sampling (DDPM or DDIM), the SR→MICA
  hand-off, ArcFace, shape regression, and FLAME decode fuse into a single
  program; no host round-trips between stages.
* static shapes: requests are padded to the fixed ``batch_size`` so the
  program compiles exactly once (ragged tails are served from the same
  compiled program and un-padded on the host).
* optional spatial parallelism for latency: with ``mesh`` and
  ``spatial=True`` the image height is sharded over the model axis
  (parallel/steps.py::pjit_sample_spatial semantics) so a single face's
  sampling scales across chips.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .train.joint import (
    JointModules,
    abstract_train_state,
    build_joint,
    make_val_step,
)


def _materialize_mica_init(modules: JointModules, rng: jax.Array):
    """Random-init ArcFace variables + mapping params (the converted-UNet
    serving case — such checkpoints carry no MICA weights).  Runs on the
    LOCAL cpu backend when present: these are tiny initializer programs,
    and compiling them remotely was part of the cold-start cost the
    abstract-skeleton path removes.  Returns numpy leaves (uncommitted) so
    the caller's ``device_put`` places them wherever serving runs."""
    def init_fn(key):
        ka, km = jax.random.split(key)
        af_vars = modules.arcface.init(
            ka, jnp.zeros((1, modules.blob_size, modules.blob_size, 3)))
        map_params = modules.mapping.init(
            km, jnp.zeros((1, modules.mapping.z_dim)))
        return af_vars, map_params

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            out = jax.jit(init_fn)(jax.device_put(rng, cpu))
    else:  # pragma: no cover — every runtime here has a cpu backend
        out = jax.jit(init_fn)(rng)
    return jax.tree.map(np.asarray, out)


class Predictor:
    """Trainer-less inference endpoint.

    >>> p = Predictor.from_config(cfg, checkpoint="out/best_model.npz")
    >>> out = p.predict(lr_u8)     # [N,l,l,3] uint8, any N
    >>> out["sr_u8"], out["verts"], out["lmk68"], out["identity"]
    """

    def __init__(self, cfg, modules: JointModules, state,
                 batch_size: int = 8, use_ema: bool = False,
                 mesh=None, spatial: bool = False):
        """With ``mesh``, the request is served over the device mesh:
        batch sharded over the ``data`` axis (throughput), or — with
        ``spatial=True`` — image height sharded over the ``model`` axis
        (latency: one face's sampling spread across chips; GSPMD inserts
        the conv halo exchanges, parallel/steps.py::pjit_sample_spatial
        semantics)."""
        self.cfg = cfg
        self.batch_size = int(batch_size)
        # the SR output resolution is the dataset's r_resolution, NOT
        # diffusion.image_size — the reference YAMLs set the latter to 224
        # (it only gates the UNet's attention topology, unet.py:192)
        self.hr = int(cfg.sr.datasets.val.r_resolution)
        self.lr = int(cfg.sr.datasets.val.l_resolution)
        # serving never steps an optimizer; don't hold (or upload) moments.
        # Without use_ema the EMA mirror is dead weight too.
        state = state._replace(opt_state=None,
                               ema=state.ema if use_ema else None)
        step_fn = make_val_step(use_ema=use_ema)
        if mesh is None:
            # commit host (numpy) leaves once — np arrays passed to a jit
            # re-transfer on EVERY call through this tunneled runtime
            self.modules, self.state = modules, jax.device_put(state)
            self._step = jax.jit(step_fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import DATA_AXIS, MODEL_AXIS

            repl = NamedSharding(mesh, P())
            if spatial:
                if self.hr % mesh.shape[MODEL_AXIS]:
                    raise ValueError(
                        f"image height {self.hr} not divisible by the "
                        f"model axis ({mesh.shape[MODEL_AXIS]})")
                batch_sh = {"SR": NamedSharding(mesh, P(None, MODEL_AXIS))}
            else:
                if self.batch_size % mesh.shape[DATA_AXIS]:
                    raise ValueError(
                        f"batch_size {self.batch_size} not divisible by the "
                        f"data axis ({mesh.shape[DATA_AXIS]})")
                batch_sh = {"SR": NamedSharding(mesh, P(DATA_AXIS))}
            self.modules = jax.device_put(modules, repl)
            self.state = jax.device_put(state, repl)
            self._step = jax.jit(step_fn,
                                 in_shardings=(repl, repl, batch_sh, repl),
                                 out_shardings=repl)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, cfg, checkpoint: str | None = None,
                    batch_size: int = 8, use_ema: bool = False,
                    mesh=None, spatial: bool = False) -> "Predictor":
        """Build modules from the config and load a checkpoint: a named
        ``.npz`` (best_model / save_state_npz format), a converted
        reference UNet ``.npz``, or the latest orbax step in
        ``{output_dir}/{name}/{path.checkpoint}``.

        Trainer-less init: the load target is an ``eval_shape`` skeleton
        (train/joint.py::abstract_train_state), so no parameter
        initializer is ever jit-compiled and no optimizer/EMA arrays are
        materialized — the serving process pays only module construction
        + checkpoint IO + the serving graph's own compile (the old
        ``init_train_state`` path dominated cold start, PERF.md)."""
        from .train.checkpoint import (
            CheckpointManager,
            load_leaves_into,
            load_state_npz,
        )

        modules = build_joint(cfg)
        state = abstract_train_state(
            modules, cfg, int(cfg.sr.datasets.val.r_resolution))
        if checkpoint and str(checkpoint).endswith(".npz"):
            try:
                state = load_state_npz(checkpoint, state,
                                       {"global_step": 0, "epoch": 0}
                                       )["state"]
            except (ValueError, KeyError):
                # converted reference UNet: SR branch only.  The MICA
                # branch has no weights in such a file — materialize its
                # random init on the LOCAL cpu backend (tiny compiles, no
                # remote round trip) exactly as init_train_state would.
                params = dict(state.params)
                params["sr"] = load_leaves_into(checkpoint,
                                                state.params["sr"])
                af_vars, map_params = _materialize_mica_init(
                    modules, jax.random.PRNGKey(int(cfg.seed)))
                params["arcface"] = af_vars["params"]
                params["mapping"] = map_params
                # use_ema over a converted file would serve the loaded
                # weights either way (the mirror re-seeds from them), so
                # the EMA slot stays empty and val falls back to params
                state = state._replace(
                    params=params, ema=None,
                    arcface_stats=af_vars.get("batch_stats", {}),
                    step=jnp.zeros((), jnp.int32))
        elif checkpoint is None:
            ckpt_dir = (Path(cfg.output_dir) / (cfg.get("name") or "default")
                        / cfg.path.checkpoint)
            mgr = CheckpointManager(ckpt_dir)
            if mgr.latest_step() is None:
                # never silently serve randomly-initialised weights
                raise FileNotFoundError(
                    f"no checkpoint found under {ckpt_dir} — pass an "
                    f"explicit .npz via `checkpoint=` or train first")
            state = mgr.restore(None, state,
                                {"global_step": 0, "epoch": 0})["state"]
        else:
            raise FileNotFoundError(f"checkpoint {checkpoint!r}: expected a "
                                    f".npz path or None for auto-resume")
        return cls(cfg, modules, state, batch_size, use_ema,
                   mesh=mesh, spatial=spatial)

    # ------------------------------------------------------------------
    @staticmethod
    def enable_compile_cache(cache_dir: str):
        """Persist compiled executables across processes (cold-start fix).

        The serving program's one-time compile is expensive on the target
        runtime (remote XLA compile through the tunnel: 100s+ for sampling
        graphs, PERF.md "serving cold start").  Pointing JAX's persistent
        compilation cache at a directory makes every later process load the
        serialized executable instead of recompiling.  Call BEFORE building
        the Predictor (any jit compiled earlier won't be cached).

        Returns a zero-arg ``restore()`` that puts the three global cache
        settings back to their previous values — the settings are
        process-global, so an embedding process (or a test suite with its
        own persistent cache) that serves temporarily should call it when
        done.
        """
        prev = (jax.config.jax_compilation_cache_dir,
                jax.config.jax_persistent_cache_min_compile_time_secs,
                jax.config.jax_persistent_cache_min_entry_size_bytes)

        def _apply(cache, min_secs, min_bytes):
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              min_secs)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              min_bytes)
            try:
                # the cache object initialises lazily at the FIRST compile;
                # if this process already compiled anything (e.g. a prior
                # cache dir), drop the instance so the new dir takes effect
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:  # pragma: no cover — internal API drift
                pass

        # cache everything — serving graphs are few and large
        _apply(str(cache_dir), 0.0, 0)

        def restore():
            _apply(*prev)

        return restore

    def warmup(self, rng: jax.Array | None = None) -> float:
        """Compile (or cache-load) the full serving program by running one
        dummy padded batch end-to-end; returns wall seconds.  With
        :meth:`enable_compile_cache` this is the only request that pays the
        cold start — and only in the first process ever."""
        import time

        t0 = time.time()
        dummy = np.zeros((1, self.lr, self.lr, 3), np.uint8)
        self.predict(dummy, rng)
        return time.time() - t0

    # ------------------------------------------------------------------
    def _prep_cond(self, lr_imgs: np.ndarray) -> np.ndarray:
        """uint8 or [-1,1] LR batch → bicubic-upsampled conditioning
        (the offline prep tool's sr_{l}_{r} transform, on device)."""
        from .ops.image import resize

        x = np.asarray(lr_imgs)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        x = jnp.asarray(x, jnp.float32)
        if x.shape[1] != self.hr:
            x = resize(x, self.hr, self.hr, "bicubic", antialias=False)
        return np.asarray(x)

    def predict(self, lr_imgs: np.ndarray, rng: jax.Array | None = None
                ) -> dict:
        """Serve a request of any size: pads to ``batch_size`` chunks so
        the compiled program is reused, un-pads on the host.

        Returns ``{"sr_u8" [N,hr,hr,3] uint8, "verts" [N,5023,3],
        "lmk68" [N,68,3], "identity" [N,n_shape]}``."""
        from .ops.image import tensor_to_uint8

        if np.size(lr_imgs) == 0:
            nv = int(self.modules.flame.v_template.shape[0])
            ns = int(self.cfg.mica.model.n_shape)
            return {"sr_u8": np.zeros((0, self.hr, self.hr, 3), np.uint8),
                    "verts": np.zeros((0, nv, 3), np.float32),
                    "lmk68": np.zeros((0, 68, 3), np.float32),
                    "identity": np.zeros((0, ns), np.float32)}
        cond = self._prep_cond(lr_imgs)
        n = cond.shape[0]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        outs: list[dict] = []
        for i in range(0, n, self.batch_size):
            chunk = cond[i:i + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)])
            rng, k = jax.random.split(rng)
            out = self._step(self.modules, self.state,
                             {"SR": jnp.asarray(chunk)}, k)
            keep = self.batch_size - pad
            outs.append({
                "sr_u8": np.asarray(tensor_to_uint8(out["sr"]))[:keep]
                .astype(np.uint8),
                "verts": np.asarray(out["verts"])[:keep],
                "lmk68": np.asarray(out["lmk68"])[:keep],
                "identity": np.asarray(out["identity"])[:keep],
            })
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def export(self, lr_imgs: np.ndarray, out_dir: str,
               names: list[str] | None = None) -> int:
        """Predict + write the full per-face bundle (mesh.ply/obj,
        kpt7/kpt68/identity npys, the SR png) — the NoW-submission layout."""
        from .eval.export import export_prediction
        from .eval.metrics import save_img

        res = self.predict(lr_imgs)
        n = res["verts"].shape[0]
        names = names or [f"{i:04d}" for i in range(n)]
        faces = np.asarray(self.modules.flame.faces)
        for i in range(n):
            dst = Path(out_dir) / names[i]
            export_prediction(dst, res["verts"][i], faces,
                              res["identity"][i], res["lmk68"][i])
            save_img(res["sr_u8"][i], str(dst / f"{names[i]}_sr.png"))
        return n


def bundle_names(paths: list, input_root: str) -> list[str]:
    """Output-bundle name per input image: the file stem, disambiguated by
    its subdirectory when the recursive scan finds duplicate stems
    (``a/face.png`` + ``b/face.png``), and by the extension when even the
    relative path collides (``a/face.png`` + ``a/face.jpg``) — bundles
    must never overwrite each other."""
    from collections import Counter

    stems = [Path(p).stem for p in paths]
    stem_counts = Counter(stems)
    names = []
    for p, stem in zip(paths, stems):
        if stem_counts[stem] > 1:
            rel = Path(p).relative_to(input_root)
            stem = "_".join(rel.parts[:-1] + (rel.stem,))
        names.append(stem)
    name_counts = Counter(names)
    for i, p in enumerate(paths):
        if name_counts[names[i]] > 1:
            names[i] = f"{names[i]}_{Path(p).suffix.lstrip('.')}"
    return names


def main(argv=None) -> int:
    """Batch-serving CLI: a directory of LR face images → per-face bundles
    (mesh.ply/obj, kpt7/kpt68/identity npys, SR png).

    ``python -m sr3d_tpu.serve -c <cfg.yml> [-ckt best_model.npz]
    --input <lr_dir> --out <dst> [--sampler dpm++] [--steps 25]
    [--batch 8] [--ema]``

    New capability; the reference's closest path is ``main_temp.py -p val``
    (which needs the full trainer + paired val dataset).  ``--sampler``/
    ``--steps`` override ``sr.model.diffusion.{sampler,ddim_steps}`` — see
    PERF.md "serving latency" for the measured latency of each choice.
    """
    import argparse
    import time

    from .config.defaults import get_cfg_defaults, update_cfg
    from .data.lrhr import get_paths_from_images, load_image_m11

    ap = argparse.ArgumentParser(description="sr3d_tpu batch serving")
    ap.add_argument("-c", "--cfg", default=None)
    ap.add_argument("-ckt", "--checkpoint", default=None)
    ap.add_argument("--input", required=True, help="directory of LR images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sampler", default=None,
                    choices=["ddpm", "ddim", "dpm++"],
                    help="ddim (eta=1, marginal init) matches ancestral "
                         "ddpm quality at a fraction of the steps; dpm++ "
                         "is faster at equal steps but measurably WORSE "
                         "quality on this model family (PERF.md 'sampler "
                         "quality') — prefer ddim unless latency-bound")
    ap.add_argument("--steps", type=int, default=None,
                    help="strided sampler step count (ddim/dpm++)")
    ap.add_argument("--int8", type=int, default=None, metavar="MIN_RES",
                    help="w8a8 int8 convs at spatial res >= MIN_RES "
                         "(sets sr.model.unet.quant_min_res; 0 forces fp). "
                         "Default 1 (all ResnetBlock convs): same fp "
                         "checkpoint, confirmed quality-neutral at every "
                         "depth by the on-chip multi-seed protocol and "
                         "+21%% throughput together with the default "
                         "transition-conv quant (PERF.md 'int8 at the "
                         "O=64 levels'). Pass --int8 0 for exact-fp "
                         "sampling.")
    ap.add_argument("--int8-resample", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="additionally quantize the Downsample/Upsample "
                         "transition convs (sets "
                         "sr.model.unet.quant_resample; dynamic "
                         "activation scale).  Default ON at the serving "
                         "depth --int8 1 — quality-neutral on every seed "
                         "of the multi-seed protocol "
                         "(SAMPLER_STUDY_r3_extra.json) and a further "
                         "+2.6%% throughput (PERF.md); "
                         "--no-int8-resample restores ResnetBlock-only "
                         "quantization")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--warmup-cache", default=None, metavar="DIR",
                    help="persistent compile-cache dir: the first run pays "
                         "the one-time XLA compile and serializes the "
                         "executable there; every later process cold-starts "
                         "from the cache instead of recompiling (measured "
                         "in PERF.md 'serving cold start')")
    args = ap.parse_args(argv)

    restore_cache = None
    if args.warmup_cache:
        restore_cache = Predictor.enable_compile_cache(args.warmup_cache)

    cfg = get_cfg_defaults()
    if args.cfg:
        cfg = update_cfg(cfg, args.cfg)
    if args.sampler:
        cfg.sr.model.diffusion.sampler = args.sampler
    if args.steps:
        cfg.sr.model.diffusion.ddim_steps = args.steps
    if args.int8 is not None:
        cfg.sr.model.unet.quant_min_res = args.int8
    elif not int(cfg.sr.model.unet.quant_min_res or 0):
        # round-3 serving default: w8a8 at every ResnetBlock conv —
        # quality-neutral on every seed of the multi-seed protocol at
        # every quant depth (SAMPLER_STUDY_r3_int8.json) and measured
        # +17% sampling throughput (PERF.md).  A config that sets its
        # own quant_min_res wins; --int8 0 forces exact-fp sampling.
        cfg.sr.model.unet.quant_min_res = 1
    if args.int8_resample is not None:
        cfg.sr.model.unet.quant_resample = bool(args.int8_resample)
    elif int(cfg.sr.model.unet.quant_min_res or 0) == 1:
        # at the measured serving depth (1) the transition convs ride
        # along by default: quality-neutral on every seed and a further
        # +2.6% throughput (PERF.md "int8 at the O=64 levels").  Other
        # depths were not quality-qualified with +rs — opt in explicitly.
        cfg.sr.model.unet.quant_resample = True

    paths = get_paths_from_images(args.input)
    names = bundle_names(paths, args.input)
    imgs = np.stack([load_image_m11(p) for p in paths])
    predictor = Predictor.from_config(cfg, checkpoint=args.checkpoint,
                                      batch_size=int(args.batch),
                                      use_ema=bool(args.ema))
    if args.warmup_cache:
        wt = predictor.warmup()
        print(f"warmup (compile or cache load): {wt:.1f}s")
    t0 = time.perf_counter()
    n = predictor.export(imgs, args.out, names=names)
    dt = time.perf_counter() - t0
    print(f"served {n} faces -> {args.out} in {dt:.1f}s "
          f"({n / max(dt, 1e-9):.2f} faces/s incl. export)")
    if restore_cache is not None:
        # the settings are process-global; leave them as found for
        # in-process callers (the real CLI process exits anyway)
        restore_cache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
