"""Legacy alternating trainer — behavior parity with the reference's
"model1-era" stack (reference: main.py → lib/trainer.py:235-605).

Where the current joint trainer fuses both losses in one compiled step, this
mode alternates like the reference: an SR diffusion step per batch, periodic
SR validation with PSNR, then SR sampling feeds arcface blobs into a MICA
update (lib/trainer.py:364-420).  Useful for staged pretraining and as the
migration path for users of the reference's ``main.py`` entry point.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from ..eval.metrics import calculate_psnr
from ..ops.image import sr_to_mica_inputs, tensor_to_uint8
from .joint import JointModules
from .mica_only import (
    MicaTrainState,
    init_mica_state,
    make_mica_optimizer,
    make_mica_train_step,
)
from .sr_only import SRModel, SRTrainState

logger = logging.getLogger("sr3d_tpu")


class AlternatingTrainer:
    def __init__(self, cfg, modules: JointModules, dtype=None):
        self.cfg = cfg
        self.modules = modules
        self.sr = SRModel(cfg, dtype=dtype or modules.unet.dtype)
        self.mica_opt = make_mica_optimizer(cfg)

        rng = jax.random.PRNGKey(int(cfg.seed))
        k1, k2 = jax.random.split(rng)
        self.sr_state: SRTrainState = self.sr.init_state(k1)
        self.mica_state: MicaTrainState = init_mica_state(
            modules, cfg, k2, self.mica_opt)

        self._sr_step = jax.jit(self.sr.make_train_step(), donate_argnums=0)
        # same val-weights convention as the joint trainer: the EMA knob
        # applies to the alternating path's sampling too
        self._sr_sample = jax.jit(self.sr.make_sampler(
            use_ema=bool(cfg.train.get("val_use_ema", False))))
        self._mica_step = jax.jit(make_mica_train_step(self.mica_opt),
                                  donate_argnums=1)
        self._rng = jax.random.PRNGKey(int(cfg.seed) + 7)
        self.step = 0

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # -- checkpoints (reference lib/trainer.py:185-220: separate SR pair +
    # MICA model.tar) --------------------------------------------------------

    def _dirs(self):
        from pathlib import Path

        root = Path(self.cfg.output_dir) / (self.cfg.get("name") or "default")
        return root, root / str(self.cfg.path.checkpoint_sr)

    def save_checkpoint(self) -> None:
        """SR branch → ``checkpoint_sr/I{step}_E0_{gen,opt}.npz``; MICA
        branch + counters → ``model_mica.npz`` (the reference's
        ``model_mica.tar``, lib/trainer.py:209-220)."""
        from .checkpoint import save_state_npz

        root, sr_dir = self._dirs()
        self.sr.save_network(sr_dir, self.sr_state, epoch=0,
                             iter_step=self.step)
        save_state_npz(root / "model_mica.npz",
                       jax.device_get(self.mica_state),
                       {"global_step": self.step})
        logger.info("legacy checkpoint saved @ step %d", self.step)

    def load_checkpoint(self) -> bool:
        """Auto-resume both branches; ``self.step`` comes from the MICA
        side's counter (reference lib/trainer.py:195-207)."""
        from .checkpoint import load_state_npz

        root, sr_dir = self._dirs()
        mica_path = root / "model_mica.npz"
        resumed = False
        if mica_path.exists():
            restored = load_state_npz(mica_path, self.mica_state,
                                      {"global_step": 0})
            self.mica_state = restored["state"]
            self.step = int(restored["meta"]["global_step"])
            resumed = True
        if sr_dir.is_dir() and self.sr.latest_prefix(sr_dir):
            self.sr_state, _, _ = self.sr.load_network(
                self.sr_state, sr_dir, phase=str(self.cfg.phase))
            resumed = True
        if resumed:
            logger.info("legacy resume @ step %d", self.step)
        return resumed

    def training_step(self, batch: dict) -> dict:
        """One alternating iteration (reference lib/trainer.py:273-420):
        SR update → sample SR for this batch → arcface blobs → MICA update."""
        sr_batch = {"HR": batch["HR"], "SR": batch["SR"]}
        self.sr_state, sr_metrics = self._sr_step(
            self.sr_state, sr_batch, self._next_rng())

        sr_img = self._sr_sample(self.sr_state, batch["SR"],
                                 self._next_rng())
        _, blobs = sr_to_mica_inputs(
            sr_img, image_size=self.modules.image_size,
            blob_size=self.modules.blob_size)
        self.mica_state, mica_metrics = self._mica_step(
            self.modules, self.mica_state,
            {"arcface": blobs, "flame_shape": batch["flame_shape"]},
            self._next_rng())
        self.step += 1
        return {"l_pix": float(sr_metrics["l_pix"]),
                "l_mica": float(mica_metrics["loss"])}

    def fit(self, loader, max_steps: int, val_batches=None,
            val_freq: int = 0, log_every: int = 10,
            checkpoint_every: int | None = None) -> None:
        """Step-counted loop over a BatchLoader of joint batches
        (reference lib/trainer.py:235-605 outer loop)."""
        import numpy as np

        if checkpoint_every is None:
            checkpoint_every = int(self.cfg.train.checkpoint_steps)
        it = iter(loader)
        while self.step < max_steps:
            raw = next(it)
            batch = {}
            for key in ("HR", "SR", "flame_shape"):
                v = np.asarray(raw[key], np.float32)
                if v.ndim == 5 or (key == "flame_shape" and v.ndim == 3):
                    v = v.reshape((-1,) + v.shape[2:])
                batch[key] = v
            m = self.training_step(batch)
            if self.step % log_every == 0:
                logger.info("legacy step %d | l_pix %.4f l_mica %.4f",
                            self.step, m["l_pix"], m["l_mica"])
            if val_freq and val_batches and self.step % val_freq == 0:
                self.validate_sr(val_batches)
            if checkpoint_every and self.step % checkpoint_every == 0:
                self.save_checkpoint()
        if checkpoint_every:
            self.save_checkpoint()

    def validate_sr(self, val_batches) -> float:
        """Periodic SR-only PSNR validation (reference
        lib/trainer.py:291-355).  Accepts joint-loader batches too: actor-K
        [B,K,h,h,3] arrays flatten to [B*K,...] like ``fit`` does."""
        psnrs = []
        for batch in val_batches:
            sr = np.asarray(batch["SR"], np.float32)
            hr = np.asarray(batch["HR"], np.float32)
            if sr.ndim == 5:
                sr = sr.reshape((-1,) + sr.shape[2:])
                hr = hr.reshape((-1,) + hr.shape[2:])
            sr_img = self._sr_sample(self.sr_state, sr, self._next_rng())
            sr_u8 = np.asarray(tensor_to_uint8(sr_img))
            hr_u8 = np.asarray(tensor_to_uint8(hr))
            for i in range(sr_u8.shape[0]):
                psnrs.append(calculate_psnr(sr_u8[i], hr_u8[i]))
        avg = float(np.mean(psnrs)) if psnrs else 0.0
        logger.info("legacy SR val: psnr %.3f over %d images", avg,
                    len(psnrs))
        return avg
