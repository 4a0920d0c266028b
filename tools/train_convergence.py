"""On-chip joint-training convergence at the flagship mirrored config
(VERDICT r2 #8): extend the round-2 300-step 16→64 demo to 1–2k steps of
``configs/sr_sr3_VGGF2_16_128_model2.yml`` through the production
``Trainer.fit`` (mesh-compiled step, prefetched loader, eval cadences),
logging the val PSNR trajectory.

Synthetic actors (the real VGGFace2/LYHM assets are not in this image,
BASELINE.md); flagship geometry is real: 16→128, T=600 sampling inside
every model2 step, 224² arcface crops, n_shape=300 FLAME.

TPU:  python tools/train_convergence.py --steps 1500 --eval-every 250
CPU smoke:  python tools/train_convergence.py --cpu --steps 4 \
    --eval-every 2 --actors 2 --imgs 2 --val-faces 2

Writes {workdir}/trajectory.json with the logged series.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--actors", type=int, default=24)
    ap.add_argument("--imgs", type=int, default=4)
    ap.add_argument("--val-faces", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/conv_flagship")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train-sampler", default="ddpm",
                    choices=("ddpm", "ddim"),
                    help="in-step SR->MICA hand-off: 'ddpm' = reference "
                         "semantics (full T-step loop inside every joint "
                         "step); 'ddim' = the quality-confirmed fast "
                         "hand-off (train_sampler knob, PERF.md)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sr3d_tpu.config.defaults import get_cfg_defaults, update_cfg
    from sr3d_tpu.data.synthetic import (
        generate_synthetic_faces,
        generate_synthetic_joint_root,
    )
    from sr3d_tpu.train.trainer import Trainer

    wd = Path(args.workdir)
    cfg = update_cfg(get_cfg_defaults(),
                     str(REPO / "configs/sr_sr3_VGGF2_16_128_model2.yml"))
    if args.cpu:
        # wiring smoke only — the flagship T=600/128² model2 step is far
        # too slow on CPU; shrink shapes while keeping the same code path
        for ds in ("train", "val"):
            cfg.sr.datasets[ds].l_resolution = 8
            cfg.sr.datasets[ds].r_resolution = 16
        for ph in ("train", "val"):
            cfg.sr.model.beta_schedule[ph].n_timestep = 8
        cfg.sr.model.unet.inner_channel = 32
        cfg.sr.model.unet.norm_groups = 8
        cfg.sr.model.unet.channel_multiplier = [1, 2]
        cfg.sr.model.unet.res_blocks = 1
        cfg.mica.model.n_shape = 16
        cfg.mica.model.map_hidden_dim = 32
        cfg.mica.model.mapping_layers = 1
        cfg.mica.model.arcface_layers = [1, 1, 1, 1]
        cfg.tpu.synthetic_flame = True
    lr_res = int(cfg.sr.datasets.train.l_resolution)
    hr_res = int(cfg.sr.datasets.train.r_resolution)
    if not (wd / "joint").exists():
        generate_synthetic_joint_root(
            wd / "joint", name="SYNTH", n_actors=args.actors,
            imgs_per_actor=args.imgs, img_res=224, lr_res=lr_res,
            hr_res=hr_res, n_shape=int(cfg.mica.model.n_shape))
        generate_synthetic_faces(wd / "eval", n=args.val_faces,
                                 l_res=lr_res, r_res=hr_res)

    cfg.output_dir = str(wd / "out")
    cfg.mica.datasets.root = str(wd / "joint")
    cfg.mica.datasets.training_data = ["SYNTH"]
    cfg.mica.datasets.eval_data = ["SYNTH"]
    cfg.sr.datasets.val.dataroot = str(wd / "eval")
    cfg.sr.train.n_iter = args.steps
    cfg.mica.train.max_steps = 0
    cfg.train.log_steps = max(args.eval_every // 5, 1)
    # checkpoint at the eval cadence: a tunnel outage mid-run loses at
    # most one eval interval (the Trainer auto-resumes from the workdir)
    cfg.train.checkpoint_steps = args.eval_every
    cfg.train.eval_steps = args.eval_every          # SR val PSNR cadence
    cfg.mica.train.eval_steps = args.eval_every     # evaluate_MICA cadence
    cfg.train.vis_steps = 0
    # serving-point val sampler (confirmed by the round-3 multi-seed
    # protocol) so the val pass costs 25 UNet evals, not 600
    cfg.sr.model.diffusion.sampler = "ddim"
    cfg.sr.model.diffusion.ddim_steps = 4 if args.cpu else 25
    cfg.sr.model.diffusion.ddim_eta = 1.0
    cfg.sr.model.diffusion.sampler_init = "marginal"
    cfg.sr.model.diffusion.train_sampler = args.train_sampler
    cfg.sr.model.diffusion.train_ddim_steps = 4 if args.cpu else 25
    cfg.tpu.mesh_shape = [1, 1]

    trainer = Trainer(cfg)
    trainer.prepare_data()
    t0 = time.time()
    trainer.fit(max_steps=args.steps)
    wall = time.time() - t0

    # collect the JSONL metrics the Trainer's MetricsWriter logged
    # (output dir may be nested under the experiment name — glob)
    jsonl = sorted(Path(cfg.output_dir).rglob("metrics.jsonl"))[0]
    series = [json.loads(line)
              for line in jsonl.read_text().splitlines()]
    traj = {"steps": args.steps, "wall_s": round(wall, 1),
            "sec_per_step": round(wall / max(args.steps, 1), 3),
            "series": series}
    (wd / "trajectory.json").write_text(json.dumps(traj, indent=1))
    psnr = [(r["step"], r["value"]) for r in series
            if r.get("tag", "").endswith("psnr")]
    print(json.dumps({"wall_s": traj["wall_s"],
                      "sec_per_step": traj["sec_per_step"],
                      "val_psnr": psnr}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
