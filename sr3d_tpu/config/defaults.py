"""Default configuration tree.

Mirrors the schema of the reference's yacs defaults
(reference: config/default/config.py:9-229) so the reference experiment YAMLs
(``config/sr_sr3_VGGF2_<lr>_<hr>_model{2,3}.yml``) merge cleanly, while adding a
``tpu`` section for the sharding/precision knobs this framework introduces.
"""

from __future__ import annotations

import os

from .node import ConfigNode


def get_cfg_defaults() -> ConfigNode:
    c = ConfigNode()

    c.sr3d_dir = os.getcwd()
    c.device = "tpu"
    c.device_id = [0]
    c.name = ""
    c.phase = "train"
    c.debug = None
    c.enable_wandb = None
    c.log_wandb_ckpt = None
    c.log_eval = None
    c.sample = 1
    c.checkpoint = None
    c.cfg_file = None   # set by the CLI; in-schema so the dumped full
                        # config tree (logs/full_config.yaml) merges back
                        # strictly
    c.model = "model3"
    c.seed = 0
    c.output_dir = "output"

    c.path = ConfigNode()
    c.path.log = "logs"
    c.path.tb_logger = "tb_logger"
    c.path.checkpoint = "checkpoint"
    c.path.checkpoint_sr = "checkpoint_sr"  # SR-only I*_E*_{gen,opt} pairs

    # ------------------------------------------------------------------ SR
    sr = ConfigNode()
    c.sr = sr
    sr.pretrained_model_path = None

    sr.datasets = ConfigNode()
    sr.datasets.K = 4
    sr.datasets.train = ConfigNode(
        dict(
            name="mocktest",
            mode="HR",
            dataroot="contents/vgg_face2_train_32_128",
            datatype="img",
            l_resolution=32,
            r_resolution=128,
            batch_size=4,
            num_workers=0,
            use_shuffle=True,
            data_len=10000,
        )
    )
    sr.datasets.val = ConfigNode(
        dict(
            name="mocktest",
            mode="LRHR",
            dataroot="contents/vgg_face2_eval_32_128",
            datatype="img",
            l_resolution=32,
            r_resolution=128,
            data_len=3,
        )
    )

    sr.model = ConfigNode()
    sr.model.which_model_G = "sr3"
    sr.model.finetune_norm = False
    sr.model.unet = ConfigNode(
        dict(
            in_channel=6,
            out_channel=3,
            inner_channel=64,
            channel_multiplier=[1, 2, 4, 8, 8],
            attn_res=[16],
            res_blocks=2,
            dropout=0.2,
            norm_groups=32,
            # w8a8 int8 convs at levels whose actual feature-map res is
            # >= this, at INFERENCE (0=off).  A SERVING knob: the train
            # step and the Trainer's in-training validation always run
            # the fp convs (make_val_step(int8=False)); serve.Predictor
            # engages it.  See PERF.md "int8 at the O=64 levels".
            quant_min_res=0,
            # also quantize the Downsample/Upsample transition convs
            # (dynamic per-tensor activation scale); same quant_min_res
            # resolution gate, serving-only
            quant_resample=False,
        )
    )
    sr.model.beta_schedule = ConfigNode()
    for phase in ("train", "val"):
        sr.model.beta_schedule[phase] = ConfigNode(
            dict(
                schedule="linear",
                n_timestep=2000,
                linear_start=1e-6,
                linear_end=1e-2,
            )
        )
    sr.model.diffusion = ConfigNode(
        dict(image_size=128, channels=3, conditional=True, loss="l1",
             # sampler: "ddpm" = full ancestral loop (reference semantics);
             # "ddim"/"dpm++" = strided fast sampling (new capability).
             # sampler_init: "noise" (reference) | "marginal" (corrects the
             # pure-noise start for this non-zero-terminal-SNR schedule —
             # required for good deterministic ddim/dpm++ quality, PERF.md)
             # dpmpp_eta: 0 = deterministic 2M (best with marginal init);
             # >0 = the 2M SDE variant (helps only at noise init, PERF.md)
             sampler="ddpm", ddim_steps=50, ddim_eta=1.0, dpmpp_eta=0.0,
             sampler_init="noise",
             # train_sampler: the IN-STEP SR→MICA hand-off sampler of the
             # joint step.  "ddpm" = reference semantics (full T-step
             # ancestral loop inside every train step); "ddim" = the
             # quality-confirmed η=1+marginal recipe at train_ddim_steps
             # UNet evals (~T/steps cheaper per joint step, PERF.md)
             train_sampler="ddpm", train_ddim_steps=25,
             # train_handoff_int8: run the in-step hand-off sampling with
             # the w8a8 int8 conv path (requires sr.model.unet.quant_min_res
             # > 0 to pick the levels).  Valid only when the hand-off
             # carries no gradient — model2's quantized hand-off or
             # sever_sr_grad model3 (the int8 rounding has zero gradient and
             # would silently sever flow-through model3; the step raises).
             # Quality-neutral per the round-3 multi-seed int8 protocol
             # (PERF.md); l_sr's p_losses term always stays fp.
             train_handoff_int8=False)
    )

    sr.train = ConfigNode(
        dict(
            n_iter=1000000,
            val_freq=10000,
            save_checkpoint_freq=10000,
            print_freq=200,
            optimizer=ConfigNode(dict(type="adam", lr=1e-4)),
            ema_scheduler=ConfigNode(
                dict(step_start_ema=5000, update_ema_every=1, ema_decay=0.9999)
            ),
        )
    )

    # ---------------------------------------------------------------- MICA
    mica = ConfigNode()
    c.mica = mica
    mica.pretrained_model_path = None

    mica.datasets = ConfigNode(
        dict(
            training_data=["LYHM"],
            eval_data=["FLORENCE"],
            datatype="img",
            batch_size=2,
            K=4,
            n_train=100000,
            num_workers=0,
            root="datasets/arcface/",
            dataset_path="contents",
        )
    )

    mica.model = ConfigNode(
        dict(
            testing=False,
            name="mica",
            topology_path="data/FLAME2020/head_template.obj",
            flame_model_path="data/FLAME2020/generic_model.pkl",
            flame_lmk_embedding_path="data/FLAME2020/landmark_embedding.npy",
            masks_path="data/FLAME2020/FLAME_masks.pkl",
            n_shape=300,
            n_exp=50,
            layers=8,
            hidden_layers_size=256,
            mapping_layers=3,
            map_hidden_dim=300,
            use_pretrained=True,
            arcface_pretrained_model=None,
            arcface_layers=[3, 13, 30, 3],  # iresnet100
            n_pose=6,
            # asset-free fallback when flame_model_path is absent:
            # "random" = synthetic_flame (structure-only miniature),
            # "sphere" = sphere_flame (smooth, renderable — the
            # identity-correlated synthetic-data experiments use this)
            synthetic_flame_kind="random",
        )
    )

    mica.train = ConfigNode(
        dict(
            use_mask=False,
            max_epochs=50,
            max_steps=100000,
            lr=1e-4,
            arcface_lr=1e-3,
            weight_decay=0.0,
            lr_update_step=100000000,
            lr_gamma=0.1,
            log_dir="logs",
            log_steps=10,
            vis_dir="train_images_mica",
            vis_steps=200,
            write_summary=True,
            checkpoint_steps=1000,
            # step-named model_mica_{step}.npz snapshots.  DELIBERATE
            # divergence: the reference default is 2 (micalib writes a full
            # snapshot every 2 steps — a disk-filling footgun its experiment
            # YAMLs all override to 1000–10000); we default to the YAMLs'
            # upper value
            checkpoint_epochs_steps=10000,
            val_steps=1000,
            val_vis_dir="val_images_mica",
            eval_steps=5000,
            reset_optimizer=False,
            val_save_img=5000,
            arcface_new=False,
            # Reference semantics: MICA freezes the pretrained ArcFace
            # stem + stages 1-3 and trains only stage 4 / head (reference
            # model/mica/arcface.py:171-176).  That freeze presumes a
            # pretrained backbone.pth; when ArcFace is RANDOM-init (no
            # assets, e.g. synthetic studies) a frozen random prefix makes
            # the identity→shape task unlearnable — set False to train the
            # whole encoder (prefix BN then also runs in train mode).
            freeze_arcface_prefix=True,
        )
    )

    mica.mask_weights = ConfigNode(
        dict(
            face=150.0,
            nose=50.0,
            lips=50.0,
            forehead=50.0,
            lr_eye_region=50.0,
            eye_region=50.0,
            whole=1.0,
            ears=0.01,
            eyes=0.01,
        )
    )
    mica.running_average = 7
    mica.test_dataset = "now"

    # --------------------------------------------------------------- train
    c.train = ConfigNode(
        dict(
            log_dir="logs",
            val_freq=10000,
            save_checkpoint_freq=10000,
            print_freq=200,
            lr_update_step=100000000,
            log_steps=100,
            vis_dir="train_images_mica",
            vis_steps=500,
            write_summary=True,
            checkpoint_steps=1000,
            # checkpoints retained by rotation; ≤0 keeps all (the reference
            # keeps every I*_E*_checkpoint.pth)
            checkpoint_max_keep=5,
            # False: best-model TRACKING still runs (best_model.txt logic,
            # BestModel averages) but the full-state npz snapshot writes are
            # skipped — for studies where the trajectory is the product and
            # a ~GB-scale write per improved eval dominates wall time
            best_snapshots=True,
            # model3 flow-through: scale on the ∂l_mica/∂θ_sr gradient
            # through the differentiable hand-off.  1.0 = the reference's
            # intended unscaled flow-through, which the round-4 ablation
            # measured to collapse the SR branch (l_mica is 10²-10³× l_sr);
            # ~1e-3 rebalances the two gradient streams.  Ignored by
            # model2 and by sever_sr_grad.
            handoff_grad_scale=1.0,
            # what the MICA branch trains/evals on: "sampled" = the
            # reference pipeline (in-step SR sampling feeds MICA);
            # "cond" / "hr" are the bicubic-lower-bound / HR-oracle
            # CONTROL ARMS for the SR→reconstruction value-chain study
            # (tools/train_ablation.py) — they skip the hand-off sampling
            # while leaving l_sr / SR-branch training untouched
            handoff_source="sampled",
            val_vis_dir="val_images_mica",
            eval_steps=5000,
            reset_optimizer=False,
            val_n_img=5,
            # val/export path uses the EMA UNet weights (EMA is a real
            # capability here; the reference only configured it).  Scope:
            # `evaluate` only — best-model selection (`evaluate_MICA`)
            # keeps the reference's live-weights train-schedule semantics
            val_use_ema=False,
            # model3 only: True reproduces the reference's LITERAL behavior
            # (sampled SR detached before the MICA hand-off,
            # model/sr3d/model.py:483-490); False keeps the documented
            # intended semantics (∂l_mica/∂θ_sr flows through sampling)
            sever_sr_grad=False,
        )
    )

    c.wandb = ConfigNode(dict(project="sr_vggf2"))

    # ----------------------------------------------------------------- TPU
    # New capability section (no reference equivalent): device-mesh layout,
    # precision, and compilation knobs.
    c.tpu = ConfigNode(
        dict(
            mesh_shape=[-1, 1],          # (data, model); -1 = all devices
            mesh_axis_names=["data", "model"],
            tp_min_channels=128,         # min out-dim for model-axis sharding
            compute_dtype="bfloat16",     # activations/matmuls on MXU
            param_dtype="float32",
            sample_remat=True,            # jax.checkpoint per sampling step
            sample_remat_chunk=1,         # checkpoint every k-th step (k>1 =
                                          # coarser remat: k× step-activation
                                          # memory, same gradients — the
                                          # model3 full-depth cost knob).
                                          # k must divide the loop length:
                                          # T for train_sampler=ddpm,
                                          # train_ddim_steps for ddim (the
                                          # hand-off falls back to per-step
                                          # remat with a warning otherwise)
            train_remat=True,             # remat UNet blocks in train step
            use_pallas=True,              # fused kernels where profitable
            donate_state=True,
            prefetch_depth=2,
            grad_accum=1,                 # micro-batches per optimizer update
        )
    )

    return c


def update_cfg(cfg: ConfigNode, cfg_file: str) -> ConfigNode:
    cfg.merge_from_file(cfg_file)
    return cfg.clone()
