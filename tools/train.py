#!/usr/bin/env python
"""Full-model video training (the reference train_ddp.py, TPU-native).

Usage:
    python tools/train.py --cfg cfgs/vmd_vmn_fba_pretrained_30ep.yaml [KEY VALUE ...]

One process drives the whole mesh; the sharded batch makes XLA emit the
gradient all-reduces and sync-BN collectives the reference got from
DDP/SyncBatchNorm.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# pod-slice (multi-host) wiring: one controller process per host, must run
# BEFORE anything touches the XLA backend — the model modules build jnp
# constants at import time. Reads JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID (real TPU pods can rely on the TPU
# metadata instead and leave the last two unset). The reference's analog
# is torch.distributed env:// rendezvous (train_ddp.py:202-204).
if os.environ.get("JAX_COORDINATOR_ADDRESS"):
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_NUM_PROCESSES") else None,
        process_id=int(os.environ["JAX_PROCESS_ID"])
        if os.environ.get("JAX_PROCESS_ID") else None)

import jax.numpy as jnp
import numpy as np

from tcvom_tpu.config import load_config
from tcvom_tpu.data.loader import DataLoader
from tcvom_tpu.data.vmd import VideoMattingDataset
from tcvom_tpu.models.full_model import TaskConfig
from tcvom_tpu.parallel import make_mesh, shard_batch
from tcvom_tpu.train.trainer import MattingTrainer
from tcvom_tpu.utils.checkpoint import (load_weights, restore_train_state,
                                        save_checkpoint)
from tcvom_tpu.utils.logging import AverageMeter, create_logger


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--driver", default="vmd", choices=["vmd", "single"],
                   help="'vmd' = video trainer (train_ddp), 'single' = "
                        "single-frame/pretrain trainer")
    p.add_argument("--dataset", default="vmd", choices=["vmd", "dim"],
                   help="'dim' selects the Adobe pretrain dataset")
    p.add_argument("--sample_length", type=int, default=None)
    p.add_argument("--eps", type=float, default=0.0,
                   help="alpha snapping for pretrain (1e-2 in pretrain_ddp)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of steps 10-20 here")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder activations in the backward "
                        "pass (fits larger per-chip batches)")
    p.add_argument("--val_image_batches", type=int, default=2,
                   help="val batches to dump as pred/tri/gt PNG triplets "
                        "per epoch (reference train_ddp.py:129-138)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def main():
    args = build_argparser().parse_args()
    # after the module-level jax.distributed.initialize, jax.devices()
    # spans the slice, the Mesh covers all chips, and the loader below
    # shards by jax.process_index()
    rank = jax.process_index()
    cfg = load_config(args.cfg, args.opts)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0] + cfg.SYSTEM.EXP_SUFFIX
    # non-zero ranks log to their own file (phase suffix) so the main log
    # stays single-writer, like the reference's rank-0 logging
    logger, outdir = create_logger(cfg.SYSTEM.OUTDIR, cfg_name,
                                   "train" if rank == 0 else f"train_p{rank}")
    cfg.dump(os.path.join(outdir, "config.yaml"))
    logger.info("config:\n%s", cfg)

    seed = cfg.SYSTEM.RANDOM_SEED if cfg.SYSTEM.RANDOM_SEED > 0 else 0
    mesh = make_mesh()
    n_dev = mesh.devices.size
    logger.info("mesh: %s devices", n_dev)

    sample_length = args.sample_length or (5 if args.driver == "vmd" else 3)
    if args.dataset == "vmd":
        train_ds = VideoMattingDataset(
            data_root=cfg.DATASET.PATH, image_shape=cfg.TRAIN.TRAIN_INPUT_SIZE,
            mode="train", use_subset=cfg.DATASET.SUBSET, no_flow=True,
            sample_length=sample_length,
            plus1=cfg.MODEL.startswith("vmn_res"), seed=seed)
        val_ds = VideoMattingDataset(
            data_root=cfg.DATASET.PATH, image_shape=cfg.TRAIN.VAL_INPUT_SIZE,
            mode="val", use_subset=cfg.DATASET.SUBSET, no_flow=True,
            sample_length=3, plus1=cfg.MODEL.startswith("vmn_res"), seed=seed)
    else:
        from tcvom_tpu.data.dim import DIMPretrainDataset
        train_ds = DIMPretrainDataset(
            data_root=cfg.DATASET.PATH, image_shape=cfg.TRAIN.TRAIN_INPUT_SIZE,
            min_shape=cfg.TRAIN.MIN_EDGE_LENGTH, plus1=False, seed=seed)
        val_ds = None

    # the loader's batch_size is PER PROCESS (its index list is already
    # strided across processes); the devices of this process consume it and
    # GSPMD sees the concatenation as the global batch of size
    # per_gpu * n_dev — the reference's per-rank batches under DDP
    local_bs = cfg.TRAIN.BATCH_SIZE_PER_GPU * jax.local_device_count()
    global_bs = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
    train_loader = DataLoader(train_ds, local_bs, shuffle=True,
                              num_workers=cfg.SYSTEM.NUM_WORKERS, seed=seed,
                              num_shards=jax.process_count(),
                              shard=jax.process_index())
    steps_per_epoch = len(train_loader)
    total_iters = cfg.TRAIN.TOTAL_STEPS * steps_per_epoch

    task = TaskConfig(model=cfg.MODEL, agg_window=cfg.AGG_WINDOW,
                      freeze_backbone=cfg.TRAIN.FREEZE_BACKBONE, eps=args.eps)
    trainer = MattingTrainer(task, args.driver,
                             optimizer=cfg.TRAIN.OPTIMIZER,
                             lr_strategy=cfg.TRAIN.LR_STRATEGY,
                             base_lr=cfg.TRAIN.BASE_LR,
                             weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                             total_iters=total_iters, remat=args.remat,
                             compute_dtype=jnp.bfloat16
                             if cfg.TRAIN.BF16 else None)

    key = jax.random.PRNGKey(seed)
    sample = next(iter(train_loader))
    sample = {k: jnp.asarray(v) for k, v in sample.items() if k in ("a", "fg", "bg")}
    state = trainer.init_state(key, sample)

    start_epoch = 0
    if getattr(cfg.TRAIN, "LOAD_IMAGENET", ""):
        # encoder init from a torch ImageNet ResNet state_dict, stem conv
        # widened to the model's input channels (reference
        # train_single_ddp.py:186-196); applied before LOAD_CKPT so a
        # staged checkpoint can still override
        from tcvom_tpu.utils.checkpoint import load_imagenet_encoder
        merged, _, _ = load_imagenet_encoder(
            cfg.MODEL, state.variables, cfg.TRAIN.LOAD_IMAGENET, logger)
        params = merged.pop("params")
        state = state.replace(params=params, model_state=merged)
        logger.info("=> loaded ImageNet pretrain weight from %s",
                    cfg.TRAIN.LOAD_IMAGENET)
    if cfg.TRAIN.LOAD_CKPT:
        merged, _, _ = load_weights(cfg.MODEL, state.variables,
                                    cfg.TRAIN.LOAD_CKPT, logger)
        params = merged.pop("params")
        state = state.replace(params=params, model_state=merged)
        logger.info("=> loaded checkpoint from %s", cfg.TRAIN.LOAD_CKPT)
    if cfg.TRAIN.LOAD_OPT:
        # full optimizer resume (reference train_ddp.py:300-304): restore
        # the entire TrainState into the freshly-initialized structure so
        # optax state (moments, step counts, masked nodes) round-trips
        state = restore_train_state(cfg.TRAIN.LOAD_OPT, state)
        start_epoch = int(np.asarray(state.step)) // steps_per_epoch
        logger.info("=> resumed full train state from %s (step %d, "
                    "epoch %d)", cfg.TRAIN.LOAD_OPT,
                    int(np.asarray(state.step)), start_epoch)

    # place the (identical-on-every-process) state onto the mesh as global
    # replicated arrays; required before mixing with multi-process global
    # batches, a no-op data-wise on one process
    from tcvom_tpu.parallel import replicate
    state = replicate(state, mesh)

    losses_fmt = (["L_alpha", "L_comp", "L_grad"]
                  if task.method != "fba" else
                  ["L_alpha_comp", "L_lap", "L_grad"])
    best_loss = 1e8
    tic0 = time.time()
    for epoch in range(start_epoch, cfg.TRAIN.TOTAL_STEPS):
        train_loader.set_epoch(epoch)
        batch_time, ave_loss = AverageMeter(), AverageMeter()
        tic = time.time()
        for i_iter, batch in enumerate(train_loader):
            if args.profile_dir and epoch == start_epoch and i_iter == 10:
                jax.profiler.start_trace(args.profile_dir)
            if args.profile_dir and epoch == start_epoch and i_iter == 20:
                jax.profiler.stop_trace()
            dev_batch = shard_batch(
                {k: batch[k] for k in ("a", "fg", "bg")}, mesh)
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, dev_batch, sub)
            if i_iter % cfg.TRAIN.PRINT_FREQ == 0:
                metrics = jax.device_get(metrics)
                ave_loss.update(float(metrics["loss"]))
                batch_time.update(time.time() - tic)
                tic = time.time()
                cur = epoch * steps_per_epoch + i_iter
                msg = (f"Iter:[{cur}/{total_iters}], "
                       f"Time: {batch_time.average() / max(cfg.TRAIN.PRINT_FREQ, 1):.2f}, "
                       f"lr: {float(metrics['lr']):.6g}, "
                       f"Avg. Loss: {ave_loss.average():.6f} | "
                       f"Current: Loss: {float(metrics['loss']):.6f}, ")
                msg += " ".join(f"{n}: {float(metrics[k]):.4f}" for n, k in
                                zip(losses_fmt, ("L1", "L2", "L3")))
                if args.driver == "vmd":
                    msg += (f" L_dt: {float(metrics['L_dt']):.4f}"
                            f" L_att: {float(metrics['L_att']):.4f}")
                logger.info(msg)

            if i_iter % cfg.TRAIN.IMAGE_FREQ == 0:
                from tcvom_tpu.parallel import local_data
                from tcvom_tpu.utils.visualize import write_training_images
                key, sub = jax.random.split(key)
                aux = trainer.vis_step(state, dev_batch, sub)
                # rank 0 dumps its local slice of the global batch (the
                # reference wrote rank-0's per-rank batch under DDP)
                aux = jax.tree.map(local_data, aux)
                if rank == 0:
                    write_training_images(
                        os.path.join(outdir, "training_images"), aux,
                        epoch * steps_per_epoch + i_iter)

        # validation L_dt indicator (epochs >= 15, train_ddp.py:322)
        val_loss = best_loss
        if val_ds is not None and epoch >= 15 and args.driver == "vmd":
            val_loader = DataLoader(val_ds, local_bs, shuffle=False,
                                    num_workers=cfg.SYSTEM.NUM_WORKERS,
                                    drop_last=True,
                                    num_shards=jax.process_count(),
                                    shard=jax.process_index())
            meter = AverageMeter()
            # per-epoch pred/tri/gt triplets for the first few val batches
            # (the reference's validate() image dumps, train_ddp.py:129-138)
            from tcvom_tpu.utils.visualize import write_val_triplets
            val_img_dir = os.path.join(outdir, "val_images", f"epoch_{epoch}")
            dumped = 0
            for bi, batch in enumerate(val_loader):
                dev_batch = shard_batch(
                    {k: batch[k] for k in ("a", "fg", "bg")}, mesh)
                key, sub = jax.random.split(key)
                l_dt, (pred_c, tri_c, gt_c) = trainer.val_dt_step(
                    state, dev_batch, sub)
                meter.update(float(l_dt))
                if bi < args.val_image_batches and rank == 0:
                    from tcvom_tpu.parallel import local_data
                    dumped = write_val_triplets(
                        val_img_dir, local_data(pred_c), local_data(tri_c),
                        local_data(gt_c), dumped)
            val_loss = meter.average()
            logger.info("epoch %d val L_dt: %.6f", epoch, val_loss)

        # every process enters the save: orbax's Checkpointer.save holds
        # internal all-process barriers (gating to rank 0 deadlocks rank 0,
        # observed with a 2-process CPU run) and writes single-writer from
        # the primary host — the reference's rank<=0 torch.save
        # (train_ddp.py:331-343)
        ckpt_fn = os.path.join(outdir, f"checkpoint_{epoch + 1}")
        save_checkpoint(ckpt_fn, {"step": state.step, "params": state.params,
                                  "model_state": state.model_state,
                                  "opt_state": state.opt_state})
        if rank == 0:
            logger.info("=> saved checkpoint to %s", ckpt_fn)
        # val_loss is a global-batch mean, identical on every process, so
        # all ranks agree on whether to enter the collective save
        if val_loss < best_loss:
            best_loss = val_loss
            save_checkpoint(os.path.join(outdir, "best"),
                            {"step": state.step, "params": state.params,
                             "model_state": state.model_state})
            if rank == 0:
                logger.info("=> new minimum loss. saved best")
    logger.info("Time: %d sec.", int(time.time() - tic0))
    logger.info("Done")


if __name__ == "__main__":
    main()
