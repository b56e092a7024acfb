#!/usr/bin/env python
"""Training CLI for the modulated SIREN.

Parity with the reference's ``train_mod_siren.py`` (studied, not copied):
resume-vs-fresh run resolution, timestamped run dir with a config copy,
dataset/model/optimizer/trainer assembly, training with periodic
checkpoints + snapshots. Additions: dotted ``--set key=value`` overrides
(the reference README promises these but never implements them) and
mesh-sharded data parallelism.

Usage:
    python train_mod_siren.py --config configs/train.yaml \
        [--set training.epochs=10] [--set training.lr=3e-4]
"""

from __future__ import annotations

import argparse
import pathlib


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", default=None)
    parser.add_argument("--set", dest="overrides", action="append", default=[])
    from mri_inr_tpu.utils.platform import add_platform_arg, select_platform

    add_platform_arg(parser)
    args = parser.parse_args()
    select_platform(args.platform, args.devices)

    import jax
    import jax.numpy as jnp

    from mri_inr_tpu.parallel import distributed

    # pod-slice bootstrap (no-op single-process); every host runs this same
    # program, only the primary writes host-side artifacts
    distributed.initialize()
    primary = distributed.is_primary()

    from mri_inr_tpu.configuration import load_train_configuration
    from mri_inr_tpu.configuration.config import save_config_yaml
    from mri_inr_tpu.data.dataset import MRIDataset, MRIDatasetLowMemory
    from mri_inr_tpu.models import modulated_siren as ms
    from mri_inr_tpu.models.encoder import ConvAutoencoder
    from mri_inr_tpu.parallel import mesh as mesh_lib
    from mri_inr_tpu.train import checkpoint as ckpt_lib
    from mri_inr_tpu.train import losses
    from mri_inr_tpu.train.trainer import (
        Trainer,
        create_train_state,
        splice_pretrained_encoder,
    )

    cfg = load_train_configuration(args.config, args.overrides)
    tcfg, mcfg, dcfg = cfg.training, cfg.model, cfg.data

    # resume-vs-fresh resolution (reference train_mod_siren.py:32-56);
    # an explicit training.model_path pins the run dir, otherwise the
    # newest {name}_{timestamp} dir with the highest step is discovered
    resume = None
    if tcfg.continue_training:
        if tcfg.model_path:
            run = pathlib.Path(tcfg.model_path)
            resume = (run, ckpt_lib.find_latest_step(run))
        else:
            resume = ckpt_lib.resolve_resume(tcfg.output_dir, tcfg.output_name)
        if resume:
            print(f"resuming from {resume[0]} at step {resume[1]}")
    if resume:
        run_dir = resume[0]
    else:
        # all hosts must agree on the timestamped dir name: broadcast the
        # primary's wall clock before forming it
        ts = None
        if distributed.process_count() > 1:
            import datetime

            import numpy as np
            from jax.experimental import multihost_utils

            epoch_s = int(
                multihost_utils.broadcast_one_to_all(
                    np.int64(datetime.datetime.now().timestamp())
                )
            )
            ts = datetime.datetime.fromtimestamp(epoch_s).strftime(
                "%Y-%m-%d_%H-%M-%S"
            )
        run_dir = ckpt_lib.new_run_dir(tcfg.output_dir, tcfg.output_name, ts)
    if primary:
        save_config_yaml(cfg, run_dir / "config.yaml")
    print(f"run dir: {run_dir}")

    dataset_cls = MRIDatasetLowMemory if dcfg.low_memory else MRIDataset
    if dcfg.train.online:
        from mri_inr_tpu.data.online import OnlineKspaceDataset

        train_ds = OnlineKspaceDataset(
            dcfg.train.dataset,
            center_fraction=dcfg.center_fraction,
            acceleration=dcfg.acceleration,
            mri_type=dcfg.train.mri_type,
            max_slice_num=dcfg.train.max_slice_num,
            num_samples=dcfg.train.num_samples,
            seed=dcfg.train.seed,
            outer_patch_size=mcfg.outer_patch_size,
            inner_patch_size=mcfg.inner_patch_size,
            remask_each_epoch=dcfg.train.remask_each_epoch,
        )
    else:
        train_ds = dataset_cls(
            dcfg.train.dataset,
            center_fraction=dcfg.center_fraction,
            acceleration=dcfg.acceleration,
            mri_type=dcfg.train.mri_type,
            max_slice_num=dcfg.train.max_slice_num,
            num_samples=dcfg.train.num_samples,
            seed=dcfg.train.seed,
            outer_patch_size=mcfg.outer_patch_size,
            inner_patch_size=mcfg.inner_patch_size,
        )
    if dcfg.val.online or (not dcfg.val.dataset and dcfg.train.online):
        # online train runs default to an online val split too (the train
        # fallback path would otherwise hand MRIDataset an .h5 directory);
        # validation masks stay FIXED (remask off) so val curves are
        # comparable across epochs
        from mri_inr_tpu.data.online import OnlineKspaceDataset

        val_ds = OnlineKspaceDataset(
            dcfg.val.dataset or dcfg.train.dataset,
            center_fraction=dcfg.center_fraction,
            acceleration=dcfg.acceleration,
            mri_type=dcfg.val.mri_type,
            max_slice_num=dcfg.val.max_slice_num,
            num_samples=dcfg.val.num_samples,
            seed=dcfg.val.seed,
            outer_patch_size=mcfg.outer_patch_size,
            inner_patch_size=mcfg.inner_patch_size,
            remask_each_epoch=False,
        )
    else:
        val_ds = dataset_cls(
            dcfg.val.dataset or dcfg.train.dataset,
            center_fraction=dcfg.center_fraction,
            acceleration=dcfg.acceleration,
            mri_type=dcfg.val.mri_type,
            max_slice_num=dcfg.val.max_slice_num,
            num_samples=dcfg.val.num_samples,
            seed=dcfg.val.seed,
            outer_patch_size=mcfg.outer_patch_size,
            inner_patch_size=mcfg.inner_patch_size,
        )
    print(f"train patches: {len(train_ds)}, val patches: {len(val_ds)}")
    # data manifest (the reference's processed_files.txt)
    if primary and hasattr(train_ds, "write_manifest"):
        train_ds.write_manifest(run_dir / "processed_files.txt")

    model = ms.from_config(mcfg, tcfg.precision)
    state = create_train_state(
        model,
        jax.random.key(tcfg.seed),
        jnp.zeros((2, mcfg.outer_patch_size, mcfg.outer_patch_size)),
        tcfg.optimizer,
        tcfg.lr,
    )

    if mcfg.encoder_path:
        if mcfg.encoder_type == "vgg":
            from mri_inr_tpu.models.encoder import VGGAutoencoder

            ae = VGGAutoencoder()
        else:
            ae = ConvAutoencoder(latent_dim=mcfg.latent_dim)
        abstract = ckpt_lib.with_default_sharding(
            jax.eval_shape(
                lambda: ae.init(
                    jax.random.key(0),
                    jnp.zeros((2, mcfg.outer_patch_size, mcfg.outer_patch_size)),
                )
            )["params"]
        )
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ae_params = ckptr.restore(
                pathlib.Path(mcfg.encoder_path).absolute(), abstract
            )
        state = state.replace(
            params=splice_pretrained_encoder(state.params, ae_params)
        )
        print(f"loaded pretrained {mcfg.encoder_type} encoder from {mcfg.encoder_path}")

    perceptual_vars = None
    if tcfg.criterion == "perceptual":
        from mri_inr_tpu.models.perceptual import PerceptualEncoderV2

        if not tcfg.perceptual_encoder_path:
            raise ValueError(
                "criterion=perceptual requires training.perceptual_encoder_path"
            )
        enc = PerceptualEncoderV2()
        abstract = enc.init(
            jax.random.key(0), jnp.zeros((2, mcfg.siren_patch_size, mcfg.siren_patch_size))
        )
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            perceptual_vars = ckptr.restore(
                pathlib.Path(tcfg.perceptual_encoder_path).absolute(), abstract
            )
    loss_fn = losses.make_loss_fn(
        tcfg.criterion, perceptual_vars, mcfg.siren_patch_size
    )

    mesh = mesh_lib.make_mesh(tcfg.data_axis_size)
    print(f"mesh: {mesh}")

    from mri_inr_tpu.ops.siren_kernel import pallas_available

    use_pallas = (
        tcfg.use_pallas
        if tcfg.use_pallas is not None
        else (mcfg.use_pallas and pallas_available())
    )
    if use_pallas:
        print("training with fused Pallas fwd+bwd kernels")

    initial_epoch = 0
    trainer = Trainer(
        model,
        state,
        loss_fn,
        train_ds,
        val_ds,
        run_dir,
        batch_size=tcfg.batch_size,
        save_interval=tcfg.save_interval,
        outer_patch_size=mcfg.outer_patch_size,
        siren_patch_size=mcfg.siren_patch_size,
        mesh=mesh,
        base_rng=jax.random.key(tcfg.seed + 1),
        tensorboard=tcfg.logging,
        use_pallas=use_pallas,
        device_data=tcfg.device_data,
        sin5=tcfg.sin5,
        freeze_encoder=tcfg.freeze_encoder,
    )
    if resume:
        trainer.state = ckpt_lib.restore_state(resume[0], resume[1], trainer.state)
        steps_per_epoch = max(1, len(train_ds) // tcfg.batch_size)
        initial_epoch = int(trainer.state.step) // steps_per_epoch
        print(f"restored step {resume[1]}; continuing at epoch {initial_epoch}")

    if tcfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from mri_inr_tpu.utils.profiling import device_trace

    trainer.initial_errors()
    with device_trace(tcfg.profile_dir):
        trainer.train(tcfg.epochs, initial_epoch)
    print(f"done; final step {int(trainer.state.step)}; artifacts in {run_dir}")


if __name__ == "__main__":
    main()
