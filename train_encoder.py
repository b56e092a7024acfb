#!/usr/bin/env python
"""Autoencoder pretraining CLI (identity reconstruction on fully-sampled
tiles), producing the pretrained encoder the modulated SIREN fine-tunes.

Parity with the reference's ``train_encoder.py`` + the AE trainer in
``src/networks/encoding/perceptual_encoder.py:251-383`` (studied, not
copied). Two targets:
- ``--model conv``: the 32x32 ConvAutoencoder whose encoder becomes the
  SIREN's ``custom`` latent encoder (``model.encoder_path``);
- ``--model perceptual``: the 24x24 PerceptualAutoencoderV2 whose encoder
  drives the perceptual loss (``training.perceptual_encoder_path``).

Usage:
    python train_encoder.py --dataset <metadata.csv> --output <dir>
        [--model conv|perceptual] [--epochs 50] [--batch-size 256] [--lr 1e-3]

Evaluation mode (the reference's ``test_autoencoder``,
``siren_encoder.py:420-483``): reconstruct sample slices patchwise through
a trained AE (``*_full`` checkpoint), fold back, write comparison PNGs +
per-slice PSNR/SSIM/NRMSE:

    python train_encoder.py --dataset <metadata.csv> --output <dir>
        [--model ...] --evaluate <..._full ckpt> [--num-samples 3]
"""

from __future__ import annotations

import argparse
import pathlib


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, help="metadata.csv path")
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--model", choices=["conv", "perceptual", "vgg"], default="conv"
    )
    parser.add_argument("--latent-dim", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--evaluate", default=None, metavar="CKPT",
        help="evaluate a trained *_full AE checkpoint instead of training",
    )
    parser.add_argument("--num-samples", type=int, default=3)
    from mri_inr_tpu.utils.platform import add_platform_arg, select_platform

    add_platform_arg(parser)
    args = parser.parse_args()
    select_platform(args.platform, args.devices)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import orbax.checkpoint as ocp

    from mri_inr_tpu.data.dataset import MRIDataset
    from mri_inr_tpu.models.encoder import ConvAutoencoder, VGGAutoencoder
    from mri_inr_tpu.models.perceptual import PerceptualAutoencoderV2
    from mri_inr_tpu.ops import tiling

    if args.model == "conv":
        model = ConvAutoencoder(latent_dim=args.latent_dim)
        patch = 32
        has_batch_stats = False
    elif args.model == "vgg":
        # pretrains the VGG16 trunk whose weights initialize the SIREN's
        # ``vgg`` encoder_type (reference loads ImageNet weights instead,
        # vgg.py:325-363 — no egress here, so in-framework pretraining)
        model = VGGAutoencoder()
        patch = 32
        has_batch_stats = False
    else:
        model = PerceptualAutoencoderV2(latent_dim=args.latent_dim)
        patch = 24
        has_batch_stats = True

    if args.evaluate:
        _evaluate(args, model, patch, has_batch_stats)
        return

    dataset = MRIDataset(args.dataset)
    print(f"dataset: {len(dataset)} patches")

    def prepare(batch_full):
        x = jnp.asarray(batch_full)
        if patch != x.shape[-1]:
            x = tiling.extract_center_batch(x, x.shape[-1], patch)
        return x

    sample = prepare(dataset.fully_tiles[: args.batch_size])
    variables = model.init(jax.random.key(args.seed), sample)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(variables, opt_state, x):
        def loss_of(params):
            vars_in = {"params": params, **{
                k: v for k, v in variables.items() if k != "params"
            }}
            if has_batch_stats:
                out, updates = model.apply(
                    vars_in, x, train=True, mutable=["batch_stats"]
                )
            else:
                out = model.apply(vars_in, x)
                updates = {}
            return jnp.mean(jnp.square(out - x)), updates

        (loss, updates), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        new_updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], new_updates)
        new_variables = {"params": new_params, **updates}
        return new_variables, new_opt_state, loss

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for epoch in range(args.epochs):
        losses_acc = []
        for fully, _ in dataset.batches(args.batch_size, seed=epoch):
            x = prepare(fully)
            variables, opt_state, loss = train_step(variables, opt_state, x)
            losses_acc.append(float(loss))
        print(f"epoch {epoch}: loss={np.mean(losses_acc):.6f}")
        if (epoch + 1) % 10 == 0 or epoch == args.epochs - 1:
            path = out_dir / f"{args.model}_autoencoder_epoch_{epoch:05d}"
            with ocp.StandardCheckpointer() as ckptr:
                if args.model in ("conv", "vgg"):
                    # save params only — the SIREN splices `params['encoder']`
                    # (conv) or `params['trunk']` (vgg)
                    ckptr.save(path.absolute(), variables["params"], force=True)
                else:
                    # perceptual loss needs params + batch_stats of the encoder
                    enc_vars = {
                        "params": variables["params"]["encoder"],
                        "batch_stats": variables["batch_stats"]["encoder"],
                    }
                    ckptr.save(path.absolute(), enc_vars, force=True)
                # full AE variables, for --evaluate reconstruction
                full = path.parent / f"{path.name}_full"
                ckptr.save(full.absolute(), dict(variables), force=True)
            print(f"saved {path}")


def _evaluate(args, model, patch: int, has_batch_stats: bool):
    """Patchwise AE reconstruction of sample slices + fold + metrics
    (reference ``test_autoencoder``, ``siren_encoder.py:420-483``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from mri_inr_tpu.data.dataset import MRISampler
    from mri_inr_tpu.eval.metrics import image_metrics
    from mri_inr_tpu.ops import tiling
    from mri_inr_tpu.utils.visualization import save_image_comparison

    sample_x = jnp.zeros((1, patch, patch), jnp.float32)
    from mri_inr_tpu.train.checkpoint import with_default_sharding

    abstract = with_default_sharding(
        jax.eval_shape(lambda: model.init(jax.random.key(0), sample_x))
    )
    with ocp.StandardCheckpointer() as ckptr:
        variables = ckptr.restore(
            pathlib.Path(args.evaluate).absolute(), abstract
        )
    print(f"restored {args.evaluate}")

    @jax.jit
    def recon_patches(x):
        return model.apply(variables, x)

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    sampler = MRISampler(args.dataset)
    inner = patch // 2
    rows = []
    for i in range(args.num_samples):
        pair = sampler.next_sample()
        img = jnp.asarray(pair.fully_sampled)
        patches = tiling.image_to_patches(img, patch, inner)
        grid = tiling.grid_shape(*img.shape, inner)
        out = recon_patches(patches)
        recon = tiling.patches_to_image(out, grid, patch, inner)
        recon = recon[: img.shape[0], : img.shape[1]]
        m = {k: float(v) for k, v in image_metrics(img, recon).items()}
        rows.append((pair.slice_id, m))
        print(f"{pair.slice_id}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        save_image_comparison(
            [np.asarray(img), np.asarray(recon)],
            ["fully_sampled", "ae_reconstruction"],
            f"{pair.slice_id}_ae",
            out_dir,
        )
    with open(out_dir / "ae_metrics.csv", "w") as f:
        f.write("FILENAME,PSNR,SSIM,NRMSE\n")
        for slice_id, m in rows:
            f.write(f"{slice_id},{m['psnr']},{m['ssim']},{m['nrmse']}\n")


if __name__ == "__main__":
    main()
