"""Training runtime: one jitted, mesh-sharded train step + an epoch loop
with the reference's artifact contract.

Reference behavior reproduced (``src/train/training.py``, studied not
copied): per-batch [crop 24x24 center target from the fully-sampled patch ->
model(undersampled patch) -> criterion -> optimizer step]; initial train/val
loss before training; per-epoch validation; every ``save_interval`` epochs a
checkpoint + train/val snapshot comparison renders; a progress log with
epoch/loss/wall-clock columns; final checkpoint at the end.

TPU-native design:
- ONE ``jax.jit`` train step (fwd+bwd+optax update) with ``NamedSharding``
  annotations: the patch batch is sharded over the ``data`` mesh axis,
  params/optimizer state replicated; XLA inserts the gradient all-reduce
  over ICI. The same step runs on 1 chip or a pod slice.
- bf16 compute / fp32 params & loss (no GradScaler needed — the reference's
  CUDA AMP + GradScaler dance, ``training.py:29,140,197-203``, is a no-op
  on TPU bf16).
- Deterministic PRNG threading: dropout keys are ``fold_in(base, step)``.
- Host input pipeline feeds static-shape batches (no recompiles).
"""

from __future__ import annotations

import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from mri_inr_tpu.eval.evaluate import SliceReconstructor
from mri_inr_tpu.ops import tiling
from mri_inr_tpu.parallel import mesh as mesh_lib
from mri_inr_tpu.train import checkpoint as ckpt_lib
from mri_inr_tpu.utils import visualization


class TrainState(train_state.TrainState):
    pass


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    if name == "adam":
        return optax.adam(lr)
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"Unknown optimizer {name!r}")


def create_train_state(
    model, rng: jax.Array, sample_batch: jax.Array, optimizer: str, lr: float
) -> TrainState:
    params = model.init(rng, sample_batch)["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(optimizer, lr)
    )


def splice_pretrained_encoder(params, autoencoder_params):
    """Install pretrained autoencoder encoder weights into a ModulatedSiren
    parameter tree; they are then fine-tuned jointly with the SIREN (the
    reference's ``FixedEncoder`` load, ``siren_encoder.py:551-577`` +
    ``modulated_siren.py:252-255``, and the VGG path,
    ``modulated_siren.py:256-262``).

    Conv AE checkpoints carry an ``encoder`` subtree (replaces the custom
    encoder); VGG AE checkpoints carry a ``trunk`` subtree (replaces the
    vgg encoder's conv stack, leaving its latent head freshly initialized).
    """
    import flax

    params = flax.core.unfreeze(params)
    if "trunk" in autoencoder_params:
        params["encoder"]["encoder"]["trunk"] = autoencoder_params["trunk"]
    else:
        params["encoder"]["encoder"] = autoencoder_params["encoder"]
    return params


def _make_forward(model, use_pallas: bool, interpret: bool,
                  sin5: bool = False, bwd_block_b: int | None = None,
                  dw_partials: bool = True):
    """(params, under, dropout_rng) -> (B, siren, siren) train-mode forward:
    the fused Pallas custom_vjp chain (``ops/siren_train_kernel``) when
    requested, else the Flax autodiff path. Residual models are not fused.
    ``sin5``: degree-5 sine/cosine in the train kernels (training speed
    mode, ``training.sin5``, opt-in — changes training numerics).
    ``bwd_block_b``/``dw_partials``: backward-kernel schedule knobs
    (benchmarks/bench_bwd_variants.py measures the tradeoffs)."""
    if use_pallas and not getattr(model, "residual", False):
        from mri_inr_tpu.ops import siren_train_kernel as stk

        def forward(params, under, dropout_rng):
            return stk.fused_train_apply(
                model, params, under, dropout_rng, interpret=interpret,
                sin5=sin5, bwd_block_b=bwd_block_b, dw_partials=dw_partials,
            )

        return forward

    def forward(params, under, dropout_rng):
        return model.apply(
            {"params": params},
            under,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )

    return forward



def _freeze_encoder_grads(grads):
    """Zero the latent-encoder trunk gradients (``training.freeze_encoder``):
    the spliced conv stack stays at its loaded initialization while the
    latent head / modulator / SIREN train. This is the reference-splice
    control experiment (the reference installs an ImageNet-trained VGG
    trunk, ``src/networks/encoding/vgg.py:325-363`` +
    ``modulated_siren.py:256-262``; freezing a non-corpus trunk isolates
    whether its initialization alone reproduces the ~5 dB collapse,
    RESULTS.md)."""
    import flax

    g = flax.core.unfreeze(grads)
    enc = g["encoder"]["encoder"]
    if "trunk" in enc:
        enc["trunk"] = jax.tree.map(jnp.zeros_like, enc["trunk"])
    else:
        g["encoder"]["encoder"] = jax.tree.map(jnp.zeros_like, enc)
    return g


def make_train_step(
    model,
    loss_fn,
    outer: int,
    siren: int,
    mesh=None,
    use_pallas: bool = False,
    interpret: bool = False,
    sin5: bool = False,
    freeze_encoder: bool = False,
):
    """Build the jitted (state, fully, under, rng) -> (state, loss) step.

    ``use_pallas`` routes the fwd+bwd through the fused Pallas kernels.
    With a mesh, the pallas path runs under ``shard_map`` (per-device local
    batch + ``pmean`` of loss/grads) — a ``pallas_call`` under plain GSPMD
    sharding constraints would gather the batch to one device; the Flax
    path keeps the GSPMD formulation (XLA partitions it well)."""
    forward = _make_forward(model, use_pallas, interpret, sin5)

    def loss_and_grads(params, fully, under, dropout_rng):
        target = tiling.extract_center_batch(fully, outer, siren).astype(jnp.float32)

        def loss_of(p):
            pred = forward(p, under, dropout_rng)
            return loss_fn(pred.astype(jnp.float32), target)

        loss, grads = jax.value_and_grad(loss_of)(params)
        if freeze_encoder:
            grads = _freeze_encoder_grads(grads)
        return loss, grads

    if mesh is None:

        def step(state: TrainState, fully, under, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            loss, grads = loss_and_grads(state.params, fully, under, dropout_rng)
            return state.apply_gradients(grads=grads), loss

        return jax.jit(step, donate_argnums=(0,))

    batch_sh = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated_sharding(mesh)

    if use_pallas and not getattr(model, "residual", False):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local_lag(params, fully, under, dropout_rng):
            # distinct dropout stream per device shard
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index("data")
            )
            loss, grads = loss_and_grads(params, fully, under, dropout_rng)
            return jax.lax.pmean(loss, "data"), jax.lax.pmean(grads, "data")

        sharded_lag = shard_map(
            local_lag,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def step(state: TrainState, fully, under, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            loss, grads = sharded_lag(state.params, fully, under, dropout_rng)
            return state.apply_gradients(grads=grads), loss

    else:

        def step(state: TrainState, fully, under, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            loss, grads = loss_and_grads(state.params, fully, under, dropout_rng)
            return state.apply_gradients(grads=grads), loss

    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def _make_eval_apply(model, use_pallas: bool, interpret: bool,
                     sin5: bool = False):
    """Deterministic (params, under) -> (B, siren, siren) forward for
    validation epochs and snapshot rendering: the fused Pallas eval kernel
    when training runs fused (the Flax fallback here used to pay the exact
    HBM layer-crossing traffic the kernels eliminate — for the validation
    half of every epoch), else the Flax apply. ``sin5`` follows the
    trainer's training.sin5 choice so val curves/snapshots use the same
    sine degree as the train step (a training.sin5=false run must not get
    degree-5 validation numerics through the eval kernel's own default).
    Library-level default is the conservative degree-9; the promoted
    sin5=True default lives in TrainingConfig, wired through the CLI."""
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn

    return make_apply_fn(model, use_pallas=use_pallas, interpret=interpret,
                         sin5=sin5)


def make_eval_step(
    model,
    loss_fn,
    outer: int,
    siren: int,
    mesh=None,
    use_pallas: bool = False,
    interpret: bool = False,
    sin5: bool = False,
):
    apply_fn = _make_eval_apply(model, use_pallas, interpret, sin5)

    def loss_of(params, fully, under):
        target = tiling.extract_center_batch(fully, outer, siren).astype(jnp.float32)
        pred = apply_fn(params, under)
        return loss_fn(pred.astype(jnp.float32), target)

    if mesh is None:
        return jax.jit(
            lambda state, fully, under: loss_of(state.params, fully, under)
        )
    batch_sh = mesh_lib.batch_sharding(mesh)
    repl = mesh_lib.replicated_sharding(mesh)

    if use_pallas and not getattr(model, "residual", False):
        # same reasoning as the fused train step: a pallas_call under plain
        # GSPMD would gather the batch to one device — shard_map keeps each
        # device on its local rows, pmean combines the loss
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        sharded_loss = shard_map(
            lambda p, f, u: jax.lax.pmean(loss_of(p, f, u), "data"),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
        step = lambda state, fully, under: sharded_loss(
            state.params, fully, under
        )
    else:
        step = lambda state, fully, under: loss_of(state.params, fully, under)
    return jax.jit(
        step, in_shardings=(repl, batch_sh, batch_sh), out_shardings=repl
    )


def make_epoch_perm(
    n: int, batch_size: int, seed: int, shuffle: bool
) -> np.ndarray:
    """(num_batches, batch_size) int32 index matrix with the exact batch
    semantics of ``MRIDataset.batches`` (shuffled order, remainder wrapped
    from the epoch's start) — shared by the host loop and the scan epoch."""
    from mri_inr_tpu.data.dataset import epoch_index_batches

    return np.stack(
        epoch_index_batches(n, batch_size, seed, shuffle)
    ).astype(np.int32)


def make_scan_epoch(
    model,
    loss_fn,
    outer: int,
    siren: int,
    use_pallas: bool = False,
    interpret: bool = False,
    sin5: bool = False,
    freeze_encoder: bool = False,
):
    """One-dispatch epoch: the whole (device-resident) tile set + a
    (num_batches, batch) permutation go in, ``lax.scan`` runs every train
    step on-device, the new state + mean loss come out.

    This is the TPU-native answer to per-batch dispatch overhead: through
    the axon relay a dispatch costs ~23.5 ms, which at the reference's
    batch 400 would dominate the step; scanned, the epoch is ONE dispatch.
    Single-mesh (data fits one chip's HBM) — the pod path keeps the
    per-batch ``make_train_step``."""
    forward = _make_forward(model, use_pallas, interpret, sin5)
    eval_apply = _make_eval_apply(model, use_pallas, interpret, sin5)

    def epoch(state: TrainState, fully_all, under_all, perm, rng, train: bool):
        def train_body(st, batch_idx):
            fully = jnp.take(fully_all, batch_idx, axis=0)
            under = jnp.take(under_all, batch_idx, axis=0)
            target = tiling.extract_center_batch(fully, outer, siren).astype(
                jnp.float32
            )
            dropout_rng = jax.random.fold_in(rng, st.step)

            def loss_of(p):
                pred = forward(p, under, dropout_rng)
                return loss_fn(pred.astype(jnp.float32), target)

            loss, grads = jax.value_and_grad(loss_of)(st.params)
            if freeze_encoder:
                grads = _freeze_encoder_grads(grads)
            return st.apply_gradients(grads=grads), loss

        def eval_body(st, batch_idx):
            fully = jnp.take(fully_all, batch_idx, axis=0)
            under = jnp.take(under_all, batch_idx, axis=0)
            target = tiling.extract_center_batch(fully, outer, siren).astype(
                jnp.float32
            )
            pred = eval_apply(st.params, under)
            return st, loss_fn(pred.astype(jnp.float32), target)

        state, losses = jax.lax.scan(
            train_body if train else eval_body, state, perm
        )
        return state, jnp.mean(losses)

    return jax.jit(epoch, static_argnums=(5,), donate_argnums=(0,))


class Trainer:
    """Epoch loop + artifacts (checkpoints, snapshots, progress log)."""

    def __init__(
        self,
        model,
        state: TrainState,
        loss_fn,
        train_dataset,
        val_dataset,
        run_dir: str | pathlib.Path,
        batch_size: int = 400,
        save_interval: int = 100,
        snapshot_slices: int = 2,
        outer_patch_size: int = 32,
        siren_patch_size: int = 24,
        mesh=None,
        base_rng: jax.Array | None = None,
        log=print,
        tensorboard: bool = False,
        use_pallas: bool = False,
        interpret: bool = False,
        device_data: bool = False,
        sin5: bool = False,
        freeze_encoder: bool = False,
    ):
        self.model = model
        self.state = state
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.run_dir = pathlib.Path(run_dir)
        self.batch_size = batch_size
        self.save_interval = save_interval
        self.snapshot_slices = snapshot_slices
        self.mesh = mesh
        self.base_rng = base_rng if base_rng is not None else jax.random.key(0)
        self.log = log
        self.outer = outer_patch_size
        self.siren = siren_patch_size

        self.train_step = make_train_step(
            model, loss_fn, outer_patch_size, siren_patch_size, mesh,
            use_pallas=use_pallas, interpret=interpret, sin5=sin5,
            freeze_encoder=freeze_encoder,
        )
        self.eval_step = make_eval_step(
            model, loss_fn, outer_patch_size, siren_patch_size, mesh,
            use_pallas=use_pallas, interpret=interpret, sin5=sin5,
        )
        # device-resident scan epochs: load each dataset's tiles to HBM once
        # and run the whole epoch as ONE dispatch (single-device only)
        self.device_data = device_data and (
            mesh is None or mesh.devices.size == 1
        )
        self._scan_epoch = None
        self._dev_tiles: dict = {}
        if self.device_data:
            self._scan_epoch = make_scan_epoch(
                model, loss_fn, outer_patch_size, siren_patch_size,
                use_pallas=use_pallas, interpret=interpret, sin5=sin5,
                freeze_encoder=freeze_encoder,
            )
        # snapshot rendering shares the fused eval path when training fused
        self.reconstructor = SliceReconstructor(
            _make_eval_apply(model, use_pallas, interpret, sin5),
            outer_patch_size=outer_patch_size,
            siren_patch_size=siren_patch_size,
        )
        self._progress: list[dict] = []
        self._start_time = time.time()
        # host-side artifacts (snapshots, logs, TensorBoard) are written by
        # the primary process only; checkpoint saves stay collective (orbax
        # coordinates all hosts)
        from mri_inr_tpu.parallel import distributed

        self._primary = distributed.is_primary()
        if self._primary:
            (self.run_dir / "snapshots").mkdir(parents=True, exist_ok=True)
        # opt-in TensorBoard scalars, the reference's `logging` flag contract
        # (training.py:115-119,383-387): training_loss/validation_loss per epoch
        self._tb_writer = None
        if tensorboard and self._primary:
            # tensorboardX writes the same event-file format without
            # pulling torch into the production package (the framework's
            # only torch use is the tests' reference-parity suite)
            from tensorboardX import SummaryWriter

            self._tb_writer = SummaryWriter(log_dir=str(self.run_dir / "tensorboard"))

    # ------------------------------------------------------------------
    def _put(self, fully: np.ndarray, under: np.ndarray):
        fully = jnp.asarray(fully)
        under = jnp.asarray(under)
        if self.mesh is not None:
            fully, under = mesh_lib.shard_batch(self.mesh, fully, under)
        return fully, under

    def _epoch_loss(self, dataset, train: bool, epoch: int) -> float:
        if self.device_data:
            return self._scan_epoch_loss(dataset, train, epoch)
        losses = []
        for fully, under in dataset.batches(
            self.batch_size, seed=epoch, shuffle=train, prefetch=2
        ):
            fully, under = self._put(fully, under)
            if train:
                self.state, loss = self.train_step(
                    self.state, fully, under, self.base_rng
                )
            else:
                loss = self.eval_step(self.state, fully, under)
            losses.append(loss)
        return float(jnp.mean(jnp.stack(losses)))

    def _scan_epoch_loss(self, dataset, train: bool, epoch: int) -> float:
        """One-dispatch epoch over device-resident tiles (same batch
        composition as the host loop: :func:`make_epoch_perm`)."""
        if hasattr(dataset, "materialize"):
            # online k-space pipeline: tiles are re-materialized on device
            # with this epoch's masks (data/online.py)
            fully_all, under_all = dataset.materialize(epoch)
        elif not hasattr(dataset, "fully_tiles"):  # e.g. MRIDatasetLowMemory
            self.device_data = False
            return self._epoch_loss(dataset, train, epoch)
        else:
            key = id(dataset)
            if key not in self._dev_tiles:
                fully = jnp.asarray(dataset.fully_tiles)
                under = jnp.asarray(dataset.under_tiles)
                self._dev_tiles[key] = (fully, under)
            fully_all, under_all = self._dev_tiles[key]
        perm = jnp.asarray(
            make_epoch_perm(len(dataset), self.batch_size, epoch, shuffle=train)
        )
        self.state, loss = self._scan_epoch(
            self.state, fully_all, under_all, perm, self.base_rng, train
        )
        return float(loss)

    def initial_errors(self) -> tuple[float, float]:
        """Pre-training train/val loss (the reference's
        ``get_initial_errors``, ``training.py:259-291``)."""
        train_loss = self._epoch_loss(self.train_dataset, train=False, epoch=0)
        val_loss = self._epoch_loss(self.val_dataset, train=False, epoch=0)
        self.log(f"initial losses: train={train_loss:.6f} val={val_loss:.6f}")
        return train_loss, val_loss

    def train(self, epochs: int, initial_epoch: int = 0) -> TrainState:
        """Epoch loop. A SIGTERM (cluster preemption) finishes the current
        epoch, saves a final checkpoint + progress log, and returns —
        pairing with ``continue_training`` auto-resume for the reference's
        SLURM restart contract (slurm_restart.py, at epoch granularity)."""
        import signal

        preempted = []
        try:  # signal handlers only install from the main thread
            prev = signal.signal(
                signal.SIGTERM, lambda *_: preempted.append(True)
            )
        except ValueError:
            prev = None
        try:
            for epoch in range(initial_epoch, epochs):
                t0 = time.time()
                train_loss = self._epoch_loss(self.train_dataset, train=True, epoch=epoch)
                val_loss = self._epoch_loss(self.val_dataset, train=False, epoch=epoch)
                self._post_epoch(epoch, train_loss, val_loss, time.time() - t0)
                if preempted:
                    self.log(f"SIGTERM: stopping after epoch {epoch}")
                    break
        finally:
            if prev is not None:
                signal.signal(signal.SIGTERM, prev)
        ckpt_lib.save_state(self.run_dir, int(self.state.step), self.state)
        if self._primary:
            self._write_progress_log()
        return self.state

    # ------------------------------------------------------------------
    def _post_epoch(self, epoch: int, train_loss: float, val_loss: float, secs: float):
        self._progress.append(
            {
                "epoch": epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "epoch_seconds": secs,
                "time_since_start": time.time() - self._start_time,
            }
        )
        self.log(
            f"epoch {epoch}: train={train_loss:.6f} val={val_loss:.6f} "
            f"({secs:.2f}s)"
        )
        if self._tb_writer is not None:
            self._tb_writer.add_scalar("training_loss", train_loss, epoch)
            self._tb_writer.add_scalar("validation_loss", val_loss, epoch)
            self._tb_writer.flush()
        if (epoch + 1) % self.save_interval == 0:
            ckpt_lib.save_state(self.run_dir, int(self.state.step), self.state)
            if self._primary:
                self._render_snapshots(epoch)
        if (epoch + 1) % 100 == 0 and self._primary:
            self._write_progress_log()

    def _render_snapshots(self, epoch: int):
        out = self.run_dir / "snapshots"
        for split, dataset in (("train", self.train_dataset), ("val", self.val_dataset)):
            for i in range(self.snapshot_slices):
                pair = dataset.get_slice(i)
                recon, fully, under, _ = self.reconstructor(
                    self.state.params, pair.fully_sampled, pair.undersampled
                )
                visualization.save_image_comparison(
                    [np.asarray(fully), np.asarray(under), np.asarray(recon)],
                    ["fully sampled", "undersampled", "reconstruction"],
                    f"{split}_{i}_epoch_{epoch:05d}",
                    out,
                )

    def _write_progress_log(self):
        import csv

        with open(self.run_dir / "progress_log.csv", "w", newline="") as f:
            writer = csv.DictWriter(
                f,
                fieldnames=[
                    "epoch",
                    "train_loss",
                    "val_loss",
                    "epoch_seconds",
                    "time_since_start",
                ],
            )
            writer.writeheader()
            writer.writerows(self._progress)
        # human-readable subsampled view (reference rewrites every 100
        # epochs with every-20th-epoch rows, training.py:533-547)
        rows = [r for r in self._progress if r["epoch"] % 20 == 0] or self._progress
        lines = [
            f"{'epoch':>6} {'train_loss':>12} {'val_loss':>12} {'t_total':>10}"
        ] + [
            f"{r['epoch']:>6} {r['train_loss']:>12.6f} {r['val_loss']:>12.6f} "
            f"{r['time_since_start']:>10.1f}"
            for r in rows
        ]
        (self.run_dir / "progress_log.txt").write_text("\n".join(lines) + "\n")
