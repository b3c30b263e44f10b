"""The shared trainer: two-phase fine-tune driven by a TrainRecipe.

One implementation replaces the reference's three near-duplicate trainer
modules (reference: trainers/efficientnet.py:336-569, fastervit.py:303-536,
efficientformer_v2.py:260-461); their behavioral deltas arrive as data via
``ModelSpec.recipe`` (registry.py). Regime parity (SURVEY.md §2.3d):

- WARMUP: head-only AdamW(3e-4, wd 5e-2) for ``warmup_epochs``
- FINE-TUNE: AdamW(lr, wd) over the recipe's unfreeze set with
  CosineAnnealingLR(T_max=epochs-1) stepped per epoch
- label-smoothed CE (0.1), improvement threshold +1e-4 on val accuracy,
  latest.ckpt every epoch + best.ckpt & bare weights on improvement,
  optional early stopping, auto-resume from latest.ckpt

TPU deltas (documented): bf16 autocast instead of CUDA AMP (no GradScaler —
bf16 needs no loss scaling); gradient accumulation folds micro-batches into
one device batch (same effective batch; BN sees the effective batch, which
under pjit is also how cross-replica stats behave); augmentation runs fused
on device (data/augment.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepfakedetection_tpu.data.augment import augment_batch, normalize_batch
from deepfakedetection_tpu.data.folder import require_num_classes, scan_image_folder
from deepfakedetection_tpu.data.pipeline import make_eval_loader, make_train_loader
from deepfakedetection_tpu.data.transforms import build_eval_plan, build_train_plan
from deepfakedetection_tpu.parallel.mesh import make_mesh, shard_batch
from deepfakedetection_tpu.registry import ModelSpec
from deepfakedetection_tpu.runtime import checkpoint as ckpt
from deepfakedetection_tpu.runtime import preempt
from deepfakedetection_tpu.runtime.logging import console, progress
from deepfakedetection_tpu.runtime.paths import RunPaths
from deepfakedetection_tpu.runtime.seeding import apply_seed, root_key
from deepfakedetection_tpu.train.optim import (
    epoch_cosine_schedule,
    head_predicate,
    make_phase_optimizer,
    unfreeze_predicate,
)
from deepfakedetection_tpu.train.steps import (
    TrainState,
    init_model_variables,
    make_eval_step,
    make_train_step,
)


@dataclass
class TrainJob:
    """Typed replacement for the reference's ~20-env-var trainer contract
    (reference: orchestrator.py:183-283)."""

    model_name: str
    spec: ModelSpec
    run_paths: RunPaths
    data_root: Path
    train_split: str = "train"
    val_split: str = "val"
    num_classes: int = 2
    img_size: int = 224
    batch_size: int = 64
    epochs: int = 10
    num_workers: int = 4
    lr: float | None = None
    weight_decay: float | None = None
    accum_steps: int | None = None
    warmup_epochs: int | None = None
    early_stop_patience: int | None = None
    resume_auto: bool = False
    seed: int | None = None
    train_toggles: dict[str, Any] = field(default_factory=dict)
    eval_toggles: dict[str, Any] = field(default_factory=dict)
    mesh_data: int = -1
    mesh_model: int = 1
    compute_dtype: Any = jnp.bfloat16
    # optional jax.profiler trace output (SURVEY.md §5.1 — the reference has
    # only wall-clock img/s; this adds real device profiling)
    profile_dir: str | None = None
    # rematerialize activations in backward (jax.checkpoint) for HBM headroom
    remat: bool = False
    # precise-BN recalibration over K train batches before each validation
    # (0 = reference behavior; short fine-tunes benefit — momentum-0.99
    # running stats lag far behind the trained weights otherwise)
    bn_recalc_batches: int = 0
    # cache decoded host canvases in RAM: epochs ≥2 skip JPEG decode entirely
    # (the host decode is deterministic; all augmentation randomness is on
    # device). ~canvas²·3 bytes per image. TPU extension, default off.
    cache_decoded: bool = False
    # global-norm gradient clipping (TPU extension, None = off = reference
    # behavior; the reference trains unclipped)
    grad_clip_norm: float | None = None
    # Mixup/CutMix batch mixing for the fine-tune phase (TPU extension,
    # 0 = off = reference behavior); see train/mixup.py for semantics
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    # class-weighted CE for imbalanced data (TPU extension, None = off =
    # reference behavior): "auto" derives sklearn-"balanced" weights
    # N/(C·count_c) from the train split, or give per-class floats in
    # alphabetical class order (the label order — data/folder.py)
    class_weights: str | tuple[float, ...] | None = None
    # exponential moving average of the fine-tune weights (TPU extension,
    # default off = reference behavior). When set (e.g. 0.999), validation,
    # best-model selection, and the exported ``.pth`` use the averaged
    # weights; ``latest.ckpt`` carries the EMA tree for resume.
    ema_decay: float | None = None
    # write per-epoch checkpoints from a background worker so serialization
    # and file IO overlap the next epoch's compute (TPU extension, default
    # off = reference's synchronous torch.save semantics). State is
    # snapshotted on device first — donation-safe (runtime/checkpoint.py
    # AsyncSaver); failures surface at the end-of-training drain.
    async_checkpoint: bool = False
    # start the fine-tune from pretrained backbone weights (a converted
    # torch ``.pth`` or a native msgpack export), strict=False: the
    # freshly built head keeps its init where shapes differ — the TPU
    # analogue of the reference's pretrained start + head swap
    # (efficientnet.py:405-410, fastervit.py:371, efficientformer_v2.py:327).
    # None = random init (the only choice in zero-egress environments).
    init_weights: Path | str | None = None
    # override the recipe's fine-tune unfreeze policy: "all" or substrings
    # (UNFREEZE_KEYS semantics, ref efficientformer_v2.py:66-74 — hardcoded
    # per trainer there, configurable here). ("head",) + init_weights is a
    # linear probe. None = the recipe's policy (reference behavior).
    unfreeze: str | tuple[str, ...] | None = None
    # extra builder kwargs (e.g. fastervit head_config: "tpu"|"official")
    model_kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class TrainResult:
    best_val_acc: float
    best_epoch: int
    epochs_run: int
    final_train_loss: float
    # SIGTERM arrived mid-run: a resumable mid-epoch checkpoint was saved
    # and the orchestrator should stop dispatching further models
    interrupted: bool = False


def resolve_init_weights(job: TrainJob) -> Path | None:
    """Validate ``training.init_weights`` up front (hard-fail beats training
    from random init when the user asked for a pretrained start)."""
    if not job.init_weights:
        return None
    wpath = Path(job.init_weights)
    if not wpath.exists():
        raise SystemExit(
            f"training.init_weights not found: {wpath}\n"
            "Point it at a torch .pth checkpoint (converted on load) or a "
            "native msgpack export, or remove the key to train from random init."
        )
    return wpath


def adopts_official_head(job: TrainJob, wpath: Path) -> bool:
    """A genuine torch init checkpoint implies the wheel's FasterViT
    configuration — same rule as the eval loader (evaluate/job.py
    load_model_for_eval); an explicit head_config always wins."""
    return (
        job.spec.family == "fastervit"
        and "head_config" not in job.model_kwargs
        and ckpt.is_torch_checkpoint(wpath)
    )


def apply_init_weights(job: TrainJob, wpath: Path, params, batch_stats):
    """Load pretrained backbone weights into a fresh init (strict=False).

    TPU analogue of the reference trainers' pretrained start: each trainer
    builds an ImageNet-pretrained backbone and swaps in a fresh head
    (efficientnet.py:405-410, fastervit.py:371, efficientformer_v2.py:327).
    Here the mismatched-shape leaves — the swapped classifier head — keep
    their fresh init, so a 1000-class ImageNet export initializes a 2-class
    fine-tune exactly like the reference's from_pretrained + head swap.
    """
    target = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    restored, unmatched = ckpt.load_weights(
        wpath, target, model_family=job.spec.family
    )
    n_total = len(jax.tree.leaves(target))
    console.print(f"  init weights ← {wpath} ({n_total} target tensors)")
    if unmatched:
        # msgpack path: target leaves kept at init; torch path: unmapped
        # source keys — either way it is the strict=False head-swap residue
        console.print(
            f"[yellow]  {len(unmatched)} unmatched "
            f"(head swap / strict=False): {unmatched[:4]}…[/]"
        )
    return restored.get("params", params), restored.get("batch_stats", batch_stats)


def resolve_class_weights(job: TrainJob, train_ds) -> np.ndarray | None:
    """[C] CE class weights from ``training.class_weights`` (TPU extension).

    ``"auto"`` derives sklearn-"balanced" weights ``N/(C·count_c)`` from the
    train split's label counts; an explicit list is validated against the
    class count. Weight order is label order = alphabetical class order
    (data/folder.py scan_image_folder).
    """
    if job.class_weights is None:
        return None
    if isinstance(job.class_weights, str):
        if job.class_weights.lower() != "auto":
            raise SystemExit(
                f"training.class_weights must be 'auto' or a list of "
                f"{job.num_classes} positive floats, got {job.class_weights!r}"
            )
        counts = np.bincount(
            [label for _, label in train_ds.samples], minlength=job.num_classes
        ).astype(np.float64)
        # require_num_classes already enforced every class is present; the
        # max() only guards pathological direct-call usage
        w = counts.sum() / (job.num_classes * np.maximum(counts, 1.0))
    else:
        w = np.asarray(job.class_weights, np.float64)
        if w.shape != (job.num_classes,) or not (w > 0).all():
            raise SystemExit(
                f"training.class_weights needs {job.num_classes} positive "
                f"floats (got {job.class_weights!r})"
            )
    return w.astype(np.float32)


def _counters_tree(epoch: int, best_val_acc: float, best_epoch: int, warmup_done: bool):
    return {
        "epoch": np.asarray(epoch, np.int32),
        "best_val_acc": np.asarray(best_val_acc, np.float32),
        "best_epoch": np.asarray(best_epoch, np.int32),
        "warmup_done": np.asarray(int(warmup_done), np.int32),
    }


def evaluate(
    eval_step, params, batch_stats, loader, plan, *, mesh, compute_dtype
) -> tuple[float, float]:
    """(accuracy, img/s) over a loader. Softmax on device, masking on host.

    The last ``DFD_EVAL_COMBINE_BATCHES`` (default 64) device results stay
    un-fetched so dispatch runs ahead of host-side decode (async pipeline);
    older batches are reduced into running counts as the loop advances, so
    host/device state is bounded on arbitrarily long splits (VERDICT r3
    weak #6)."""
    import os

    from deepfakedetection_tpu.parallel.multihost import local_rows

    combine_every = int(os.environ.get("DFD_EVAL_COMBINE_BATCHES", "64"))
    pending: list[tuple] = []
    correct = 0
    total = 0

    def drain(n):
        nonlocal correct, total
        for probs, valid, lab in pending[:n]:
            # pods: fetch only this process's rows (aligned with its local
            # labels/mask); single-process this is a plain np.asarray
            preds = np.asarray(local_rows(probs)).argmax(axis=-1)
            correct += int((preds[valid] == lab[valid]).sum())
            total += int(valid.sum())
        del pending[:n]

    speed = 0.0
    with progress("eval", total=len(loader.dataset)) as advance:
        for batch in loader:
            # numpy goes straight to shard_batch: one correctly-placed transfer
            # (jnp.asarray would commit to device 0 first, then reshard)
            images = shard_batch(mesh, batch.images)
            x = normalize_batch(images, plan, out_dtype=compute_dtype)
            pending.append((eval_step(params, batch_stats, x), batch.mask, batch.labels))
            if combine_every and len(pending) > combine_every:
                drain(len(pending) - combine_every)
            speed = advance(int(batch.mask.sum()))
    drain(len(pending))
    # multi-host: every process saw a disjoint shard — combine the counts
    from deepfakedetection_tpu.parallel.multihost import allgather_examples

    combined = allgather_examples(np.asarray([[correct, total]], np.int64))
    correct, total = int(combined[:, 0].sum()), int(combined[:, 1].sum())
    return (correct / max(total, 1)), speed


def run_training(job: TrainJob) -> TrainResult:
    from deepfakedetection_tpu.runtime.logging import tee_output

    # trainer console tees into the run's log file, mirroring the reference's
    # LOG_PATH tee (train_env.py:49-95, orchestrator.py:301-303)
    # SIGTERM during the run → graceful mid-epoch checkpoint + exact resume
    # (runtime/preempt.py; single-process only — multihost keeps the
    # per-epoch collective latest.ckpt as its recovery unit)
    from deepfakedetection_tpu.runtime import watchdog

    # relay backends can drop a device-fetch wakeup mid-run (a permanent
    # futex park with the value already computed); the heartbeat bounds
    # that hang at one interval (runtime/watchdog.py)
    watchdog.enable_for_relay()
    with tee_output(job.run_paths.logs / "train.log"), preempt.trap():
        if job.profile_dir:
            import jax.profiler

            jax.profiler.start_trace(job.profile_dir)
            try:
                return _run_training(job)
            finally:
                jax.profiler.stop_trace()
        return _run_training(job)


def _run_training(job: TrainJob) -> TrainResult:
    recipe = job.spec.recipe
    apply_seed(job.seed)
    key = root_key(job.seed)

    # ----- plans & data ---------------------------------------------------
    train_plan = build_train_plan(
        job.img_size,
        job.train_toggles,
        recipe_defaults=recipe.default_train_toggles,
        jitter_params=recipe.color_jitter,
    )
    # trainer-val geometry: over-resize then crop (efficientnet.py:195-203),
    # distinct from the orchestrator eval path's exact shorter-side resize
    eval_plan = build_eval_plan(job.img_size, job.eval_toggles, trainer_val=True)

    train_ds = scan_image_folder(job.data_root / job.train_split)
    val_ds = scan_image_folder(job.data_root / job.val_split)
    require_num_classes(
        train_ds, job.num_classes, split=job.train_split, dataset_root=train_ds.root
    )

    class_w = resolve_class_weights(job, train_ds)
    if class_w is not None:
        console.print(
            "  class-weighted CE: "
            + " ".join(f"{w:.3f}" for w in class_w)
        )

    mesh = make_mesh(job.mesh_data, job.mesh_model)
    n_data = mesh.shape["data"]
    # batch sizes must divide over the data axis; round up (pad+mask absorbs)
    job.batch_size = -(-job.batch_size // n_data) * n_data

    # ----- model ----------------------------------------------------------
    init_wpath = resolve_init_weights(job)
    if init_wpath is not None and adopts_official_head(job, init_wpath):
        job.model_kwargs["head_config"] = "official"
        console.print(
            "  torch init checkpoint detected → faster_vit head_config='official'"
        )
    model = job.spec.builder(job.num_classes, dtype=job.compute_dtype, **job.model_kwargs)
    params, batch_stats = init_model_variables(
        model, jax.random.key(0 if job.seed is None else job.seed),
        (1, job.img_size, job.img_size, 3),
    )
    if init_wpath is not None:
        if job.resume_auto and ckpt.has_latest(job.run_paths.checkpoints):
            console.print("  resume checkpoint present — skipping init_weights")
        else:
            params, batch_stats = apply_init_weights(
                job, init_wpath, params, batch_stats
            )
    console.print(
        f"[bold]→ training {job.model_name}[/] | params="
        f"{sum(x.size for x in jax.tree.leaves(params)) / 1e6:.2f}M | "
        f"mesh data={n_data} model={mesh.shape['model']}"
    )

    # ----- phase configuration -------------------------------------------
    warmup_epochs = job.warmup_epochs if job.warmup_epochs is not None else recipe.warmup_epochs
    ft_lr = job.lr if job.lr is not None else recipe.finetune_lr
    ft_wd = job.weight_decay if job.weight_decay is not None else recipe.finetune_weight_decay
    accum = recipe.accum_steps
    if recipe.accum_steps_overridable and job.accum_steps is not None:
        accum = max(1, job.accum_steps)
    micro = recipe.finetune_micro_batch or job.batch_size
    # fold micro-batch accumulation into one device batch (same effective
    # batch as the reference's micro-batch×accum loop, efficientnet.py:477-485)
    ft_batch = micro * accum
    # clamp for small datasets (otherwise drop_last eats every batch) and
    # keep the batch divisible by the data-mesh axis
    if ft_batch > len(train_ds):
        ft_batch = max((len(train_ds) // micro) * micro, micro)
    ft_batch = max((ft_batch // n_data) * n_data, n_data)
    patience = (
        job.early_stop_patience
        if job.early_stop_patience is not None
        else recipe.early_stop_patience
    )

    epochs = job.epochs
    steps_per_epoch = max(len(train_ds) // max(ft_batch, 1), 1)

    def batch_to_device(batch, aug_key, plan):
        # numpy goes straight to shard_batch: one correctly-placed transfer
        # (jnp.asarray would commit to device 0 first, then reshard)
        images = shard_batch(mesh, batch.images)
        x = augment_batch(images, aug_key, plan, out_dtype=job.compute_dtype)
        labels = shard_batch(mesh, batch.labels)
        mask = shard_batch(mesh, batch.mask)
        return x, labels, mask

    def device_prefetch(loader, epoch_key, plan, skip=0):
        """Stage the next batch's H2D transfer + augmentation while the
        current train step runs (async dispatch overlaps them).

        ``skip`` drops the first N batches BEFORE the H2D transfer (exact
        mid-epoch resume, runtime/preempt.py); the augmentation key still
        folds the true batch index so skipped and replayed runs agree."""
        staged = None
        for i, batch in enumerate(loader):
            if i < skip:
                continue
            nxt = (batch_to_device(batch, jax.random.fold_in(epoch_key, i), plan),
                   batch.num_valid)
            if staged is not None:
                yield staged
            staged = nxt
        if staged is not None:
            yield staged

    def train_one_epoch(
        train_step, state, loader, epoch_key, desc, on_step=None, skip_batches=0
    ):
        losses = []
        speed = 0.0
        interrupted = False
        batches_done = skip_batches
        # distinct PRNG domain for the step's dropout/drop-path keys: the
        # step folds in state.step, which coincides with the augmentation's
        # batch index during the first epoch of a phase — without this
        # fold_in the dropout masks would be bit-correlated with the
        # crop/flip draws (split() subkeys are shared prefixes)
        step_key = jax.random.fold_in(epoch_key, 0x5EED)
        with progress(desc, total=len(loader.dataset)) as advance:
            for (x, labels, mask), num_valid in device_prefetch(
                loader, epoch_key, train_plan, skip=skip_batches
            ):
                state, metrics = train_step(state, x, labels, mask, step_key)
                if on_step is not None:
                    on_step(state)
                losses.append(metrics["loss"])
                speed = advance(num_valid)
                batches_done += 1
                if preempt.requested():
                    interrupted = True
                    break
        # NB: a resumed partial epoch averages only the replayed batches
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        console.print(f"  {desc}: loss={mean_loss:.4f} | {speed:.1f} img/s")
        return state, mean_loss, speed, batches_done, interrupted

    eval_step = make_eval_step(model)
    eval_loader = make_eval_loader(
        val_ds, eval_plan, batch_size=job.batch_size, num_workers=job.num_workers,
        cache_decoded=job.cache_decoded,
    )

    best_val_acc = 0.0
    best_epoch = -1
    start_epoch = 0
    warmup_done = False
    final_loss = 0.0

    # ----- fine-tune optimizer (also the resume target) -------------------
    unfreeze_policy = job.unfreeze if job.unfreeze is not None else recipe.unfreeze
    ft_tx, n_train, n_total = make_phase_optimizer(
        params,
        lr=epoch_cosine_schedule(ft_lr, epochs, steps_per_epoch),
        weight_decay=ft_wd,
        trainable=unfreeze_predicate(unfreeze_policy),
        grad_clip_norm=job.grad_clip_norm,
    )
    if n_train == 0:
        raise SystemExit(
            f"training.unfreeze {unfreeze_policy!r} matches no parameter of "
            f"{job.model_name} — the fine-tune would train nothing. Use 'all' "
            "or substrings of actual parameter names (see the trainable list "
            "in the train log)."
        )
    ft_state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=ft_tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )

    # ----- auto-resume (train_env.py:182-185,288-306) ----------------------
    latest = ckpt.latest_path(job.run_paths.checkpoints)
    ema_params = None  # populated when job.ema_decay is set
    if job.resume_auto and latest.exists():
        target = {
            "state": ft_state,
            "counters": _counters_tree(0, 0.0, -1, False),
        }
        if job.ema_decay:
            try:
                restored = ckpt.restore_tree(
                    latest, dict(target, ema=ft_state.params)
                )
                ema_params = restored["ema"]
            except Exception:
                # checkpoint written before EMA was enabled: resume the
                # state and seed the average from the resumed weights
                restored = ckpt.restore_tree(latest, target)
        else:
            restored = ckpt.restore_tree(latest, target)
        from deepfakedetection_tpu.parallel.mesh import replicated

        ft_state = jax.device_put(restored["state"], replicated(mesh))
        if ema_params is not None:
            ema_params = jax.device_put(ema_params, replicated(mesh))
        c = restored["counters"]
        start_epoch = int(c["epoch"]) + 1
        best_val_acc = float(c["best_val_acc"])
        best_epoch = int(c["best_epoch"])
        warmup_done = bool(int(c["warmup_done"]))
        console.print(
            f"  resumed from {latest} at epoch {start_epoch} "
            f"(best={best_val_acc:.4f} @ {best_epoch})"
        )

    # ----- mid-epoch resume (runtime/preempt.py sidecar) --------------------
    # the sidecar records how many batches of start_epoch the interrupted run
    # completed; replaying the epoch while skipping exactly those batches is
    # bit-identical to an uninterrupted run (loader order + aug keys are
    # deterministic per epoch). Ignored unless it matches this run's resume
    # epoch and batch geometry (a changed config voids exactness anyway).
    resume_skip = 0
    prog = preempt.read_progress(job.run_paths.checkpoints) if job.resume_auto else None
    if (
        prog is not None
        and prog["epoch"] == start_epoch
        and prog["batch_size"] == ft_batch
        and prog["batches_done"] > 0
    ):
        resume_skip = prog["batches_done"]
        console.print(
            f"  mid-epoch resume: skipping {resume_skip} completed batches "
            f"of epoch {start_epoch + 1}"
        )

    # ----- WARMUP phase ----------------------------------------------------
    if not warmup_done and warmup_epochs > 0 and start_epoch == 0:
        wu_tx, wu_n, _ = make_phase_optimizer(
            ft_state.params,
            lr=recipe.warmup_lr,
            weight_decay=recipe.warmup_weight_decay,
            trainable=head_predicate(recipe.head_param_substrings),
            grad_clip_norm=job.grad_clip_norm,
        )
        console.print(
            f"  warmup: {warmup_epochs} epoch(s), head-only "
            f"({wu_n}/{n_total} param tensors) @ lr={recipe.warmup_lr}"
        )
        wu_state = TrainState(
            params=ft_state.params,
            batch_stats=ft_state.batch_stats,
            opt_state=wu_tx.init(ft_state.params),
            step=jnp.asarray(0, jnp.int32),
        )
        wu_step = make_train_step(
            model, wu_tx, label_smoothing=recipe.label_smoothing, remat=job.remat,
            class_weights=class_w,
        )
        wu_loader = make_train_loader(
            train_ds, train_plan, batch_size=job.batch_size, seed=job.seed,
            num_workers=job.num_workers, cache_decoded=job.cache_decoded,
        )
        for we in range(warmup_epochs):
            wu_loader.set_epoch(we)
            wu_key = jax.random.fold_in(key, 10_000 + we)
            wu_state, _, _, _, wu_interrupted = train_one_epoch(
                wu_step, wu_state, wu_loader, wu_key, f"warmup {we + 1}/{warmup_epochs}"
            )
            if wu_interrupted:
                # warmup state is not checkpointed (train_env.py semantics:
                # resume restarts warmup) — exit cleanly, rerun redoes warmup
                console.print(
                    "  preempted during warmup — nothing saved; rerun restarts warmup"
                )
                return TrainResult(0.0, -1, 0, 0.0, interrupted=True)
        acc, _ = evaluate(
            eval_step, wu_state.params, wu_state.batch_stats, eval_loader,
            eval_plan, mesh=mesh, compute_dtype=job.compute_dtype,
        )
        console.print(f"  warmup val acc={acc:.4f}")
        ft_state = ft_state.replace(
            params=wu_state.params, batch_stats=wu_state.batch_stats
        )
        warmup_done = True

    # ----- FINE-TUNE phase -------------------------------------------------
    console.print(
        f"  fine-tune: epochs={epochs} batch={ft_batch} "
        f"(micro {micro} × accum {accum}) lr={ft_lr} "
        f"trainable={n_train}/{n_total} tensors"
    )
    mixup_spec = None
    if job.mixup_alpha > 0.0 or job.cutmix_alpha > 0.0:
        from deepfakedetection_tpu.train.mixup import MixupSpec

        mixup_spec = MixupSpec(
            mixup_alpha=job.mixup_alpha, cutmix_alpha=job.cutmix_alpha
        )
        console.print(
            f"  mixup: alpha={job.mixup_alpha} cutmix={job.cutmix_alpha}"
        )
    ft_step = make_train_step(
        model, ft_tx, label_smoothing=recipe.label_smoothing, remat=job.remat,
        mixup=mixup_spec, class_weights=class_w,
    )
    ft_loader = make_train_loader(
        train_ds, train_plan, batch_size=ft_batch, seed=job.seed,
        num_workers=job.num_workers, cache_decoded=job.cache_decoded,
    )

    # ----- optional weight EMA (TPU extension, see TrainJob.ema_decay) ------
    on_step = None
    ema_box: dict[str, Any] = {}
    if job.ema_decay:
        from deepfakedetection_tpu.train.steps import make_ema_update

        ema_update = make_ema_update(float(job.ema_decay))
        # explicit copy: the update donates the EMA buffers, which must not
        # alias the live training params
        ema_box["ema"] = (
            ema_params
            if ema_params is not None
            else jax.tree.map(jnp.copy, ft_state.params)
        )
        console.print(f"  weight EMA: decay={job.ema_decay}")

        def on_step(state):  # noqa: F811 — deliberate rebind from None
            # state.step counts optimizer steps within the phase and resumes
            # from the checkpoint, so the decay warmup ramp is resume-safe
            ema_box["ema"] = ema_update(ema_box["ema"], state.params, state.step)

    # reconstruct the early-stop window on resume, matching the reference's
    # semantics (trainers/efficientnet.py:506): a resumed stalled run must
    # NOT get a fresh full patience window
    epochs_without_improvement = max(0, start_epoch - 1 - best_epoch)
    epoch = start_epoch - 1
    saver = ckpt.AsyncSaver() if job.async_checkpoint else None
    if saver is not None:
        console.print("  async checkpointing: epoch-end writes overlap compute")
    def recalc_stats(params, stats, epoch):
        """Precise-BN pass: running stats re-estimated for ``params``."""
        if job.bn_recalc_batches <= 0:
            return stats
        from deepfakedetection_tpu.train.steps import recalibrate_bn

        recalc_key = jax.random.fold_in(key, 30_000 + epoch)

        def batches():
            ft_loader.set_epoch(90_000 + epoch)
            for i, batch in enumerate(ft_loader):
                if i >= job.bn_recalc_batches:
                    return
                x, _, _ = batch_to_device(
                    batch, jax.random.fold_in(recalc_key, i), train_plan
                )
                yield x

        return recalibrate_bn(model, params, stats, batches(), recalc_key)

    for epoch in range(start_epoch, epochs):
        ft_loader.set_epoch(epoch)
        epoch_key = jax.random.fold_in(key, 20_000 + epoch)
        skip = resume_skip if epoch == start_epoch else 0
        if skip >= len(ft_loader):
            skip = 0  # stale/corrupt sidecar: replay the whole epoch
        ft_state, final_loss, train_speed, batches_done, interrupted = train_one_epoch(
            ft_step, ft_state, ft_loader, epoch_key,
            f"epoch {epoch + 1}/{epochs}", on_step=on_step, skip_batches=skip,
        )
        if interrupted:
            # graceful preemption: persist the mid-epoch state NOW (inline —
            # the grace window may be short; drain any in-flight async writes
            # first so latest.ckpt ends newest) plus the sidecar that lets
            # the resumed run skip the completed batches exactly
            if saver is not None:
                saver.wait()
            tree = {
                "state": ft_state,
                "counters": _counters_tree(epoch - 1, best_val_acc, best_epoch, True),
            }
            if job.ema_decay:
                tree["ema"] = ema_box["ema"]
            ckpt.save_tree(ckpt.latest_path(job.run_paths.checkpoints), tree)
            preempt.write_progress(
                job.run_paths.checkpoints,
                epoch=epoch, batches_done=batches_done, batch_size=ft_batch,
            )
            console.print(
                f"  preempted at epoch {epoch + 1} batch {batches_done}: "
                "mid-epoch checkpoint saved — rerun to resume exactly there"
            )
            if saver is not None:
                saver.close()
            return TrainResult(
                best_val_acc, best_epoch, epoch - start_epoch, final_loss,
                interrupted=True,
            )
        ft_state = ft_state.replace(
            batch_stats=recalc_stats(ft_state.params, ft_state.batch_stats, epoch)
        )
        if job.ema_decay:
            # validate/select/export on the averaged weights; when precise-BN
            # is on, the stats are re-estimated for the EMA params too
            eval_params = ema_box["ema"]
            eval_stats = (
                recalc_stats(eval_params, ft_state.batch_stats, epoch)
                if job.bn_recalc_batches > 0
                else ft_state.batch_stats
            )
        else:
            eval_params, eval_stats = ft_state.params, ft_state.batch_stats
        acc, espeed = evaluate(
            eval_step, eval_params, eval_stats, eval_loader,
            eval_plan, mesh=mesh, compute_dtype=job.compute_dtype,
        )
        improved = acc > best_val_acc + recipe.improvement_threshold
        if improved:
            best_val_acc = acc
            best_epoch = epoch
            epochs_without_improvement = 0
        else:
            epochs_without_improvement += 1
        # NB: bracketed text would be parsed (and dropped) as rich markup
        console.print(
            f"  val acc={acc:.4f}{' ema' if job.ema_decay else ''} "
            f"({espeed:.1f} img/s)"
            + (" ← best" if improved else "")
        )
        # per-epoch training record in the same append-only metrics surface
        # the eval job uses (logs/metrics.jsonl, orchestrator.py:645-647)
        from datetime import datetime

        from deepfakedetection_tpu.runtime.logging import append_metrics

        append_metrics(
            job.run_paths.logs / "metrics.jsonl",
            {
                "model": job.model_name,
                "split": "val",
                "epoch": epoch + 1,
                "train_loss": round(final_loss, 6),
                "train_img_s": round(train_speed, 1),
                "accuracy": acc,
                "best": improved,
                "timestamp": datetime.now().isoformat(),
            },
        )

        # latest.ckpt every epoch (train_env.py:254-278)
        tree = {
            "state": ft_state,
            "counters": _counters_tree(epoch, best_val_acc, best_epoch, True),
        }
        if job.ema_decay:
            tree["ema"] = ema_box["ema"]
        pth_path = job.run_paths.checkpoints / f"{job.spec.weights_key}.pth"
        if saver is not None:
            saver.submit_tree(ckpt.latest_path(job.run_paths.checkpoints), tree)
            # ordered behind the write: the sidecar must not outlive the
            # epoch-end checkpoint it refers to (stale → inexact resume)
            saver.submit_call(preempt.clear_progress, job.run_paths.checkpoints)
            if improved:
                saver.submit_tree(ckpt.best_path(job.run_paths.checkpoints), tree)
                saver.submit_export(pth_path, eval_params, eval_stats)
        else:
            ckpt.save_tree(ckpt.latest_path(job.run_paths.checkpoints), tree)
            preempt.clear_progress(job.run_paths.checkpoints)
            if improved:
                ckpt.save_tree(ckpt.best_path(job.run_paths.checkpoints), tree)
                ckpt.export_weights(pth_path, eval_params, eval_stats)
        if patience is not None and epochs_without_improvement >= patience:
            console.print(
                f"  early stop: no improvement for {patience} epochs "
                f"(efficientnet.py:559-564 semantics)"
            )
            break

    if saver is not None:
        # drain + release: training must not return before every submitted
        # write has landed (and any write failure must surface here, not be
        # lost); close() also lands the deferred multiprocess tmp→final swaps
        saver.close()
    return TrainResult(
        best_val_acc=best_val_acc,
        best_epoch=best_epoch,
        epochs_run=epoch - start_epoch + 1,
        final_train_loss=final_loss,
    )
