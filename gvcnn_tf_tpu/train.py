"""Training: functional train step under jit + SPMD sharding, and the
`train(config)` driver (reference train.py equivalent, SURVEY.md C1/3.1).

Reference flow: graph build -> Session loop with feed_dict, host driving
every step.  Here: a pure `train_step(state, batch, rng)` jitted once with
donated state; batches stream through a device-side prefetch ring; on a
multi-device mesh the batch is sharded on the `data` axis and XLA inserts
the gradient all-reduce (psum over ICI) from the sharding annotations —
there is no hand-written communication (SURVEY.md B1).

Loss matches slim semantics: softmax cross-entropy + weight decay 4e-5 as
an explicit L2 term over conv/dense kernels (slim's regularization losses,
reference train.py [U]).
"""

from __future__ import annotations

import argparse
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gvcnn_tf_tpu import metrics as metrics_lib
from gvcnn_tf_tpu.checkpoint import Checkpointer, warm_start
from gvcnn_tf_tpu.configs import (GVCNNConfig, add_flags, config_from_flags,
                                  resolve_transfer_dtype)
from gvcnn_tf_tpu.data import (
    make_dataset,
    prefetch_to_device,
    prefetch_to_device_async,
)
from gvcnn_tf_tpu.utils import normalize_views
from gvcnn_tf_tpu.models.gvcnn import build_model
from gvcnn_tf_tpu.parallel import (
    create_mesh,
    data_sharding,
    replicated_sharding,
)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Optimizer / schedule (reference: momentum + exponential LR decay [MED]).
# ---------------------------------------------------------------------------

def make_lr_schedule(tc) -> optax.Schedule:
    decay = optax.exponential_decay(
        init_value=tc.learning_rate,
        transition_steps=tc.lr_decay_steps,
        decay_rate=tc.lr_decay_rate,
        staircase=True,                  # slim's tf.train.exponential_decay
    )
    if tc.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, tc.learning_rate, tc.warmup_steps)
        return optax.join_schedules([warmup, decay], [tc.warmup_steps])
    return decay


def make_optimizer(tc) -> optax.GradientTransformation:
    sched = make_lr_schedule(tc)
    if tc.optimizer == "momentum":
        opt = optax.sgd(sched, momentum=tc.momentum, nesterov=False)
    elif tc.optimizer == "sgd":
        opt = optax.sgd(sched)
    elif tc.optimizer == "adam":
        opt = optax.adam(sched)
    else:
        raise ValueError(f"unknown optimizer {tc.optimizer!r}")
    if tc.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), opt)
    return opt


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """slim l2_regularizer parity: wd * sum(||kernel||^2) / 2, kernels only
    (BN scales/biases are not regularized in inception_arg_scope)."""
    if weight_decay <= 0:
        return jnp.asarray(0.0, jnp.float32)
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "kernel":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return 0.5 * weight_decay * total


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_train_step(
    model, tx: optax.GradientTransformation, config: GVCNNConfig,
    mesh=None,
) -> Callable:
    """Build the pure train step: (state, batch, rng) -> (state, metrics).

    `bn_sync="global"` (default): the returned function is plain jittable
    math; under a multi-device jit GSPMD computes BN statistics over the
    GLOBAL batch (exact single-device semantics at any DP degree).

    `bn_sync="local"` with a multi-device `mesh`: the step is wrapped in
    `jax.shard_map` over the mesh's `data` axis — BN normalizes over the
    LOCAL per-device batch (reference DP semantics: slim towers each
    normalize their own shard) and the cross-replica combine (gradients,
    metrics, BN EMA update) is ONE explicit pmean after the backward pass.
    The EMA is linear, so pmean-ing the updated running stats equals
    updating with the cross-replica batch statistics: state stays
    replicated and checkpoints are layout-identical to global mode.
    """

    tc = config.train
    from gvcnn_tf_tpu.parallel.mesh import DATA_AXIS

    local_bn = (
        getattr(config, "bn_sync", "global") == "local"
        and mesh is not None
        and mesh.size > 1
    )

    def loss_for(params, batch_stats, views, labels, dropout_rng):
        (logits, _), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            views,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        logits = logits.astype(jnp.float32)
        if tc.label_smoothing > 0:
            n = logits.shape[-1]
            onehot = jax.nn.one_hot(labels, n)
            soft = onehot * (1 - tc.label_smoothing) + tc.label_smoothing / n
            ce = optax.softmax_cross_entropy(logits, soft).mean()
        else:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
        loss = ce + l2_regularization(params, tc.weight_decay)
        return loss, (logits, updates["batch_stats"])

    def _pvary(tree):
        # Mark replicated params as device-VARYING before differentiating:
        # under shard_map's replication typing, the cotangent of an
        # UNVARYING input is implicitly psum'd across the mesh (transpose
        # of broadcast), which would hand back shard-grad SUMS and double
        # the combine below into n*mean.  pcast/pvary keeps the grad
        # per-shard so the one explicit pmean is the whole story.
        if hasattr(jax.lax, "pcast"):
            cast = lambda x: jax.lax.pcast(x, DATA_AXIS, to="varying")
        else:  # pragma: no cover - older jax
            cast = lambda x: jax.lax.pvary(x, DATA_AXIS)
        return jax.tree.map(cast, tree)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        params_in = state.params
        if local_bn:
            params_in = _pvary(params_in)
            # Distinct dropout streams per shard (global mode gets this for
            # free: one mask over the global batch).
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(DATA_AXIS))
        views_src, labels_src = batch["views"], batch["label"]
        if "idx" in batch:
            # HBM-resident split (data/device_resident.py): the batch
            # carries the FULL device-staged dataset plus this step's
            # index vector; gathering here — inside the jitted step —
            # keeps the loop at one dispatch and 128 B of H2D per step.
            views_src = jnp.take(views_src, batch["idx"], axis=0)
            labels_src = jnp.take(labels_src, batch["idx"], axis=0)
        # Raw-uint8 transfers normalize on device (utils/images.py);
        # float transfers pass through untouched.
        views, labels = normalize_views(views_src), labels_src
        if (config.data.loader == "decoded" and config.data.augment
                and config.data.device_flip and views.ndim == 5):
            # Device-side random horizontal flip for the decode-once
            # loader (configs.py device_flip): the host streams verbatim
            # memmap batches at memcpy speed and the flip is a lax
            # reverse + select XLA fuses into the input processing —
            # measured 2.5x host-loader speedup at flagship shapes vs
            # flipping on the host.  p=0.5 per (shape, view), matching
            # the reference's per-view flip.
            flip_rng = jax.random.fold_in(step_rng, 0x46_4C_50)  # "FLP"
            flip = jax.random.bernoulli(
                flip_rng, 0.5, views.shape[:2])
            views = jnp.where(flip[:, :, None, None, None],
                              views[:, :, :, ::-1, :], views)

        k = max(tc.accumulate_steps, 1)
        if k == 1:
            (loss, (logits, new_bn)), grads = jax.value_and_grad(
                loss_for, has_aux=True
            )(params_in, state.batch_stats, views, labels, step_rng)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
        else:
            # Gradient accumulation: lax.scan over k microbatches holds ONE
            # microbatch's activations at a time (the memory knob for large
            # effective batches), params fixed across the scan so the mean
            # of microbatch grads equals the full-batch grad. BatchNorm
            # statistics chain sequentially through the microbatches
            # (standard accumulation semantics: normalization is per
            # microbatch, not per effective batch).
            b = views.shape[0]
            if b % k:
                raise ValueError(
                    f"batch_size {b} not divisible by accumulate_steps {k}"
                )
            mviews = views.reshape((k, b // k) + views.shape[1:])
            mlabels = labels.reshape(k, b // k)
            midx = jnp.arange(k)

            def micro(bn, xs):
                v, l, i = xs
                (loss_i, (logits_i, bn_new)), grads_i = jax.value_and_grad(
                    loss_for, has_aux=True
                )(params_in, bn, v, l, jax.random.fold_in(step_rng, i))
                acc_i = jnp.mean(
                    (jnp.argmax(logits_i, -1) == l).astype(jnp.float32)
                )
                return bn_new, (grads_i, loss_i, acc_i)

            bn0 = state.batch_stats
            if local_bn:
                # Scan carries must be type-stable: the carry OUT derives
                # from device-varying views, so the carry IN must be cast
                # varying too.
                bn0 = _pvary(bn0)
            new_bn, (gstack, losses, accs) = jax.lax.scan(
                micro, bn0, (mviews, mlabels, midx)
            )
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), gstack)
            loss = jnp.mean(losses)
            acc = jnp.mean(accs)

        if local_bn:
            # The ONE cross-replica combine of the step: gradient mean,
            # metric means, and the BN running-stat EMA update (linear in
            # the batch statistics, so pmean(EMA_local) == EMA(pmean of
            # batch stats) given replicated inputs).  Sits after the
            # backward pass with no forward consumers — XLA's all-reduce
            # combiner coalesces these with the gradient all-reduce.
            grads, loss, acc, new_bn = jax.lax.pmean(
                (grads, loss, acc, new_bn), DATA_AXIS)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt_state,
        )
        mets = {
            "loss": loss,
            "accuracy": acc,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, mets

    if local_bn:
        from jax.sharding import PartitionSpec as P

        return jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
        )
    return train_step


def create_train_state(
    config: GVCNNConfig,
    rng: jax.Array,
    input_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[Any, optax.GradientTransformation, TrainState]:
    """Init model + optimizer -> (model, tx, TrainState)."""
    model = build_model(config)
    d = config.data
    if input_shape is None:
        if config.multi_view:
            input_shape = (d.batch_size, d.num_views, d.height, d.width, 3)
        else:
            input_shape = (d.batch_size, d.height, d.width, 3)
    # jit the init: eager per-op dispatch is slow, and on a remote device it
    # is catastrophic (one RPC per op).
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng}, jnp.zeros(input_shape, jnp.float32)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config.train)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return model, tx, state


def _saveable(state):
    """State as passed to Orbax: host copy single-process (safe against the
    next step's donation of the device buffers during an async save);
    multi-process saves the global jax.Arrays directly (Orbax copies to
    host before returning, and device_get cannot read non-addressable
    shards)."""
    return state if jax.process_count() > 1 else jax.device_get(state)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def train(
    config: GVCNNConfig,
    *,
    num_steps: Optional[int] = None,
    dataset_iter=None,
    writer: Optional[metrics_lib.MetricWriter] = None,
    profile_steps: Optional[Tuple[int, int]] = None,
):
    """Full training loop (reference train.py main() equivalent).

    Returns (final TrainState, last metrics dict).  `dataset_iter` can
    inject a custom host-batch iterator (tests).
    """
    from gvcnn_tf_tpu.parallel import initialize_distributed
    from gvcnn_tf_tpu.utils import setup_compilation_cache

    # Pod bootstrap (no-op single-process; COORDINATOR_ADDRESS env enables).
    initialize_distributed()
    setup_compilation_cache()
    tc = config.train
    num_steps = num_steps if num_steps is not None else tc.num_steps
    # Epoch accounting (reference trains in epochs over the split,
    # SURVEY.md §3.1): resolve steps_per_epoch, let epochs override steps.
    steps_per_epoch = tc.steps_per_epoch
    if steps_per_epoch <= 0:
        from gvcnn_tf_tpu.data import dataset_size

        # A TFRecord count needs a full scan — only pay it when the run is
        # actually epoch-denominated; otherwise use free counts for logging.
        n = dataset_size(config.data, train=True, cheap_only=tc.epochs <= 0)
        if n:
            steps_per_epoch = max(n // config.data.batch_size, 1)
    if tc.epochs > 0:
        if steps_per_epoch <= 0:
            raise ValueError(
                "epochs-denominated training needs steps_per_epoch (dataset "
                "size unknown); set TrainConfig.steps_per_epoch"
            )
        num_steps = max(int(round(tc.epochs * steps_per_epoch)), 1)
    if writer is None:
        # Metrics are global under GSPMD — only process 0 emits them.
        writer = (
            metrics_lib.MetricWriter(tc.train_logdir)
            if jax.process_index() == 0
            else metrics_lib.NullWriter()
        )

    mesh = create_mesh(config.num_devices)
    repl = replicated_sharding(mesh)
    dsh = data_sharding(mesh)

    rng = jax.random.key(tc.seed)
    init_rng, loop_rng = jax.random.split(rng)
    model, tx, state = create_train_state(config, init_rng)

    # ImageNet warm-start (reference checkpoint_path/exclude_scopes flow).
    # Restore ONLY the non-excluded scopes: the pretrained head (e.g. a
    # 1000-class Logits) may have different shapes than ours, and excluded
    # scopes must not even be read — slim's assign_from_checkpoint_fn
    # semantics (SURVEY.md C8).
    if tc.checkpoint_path:
        pre = Checkpointer(tc.checkpoint_path)

        def _included(tree):
            return {
                scope: sub
                for scope, sub in tree.items()
                if not any(
                    scope.startswith(e) for e in tc.checkpoint_exclude_scopes
                )
            }

        # Restore BN moving statistics alongside params: slim's
        # assign_from_checkpoint_fn copies moving_mean/variance too, and with
        # the default decay 0.9997 a warm-started run without them evals
        # near chance for thousands of steps (ADVICE r1).
        target = {"params": _included(state.params)}
        bn_target = _included(state.batch_stats)
        if bn_target:
            target["batch_stats"] = bn_target
        try:
            restored = pre.restore_partial(target)
        except Exception:
            if "batch_stats" not in target:
                raise
            # Params-only checkpoint (no BN stats saved): fall back.
            restored = pre.restore_partial({"params": target["params"]})

        def _concrete(tree):
            # Orbax partial restore hands back requested-but-absent subtrees
            # as abstract ShapeDtypeStructs instead of raising; only copy
            # subtrees that actually came off disk.
            leaves = jax.tree.leaves(tree)
            return bool(leaves) and not any(
                isinstance(l, jax.ShapeDtypeStruct) for l in leaves
            )

        state = state.replace(
            params=warm_start(
                state.params, restored["params"], tc.checkpoint_exclude_scopes
            )
        )
        restored_bn = restored.get("batch_stats")
        if restored_bn and _concrete(restored_bn):
            state = state.replace(
                batch_stats=warm_start(
                    state.batch_stats,
                    restored_bn,
                    tc.checkpoint_exclude_scopes,
                )
            )
        metrics_lib.log(f"warm-started from {tc.checkpoint_path}")

    ckpt = Checkpointer(tc.train_logdir) if tc.checkpoint_every > 0 else None
    if ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        metrics_lib.log(f"resumed from step {int(state.step)}")

    if jax.process_count() > 1:
        # Multi-controller: assemble global replicated arrays from the
        # (identical, same-seed) per-process state — device_put alone cannot
        # address the other hosts' devices.
        import numpy as _np

        state = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                repl, _np.asarray(x)
            ),
            state,
        )
    else:
        state = jax.device_put(state, repl)

    from gvcnn_tf_tpu.utils import tpu_compiler_options

    train_step = jax.jit(
        make_train_step(model, tx, config, mesh=mesh),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=0,
        compiler_options=tpu_compiler_options(),
    )

    if dataset_iter is None:
        n_proc = jax.process_count()
        dcfg = config.data
        n_dev = config.num_devices or jax.local_device_count()
        if dcfg.device_resident != "off" and (
                n_dev > 1 or n_proc > 1 or config.bn_sync == "local"):
            # The full-split + index batch bypasses the data-axis batch
            # sharding (and shard_map's P('data') in_specs would split
            # every leaf over the mesh), so HBM-resident input is a
            # single-device transport: stream everywhere else.
            import dataclasses as _dc

            dcfg = _dc.replace(dcfg, device_resident="off")
        if n_proc > 1:
            # Multi-host input: each process streams a disjoint shard of the
            # split at the LOCAL batch size; the prefetch layer assembles
            # the global array (make_array_from_process_local_data).
            if dcfg.batch_size % n_proc:
                raise ValueError(
                    f"global batch {dcfg.batch_size} not divisible by "
                    f"{n_proc} processes"
                )
            import dataclasses as _dc

            dcfg = _dc.replace(dcfg, batch_size=dcfg.batch_size // n_proc)
        dataset_iter = make_dataset(
            dcfg, train=True, seed=tc.seed,
            shard_index=jax.process_index(), num_shards=n_proc,
        )
    # Background-producer prefetch overlaps host batch prep with the device
    # step (SURVEY.md B4) — but only with a spare host core; on a single-CPU
    # host the producer thread starves dispatch (measured 7x slower).
    import os as _os

    use_async = config.data.async_prefetch == "on" or (
        config.data.async_prefetch == "auto" and (_os.cpu_count() or 1) > 1
    )
    prefetch_fn = prefetch_to_device_async if use_async else prefetch_to_device
    it = prefetch_fn(
        dataset_iter,
        size=config.data.prefetch_to_device,
        sharding=dsh,
        transfer_dtype=resolve_transfer_dtype(config),
    )

    if jax.process_count() > 1:
        # Pre-compile the step AOT and rendezvous before the first
        # execution: Gloo's context init (CPU pods) and collective setup
        # run against a ~30 s key-value timeout, and per-host compile-time
        # skew at the first collective can exceed it (observed: one host
        # 3 min into an XLA compile while its peer timed out waiting).
        # The coordination-service barrier has its own long timeout, so
        # hosts meet AFTER the slow part.  Train batches are fixed-shape,
        # so the AOT executable serves the whole run.
        d = config.data
        # The wire dtype of the views batch: raw-uint8 transfers arrive as
        # uint8 (resolve_transfer_dtype returns None for them because the
        # prefetch layer must not cast).
        vdt = jnp.dtype(
            jnp.uint8 if d.transfer_dtype == "uint8"
            else (resolve_transfer_dtype(config) or jnp.float32))
        batch_sds = {
            "views": jax.ShapeDtypeStruct(
                (d.batch_size, d.num_views, d.height, d.width, 3), vdt,
                sharding=dsh),
            "label": jax.ShapeDtypeStruct(
                (d.batch_size,), jnp.int32, sharding=dsh),
        }
        train_step = train_step.lower(state, batch_sds, loop_rng).compile()
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is not None:
                _dist.global_state.client.wait_at_barrier(
                    "gvcnn_train_precompiled", timeout_in_ms=600_000)
        except Exception as e:  # barrier is best-effort hardening
            metrics_lib.log(f"precompile barrier unavailable: {e!r}")

    # Preemption-safe shutdown (SURVEY.md §5 failure-detection row):
    # spot/preemptible TPU VMs deliver SIGTERM with a grace window.  The
    # handler only sets a flag; the loop finishes the in-flight step, saves
    # a checkpoint, and returns cleanly — auto-resume picks it up on the
    # next launch.  Installed only in the main thread (signal module
    # restriction); prior handlers are chained.
    import signal as _signal
    import threading as _threading

    preempted = _threading.Event()
    prev_handlers = {}
    if _threading.current_thread() is _threading.main_thread():
        def _on_term(signum, frame):
            preempted.set()
            metrics_lib.log(
                f"signal {signum} received: checkpoint-and-exit after the "
                f"current step")

        for sig in (_signal.SIGTERM,):  # SIGINT keeps KeyboardInterrupt
            try:
                prev_handlers[sig] = _signal.signal(sig, _on_term)
            except (ValueError, OSError):  # non-main thread / exotic host
                pass

    timer = metrics_lib.StepTimer()
    mets = {}
    want_schedule_trace = False
    start = int(state.step)
    # try/finally: restore the signal handlers even when the loop or
    # epilogue raises (dataset error, OOM, compile failure) — otherwise a
    # process that called train() as a library keeps a dead handler that
    # silently swallows a later SIGTERM (ADVICE r3).
    try:
        for step in range(start, num_steps):
            if preempted.is_set():
                # The epilogue below force-saves any unsaved step and closes
                # the checkpointer; breaking here is the whole shutdown.
                metrics_lib.log(
                    f"stopping at step {int(state.step)} for preemption; "
                    f"auto-resume will continue from the saved checkpoint")
                break
            # Optional profiler capture window (SURVEY.md section 5 tracing plan:
            # jax.profiler -> Perfetto/TensorBoard trace under train_logdir).
            # Skipped under the remote `axon` PJRT plugin, whose profiler hook
            # hangs start_trace (verified empirically in this container).
            if profile_steps is not None and step == profile_steps[0]:
                import os as _os

                if "axon" in _os.environ.get("JAX_PLATFORMS", ""):
                    # The remote axon PJRT plugin hangs start_trace (verified);
                    # fall back to the compiler-schedule trace — per-instruction
                    # estimated_cycles timeline from the step's scheduled HLO
                    # (tools/profile_step.py), written after the next step.
                    metrics_lib.log(
                        "jax.profiler unavailable under the remote axon "
                        "platform; writing the compiler-schedule trace instead"
                    )
                    profile_steps = None
                    want_schedule_trace = True
                else:
                    jax.profiler.start_trace(tc.train_logdir)
            batch = next(it, None)
            if batch is None:
                metrics_lib.log("dataset exhausted")
                break
            if step == start:
                # One-time sanity gate: an out-of-range label makes the
                # integer cross-entropy silently NaN hundreds of steps
                # later at best; fail loudly on the first batch instead
                # (costs one device_get, once).
                lmin, lmax = (int(v) for v in jax.device_get(
                    jnp.stack([jnp.min(batch["label"]),
                               jnp.max(batch["label"])])))
                if lmin < 0 or lmax >= config.data.num_classes:
                    raise ValueError(
                        f"labels [{lmin}, {lmax}] out of range for "
                        f"num_classes={config.data.num_classes} — dataset/"
                        f"label-space mismatch (check --num_classes vs the "
                        f"data; negative labels one-hot to all-zeros)")
            state, mets = train_step(state, batch, loop_rng)
            if want_schedule_trace:
                want_schedule_trace = False
                import json as _json
                import os as _os

                from gvcnn_tf_tpu.tools import profile_step as _ps

                # train_step is either the jit wrapper or (multi-process) the
                # AOT-compiled executable; both can produce the compiled text.
                txt = (
                    train_step.as_text()
                    if not hasattr(train_step, "lower")
                    else train_step.lower(state, batch, loop_rng)
                    .compile().as_text()
                )
                path = _os.path.join(tc.train_logdir, "schedule_trace.json")
                with open(path, "w") as f:
                    _json.dump(_ps.chrome_trace(_ps.parse_entry(txt)), f)
                metrics_lib.log(f"schedule trace written to {path}")
            if profile_steps is not None and step + 1 == profile_steps[1]:
                jax.block_until_ready(mets)
                jax.profiler.stop_trace()
                metrics_lib.log(f"profiler trace written to {tc.train_logdir}")
            timer.tick()
            if (step + 1) % tc.log_every == 0 or step + 1 == num_steps:
                jax.block_until_ready(mets)
                vals = {k: float(v) for k, v in mets.items()}
                vals["steps_per_sec"] = timer.rate()
                vals["shapes_per_sec"] = timer.rate() * config.data.batch_size
                vals["lr"] = float(make_lr_schedule(tc)(step))
                if steps_per_epoch > 0:
                    vals["epoch"] = round((step + 1) / steps_per_epoch, 3)
                try:
                    # HBM observability on real TPU VMs; memory_stats() is None
                    # under this container's tunneled plugin and on XLA:CPU.
                    stats = jax.local_devices()[0].memory_stats()
                    if stats and "bytes_in_use" in stats:
                        vals["hbm_used_mb"] = round(
                            stats["bytes_in_use"] / 1e6, 1)
                except Exception:
                    pass
                writer.scalars(step + 1, vals)
                timer.reset()
            if ckpt is not None and (step + 1) % tc.checkpoint_every == 0:
                ckpt.save(step + 1, _saveable(state))
            # Periodic in-training validation (reference workflow runs eval.py
            # as a separate process; --eval_every folds that loop in).  Multi-
            # process runs use the shard-local path in eval.py: every process
            # scores its own split shard and the counts are psum'd, so the
            # logged val_accuracy is the global number (VERDICT r3 Next #5).
            if tc.eval_every > 0 and (step + 1) % tc.eval_every == 0:
                from gvcnn_tf_tpu.eval import evaluate as _evaluate

                res = _evaluate(config, state=state)
                writer.scalars(
                    step + 1,
                    {"val_accuracy": res["accuracy"], "val_count": res["count"]},
                )
                metrics_lib.log(
                    f"step {step + 1} val accuracy {res['accuracy']:.4f} "
                    f"({res['correct']}/{res['count']})"
                )
                timer.reset()  # don't bill eval wall time to steps/sec
        if ckpt is not None:
            if ckpt.latest_step() != int(state.step):
                ckpt.save(int(state.step), _saveable(state), force=True)
            ckpt.close()
        writer.flush()
        return state, mets
    finally:
        for sig, prev in prev_handlers.items():
            try:
                _signal.signal(sig, prev)
            except (ValueError, OSError):
                pass


def main(argv=None):
    p = argparse.ArgumentParser(description="gvcnn_tf_tpu trainer")
    add_flags(p)
    args = p.parse_args(argv)
    config = config_from_flags(args)
    metrics_lib.log(f"training config {config.name}: {config}")
    train(config)


if __name__ == "__main__":
    main()
