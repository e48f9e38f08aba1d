"""Data-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4 "multi-node without a cluster", build component B1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.parallel import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from gvcnn_tf_tpu.train import create_train_state, make_train_step


def test_mesh_creation():
    mesh = create_mesh(8)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


def test_shard_batch_places_shards():
    mesh = create_mesh(8)
    batch = {
        "views": np.zeros((16, 4, 8, 8, 3), np.float32),
        "label": np.zeros((16,), np.int32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["views"].sharding.spec == P("data")
    # Each device holds 16/8 = 2 shapes.
    shard = sharded["views"].addressable_shards[0]
    assert shard.data.shape == (2, 4, 8, 8, 3)


def test_dp_train_step_matches_single_device():
    """The sharded step must compute the same update as single-device
    (global-batch mean semantics under GSPMD)."""
    cfg = get_config("mn10_8view").replace(
        data=dataclasses.replace(
            get_config("mn10_8view").data,
            height=32, width=32, batch_size=8, num_views=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    model, tx, state0 = create_train_state(cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    d = cfg.data
    batch = {
        "views": rng.rand(8, 2, 32, 32, 3).astype(np.float32),
        "label": rng.randint(0, d.num_classes, 8).astype(np.int32),
    }
    key = jax.random.key(1)

    # Single device.
    step1 = jax.jit(make_train_step(model, tx, cfg))
    s1, m1 = step1(state0, jax.tree.map(jnp.asarray, batch), key)

    # 8-device DP.
    mesh = create_mesh(8)
    repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
    step8 = jax.jit(
        make_train_step(model, tx, cfg),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    state0_r = jax.device_put(state0, repl)
    batch_r = shard_batch(batch, mesh)
    key_r = jax.device_put(key, repl)
    s8, m8 = step8(state0_r, batch_r, key_r)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    # Spot-check a parameter subtree for identical updates.
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-4,
                               atol=1e-6)


def test_graft_dryrun_multichip():
    """The driver's dryrun entry must work on the virtual mesh."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_multihost_helpers_single_process():
    """Pod scaffolding degenerates correctly on one process (SURVEY.md §5:
    DCN out of scope; this validates the code path the pod would use)."""
    from gvcnn_tf_tpu.parallel.multihost import (
        initialize_distributed,
        make_global_batch,
    )

    # No COORDINATOR_ADDRESS -> single-process no-op.
    assert initialize_distributed() is False

    mesh = create_mesh(8)
    local = {
        "views": np.arange(8 * 2 * 4, dtype=np.float32).reshape(8, 2, 4),
        "label": np.arange(8, dtype=np.int32),
    }
    gb = make_global_batch(local, mesh)
    assert gb["views"].shape == (8, 2, 4)          # 1 process = global
    assert gb["views"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(gb["label"]), local["label"])


def test_dp_train_step_with_gradient_accumulation():
    """accumulate_steps=2 under 8-device DP: the (k, B/k) reshape of the
    data-sharded batch compiles and executes (B/k divisible per device),
    producing finite loss and updated params."""
    base = get_config("mn10_8view")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, height=32, width=32, batch_size=16, num_views=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        train=dataclasses.replace(base.train, accumulate_steps=2),
    )
    model, tx, state0 = create_train_state(cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    d = cfg.data
    batch = {
        "views": rng.rand(16, 2, 32, 32, 3).astype(np.float32),
        "label": rng.randint(0, d.num_classes, 16).astype(np.int32),
    }
    mesh = create_mesh(8)
    repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
    step8 = jax.jit(
        make_train_step(model, tx, cfg),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    gbatch = {
        "views": jax.device_put(batch["views"], dsh),
        "label": jax.device_put(batch["label"], dsh),
    }
    s8, m8 = step8(
        jax.device_put(state0, repl), gbatch,
        jax.device_put(jax.random.key(1), repl),
    )
    assert np.isfinite(float(m8["loss"]))
    before = jax.tree.leaves(state0.params)[0]
    after = jax.tree.leaves(s8.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_local_bn_matches_single_device_on_tiled_batch():
    """bn_sync=local semantic check: per-SHARD normalization.  Tile one
    shard's data across all 8 devices — every tower then computes the
    same statistics, so the local-BN sharded step must equal the
    single-device step on ONE tile exactly (dropout off so per-shard rng
    streams don't enter)."""
    base = get_config("mn10_8view")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, height=32, width=32, batch_size=2, num_views=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        dropout_keep_prob=1.0,
        bn_sync="local",
    )
    model, tx, state0 = create_train_state(cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    tile_views = rng.rand(2, 2, 32, 32, 3).astype(np.float32)
    tile_label = rng.randint(0, cfg.data.num_classes, 2).astype(np.int32)
    key = jax.random.key(1)

    # Single device on ONE tile (global == local at 1 device).
    step1 = jax.jit(make_train_step(model, tx, cfg))
    s1, m1 = step1(
        state0,
        {"views": jnp.asarray(tile_views), "label": jnp.asarray(tile_label)},
        key,
    )

    # 8-device local-BN on the tiled batch (each shard = the same tile).
    cfg8 = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=16))
    mesh = create_mesh(8)
    repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
    step8 = jax.jit(
        make_train_step(model, tx, cfg8, mesh=mesh),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    batch8 = {
        "views": np.tile(tile_views, (8, 1, 1, 1, 1)),
        "label": np.tile(tile_label, 8),
    }
    s8, m8 = step8(
        jax.device_put(state0, repl), shard_batch(batch8, mesh),
        jax.device_put(key, repl),
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # BN running stats: pmean of identical per-shard EMAs == the tile EMA.
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_local_bn_step_differs_from_global_on_heterogeneous_batch():
    """With different data per shard, local-BN normalization (per-tower
    statistics) is a genuinely different function from global-BN — the
    test documents that bn_sync is a semantic knob, not a layout one."""
    base = get_config("mn10_8view")
    kw = dict(
        data=dataclasses.replace(
            base.data, height=32, width=32, batch_size=16, num_views=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        dropout_keep_prob=1.0,
    )
    rng = np.random.RandomState(1)
    batch = {
        "views": rng.rand(16, 2, 32, 32, 3).astype(np.float32),
        "label": rng.randint(0, base.data.num_classes, 16).astype(np.int32),
    }
    mesh = create_mesh(8)
    repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
    key = jax.random.key(1)
    outs = {}
    for mode in ("global", "local"):
        cfg = base.replace(bn_sync=mode, **kw)
        model, tx, state0 = create_train_state(cfg, jax.random.key(0))
        step = jax.jit(
            make_train_step(model, tx, cfg, mesh=mesh),
            in_shardings=(repl, dsh, repl),
            out_shardings=(repl, repl),
        )
        s, m = step(
            jax.device_put(state0, repl), shard_batch(batch, mesh),
            jax.device_put(key, repl),
        )
        assert np.isfinite(float(m["loss"])), (mode, m)
        outs[mode] = float(m["loss"])
    assert outs["global"] != outs["local"], outs


def test_local_bn_collective_profile():
    """Compile-time audit of the local-BN step: still pure all-reduce,
    same gradient bytes, and the op count must not EXCEED global mode
    (the BN-stat syncs move off the forward critical path; XLA's
    all-reduce combiner can then coalesce them with the gradient
    all-reduce)."""
    from gvcnn_tf_tpu.tools.analyze_collectives import (collect,
                                                       sharded_step_hlo)

    ops_g = collect(sharded_step_hlo(8, bn_sync="global"))
    ops_l = collect(sharded_step_hlo(8, bn_sync="local"))
    assert {o["op"] for o in ops_l} == {"all-reduce"}, ops_l
    top_g = max(o["bytes"] for o in ops_g)
    top_l = max(o["bytes"] for o in ops_l)
    # The coalesced gradient all-reduce is the same fp32 tree either way.
    assert top_l >= top_g, (top_l, top_g)
    assert len(ops_l) <= len(ops_g), (len(ops_l), len(ops_g))


def test_local_bn_with_gradient_accumulation():
    """bn_sync=local composes with accumulate_steps: the pvary'd params
    flow through the lax.scan microbatch loop and the post-scan pmean
    still yields replicated outputs and finite loss."""
    base = get_config("mn10_8view")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, height=32, width=32, batch_size=16, num_views=2,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        bn_sync="local",
        train=dataclasses.replace(base.train, accumulate_steps=2),
    )
    model, tx, state0 = create_train_state(cfg, jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = {
        "views": rng.rand(16, 2, 32, 32, 3).astype(np.float32),
        "label": rng.randint(0, cfg.data.num_classes, 16).astype(np.int32),
    }
    mesh = create_mesh(8)
    repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
    step = jax.jit(
        make_train_step(model, tx, cfg, mesh=mesh),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    s, m = step(
        jax.device_put(state0, repl), shard_batch(batch, mesh),
        jax.device_put(jax.random.key(1), repl),
    )
    assert np.isfinite(float(m["loss"]))
    before = jax.tree.leaves(state0.params)[0]
    after = jax.tree.leaves(s.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
