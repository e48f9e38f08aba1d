"""Collective audit: parsing units (fast) + a real 8-device GSPMD compile
of the production train step (slow) asserting the DP communication
contract — only all-reduce, gradient-sized, mostly coalesced."""

import pytest


def test_collect_parses_collectives():
    from gvcnn_tf_tpu.tools.analyze_collectives import collect

    hlo = """\
ENTRY %main {
  %ar.1 = f32[100]{0} all-reduce(%x), replica_groups={}, to_apply=%sum
  %big = (f32[7,7,3,64]{3,2,1,0}, f32[64]{0}) all-reduce(%a, %b), to_apply=%sum
  %ag = f32[800]{0} all-gather(%y), dimensions={0}
  %c = f32[100]{0} add(%ar.1, %ar.1)
}
"""
    ops = collect(hlo)
    kinds = sorted({o["op"] for o in ops})
    assert kinds == ["all-gather", "all-reduce"]
    by_name = {o["name"]: o for o in ops}
    assert by_name["ar.1"]["bytes"] == 400
    assert by_name["big"]["bytes"] == (7 * 7 * 3 * 64 + 64) * 4
    assert by_name["ag"]["bytes"] == 3200


def test_collect_async_start_forms():
    """Async `-start` halves: single-buffer counted once, VARIADIC summed
    over its distinct operand buffers (ADVICE r4 — max() undercounted),
    all-gather-start counted at its full-size output."""
    from gvcnn_tf_tpu.tools.analyze_collectives import collect

    hlo = """\
ENTRY %main {
  %ar1 = (f32[100]{0}, f32[100]{0}, u32[], u32[]) all-reduce-start(%x), to_apply=%sum
  %ar1d = f32[100]{0} all-reduce-done(%ar1)
  %arv = (f32[10]{0}, f32[20]{0}, f32[10]{0}, f32[20]{0}) all-reduce-start(%a, %b), to_apply=%sum
  %arvd = (f32[10]{0}, f32[20]{0}) all-reduce-done(%arv)
  %ags = (f32[100]{0}, f32[800]{0}) all-gather-start(%y), dimensions={0}
  %agd = f32[800]{0} all-gather-done(%ags)
}
"""
    by_name = {o["name"]: o for o in collect(hlo)}
    assert set(by_name) == {"ar1", "arv", "ags"}  # -done halves skipped
    assert by_name["ar1"]["bytes"] == 400
    assert by_name["arv"]["bytes"] == (10 + 20) * 4
    assert by_name["ags"]["bytes"] == 3200


def test_scaling_model_monotone():
    from gvcnn_tf_tpu.tools.analyze_collectives import scaling_model

    rows = scaling_model(23_000_000, 75.8)
    assert [r["devices"] for r in rows] == [2, 4, 8, 16, 64, 256]
    # comm grows with n (ring factor), efficiency falls, stays high
    assert rows[0]["allreduce_ms"] < rows[-1]["allreduce_ms"]
    assert rows[-1]["dp_efficiency"] < rows[0]["dp_efficiency"]
    assert rows[-1]["dp_efficiency"] > 0.95
    # full overlap -> no exposed comm
    full = scaling_model(23_000_000, 75.8, overlap_frac=1.0)
    assert all(r["dp_efficiency"] == 1.0 for r in full)


@pytest.mark.slow
def test_sharded_step_is_pure_dp():
    """The 8-device production train step's GSPMD program must contain
    ONLY all-reduce collectives (pure DP: params replicated, batch
    sharded), with total bytes ~= the fp32 grad tree and >=80% of the
    traffic coalesced into the largest fused all-reduce."""
    import jax

    from gvcnn_tf_tpu.tools.analyze_collectives import (collect,
                                                        sharded_step_hlo)

    ops = collect(sharded_step_hlo(8))
    kinds = {o["op"] for o in ops}
    assert kinds == {"all-reduce"}, kinds
    total = sum(o["bytes"] for o in ops)
    # grad tree is the param tree in fp32: ~22-23 MB for GVCNN-inception_v1
    # (plus O(KB) metric/BN scalars)
    assert 15e6 < total < 40e6, total
    top = max(o["bytes"] for o in ops)
    assert top / total > 0.8, (top, total)


@pytest.mark.slow
def test_flagship_shape_partition_compiles_pure_dp():
    """VERDICT r3 Next #6: the FLAGSHIP operating point (B=32 shapes x 12
    views, 224x224) must 8-way partition with the SAME communication
    contract as the tiny-shape audit — all-reduce only, one coalesced
    gradient all-reduce carrying >=80% of the bytes.  Guards against
    shape-dependent GSPMD surprises (padding, uneven sharding) that the
    byte-equivalent tiny compile cannot see."""
    from gvcnn_tf_tpu.tools.analyze_collectives import (collect,
                                                        sharded_step_hlo)

    ops = collect(sharded_step_hlo(8, full_shapes=True))
    kinds = {o["op"] for o in ops}
    assert kinds == {"all-reduce"}, kinds
    total = sum(o["bytes"] for o in ops)
    assert 15e6 < total < 40e6, total
    top = max(o["bytes"] for o in ops)
    assert top / total > 0.8, (top, total)
    # Pin the op COUNT too (VERDICT r4 Weak #3): the expected program is
    # one coalesced gradient all-reduce + ~61 small global-batch BN-stat /
    # metric reductions.  A count blow-up (e.g. the gradient all-reduce
    # de-coalescing into per-param ops) changes pod-scale launch latency
    # even when the byte dominance check still passes.
    assert len(ops) <= 80, (len(ops), [o["name"] for o in ops[:5]])
    small = [o for o in ops if o is not max(ops, key=lambda o: o["bytes"])]
    assert all(o["bytes"] < 1e6 for o in small), (
        "a second large all-reduce appeared — gradient coalescing broke",
        sorted((o["bytes"] for o in small), reverse=True)[:5])
