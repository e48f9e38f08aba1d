"""Serving export round-trip: serialize -> deserialize -> same logits."""

import dataclasses

import jax
import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.models.gvcnn import init_model
from gvcnn_tf_tpu.tools.export_model import deserialize_and_call, export_model

# Full-model compiles / train loops: minutes each on a 1-core host.
pytestmark = pytest.mark.slow



def test_export_roundtrip_matches_live_model():
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=32,
                                 num_views=2, batch_size=2),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    model, variables = init_model(cfg, jax.random.key(0),
                                  input_shape=(2, 2, 32, 32, 3))

    blob = export_model(cfg, state=None, checkpoint_dir=None, batch_size=2)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    x = np.random.RandomState(0).rand(2, 2, 32, 32, 3).astype(np.float32)
    logits_exp, preds_exp = deserialize_and_call(blob, x)

    # The export used freshly-initialized weights with the same seed path
    # (init_model with config.train.seed) — recreate and compare.
    model2, variables2 = init_model(cfg, jax.random.key(cfg.train.seed))
    import functools
    logits_live, _ = jax.jit(functools.partial(model2.apply, train=False))(
        variables2, x
    )
    np.testing.assert_allclose(np.asarray(logits_exp),
                               np.asarray(logits_live), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds_exp).sum(-1), 1.0, rtol=1e-5)
