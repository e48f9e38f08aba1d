"""Retrieval tool tests: AP math against hand cases + end-to-end extract."""

import dataclasses

import numpy as np

from gvcnn_tf_tpu.tools.retrieval import extract_descriptors, retrieval_metrics


def test_map_perfect_clusters():
    # Two tight clusters -> every query ranks its own class first -> mAP 1.
    rng = np.random.RandomState(0)
    a = rng.randn(1, 8) + 10
    b = rng.randn(1, 8) - 10
    descs = np.concatenate([a + 0.01 * rng.randn(5, 8),
                            b + 0.01 * rng.randn(5, 8)])
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    labels = np.array([0] * 5 + [1] * 5)
    m = retrieval_metrics(descs, labels)
    assert m["mAP"] == 1.0
    assert m["precision@1"] == 1.0


def test_ap_hand_case():
    # 3 items, labels [0, 0, 1]; query 0 has 1 relevant (item 1).
    # Build descriptors so query 0 ranks item 2 first, item 1 second:
    # AP for query 0 = precision@2 = 1/2.
    descs = np.array([
        [1.0, 0.0],
        [0.0, 1.0],      # same class as 0, but orthogonal
        [0.9, 0.1],      # different class, very similar to 0
    ])
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    labels = np.array([0, 0, 1])
    m = retrieval_metrics(descs, labels, ks=(1,))
    # query0: ranked [2, 1] -> AP = 1/2
    # query1: ranked [2, 0] (sim(1,2)=0.11 > sim(1,0)=0) -> AP = 1/2
    # query2: relevant none -> skipped
    assert abs(m["mAP"] - 0.5) < 1e-9
    assert m["precision@1"] == 0.0


def test_extract_descriptors_end_to_end():
    from gvcnn_tf_tpu.configs import get_config

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32, num_views=2,
            batch_size=4, synthetic_num_shapes=8,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
    )
    descs, labels = extract_descriptors(cfg, checkpoint_dir=None)
    assert descs.shape == (8, 1024)
    assert labels.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0, rtol=1e-5)
    m = retrieval_metrics(descs, labels)
    assert 0.0 <= m["mAP"] <= 1.0
