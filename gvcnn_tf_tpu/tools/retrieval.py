"""3D shape retrieval on GVCNN shape descriptors (paper capability).

The GVCNN paper (CVPR 2018) evaluates retrieval with the fused shape
descriptor (ModelNet40 mAP ~85.7%); the reference repo implements
classification only (SURVEY.md section 6).  This tool completes the paper
capability: extract L2-normalized shape descriptors with the trained model,
rank the gallery by cosine similarity, report mAP and precision@k.

Descriptor extraction runs batched under jit on device; ranking math is
NumPy on host (gallery sizes here are thousands, not millions).

CLI:
    python -m gvcnn_tf_tpu.tools.retrieval --config mn40_12view \
        --checkpoint_dir /ckpts/run1 --dataset_dir /data/tfr
"""

from __future__ import annotations

import argparse
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from gvcnn_tf_tpu.configs import GVCNNConfig, add_flags, config_from_flags
from gvcnn_tf_tpu.data import make_dataset
from gvcnn_tf_tpu.models.gvcnn import init_model


def extract_descriptors(
    config: GVCNNConfig,
    checkpoint_dir: Optional[str] = None,
    *,
    dataset_iter: Optional[Iterator] = None,
    state=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (descriptors (N, C) L2-normalized fp32, labels (N,))."""
    model, init_vars = init_model(config, jax.random.key(config.train.seed))
    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    elif checkpoint_dir:
        from gvcnn_tf_tpu.checkpoint import Checkpointer

        target = {
            "params": init_vars["params"],
            "batch_stats": init_vars.get("batch_stats", {}),
        }
        variables = Checkpointer(checkpoint_dir).restore_partial(target)
    else:
        variables = init_vars

    import jax.numpy as jnp

    @jax.jit
    def embed(variables, views):
        from gvcnn_tf_tpu.utils import normalize_views

        _, ep = model.apply(variables, normalize_views(views), train=False)
        d = ep["shape_descriptor"].astype(jnp.float32)
        return d / jnp.sqrt(1e-12 + (d * d).sum(-1, keepdims=True))

    if dataset_iter is None:
        dataset_iter = make_dataset(
            config.data, train=False, seed=config.train.seed, num_epochs=1
        )
    descs, labels = [], []
    for batch in dataset_iter:
        descs.append(np.asarray(embed(variables, batch["views"])))
        labels.append(np.asarray(batch["label"]))
    return np.concatenate(descs), np.concatenate(labels)


def retrieval_metrics(
    descriptors: np.ndarray,
    labels: np.ndarray,
    *,
    ks: Tuple[int, ...] = (1, 5, 10),
) -> dict:
    """Leave-one-out retrieval over the gallery: each item queries the rest.

    mAP with relevant = same class; AP is the mean of precision@hit over a
    query's relevant items (standard information-retrieval AP).
    """
    n = len(labels)
    sims = descriptors @ descriptors.T
    np.fill_diagonal(sims, -np.inf)             # exclude self-match
    order = np.argsort(-sims, axis=1)[:, : n - 1]
    rel = labels[order] == labels[:, None]      # (n, n-1) relevance

    aps = []
    prec_at = {k: [] for k in ks}
    for i in range(n):
        r = rel[i]
        n_rel = int(r.sum())
        if n_rel == 0:
            continue
        hits = np.flatnonzero(r)
        precisions = (np.arange(1, n_rel + 1)) / (hits + 1)
        aps.append(precisions.mean())
        for k in ks:
            prec_at[k].append(r[:k].mean())
    out = {"mAP": float(np.mean(aps)) if aps else 0.0, "num_queries": n}
    for k in ks:
        out[f"precision@{k}"] = (
            float(np.mean(prec_at[k])) if prec_at[k] else 0.0
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="GVCNN shape retrieval eval")
    add_flags(p)
    p.add_argument("--checkpoint_dir", default=None)
    args = p.parse_args(argv)
    config = config_from_flags(args)
    descs, labels = extract_descriptors(
        config, checkpoint_dir=args.checkpoint_dir or config.train.train_logdir
    )
    metrics = retrieval_metrics(descs, labels)
    print(metrics)


if __name__ == "__main__":
    main()
