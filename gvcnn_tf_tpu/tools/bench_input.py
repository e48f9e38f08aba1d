"""Input-pipeline throughput benchmark (host-side, no device needed).

The flagship can be input-bound (12 JPEG decodes per shape — SURVEY.md §7
"Input-bound risk"); this tool measures what the configured loader actually
sustains so train-step throughput gaps can be attributed host vs device.

    python -m gvcnn_tf_tpu.tools.bench_input --config mn40_12view \
        --dataset_dir /data/tfr [--num_batches 50]

Prints one JSON line: batches/s, shapes/s, views/s at the config's batch
geometry.
"""

from __future__ import annotations

import argparse
import json
import time

from gvcnn_tf_tpu.configs import add_flags, config_from_flags
from gvcnn_tf_tpu.data import make_dataset


def bench_input(config, num_batches: int = 50, warmup: int = 3) -> dict:
    d = config.data
    it = make_dataset(d, train=True, seed=0)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(num_batches):
        batch = next(it, None)
        if batch is None:
            break
        n += 1
    dt = time.perf_counter() - t0
    rate = n / dt if dt > 0 else float("inf")
    return {
        "loader": d.loader,
        "transfer_dtype": d.transfer_dtype,
        "batches_per_sec": round(rate, 3),
        "shapes_per_sec": round(rate * d.batch_size, 2),
        "views_per_sec": round(rate * d.batch_size * d.num_views, 1),
        "batch_geometry": [d.batch_size, d.num_views, d.height, d.width, 3],
        "measured_batches": n,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="input pipeline throughput")
    add_flags(p)
    p.add_argument("--num_batches", type=int, default=50)
    args = p.parse_args(argv)
    print(json.dumps(bench_input(config_from_flags(args), args.num_batches)))


if __name__ == "__main__":
    main()
