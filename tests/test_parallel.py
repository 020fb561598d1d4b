"""Worker pool + host-sharding tests."""

import numpy as np

from diffusiondrive_tpu.evaluate.runner import shard_tokens_for_host
from diffusiondrive_tpu.parallel.worker_pool import Sequential, ThreadPool, build_worker, worker_map


def test_worker_map_flattens():
    def per_log(item):
        return [f"{item}_{i}" for i in range(2)]

    for worker in (Sequential(), ThreadPool(max_workers=4)):
        out = worker_map(worker, per_log, ["a", "b", "c"])
        assert out == ["a_0", "a_1", "b_0", "b_1", "c_0", "c_1"]


def test_build_worker():
    assert isinstance(build_worker("sequential"), Sequential)
    assert isinstance(build_worker("thread_pool", max_workers=2), ThreadPool)


def test_token_sharding_partition():
    tokens = [f"tok_{i:03d}" for i in range(103)]
    shards = [shard_tokens_for_host(tokens, h, 4) for h in range(4)]
    merged = sorted(t for shard in shards for t in shard)
    assert merged == sorted(tokens)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
