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


def test_initialize_distributed_multihost_branch(monkeypatch):
    """Fake-env coverage of the multihost path: `jax.distributed.initialize`
    must fire exactly when a coordinator is configured (flag or env), with
    the caller's topology forwarded verbatim."""
    import jax

    from diffusiondrive_tpu.parallel.distributed import initialize_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))

    # single-host: no env, no args -> no initialize call
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    pid, n = initialize_distributed()
    assert calls == [] and (pid, n) == (0, 1)

    # explicit coordinator args -> forwarded verbatim
    initialize_distributed("10.0.0.1:8476", num_processes=4, process_id=2)
    assert calls == [dict(coordinator_address="10.0.0.1:8476",
                          num_processes=4, process_id=2)]

    # env-driven (pod launcher sets the coordinator) -> auto-init
    calls.clear()
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.2:8476")
    initialize_distributed()
    assert len(calls) == 1 and calls[0]["coordinator_address"] is None


def test_host_shard_info_env_and_default(monkeypatch):
    from diffusiondrive_tpu.parallel.distributed import host_shard_info

    monkeypatch.setenv("HOST_ID", "3")
    monkeypatch.setenv("NUM_HOSTS", "8")
    assert host_shard_info() == (3, 8)
    monkeypatch.delenv("HOST_ID")
    monkeypatch.delenv("NUM_HOSTS")
    assert host_shard_info() == (0, 1)
