"""Feature/target dataset with a resumable on-disk cache.

Parity: `navsim/planning/training/dataset.py` (Dataset, CacheOnlyDataset):
per-token directories `cache/<log>/<token>/<builder_name>.gz` holding gzip
pickles of each builder's dict; caching skips tokens whose files exist.
Returns numpy dicts; `batch_iterator` collates and feeds the sharded train
step (no torch DataLoader — host threads overlap IO with device compute).
"""

from __future__ import annotations

import gzip
import pickle
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from diffusiondrive_tpu.common.dataloader import SceneLoader
from diffusiondrive_tpu.training.abstract_feature_target_builder import (
    AbstractFeatureBuilder,
    AbstractTargetBuilder,
)


def dump_feature_target(data: Dict[str, np.ndarray], path: Path) -> None:
    with gzip.open(path, "wb", compresslevel=1) as fp:
        pickle.dump(data, fp)


def load_feature_target(path: Path) -> Dict[str, np.ndarray]:
    with gzip.open(path, "rb") as fp:
        return pickle.load(fp)


class Dataset:
    """Scene-backed dataset with optional disk cache."""

    def __init__(
        self,
        scene_loader: SceneLoader,
        feature_builders: List[AbstractFeatureBuilder],
        target_builders: List[AbstractTargetBuilder],
        cache_path: Optional[str] = None,
        force_cache_computation: bool = False,
    ):
        self._scene_loader = scene_loader
        self._feature_builders = feature_builders
        self._target_builders = target_builders
        self._cache_path = Path(cache_path) if cache_path else None
        self._force = force_cache_computation
        if self._cache_path is not None:
            self.cache_dataset()

    def __len__(self) -> int:
        return len(self._scene_loader)

    def _token_dir(self, token: str) -> Path:
        log_name = self._scene_loader.scene_frames_dicts[token][0]["log_name"]
        return self._cache_path / log_name / token

    def _cache_token(self, token: str) -> None:
        token_dir = self._token_dir(token)
        token_dir.mkdir(parents=True, exist_ok=True)
        builders = list(self._feature_builders) + list(self._target_builders)
        missing = [
            b for b in builders if self._force or not (token_dir / f"{b.get_unique_name()}.gz").exists()
        ]
        if not missing:
            return
        scene = self._scene_loader.get_scene_from_token(token)
        agent_input = scene.get_agent_input()
        for builder in missing:
            if isinstance(builder, AbstractFeatureBuilder):
                data = builder.compute_features(agent_input)
            else:
                data = builder.compute_targets(scene)
            dump_feature_target(data, token_dir / f"{builder.get_unique_name()}.gz")

    def cache_dataset(self, num_workers: int = 8) -> None:
        """Precompute (resumable) feature/target cache for all tokens."""
        assert self._cache_path is not None
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            list(pool.map(self._cache_token, self._scene_loader.tokens))

    def __getitem__(self, idx: int) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        token = self._scene_loader.tokens[idx]
        if self._cache_path is not None:
            token_dir = self._token_dir(token)
            features: Dict[str, np.ndarray] = {}
            targets: Dict[str, np.ndarray] = {}
            for b in self._feature_builders:
                features.update(load_feature_target(token_dir / f"{b.get_unique_name()}.gz"))
            for b in self._target_builders:
                targets.update(load_feature_target(token_dir / f"{b.get_unique_name()}.gz"))
            return features, targets
        scene = self._scene_loader.get_scene_from_token(token)
        agent_input = scene.get_agent_input()
        features, targets = {}, {}
        for b in self._feature_builders:
            features.update(b.compute_features(agent_input))
        for b in self._target_builders:
            targets.update(b.compute_targets(scene))
        return features, targets


class CacheOnlyDataset:
    """Trains purely from cache dirs (`dataset.py:31-132`)."""

    def __init__(
        self,
        cache_path: str,
        feature_builders: List[AbstractFeatureBuilder],
        target_builders: List[AbstractTargetBuilder],
        log_names: Optional[List[str]] = None,
    ):
        self._cache_path = Path(cache_path)
        self._feature_builders = feature_builders
        self._target_builders = target_builders
        names = [b.get_unique_name() for b in list(feature_builders) + list(target_builders)]

        self._token_dirs: List[Path] = []
        log_dirs = [
            d for d in sorted(self._cache_path.iterdir())
            if d.is_dir() and (log_names is None or d.name in log_names)
        ]
        for log_dir in log_dirs:
            for token_dir in sorted(log_dir.iterdir()):
                if all((token_dir / f"{n}.gz").exists() for n in names):
                    self._token_dirs.append(token_dir)

    def __len__(self) -> int:
        return len(self._token_dirs)

    @property
    def tokens(self) -> List[str]:
        return [d.name for d in self._token_dirs]

    def __getitem__(self, idx: int) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        token_dir = self._token_dirs[idx]
        features, targets = {}, {}
        for b in self._feature_builders:
            features.update(load_feature_target(token_dir / f"{b.get_unique_name()}.gz"))
        for b in self._target_builders:
            targets.update(load_feature_target(token_dir / f"{b.get_unique_name()}.gz"))
        return features, targets


def collate(samples: List[Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]]) -> Dict[str, np.ndarray]:
    """Stack feature+target dicts into one flat batch dict."""
    batch: Dict[str, np.ndarray] = {}
    feature_keys = samples[0][0].keys()
    target_keys = samples[0][1].keys()
    for k in feature_keys:
        batch[k] = np.stack([np.asarray(s[0][k]) for s in samples])
    for k in target_keys:
        batch[k] = np.stack([np.asarray(s[1][k]) for s in samples])
    return batch


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 8,
) -> Iterator[Dict[str, np.ndarray]]:
    """Threaded batch loader: gzip-unpickle overlaps device compute."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    num_batches = len(order) // batch_size if drop_last else -(-len(order) // batch_size)

    def load_batch(b: int) -> Dict[str, np.ndarray]:
        idxs = order[b * batch_size : (b + 1) * batch_size]
        return collate([dataset[int(i)] for i in idxs])

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        prefetch = 4
        futures = {b: pool.submit(load_batch, b) for b in range(min(prefetch, num_batches))}
        for b in range(num_batches):
            batch = futures.pop(b).result()
            nxt = b + prefetch
            if nxt < num_batches:
                futures[nxt] = pool.submit(load_batch, nxt)
            yield batch
