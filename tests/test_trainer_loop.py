"""Trainer checkpointing + (optionally) the full fit loop.

The full fit test compiles the sharded backward on XLA:CPU (~10 min), so it
only runs with DD_RUN_SLOW=1; the multichip dryrun exercises the same step
path every round. The checkpoint roundtrip is cheap (init compile only) and
always runs.
"""

import os

import numpy as np
import jax
import pytest

from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.training.train import OptimizerConfig
from diffusiondrive_tpu.training.trainer import Trainer

from test_train import make_batch, tiny_config

RUN_SLOW = os.environ.get("DD_RUN_SLOW") == "1"


def test_checkpoint_save_restore(tmp_path):
    config = tiny_config()
    model = DiffusionDriveModel(config)
    batch = make_batch(16)

    trainer = Trainer(model, config, OptimizerConfig(), output_dir=str(tmp_path / "ckpt"))
    trainer.setup(batch)
    trainer.save_checkpoint(0)

    ckpts = sorted((tmp_path / "ckpt").iterdir())
    assert len(ckpts) == 1

    trainer2 = Trainer(model, config, OptimizerConfig())
    trainer2.setup(batch)
    # perturb, then restore must bring params back
    trainer2.state = trainer2.state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, trainer2.state.params)
    )
    trainer2.restore_checkpoint(str(ckpts[0]))
    p1 = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0])
    np.testing.assert_allclose(p1, p2)


@pytest.mark.slow
@pytest.mark.skipif(not RUN_SLOW, reason="set DD_RUN_SLOW=1 (XLA:CPU backward compile ~10 min)")
def test_trainer_fit_and_resume(tmp_path):
    config = tiny_config()
    model = DiffusionDriveModel(config)
    trainer = Trainer(model, config, OptimizerConfig(), output_dir=str(tmp_path / "ckpt"))

    batches = [make_batch(16, seed=s) for s in range(2)]
    state = trainer.fit(lambda epoch: iter(batches), num_epochs=1)
    assert int(state.step) == 2

    ckpts = sorted((tmp_path / "ckpt").iterdir())
    assert len(ckpts) == 1

    trainer2 = Trainer(model, config, OptimizerConfig())
    trainer2.setup(batches[0])
    trainer2.restore_checkpoint(str(ckpts[0]))
    assert int(trainer2.state.step) == 2
    p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
