"""End-to-end Trainer loop: fit one epoch, checkpoint, resume."""

import numpy as np
import jax
import pytest

from diffusiondrive_tpu.models.transfuser_model import DiffusionDriveModel
from diffusiondrive_tpu.training.train import OptimizerConfig
from diffusiondrive_tpu.training.trainer import Trainer

from test_train import make_batch, tiny_config


@pytest.mark.slow
def test_trainer_fit_and_resume(tmp_path):
    config = tiny_config()
    model = DiffusionDriveModel(config)
    # default OptimizerConfig so the jitted step hits the persistent compile
    # cache shared with test_train (different schedule constants = cache miss)
    trainer = Trainer(model, config, OptimizerConfig(), output_dir=str(tmp_path / "ckpt"))

    batches = [make_batch(16, seed=s) for s in range(2)]  # batch 16 == test_train shapes -> warm cache
    state = trainer.fit(lambda epoch: iter(batches), num_epochs=1)
    assert int(state.step) == 2

    ckpts = sorted((tmp_path / "ckpt").iterdir())
    assert len(ckpts) == 1

    # fresh trainer restores the checkpoint and continues
    trainer2 = Trainer(model, config, OptimizerConfig())
    trainer2.setup(batches[0])
    trainer2.restore_checkpoint(str(ckpts[0]))
    assert int(trainer2.state.step) == 2
    p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
