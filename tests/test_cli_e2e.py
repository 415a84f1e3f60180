"""End-to-end drive of the training entry-point CLIs (train -> finetune ->
evaluate) through their real main() on synthetic records.

The operator-facing path: train in test mode, finetune from the produced
checkpoint with a --lr override and a promotion gate, offline-evaluate the
promoted model. Pins the operational contracts the CLI review fixed:
--lr wins over the checkpoint's saved LR, debug finetune never writes the
online artifact, the promotion gate always sees val_auc, evaluate covers
tail examples (drop_remainder=False) and warns on random weights.
"""
import io
import json
import os
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from recommendflow_tpu.config import Configuration

pytestmark = pytest.mark.slow  # trains a few (tiny) runs end-to-end

CONF = os.path.join(os.path.dirname(__file__), "..", "conf",
                    "demo_recall.yaml")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from recommendflow_tpu.data.synthetic import generate_records
    conf = Configuration(CONF)
    out = str(tmp_path_factory.mktemp("cli_records"))
    # 2 files so train/valid split exists for the train CLI
    paths = generate_records(conf, out, num_rows=3000, num_files=2, seed=9)
    return os.path.join(out, "*.rfb") if paths[0].endswith(".rfb") else \
        os.path.join(out, "*" + os.path.splitext(paths[0])[1])


def test_train_finetune_evaluate_cli(world, tmp_path):
    from recommendflow_tpu.cli import evaluate as eval_cli
    from recommendflow_tpu.cli import finetune as finetune_cli
    from recommendflow_tpu.cli import train as train_cli

    save_root = str(tmp_path / "run1")
    result = train_cli.main([
        CONF, "--data", world, "--train_mode", "test", "--epochs", "1",
        "--batch_size", "256", "--model_save_root", save_root,
        "--no_mesh", "--monitor", "val_hit@5", "--topk", "5,10"])
    assert result["history"], "train CLI produced no history"

    # the test-mode run skips ModelCheckpoint; produce a checkpoint to
    # finetune from via the library save (what a real run's callback does)
    from recommendflow_tpu.train.checkpoint import save_checkpoint
    ckpt_root = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_root, result["state"], step=0)

    ft_root = str(tmp_path / "ft")
    buf = io.StringIO()
    with redirect_stdout(buf):
        finetune_cli.main([
            CONF, "--data", world, "--load_checkpoint", ckpt_root,
            "--model_save_root", ft_root, "--train_mode", "test",
            "--epochs", "1", "--lr", "5e-4",
            "--promotion_constraints", "val_auc=[-0.5, inf)"])
    out_text = buf.getvalue()
    # debug finetune must NOT write the online artifact
    assert "NOT promoting" in out_text
    assert not os.path.exists(os.path.join(ft_root, "online"))
    # the promotion gate ran against a final val_auc (symmetric eval)
    assert "val_auc" in out_text

    # non-debug finetune promotes
    buf = io.StringIO()
    with redirect_stdout(buf):
        finetune_cli.main([
            CONF, "--data", world, "--load_checkpoint", ckpt_root,
            "--model_save_root", ft_root, "--epochs", "1",
            "--lr", "5e-4", "--batch_size", "256"])
    assert os.path.exists(os.path.join(ft_root, "online"))

    # offline evaluate of the checkpoint; random-weights warning absent,
    # recall report printed
    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_cli.main([CONF, "--data", world, "--checkpoint", ckpt_root,
                       "--topk", "5,10", "--batch_size", "256"])
    out_text = buf.getvalue()
    assert "RANDOM" not in out_text
    assert re.search(r"\bhit\b", out_text) and "auc=" in out_text, out_text

    # no --checkpoint -> loud random-weights warning
    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_cli.main([CONF, "--data", world, "--topk", "5",
                       "--batch_size", "256"])
    assert "RANDOM" in buf.getvalue()


def test_finetune_lr_overrides_checkpoint_lr(world, tmp_path):
    """--lr must win over the checkpoint's saved learning_rate hyperparam
    (a restored plateau-reduced LR silently poisoned daily finetunes)."""
    from recommendflow_tpu.cli import train as train_cli
    from recommendflow_tpu.data.pipeline import make_dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import (
        Trainer, current_learning_rate, set_learning_rate,
    )
    from recommendflow_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    conf = Configuration(CONF)
    train_ds, _ = make_dataset(conf, world, 256, valid_ratio=0.0, seed=0,
                               debug=True)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(next(iter(train_ds))))
    state = set_learning_rate(state, 1e-5)  # a plateau-reduced old run
    ckpt = str(tmp_path / "lr_ckpt")
    save_checkpoint(ckpt, state, step=0)

    trainer2 = Trainer(model, learning_rate=5e-4)
    state2 = trainer2.init_state(trainer2._put(next(iter(train_ds))))
    state2 = restore_checkpoint(ckpt, state2)
    # this is the hazard: restore brings back 1e-5
    assert current_learning_rate(state2) == pytest.approx(1e-5)
    state2 = set_learning_rate(state2, 5e-4)  # what finetune.py now does
    assert current_learning_rate(state2) == pytest.approx(5e-4)
