"""Checkpoint tag parsing, latest discovery, retention pruning."""

import os

import pytest

from dalm_tpu.train import checkpoints as ckpt


def test_parse_tags():
    assert ckpt.parse_checkpoint_tag("/x/step_40") == ("step", 40)
    assert ckpt.parse_checkpoint_tag("/x/epoch_2") == ("epoch", 2)
    with pytest.raises(ValueError):
        ckpt.parse_checkpoint_tag("/x/final")


def test_latest_and_prune(tmp_path):
    for i in [10, 20, 30, 40]:
        (tmp_path / f"step_{i}").mkdir()
    (tmp_path / "epoch_0").mkdir()
    (tmp_path / "unrelated").mkdir()
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert os.path.basename(latest) in {"step_40", "epoch_0"}  # mtime-based

    removed = ckpt.prune_checkpoints(str(tmp_path), keep_last=2)
    assert removed == 2
    remaining = {d for d in os.listdir(tmp_path) if d.startswith("step_")}
    assert remaining == {"step_30", "step_40"}
    assert (tmp_path / "epoch_0").exists()  # epochs untouched
