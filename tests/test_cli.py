"""CLI wiring smoke tests (reference `tests/test_cli.py` shells out to
`dalm version`; we use click's runner, plus check every command exists)."""

from click.testing import CliRunner

from dalm_tpu import __version__
from dalm_tpu.cli import cli


def test_version():
    result = CliRunner().invoke(cli, ["version"])
    assert result.exit_code == 0
    assert __version__ in result.output


def test_all_reference_commands_exist():
    for name in ["version", "train-rag-e2e", "train-retriever-only", "qa-gen", "eval-rag", "eval-retriever"]:
        assert name in cli.commands, f"missing command {name}"


def test_help_runs_for_every_command():
    runner = CliRunner()
    for name in cli.commands:
        result = runner.invoke(cli, [name, "--help"])
        assert result.exit_code == 0, f"{name} --help failed: {result.output}"


def test_train_retriever_cli_end_to_end(toy_csv, tmp_path):
    result = CliRunner().invoke(
        cli,
        [
            "train-retriever-only", "tiny", toy_csv,
            "--per-device-train-batch-size", "2",
            "--num-train-epochs", "1",
            "--query-max-len", "16", "--passage-max-len", "16",
            "--output-dir", str(tmp_path / "out"),
            "--no-with-tracking",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (tmp_path / "out" / "retriever" / "params.msgpack").exists()


def test_train_generator_cli_pipeline_stages(tmp_path):
    """`dalm train-generator --pipeline-stages 2` drives the PP trainer
    end-to-end (the shipped CLI surface for pipeline parallelism)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from datasets import Dataset

    rows = [
        {"messages": [
            {"role": "user", "content": f"q {i} on topic {i % 3}"},
            {"role": "assistant", "content": f"a {i} is {i * 3}"},
        ]}
        for i in range(16)
    ]
    ds = str(tmp_path / "ds")
    Dataset.from_list(rows).save_to_disk(ds)
    out = str(tmp_path / "gen_out")
    result = CliRunner().invoke(
        cli,
        [
            "train-generator", "tiny", ds,
            "--output-dir", out,
            "--num-train-epochs", "1",
            "--seq-length", "64",
            "--per-device-train-batch-size", "2",
            "--pp-microbatches", "2",
            "--eval-steps", "0",
            "--validation-split", "0.2",
            "--no-use-peft",
            "--pipeline-stages", "2",
            "--neftune-noise-alpha", "0",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    import os

    assert os.path.exists(os.path.join(out, "final_checkpoint", "params.msgpack"))
