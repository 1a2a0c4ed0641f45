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
