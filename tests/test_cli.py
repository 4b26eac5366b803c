"""CLI surface tests: the reference's underscore command names and flags
(reference main.py:12-64) must resolve exactly."""

from click.testing import CliRunner

from mapping_tpu.main import main


def test_commands_exist():
    runner = CliRunner()
    result = runner.invoke(main, ["--help"])
    assert result.exit_code == 0
    for cmd in ("prepare_masks", "prepare_metadata", "train", "evaluate",
                "predict_on_dir", "train_evaluate"):
        assert cmd in result.output, f"missing CLI command {cmd}"


def test_command_flags():
    runner = CliRunner()
    out = runner.invoke(main, ["train", "--help"]).output
    assert "-p" in out and "--pipeline_name" in out and "--dev_mode" in out
    assert "--warm_start" in out
    out = runner.invoke(main, ["train_evaluate", "--help"]).output
    assert "--warm_start" in out
    out = runner.invoke(main, ["evaluate", "--help"]).output
    assert "--chunk_size" in out
    out = runner.invoke(main, ["predict_on_dir", "--help"]).output
    assert "--dir_path" in out and "--prediction_path" in out


def test_serve_command():
    runner = CliRunner()
    result = runner.invoke(main, ["--help"])
    assert "serve" in result.output
    out = runner.invoke(main, ["serve", "--help"]).output
    assert "--port" in out and "--max_wait_ms" in out and "--host" in out
    assert "--artifact" in out


def test_export_command():
    runner = CliRunner()
    result = runner.invoke(main, ["--help"])
    assert "export" in result.output
    out = runner.invoke(main, ["export", "--help"]).output
    assert "--dir_path" in out and "--platforms" in out
