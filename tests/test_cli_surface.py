"""CLI wiring smoke tests: every subcommand parses, help exits clean,
and user errors surface as messages rather than tracebacks
(reference command surface: ws-unet README.md:5-27)."""

import pytest

from wsunet_tpu.cli import build_parser, main as cli

COMMANDS = [
    "filters-eval", "ws-eval", "unet-eval", "detector-eval", "roc",
    "train-unet", "train-b0", "correlation", "error-boxes", "contour",
    "saliency", "init-dataset", "simulate", "bench", "serve",
]


def test_parser_covers_the_command_surface():
    sub = next(a for a in build_parser()._actions
               if hasattr(a, "choices") and a.choices)
    assert set(COMMANDS) <= set(sub.choices)


@pytest.mark.parametrize("cmd", COMMANDS)
def test_subcommand_help_exits_clean(cmd, capsys):
    with pytest.raises(SystemExit) as e:
        cli([cmd, "--help"])
    assert e.value.code == 0
    assert cmd in capsys.readouterr().out


def test_missing_model_dir_is_a_user_error(tmp_path):
    with pytest.raises(SystemExit) as e:
        cli(["unet-eval", "--data", "/root/reference/data",
             "--model-dir", str(tmp_path / "absent")])
    # a message, not a traceback-driven crash code
    assert "unet-eval" in str(e.value)


def test_saliency_cli_produces_grid_and_dots(tmp_path):
    """The saliency command writes BOTH artifacts: the 2x2 grid and the
    interesting-points overlay (VERDICT r4 item 8)."""
    cli(["saliency", "--data", "/root/reference/data",
         "--results", str(tmp_path), "--model-dir", "models/unet",
         "--points", "[[307, 10]]"])
    assert (tmp_path / "prediction" / "saliency_LSBR.png").exists()
    assert (tmp_path / "prediction" / "saliency_image_dots.png").exists()


def test_split_take_rejected_where_meaningless(tmp_path):
    with pytest.raises(SystemExit) as e:
        cli(["saliency", "--data", "/root/reference/data",
             "--model-dir", str(tmp_path), "--take", "3"])
    assert "--split/--take" in str(e.value)
