"""CLI flag-surface parity with the reference scripts (SURVEY.md §2a rows
9, 14-18): flags exist, defaults encode the recipe."""

import pytest

from erfnet_pytorch_tpu.cli import (train_main, eval_iou,
                                    eval_cityscapes_color,
                                    eval_cityscapes_server,
                                    eval_forwardTime, imagenet_main)


def test_train_main_flags():
    args = train_main.build_parser().parse_args(["--savedir", "x"])
    # reference recipe defaults (train/main.py argparse)
    assert args.model == "erfnet"
    assert args.height == 512
    assert args.num_epochs == 150
    assert args.num_workers == 4
    assert args.batch_size == 6
    assert args.steps_loss == 50
    assert args.steps_plot == 50
    assert args.epochs_save == 0
    assert args.port == 8097
    assert args.iouVal is True and args.iouTrain is False
    assert args.decoder is False and args.resume is False
    assert args.cuda is True  # accepted & ignored
    # reference flags parse
    train_main.build_parser().parse_args(
        ["--savedir", "x", "--decoder", "--pretrainedEncoder", "e.pth.tar",
         "--visualize", "--iouTrain", "--resume", "--state", "s.pth"])


def test_eval_iou_flags():
    args = eval_iou.build_parser().parse_args([])
    assert args.loadWeights == "model_best.pth"
    assert args.loadModel == "erfnet"
    assert args.subset == "val"
    assert args.batch_size == 8


def test_eval_color_server_flags():
    a = eval_cityscapes_color.build_parser().parse_args([])
    assert a.subset == "val"
    a = eval_cityscapes_server.build_parser().parse_args([])
    assert a.subset == "test"  # server submissions run on the test split


def test_eval_forwardtime_flags():
    a = eval_forwardTime.build_parser().parse_args([])
    assert a.width == 1024 and a.height == 512 and a.batch_size == 1


def test_imagenet_flags():
    a = imagenet_main.build_parser().parse_args(["/data"])
    assert a.epochs == 90 and a.batch_size == 256 and a.lr == 0.1
    assert a.momentum == 0.9 and a.weight_decay == 1e-4
    assert a.print_freq == 10 and a.workers == 4


def test_pallas_flag_tristate():
    """--pallas / --no-pallas / absent -> True / False / auto(None)."""
    from erfnet_pytorch_tpu.cli.eval_iou import build_parser
    from erfnet_pytorch_tpu.inference import resolve_use_pallas
    p = build_parser()
    assert p.parse_args([]).pallas is None
    assert p.parse_args(["--pallas"]).pallas is True
    assert p.parse_args(["--no-pallas"]).pallas is False
    # auto resolves by backend (tests force CPU -> False)
    assert resolve_use_pallas(None) is False
    assert resolve_use_pallas(True) is True
    assert resolve_use_pallas(False) is False


def test_eval_forward_time_end_to_end(capsys):
    """eval_forwardTime.main runs the full benchmark loop (random-init
    weights, tiny input) — regression net for main()-level breaks (a
    function-local jax import once crashed every non---cpu invocation)."""
    from erfnet_pytorch_tpu.cli import eval_forwardTime
    per_img = eval_forwardTime.main([
        "--width", "64", "--height", "32", "--batch-size", "1",
        "--warmup", "1", "--iterations", "2"])
    out = capsys.readouterr().out
    assert "FORWARD:" in out and "FPS" in out
    assert 0 < per_img < 60
