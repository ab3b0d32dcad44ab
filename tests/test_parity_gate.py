"""The one-command mIoU parity gate (eval_iou --parity) and the explicit
--width CLI surface, end-to-end on the fake-cityscapes fixture with a
synthetic torch ``.pth`` — so the day a real dataset/checkpoint mount
appears, the standing BASELINE gate (reference README.md:≈60, 72.20% val)
is a single command away:

    python -m erfnet_pytorch_tpu.cli.eval_iou --parity \
        --datadir /datasets/cityscapes --state erfnet_pretrained.pth
"""

import re

import pytest
import torch

import torch_oracle as oracle
from erfnet_pytorch_tpu.cli import eval_iou


@pytest.fixture(scope="module")
def synth_pth(tmp_path_factory):
    """A random-init torch Net(20) state_dict saved the way the reference
    ships its artifact — exercises the torch-pickle import path inside
    load_any_weights, not just the msgpack one."""
    torch.manual_seed(0)
    net = oracle.Net(20).eval()
    path = tmp_path_factory.mktemp("weights") / "erfnet_synth.pth"
    torch.save(net.state_dict(), str(path))
    return str(path)


def test_eval_iou_parity_gate(fake_cityscapes, synth_pth, capsys):
    """--parity forces the reference protocol (512x1024 val), prints the
    per-class table plus a PASS/FAIL verdict vs the published target, and
    exits 1 on FAIL (random weights can't hit 72.20 +-0.3)."""
    argv = ["--datadir", fake_cityscapes, "--state", synth_pth,
            "--batch-size", "6", "--height", "256", "--parity"]
    with pytest.raises(SystemExit) as ei:
        eval_iou.main(argv)
    assert ei.value.code == 1
    out = capsys.readouterr().out
    assert "overriding --height/--width/--subset" in out  # protocol forced
    assert "MEAN IoU" in out and "Road" in out  # full per-class table
    m = re.search(r"PARITY FAIL: ([0-9.]+)% vs 72\.20%", out)
    assert m, out
    measured = float(m.group(1))

    # verdict arithmetic round-trips: with the target set to the measured
    # value the same protocol PASSes (and main returns the mean)
    mean = eval_iou.main(["--datadir", fake_cityscapes, "--state", synth_pth,
                          "--batch-size", "6", "--parity",
                          "--parity-target", f"{measured}"])
    out = capsys.readouterr().out
    assert "PARITY PASS" in out
    assert abs(mean * 100 - measured) < 0.01


def test_eval_iou_explicit_width_non_2to1(fake_cityscapes, synth_pth,
                                          capsys):
    """--width decouples eval width from 2*height (round-2 verdict weak #4):
    a 64x96 eval runs end-to-end instead of being silently reshaped."""
    mean = eval_iou.main(["--datadir", fake_cityscapes, "--state", synth_pth,
                          "--subset", "val", "--height", "64",
                          "--width", "96", "--batch-size", "6"])
    out = capsys.readouterr().out
    assert "MEAN IoU" in out
    assert 0.0 <= mean <= 1.0


def test_color_server_cli_width_flag():
    from erfnet_pytorch_tpu.cli import (eval_cityscapes_color,
                                        eval_cityscapes_server)
    for mod in (eval_cityscapes_color, eval_cityscapes_server):
        a = mod.build_parser().parse_args(["--width", "96"])
        assert a.width == 96
        assert mod.build_parser().parse_args([]).width is None
