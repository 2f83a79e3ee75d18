"""End-to-end trainer example: shards -> native loader -> sharded train
step -> checkpoint/resume. Pins the full production loop in one test."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))

from videomamba_tpu.data import native as nat  # noqa: E402

if not nat.native_available():  # pragma: no cover - g++ is in the image
    pytest.skip("native loader unavailable", allow_module_level=True)


@pytest.mark.slow
def test_train_classifier_end_to_end(tmp_path, capsys):
    from train_classifier import main

    loss = main([
        "--epochs", "2", "--depth", "1", "--embed-dim", "32",
        "--img", "32", "--frames", "4", "--classes", "2", "--batch", "4",
        "--ckpt-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert loss < 1.0  # 2-class CE starts at ~0.69 + margin; must be finite/learning
    assert "resume parity: max |param diff| after replayed epoch = 0.00e+00" in out
    assert os.path.exists(tmp_path / "ckpt_ep1.msgpack")
