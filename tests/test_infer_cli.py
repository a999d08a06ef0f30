"""Standalone inference CLIs (tools/infer_nets.py) — the test_simple.py /
flow run.py __main__ surfaces."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _imgs(tmp_path, n=2, H=70, W=90):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(str(tmp_path), f"{i}.png")
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


@pytest.mark.slow
def test_depth_cli(tmp_path):
    import infer_nets

    _imgs(tmp_path)
    out = os.path.join(str(tmp_path), "out")
    infer_nets.main(["depth", "--images", str(tmp_path), "--out", out,
                     "--height", "64", "--width", "64"])
    disp = np.load(os.path.join(out, "0_disp.npy"))
    assert disp.shape == (70, 90)       # resized back to the original size
    assert np.isfinite(disp).all() and (disp > 0).all()
    assert os.path.exists(os.path.join(out, "1_disp.png"))


@pytest.mark.slow
def test_flow_cli(tmp_path):
    import infer_nets

    from vido_slam_tpu.io.datasets import read_flo

    a, b = _imgs(tmp_path)
    out = os.path.join(str(tmp_path), "outf")
    infer_nets.main(["flow", "--first", a, "--second", b, "--out", out,
                     "--height", "64", "--width", "64"])
    flow = read_flo(os.path.join(out, "flow.flo"))
    assert flow.shape == (70, 90, 2)
    assert np.isfinite(flow).all()
    assert os.path.exists(os.path.join(out, "flow.png"))


@pytest.mark.slow
@pytest.mark.parametrize("family", ["fbnet", "retinanet"])
def test_detector_cli(tmp_path, family):
    """VERDICT r4 stretch item 9: the alternative detector families are
    drivable from one CLI invocation and produce detections (JSON +
    annotated PNG) on a synthetic image."""
    import json

    import infer_nets

    out = os.path.join(str(tmp_path), family)
    infer_nets.main(["detector", "--family", family, "--image", "synthetic",
                     "--out", out, "--height", "96", "--width", "128"])
    with open(os.path.join(out, f"{family}_detections.json")) as f:
        rec = json.load(f)
    assert rec["family"] == family
    assert isinstance(rec["detections"], list)
    for d in rec["detections"]:
        assert len(d["box"]) == 4 and 0.0 <= d["score"] <= 1.0
    assert os.path.exists(os.path.join(out, f"{family}_annotated.png"))
