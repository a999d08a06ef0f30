import numpy as np
import pytest

from vido_slam_tpu.io.native import (
    FilePrefetcher,
    demosaic_bg2bgr,
    native_available,
    read_flo_native,
)
from vido_slam_tpu.io.datasets import write_flo


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_available():
        pytest.skip("native toolchain unavailable")


class TestNativeDemosaic:
    def test_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        raw = np.random.RandomState(0).randint(0, 255, (64, 96), np.uint8)
        ours = demosaic_bg2bgr(raw).astype(np.int32)
        ref = cv2.cvtColor(raw, cv2.COLOR_BayerBG2BGR).astype(np.int32)
        # interior pixels: same bilinear recipe up to rounding
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.median(diff) <= 1
        assert (diff <= 2).mean() > 0.95

    def test_constant(self):
        raw = np.full((32, 32), 77, np.uint8)
        out = demosaic_bg2bgr(raw)
        np.testing.assert_allclose(out, 77, atol=1)


class TestNativeFlo:
    def test_roundtrip(self, tmp_path):
        flow = np.random.RandomState(1).randn(10, 14, 2).astype(np.float32)
        p = str(tmp_path / "a.flo")
        write_flo(p, flow)
        back = read_flo_native(p)
        np.testing.assert_array_equal(back, flow)


class TestPrefetcher:
    def test_reads_in_order_and_random(self, tmp_path):
        paths = []
        for i in range(10):
            p = tmp_path / f"f{i}.bin"
            p.write_bytes(bytes([i]) * (100 + i))
            paths.append(str(p))
        pf = FilePrefetcher(paths, n_threads=3, max_ahead=4)
        for i in range(10):
            data = pf.get(i)
            assert len(data) == 100 + i
            assert data[0] == i
        pf.close()
