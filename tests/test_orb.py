"""ORB extractor: pyramid, orientation, descriptors, matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vido_slam_tpu.ops.orb import (
    OrbFeatures,
    features_per_level,
    level_sizes,
    match_descriptors,
    orb_extract,
    orientation_map,
    steered_brief,
)


def checkerboard(h=192, w=256, cell=16, lo=40.0, hi=210.0):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    return board * (hi - lo) + lo


def textured(h=192, w=256, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    return img


class TestPyramid:
    def test_level_sizes_geometric(self):
        s = level_sizes(560, 1280)
        assert s[0] == (560, 1280)
        for (h0, w0), (h1, w1) in zip(s, s[1:]):
            assert abs(h0 / h1 - 1.2) < 0.05
            assert abs(w0 / w1 - 1.2) < 0.05

    def test_budget_sums_to_n(self):
        b = features_per_level(2000)
        assert sum(b) == 2000
        assert b[0] > b[-1]  # finest level gets the most


class TestExtract:
    def test_corners_found_and_fields_consistent(self):
        # isolated bright squares: their corners are L-junctions, which
        # FAST-9 detects (checkerboard X-junctions correctly do NOT fire —
        # no 9-contiguous arc exists there)
        img = np.full((192, 256), 30.0, np.float32)
        gt = []
        for cy in range(40, 180, 48):
            for cx in range(40, 240, 48):
                img[cy:cy + 20, cx:cx + 20] = 220.0
                gt += [(cx, cy), (cx + 19, cy), (cx, cy + 19), (cx + 19, cy + 19)]
        f = orb_extract(jnp.asarray(img), n=500)
        assert isinstance(f, OrbFeatures)
        ok = np.asarray(f.valid)
        assert ok.sum() > 20
        uv = np.asarray(f.uv)[ok]
        assert uv[:, 0].max() < 256 and uv[:, 1].max() < 192
        assert uv[:, 0].min() >= 0 and uv[:, 1].min() >= 0
        # every level-0 detection is near a true square corner
        lv0 = np.asarray(f.octave)[ok] == 0
        assert lv0.sum() > 10
        gt = np.asarray(gt, np.float32)
        d = np.linalg.norm(uv[lv0][:, None] - gt[None], axis=-1).min(axis=1)
        assert (d <= 2.5).mean() > 0.9, d
        assert f.descriptor.shape[-1] == 32
        assert f.descriptor.dtype == jnp.uint8

    def test_multi_level_octaves(self):
        img = jnp.asarray(textured())
        f = orb_extract(img, n=800)
        octs = np.asarray(f.octave)[np.asarray(f.valid)]
        assert len(np.unique(octs)) >= 3  # several pyramid levels fire


class TestOrientation:
    def test_gradient_patch_angle(self):
        # intensity increasing along +x -> centroid to the right -> angle ~ 0
        xx = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        a = np.asarray(orientation_map(jnp.asarray(xx)))[32, 32]
        assert abs(a) < 0.05
        # increasing along +y -> angle ~ pi/2
        a2 = np.asarray(orientation_map(jnp.asarray(xx.T)))[32, 32]
        assert abs(a2 - np.pi / 2) < 0.05

    def test_rotation_equivariance(self):
        img = textured(96, 96, seed=3)
        a0 = np.asarray(orientation_map(jnp.asarray(img)))[48, 48]
        a90 = np.asarray(orientation_map(jnp.asarray(np.rot90(img, -1).copy())))[48, 48]
        d = (a90 - a0 - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.1


class TestDescriptors:
    def test_rotation_invariance(self):
        # descriptor of a patch should be stable under image rotation when
        # steering by the measured orientation
        img = textured(128, 128, seed=5)
        rot = np.rot90(img, -1).copy()  # (x, y) -> (w-1-y, x)
        g0, g1 = jnp.asarray(img), jnp.asarray(rot)
        p0 = jnp.asarray([[50.0, 40.0]])
        p1 = jnp.asarray([[128 - 1 - 40.0, 50.0]])
        a0 = orientation_map(g0)[40, 50][None]
        a1 = orientation_map(g1)[int(p1[0, 1]), int(p1[0, 0])][None]
        d0 = steered_brief(g0, p0, a0)
        d1 = steered_brief(g1, p1, a1)
        ham = int(jnp.sum(jax.lax.population_count(
            jnp.bitwise_xor(d0, d1)).astype(jnp.int32)))
        assert ham < 60, f"hamming {ham}/256 after 90deg rotation"

    def test_distinct_points_differ(self):
        img = jnp.asarray(textured(128, 128, seed=6))
        pts = jnp.asarray([[40.0, 40.0], [90.0, 70.0]])
        ang = jnp.zeros(2)
        d = steered_brief(img, pts, ang)
        ham = int(jnp.sum(jax.lax.population_count(
            jnp.bitwise_xor(d[0], d[1])).astype(jnp.int32)))
        assert ham > 60


class TestCanonicalPattern:
    def test_pattern_is_the_reference_table(self):
        # spot-check the first/last learned pairs of bit_pattern_31_
        # (ORBextractor.cc:141-393) and the table's documented range
        from vido_slam_tpu.ops.orb import _PATTERN
        assert _PATTERN.shape == (256, 2, 2)
        assert _PATTERN[0].tolist() == [[8, -3], [9, 5]]
        assert _PATTERN[1].tolist() == [[4, 2], [7, -12]]
        assert _PATTERN[255].tolist() == [[-1, -6], [0, -11]]
        assert _PATTERN.min() == -13 and _PATTERN.max() == 12

    def test_descriptor_matches_numpy_oracle(self):
        # direct numpy evaluation of computeOrbDescriptor's semantics
        # (ORBextractor.cc:105-147): rotate each test pair by the keypoint
        # angle (col = round(x cos - y sin), row = round(x sin + y cos)),
        # compare intensities, pack LSB-first into 32 bytes
        from vido_slam_tpu.ops.orb import _PATTERN
        img = textured(96, 96, seed=11)
        pts = np.asarray([[40.0, 50.0], [60.0, 30.0], [48.0, 48.0]])
        angs = np.asarray([0.0, 0.7, -2.1])
        got = np.asarray(steered_brief(jnp.asarray(img), jnp.asarray(pts),
                                       jnp.asarray(angs)))
        for k, ((u, v), th) in enumerate(zip(pts, angs)):
            ca, sa = np.cos(th), np.sin(th)
            want = np.zeros(32, np.uint8)
            for i in range(256):
                vals = []
                for (x, y) in _PATTERN[i]:
                    c = int(np.rint(u + x * ca - y * sa))
                    r = int(np.rint(v + x * sa + y * ca))
                    vals.append(img[r, c])
                want[i // 8] |= np.uint8(int(vals[0] < vals[1]) << (i % 8))
            np.testing.assert_array_equal(got[k], want)


class TestMatching:
    def test_translation_matching(self):
        img = textured(160, 200, seed=7)
        shifted = np.roll(img, (0, 5), axis=(0, 1))
        f1 = orb_extract(jnp.asarray(img), n=300)
        f2 = orb_extract(jnp.asarray(shifted), n=300)
        idx, ok = match_descriptors(f1.descriptor, f1.valid,
                                    f2.descriptor, f2.valid)
        ok = np.asarray(ok)
        assert ok.sum() > 30
        uv1 = np.asarray(f1.uv)[ok]
        uv2 = np.asarray(f2.uv)[np.asarray(idx)[ok]]
        d = uv2 - uv1
        good = (np.abs(d[:, 0] - 5) < 2) & (np.abs(d[:, 1]) < 2)
        assert good.mean() > 0.8, f"only {good.mean():.2f} matches consistent"

pytestmark = pytest.mark.slow  # heavy jit: full tier only
