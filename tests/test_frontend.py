"""Front-end tests: FAST vs a NumPy reference, rBRIEF bit-exactness vs a
NumPy reference of the same spec, Gaussian blur vs OpenCV, and end-to-end
extraction properties (count, spread, rotation behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_cuda_tpu.frontend import ORBExtractor, ExtractorConfig
from orb_slam_cuda_tpu.frontend import extractor as ex
from orb_slam_cuda_tpu.frontend import fast, image_ops
from orb_slam_cuda_tpu.utils import synthetic


def numpy_fast_corners(img, t):
    """Straightforward FAST-9 segment test (independent reference impl)."""
    h, w = img.shape
    circle = fast.CIRCLE
    corners = np.zeros((h, w), bool)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = float(img[y, x])
            diffs = np.array([float(img[y + dy, x + dx]) - c for dy, dx in circle])
            bright = diffs > t
            dark = diffs < -t
            for mask in (bright, dark):
                ext = np.concatenate([mask, mask])
                run = 0
                best = 0
                for v in ext:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= 9:
                    corners[y, x] = True
                    break
    return corners


class TestFAST:
    def test_matches_numpy_reference(self, rng):
        img = synthetic.make_texture(64, 80, rng, n_blobs=40).astype(np.float32)
        t = 20.0
        score = np.asarray(fast.fast_score(jnp.asarray(img), t))
        ours = score > 0
        ref = numpy_fast_corners(img, t)
        # Interior only (our implementation masks the 3px ring).
        np.testing.assert_array_equal(ours[3:-3, 3:-3], ref[3:-3, 3:-3])

    def test_score_monotonic_in_threshold(self, rng):
        img = synthetic.make_texture(64, 64, rng, n_blobs=30).astype(np.float32)
        s_hi = np.asarray(fast.fast_score(jnp.asarray(img), 20.0))
        s_lo = np.asarray(fast.fast_score(jnp.asarray(img), 7.0))
        assert ((s_hi > 0) <= (s_lo > 0)).all()  # hi-threshold corners ⊆ lo
        # Scores agree where both detect (score independent of threshold).
        both = (s_hi > 0) & (s_lo > 0)
        np.testing.assert_allclose(s_hi[both], s_lo[both])

    def test_nms_keeps_local_maxima(self):
        score = np.zeros((16, 16), np.float32)
        score[5, 5] = 10.0
        score[5, 6] = 8.0  # suppressed by neighbor
        score[10, 10] = 3.0
        out = np.asarray(fast.nms3x3(jnp.asarray(score)))
        assert out[5, 5] == 10.0 and out[5, 6] == 0.0 and out[10, 10] == 3.0

    def test_two_threshold_fallback(self):
        hi = np.zeros((64, 64), np.float32)
        lo = np.zeros((64, 64), np.float32)
        hi[5, 5] = 30.0
        lo[5, 5] = 30.0
        lo[10, 12] = 9.0  # same cell as hi corner -> dropped
        lo[40, 40] = 8.0  # cell without hi corner -> kept
        out = np.asarray(fast.two_threshold_cell_select(jnp.asarray(hi), jnp.asarray(lo), cell=32))
        assert out[5, 5] == 30.0 and out[10, 12] == 0.0 and out[40, 40] == 8.0


class TestImageOps:
    def test_gaussian_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = synthetic.make_texture(48, 56, rng, n_blobs=20).astype(np.float32)
        ours = np.asarray(image_ops.separable_gaussian(jnp.asarray(img), 7, 2.0))
        ref = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=1e-2)

    def test_resize_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = synthetic.make_texture(100, 120, rng, n_blobs=20).astype(np.float32)
        ours = np.asarray(image_ops.resize_bilinear(jnp.asarray(img), (83, 100)))
        ref = cv2.resize(img, (100, 83), interpolation=cv2.INTER_LINEAR)
        assert np.abs(ours - ref).mean() < 0.5  # sub-LSB mean difference

    def test_pyramid_shapes(self):
        shapes = image_ops.pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8


def numpy_rbrief(blurred, ys, xs, angles_deg, pattern):
    """Reference implementation of the descriptor spec (independent loop)."""
    n = len(ys)
    h, w = blurred.shape
    out = np.zeros((n, 8), np.uint32)
    for i in range(n):
        a = np.cos(np.radians(angles_deg[i]))
        b = np.sin(np.radians(angles_deg[i]))
        bits = []
        for p in range(256):
            px1, py1, px2, py2 = [float(v) for v in pattern[p]]

            def val(px, py):
                r = int(np.rint(px * b + py * a))
                c = int(np.rint(px * a - py * b))
                return blurred[min(max(ys[i] + r, 0), h - 1), min(max(xs[i] + c, 0), w - 1)]

            bits.append(1 if val(px1, py1) < val(px2, py2) else 0)
        for word in range(8):
            v = 0
            for j in range(32):
                v |= bits[word * 32 + j] << j
            out[i, word] = v
    return out


class TestBRIEF:
    def test_bit_exact_vs_numpy(self, rng):
        img = synthetic.make_texture(96, 96, rng, n_blobs=40).astype(np.float32)
        blurred = np.asarray(image_ops.separable_gaussian(jnp.asarray(img), 7, 2.0))
        ys = np.array([30, 40, 50, 60], np.int32)
        xs = np.array([35, 45, 55, 48], np.int32)
        angles = np.array([0.0, 33.0, 121.5, 287.0], np.float32)
        pattern = ex.load_brief_pattern()
        ours = np.asarray(
            ex._rbrief(jnp.asarray(blurred), jnp.asarray(ys), jnp.asarray(xs),
                       jnp.asarray(angles), jnp.asarray(pattern, jnp.int32))
        )
        ref = numpy_rbrief(blurred, ys, xs, angles, pattern)
        np.testing.assert_array_equal(ours, ref)

    def test_descriptor_bytes_roundtrip(self):
        d = np.array([[0x04030201, 0x08070605, 0, 0, 0, 0, 0, 0xFF000000]], np.uint32)
        b = ex.descriptors_to_bytes(d)
        assert list(b[0, :8]) == [1, 2, 3, 4, 5, 6, 7, 8]
        assert b[0, 31] == 0xFF


class TestICAngle:
    def test_gradient_direction(self):
        # Horizontal intensity ramp -> centroid along +x -> angle ~ 0.
        img = np.tile(np.arange(64, dtype=np.float32)[None, :] * 2, (64, 1))
        ang = np.asarray(ex._ic_angle(jnp.asarray(img), jnp.asarray([32]), jnp.asarray([32])))
        assert ang[0] < 2.0 or ang[0] > 358.0
        # Vertical ramp -> angle ~ 90 (y down).
        img_v = img.T.copy()
        ang_v = np.asarray(ex._ic_angle(jnp.asarray(img_v), jnp.asarray([32]), jnp.asarray([32])))
        assert abs(ang_v[0] - 90.0) < 2.0

    def test_rotation_equivariance(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = synthetic.make_texture(128, 128, rng, n_blobs=60).astype(np.float32)
        ang0 = float(np.asarray(ex._ic_angle(jnp.asarray(img), jnp.asarray([64]), jnp.asarray([64])))[0])
        M = cv2.getRotationMatrix2D((64, 64), 30.0, 1.0)
        rot = cv2.warpAffine(img, M, (128, 128))
        ang1 = float(np.asarray(ex._ic_angle(jnp.asarray(rot), jnp.asarray([64]), jnp.asarray([64])))[0])
        diff = (ang0 - ang1 - 30.0 + 180.0) % 360.0 - 180.0
        assert abs(diff) < 8.0  # warp interpolation shifts the centroid a bit


class TestExtractor:
    def test_end_to_end_properties(self, rng):
        cfg = ExtractorConfig(n_features=500, n_levels=4)
        img = synthetic.make_texture(240, 320, rng, n_blobs=300)
        feats = ORBExtractor(cfg, 240, 320)(img)
        uv = np.asarray(feats.uv)
        valid = np.asarray(feats.valid)
        assert feats.capacity == 500
        assert valid.sum() > 300  # textured scene should nearly fill quota
        assert (np.asarray(feats.octave)[valid] < 4).all()
        assert (uv[valid, 0] >= 0).all() and (uv[valid, 0] < 320).all()
        assert (uv[valid, 1] >= 0).all() and (uv[valid, 1] < 240).all()
        ang = np.asarray(feats.angle)[valid]
        assert (ang >= 0).all() and (ang < 360).all()
        assert feats.desc.dtype == jnp.uint32

    def test_spatial_spread(self, rng):
        cfg = ExtractorConfig(n_features=400, n_levels=4)
        img = synthetic.make_texture(240, 320, rng, n_blobs=400)
        feats = ORBExtractor(cfg, 240, 320)(img)
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        # Level-0 coords binned 4x4: most bins should be occupied.
        bx = np.clip((uv[:, 0] / 80).astype(int), 0, 3)
        by = np.clip((uv[:, 1] / 60).astype(int), 0, 3)
        occupied = len(set(zip(by.tolist(), bx.tolist())))
        assert occupied >= 12

    def test_determinism(self, rng):
        cfg = ExtractorConfig(n_features=300, n_levels=3)
        img = synthetic.make_texture(200, 200, rng, n_blobs=100)
        e = ORBExtractor(cfg, 200, 200)
        f1, f2 = e(img), e(img)
        np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))

    def test_descriptor_stability_under_small_shift(self, rng):
        """Descriptors at the same physical corner should be close across a
        1px image shift (robustness smoke test for matching)."""
        cfg = ExtractorConfig(n_features=200, n_levels=1)
        img = synthetic.make_texture(200, 200, rng, n_blobs=120)
        e = ORBExtractor(cfg, 200, 200)
        f1 = e(img)
        shifted = np.roll(img, 1, axis=1)
        f2 = e(shifted)
        uv1 = np.asarray(f1.uv)[np.asarray(f1.valid)]
        uv2 = np.asarray(f2.uv)[np.asarray(f2.valid)]
        d1 = np.asarray(f1.desc)[np.asarray(f1.valid)]
        d2 = np.asarray(f2.desc)[np.asarray(f2.valid)]
        # Match by position (shifted +1 in x), compare Hamming distance.
        matches = 0
        close = 0
        for i in range(len(uv1)):
            target = uv1[i] + np.array([1.0, 0.0])
            j = np.argmin(np.abs(uv2 - target).sum(axis=1))
            if np.abs(uv2[j] - target).sum() < 1.5:
                matches += 1
                ham = bin(int(d1[i, 0] ^ d2[j, 0])).count("1")
                for wv in range(1, 8):
                    ham += bin(int(d1[i, wv] ^ d2[j, wv])).count("1")
                if ham < 60:
                    close += 1
        assert matches > 30
        assert close / max(matches, 1) > 0.8


class TestBinnedDescriptorPath:
    """MXU rotation-binned rBRIEF (extractor.rotation_bins>0) must agree
    with the exact continuous-rotation path up to the ORB paper's 12-deg
    quantization noise (Rublee et al. sec 4.3)."""

    def test_binned_matches_exact(self):
        rng = np.random.default_rng(3)
        H, W = 240, 320
        img = np.zeros((H, W), np.float32)
        for _ in range(120):
            y, x = rng.integers(10, H - 40), rng.integers(10, W - 40)
            img[y:y + rng.integers(5, 25), x:x + rng.integers(5, 25)] += (
                rng.random() * 120
            )
        img = np.clip(img + rng.random((H, W)) * 25, 0, 255).astype(np.uint8)
        fb = ORBExtractor(ExtractorConfig(n_features=400, rotation_bins=30), H, W)(img)
        fe = ORBExtractor(ExtractorConfig(n_features=400, rotation_bins=0), H, W)(img)
        vb = np.asarray(fb.valid)
        assert (vb == np.asarray(fe.valid)).all()
        ang_d = np.abs(np.asarray(fb.angle)[vb] - np.asarray(fe.angle)[vb])
        ang_d = np.minimum(ang_d, 360.0 - ang_d)
        assert ang_d.max() < 0.01  # angle path is quantization-free
        db, de = np.asarray(fb.desc)[vb], np.asarray(fe.desc)[vb]
        ham = np.unpackbits((db ^ de).view(np.uint8), axis=1).sum(1)
        # 12-deg bins move samples <= r*sin(6deg) ~ 1.9 px; well under
        # the matcher's TH_LOW=50 budget.
        assert ham.mean() < 30, ham.mean()
        assert np.percentile(ham, 95) < 60
