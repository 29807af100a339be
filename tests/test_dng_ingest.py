"""DNG ingestion branch coverage with mocked rawpy/exifread.

The real libraries are absent in CI (as they may be on user machines), so
the EXIF branch logic of ``load_dng_burst`` (reference utils_dng.py:50-164)
is exercised against small fake raw objects: ISO fallback chain, orientation
warning, 0xC761 grey-vs-bayer averaging, CFA green unification, the
integer-dtype guard, and the black-level/WB normalization output.
"""

import warnings

import numpy as np
import pytest

import hmsr_tpu.io.burst as burst_mod


class FakeRatio:
    """Indexable rational like exifread's Ratio list entries: x[0] = num."""

    def __init__(self, num, den=1):
        self._v = (num, den)

    def __getitem__(self, i):
        return self._v[i]

    def decimal(self):
        return self._v[0] / self._v[1]


class FakeTag:
    def __init__(self, values):
        self.values = values

    def __str__(self):
        return str(self.values)


RGGB_RAWPY = np.array([[0, 1], [3, 2]])    # rawpy uses 3 for the second green


class FakeRaw:
    """Mimics the rawpy.RawPy surface load_dng_burst touches."""

    def __init__(self, image, cfa=RGGB_RAWPY, white_level=1023,
                 black=(64, 64, 64, 64), wb=(2.0, 1.0, 1.5, 1.0)):
        self.raw_image = image
        self.white_level = white_level
        self.black_level_per_channel = list(black)
        self.camera_whitebalance = list(wb)
        self.raw_pattern = np.asarray(cfa)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class FakeRawpy:
    def __init__(self, images, **kw):
        self._images = images    # path -> image
        self._kw = kw

    def imread(self, path):
        return FakeRaw(self._images[str(path)], **self._kw)


class FakeExifread:
    def __init__(self, tags):
        self._tags = tags

    def process_file(self, f):
        return dict(self._tags)


def install(monkeypatch, images, tags, **raw_kw):
    monkeypatch.setattr(burst_mod, "rawpy", FakeRawpy(images, **raw_kw))
    monkeypatch.setattr(burst_mod, "exifread", FakeExifread(tags))
    monkeypatch.setattr(burst_mod, "HAS_RAWPY", True)
    monkeypatch.setattr(burst_mod, "HAS_EXIFREAD", True)


@pytest.fixture
def dng_dir(tmp_path):
    """Two empty .dng placeholder files (content comes from the mocks)."""
    for name in ("a.dng", "b.dng"):
        (tmp_path / name).write_bytes(b"")
    return tmp_path


def fake_images(dng_dir, h=8, w=8, dtype=np.uint16):
    rng = np.random.RandomState(0)
    return {str(dng_dir / n): (rng.randint(64, 1024, (h, w)).astype(dtype)
                               if np.issubdtype(dtype, np.integer)
                               else rng.rand(h, w).astype(dtype))
            for n in ("a.dng", "b.dng")}


BASE_TAGS = {
    "EXIF ISOSpeedRatings": FakeTag(800),
    "Image Orientation": FakeTag([1]),
}


class TestIsoChain:
    def test_exif_iso_preferred(self, monkeypatch, dng_dir):
        tags = dict(BASE_TAGS)
        tags["Image ISOSpeedRatings"] = FakeTag(200)
        install(monkeypatch, fake_images(dng_dir), tags)
        b = burst_mod.load_dng_burst(dng_dir)
        assert b.iso == 800

    def test_image_iso_fallback(self, monkeypatch, dng_dir):
        tags = {"Image ISOSpeedRatings": FakeTag(400),
                "Image Orientation": FakeTag([1])}
        install(monkeypatch, fake_images(dng_dir), tags)
        assert burst_mod.load_dng_burst(dng_dir).iso == 400

    def test_missing_iso_raises(self, monkeypatch, dng_dir):
        install(monkeypatch, fake_images(dng_dir),
                {"Image Orientation": FakeTag([1])})
        with pytest.raises(AttributeError):
            burst_mod.load_dng_burst(dng_dir)

    def test_iso_clipped_to_100_3200(self, monkeypatch, dng_dir):
        tags = dict(BASE_TAGS)
        tags["EXIF ISOSpeedRatings"] = FakeTag(12800)
        install(monkeypatch, fake_images(dng_dir), tags)
        assert burst_mod.load_dng_burst(dng_dir).iso == 3200
        tags["EXIF ISOSpeedRatings"] = FakeTag(50)
        install(monkeypatch, fake_images(dng_dir), tags)
        assert burst_mod.load_dng_burst(dng_dir).iso == 100


class TestExifBranches:
    def test_orientation_missing_warns(self, monkeypatch, dng_dir):
        install(monkeypatch, fake_images(dng_dir),
                {"EXIF ISOSpeedRatings": FakeTag(100)})
        with pytest.warns(UserWarning, match="[Oo]rientation"):
            b = burst_mod.load_dng_burst(dng_dir)
        assert b.orientation == 1

    def test_orientation_read(self, monkeypatch, dng_dir):
        tags = dict(BASE_TAGS)
        tags["Image Orientation"] = FakeTag([6])
        install(monkeypatch, fake_images(dng_dir), tags)
        assert burst_mod.load_dng_burst(dng_dir).orientation == 6

    def test_noise_profile_bayer_averages_channels(self, monkeypatch, dng_dir):
        # 0xC761: (a_R, b_R, a_G, b_G, a_B, b_B) -> channel-averaged
        tags = dict(BASE_TAGS)
        prof = [FakeRatio(12, 10), FakeRatio(3, 10),
                FakeRatio(18, 10), FakeRatio(6, 10),
                FakeRatio(24, 10), FakeRatio(9, 10)]
        tags["Image Tag 0xC761"] = FakeTag(prof)
        install(monkeypatch, fake_images(dng_dir), tags)
        b = burst_mod.load_dng_burst(dng_dir)
        # numerators only: vals[::2] indexes x[0] (the reference's math,
        # utils_dng.py:104-111)
        assert b.noise_alpha == pytest.approx((12 + 18 + 24) / 3)
        assert b.noise_beta == pytest.approx((3 + 6 + 9) / 3)

    def test_noise_profile_grey_first_entry(self, monkeypatch, dng_dir):
        tags = dict(BASE_TAGS)
        tags["Image Tag 0xC761"] = FakeTag([FakeRatio(7), FakeRatio(2)])
        install(monkeypatch, fake_images(dng_dir), tags)
        b = burst_mod.load_dng_burst(dng_dir, mode="grey")
        assert b.noise_alpha == pytest.approx(7.0)
        assert b.noise_beta == pytest.approx(2.0)

    def test_noise_profile_absent_is_none(self, monkeypatch, dng_dir):
        install(monkeypatch, fake_images(dng_dir), dict(BASE_TAGS))
        b = burst_mod.load_dng_burst(dng_dir)
        assert b.noise_alpha is None and b.noise_beta is None

    def test_xyz2cam_from_colormatrix1(self, monkeypatch, dng_dir):
        tags = dict(BASE_TAGS)
        mat = [FakeRatio(i + 1, 2) for i in range(9)]
        tags["Image Tag 0xC621"] = FakeTag(mat)
        install(monkeypatch, fake_images(dng_dir), tags)
        b = burst_mod.load_dng_burst(dng_dir)
        want = (np.arange(1, 10) / 2.0).reshape(3, 3)
        np.testing.assert_allclose(b.xyz2cam, want)


class TestRawHandling:
    def test_cfa_greens_unified(self, monkeypatch, dng_dir):
        install(monkeypatch, fake_images(dng_dir), dict(BASE_TAGS))
        b = burst_mod.load_dng_burst(dng_dir)
        np.testing.assert_array_equal(b.cfa, [[0, 1], [1, 2]])

    def test_float_input_warns_and_skips_normalization(self, monkeypatch,
                                                       dng_dir):
        imgs = fake_images(dng_dir, dtype=np.float32)
        install(monkeypatch, imgs, dict(BASE_TAGS))
        with pytest.warns(UserWarning, match="integer"):
            b = burst_mod.load_dng_burst(dng_dir)
        np.testing.assert_array_equal(
            b.ref_raw, imgs[str(sorted(dng_dir.glob("*.dng"))[0])])

    def test_normalization_black_white_wb(self, monkeypatch, dng_dir):
        imgs = fake_images(dng_dir)
        black, white = (64, 80, 96, 64), 1023
        wb = (2.0, 1.0, 1.5, 1.0)
        install(monkeypatch, imgs, dict(BASE_TAGS),
                black=black, wb=wb, white_level=white)
        b = burst_mod.load_dng_burst(dng_dir)
        ref = imgs[str(dng_dir / "a.dng")].astype(np.float32)
        want = np.empty_like(ref)
        cfa = np.array([[0, 1], [1, 2]])     # greens unified
        for i in range(2):
            for j in range(2):
                c = cfa[i, j]
                want[i::2, j::2] = ((ref[i::2, j::2] - black[c]) /
                                    (white - black[c]) * wb[c] / wb[1])
        np.testing.assert_allclose(b.ref_raw, want, rtol=1e-6)

    def test_ref_is_first_sorted_file(self, monkeypatch, dng_dir):
        imgs = fake_images(dng_dir)
        install(monkeypatch, imgs, dict(BASE_TAGS))
        b = burst_mod.load_dng_burst(dng_dir)
        assert b.ref_path.endswith("a.dng")
        assert b.comp_raws.shape[0] == 1

    def test_missing_libs_error_message(self, monkeypatch, dng_dir):
        monkeypatch.setattr(burst_mod, "HAS_RAWPY", False)
        with pytest.raises(ImportError, match="npz"):
            burst_mod.load_dng_burst(dng_dir)
