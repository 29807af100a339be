"""Device (jnp) finishing chain vs the host NumPy/scipy chain.

finishing/device.py claims numerics parity with raw2rgb.postprocess for
every step except cv2-Mertens fusion; these tests pin that claim.
"""

import numpy as np
import pytest

from hmsr_tpu.finishing.device import (gaussian_blur_nearest,
                                       make_postprocess_device)
from hmsr_tpu.finishing.raw2rgb import postprocess


def _img(seed=0, h=65, w=47):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3).astype(np.float32) * 1.2 - 0.1)


def test_gaussian_blur_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    img = _img(3)
    want = np.stack([scipy_ndimage.gaussian_filter(
        img[..., c], sigma=3, mode="nearest") for c in range(3)], -1)
    got = np.asarray(gaussian_blur_nearest(img, 3))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("cc,gamma,dv", [(False, True, False),
                                         (True, True, False),
                                         (False, False, True),
                                         (True, True, True)])
def test_default_chain_matches_host(cc, gamma, dv):
    img = _img(7)
    sharp = {"enabled": True, "radius": 3, "amount": 1.5}
    want = postprocess(img, do_color_correction=cc, do_tonemapping=False,
                       do_gamma=gamma, sharpening_config=sharp,
                       do_devignette=dv)
    fn = make_postprocess_device(do_color_correction=cc, do_tonemapping=False,
                                 do_gamma=gamma, sharpening_config=sharp,
                                 do_devignette=dv)
    got = np.asarray(fn(img))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_smoothstep_fallback_matches_host(monkeypatch):
    """do_tonemapping without cv2: both chains use the plain smoothstep."""
    import builtins
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("mocked out")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    img = _img(11)
    with pytest.warns(UserWarning):
        want = postprocess(img, do_color_correction=False,
                           do_tonemapping=True, do_gamma=True,
                           sharpening_config=None)
    fn = make_postprocess_device(do_color_correction=False,
                                 do_tonemapping=True, do_gamma=True,
                                 sharpening_config=None)
    got = np.asarray(fn(img))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_process_routes_device_finishing():
    """process_arrays with finishing_impl=device == finishing_impl=host
    (default chain: sharpening + gamma, no tonemapping)."""
    from hmsr_tpu.configs import default_config, merge as merge_config
    from hmsr_tpu.models.process import process_arrays

    rng = np.random.RandomState(5)
    frames = rng.rand(3, 32, 32).astype(np.float32) * 0.5 + 0.25
    base = {
        "scale": 1, "verbose": 0,
        "noise_model": {"alpha": 1.8e-4, "beta": 3.0e-6},
        "block_matching": {"tuning": {
            "factors": [1, 2], "tile_size_factors": [1, 1],
            "search_radii": [1, 4], "metrics": ["L1", "L2"],
            "tile_size": 16}},
        "postprocessing": {"enabled": True, "do_tonemapping": False},
    }
    outs = {}
    for impl in ("device", "host"):
        c = merge_config(default_config(), dict(base, tpu={"finishing_impl": impl}))
        outs[impl], _ = process_arrays(frames[0], frames[1:], c)
    np.testing.assert_allclose(outs["device"], outs["host"], atol=1e-5)
