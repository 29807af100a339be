"""Config system tests: defaults, merge, dotted update, SNR resolution, sanitize."""

import pytest

from hmsr_tpu.configs import (
    default_config, merge, update, sanitize_config, update_snr_config, lerp,
)


def test_defaults_shape():
    c = default_config()
    assert c.scale == 1
    assert c.mode == "bayer"
    assert c.block_matching.tuning.factors == [1, 2, 4, 4]
    assert c.block_matching.tuning.tile_size == "SNR_based"
    assert c.merging.kernel == "steerable"


def test_merge_and_update():
    c = default_config()
    c2 = merge(c, {"scale": 2, "ica": {"tuning": {"n_iter": 5}}})
    assert c2.scale == 2
    assert c2.ica.tuning.n_iter == 5
    assert c2.ica.tuning.sigma_blur == 0          # untouched sibling survives
    assert c.scale == 1                            # base not mutated
    update(c2, "robustness.tuning.t", 0.2)
    assert c2.robustness.tuning.t == 0.2


@pytest.mark.parametrize("snr,ts", [(10, 64), (20, 32), (28, 16), (100, 16)])
def test_snr_tile_size(snr, ts):
    c = default_config()
    update_snr_config(c, snr)
    assert c.block_matching.tuning.tile_size == ts
    assert c.block_matching.tuning.tile_sizes == [ts, ts, ts, ts // 2]


def test_snr_lerp_endpoints():
    c = default_config()
    update_snr_config(c, 6)
    assert c.merging.tuning.k_detail == pytest.approx(0.33)
    assert c.merging.tuning.k_denoise == pytest.approx(5.0)
    c = default_config()
    update_snr_config(c, 30)
    assert c.merging.tuning.D_th == pytest.approx(0.71)
    assert c.merging.tuning.D_tr == pytest.approx(1.0)


def test_lerp_clamps():
    assert lerp(0, [6, 30], [1.0, 2.0]) == 1.0
    assert lerp(100, [6, 30], [1.0, 2.0]) == 2.0
    assert lerp(18, [6, 30], [1.0, 2.0]) == pytest.approx(1.5)


def test_sanitize_passes_on_valid():
    c = default_config()
    update_snr_config(c, 25)
    sanitize_config(c, (256, 256))


def test_sanitize_rejects_denoiser_without_robustness():
    c = default_config()
    update_snr_config(c, 25)
    c.robustness.enabled = False
    c.robustness.save_mask = False
    c.accumulated_robustness_denoiser.gauss.enabled = True
    with pytest.raises(ValueError):
        sanitize_config(c, (256, 256))


def test_sanitize_rejects_tiny_image():
    c = default_config()
    update_snr_config(c, 10)   # Ts = 64, coarsest level /32 with tile 32
    with pytest.raises(ValueError):
        sanitize_config(c, (64, 64))
