"""Native burst loader: C++ path vs NumPy reference semantics."""

import numpy as np

from hmsr_tpu.io import native_loader as nl

CFA = np.array([[0, 1], [1, 2]])


def reference_normalize(frames, cfa, black, white, wb):
    out = np.empty(frames.shape, np.float32)
    for i in range(2):
        for j in range(2):
            c = int(cfa[i, j])
            k = wb[c] / wb[1]
            out[:, i::2, j::2] = (frames[:, i::2, j::2].astype(np.float32)
                                  - black[c]) / (white - black[c]) * k
    return out


def test_native_builds():
    assert nl.have_native(), "native loader failed to build (g++ missing?)"


def test_normalize_matches_reference():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 1024, size=(3, 32, 40)).astype(np.uint16)
    black = [64.0, 60.0, 62.0]
    white = 1023
    wb = [2.0, 1.0, 1.5]
    got = nl.normalize_burst(frames, CFA, black, white, wb)
    want = reference_normalize(frames, CFA, np.array(black), white, np.array(wb))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_unpack_raw10():
    rng = np.random.RandomState(1)
    pixels = rng.randint(0, 1024, size=64).astype(np.uint16)
    packed = np.zeros(64 // 4 * 5, np.uint8)
    for g in range(16):
        p = pixels[g * 4:(g + 1) * 4]
        packed[g * 5:g * 5 + 4] = (p >> 2).astype(np.uint8)
        packed[g * 5 + 4] = ((p[0] & 3) | ((p[1] & 3) << 2) |
                             ((p[2] & 3) << 4) | ((p[3] & 3) << 6))
    out = nl.unpack_raw10(packed, 64)
    np.testing.assert_array_equal(out, pixels)


def test_unpack_raw12():
    rng = np.random.RandomState(2)
    pixels = rng.randint(0, 4096, size=32).astype(np.uint16)
    packed = np.zeros(32 // 2 * 3, np.uint8)
    for g in range(16):
        p = pixels[g * 2:(g + 1) * 2]
        packed[g * 3] = (p[0] >> 4).astype(np.uint8)
        packed[g * 3 + 1] = (p[1] >> 4).astype(np.uint8)
        packed[g * 3 + 2] = ((p[0] & 0xF) | ((p[1] & 0xF) << 4)).astype(np.uint8)
    out = nl.unpack_raw12(packed, 32)
    np.testing.assert_array_equal(out, pixels)


def test_numpy_fallback_matches_native():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 4096, size=(2, 16, 16)).astype(np.uint16)
    native = nl.normalize_burst(frames, CFA, [0, 0, 0], 4095, [1.9, 1.0, 1.4])
    saved = nl._lib
    try:
        nl._lib = None
        fallback = nl.normalize_burst(frames, CFA, [0, 0, 0], 4095,
                                      [1.9, 1.0, 1.4])
    finally:
        nl._lib = saved
    np.testing.assert_allclose(native, fallback, rtol=1e-6)
