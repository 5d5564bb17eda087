"""Native host library: build, then verify against numpy/reference behavior."""

import numpy as np
import pytest

from pips_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.ensure_built():
        pytest.skip("no C++ toolchain available")


def _write_pfm_bytes(data: np.ndarray, little_endian=True) -> bytes:
    h, w = data.shape[:2]
    color = data.ndim == 3
    header = (b"PF\n" if color else b"Pf\n") + f"{w} {h}\n".encode()
    header += (b"-1.0\n" if little_endian else b"1.0\n")
    payload = np.flipud(data).astype("<f4" if little_endian else ">f4").tobytes()
    return header + payload


def test_decode_pfm_roundtrip(rng):
    img = rng.randn(7, 9).astype(np.float32)
    out = native.decode_pfm(_write_pfm_bytes(img))
    np.testing.assert_allclose(out, img, rtol=1e-6)
    # big endian + 3 channel
    img3 = rng.randn(5, 4, 3).astype(np.float32)
    out3 = native.decode_pfm(_write_pfm_bytes(img3, little_endian=False))
    np.testing.assert_allclose(out3, img3, rtol=1e-6)


def test_decode_pfm_matches_python_reader(tmp_path, rng):
    from pips_tpu.data.pfm import read_pfm
    img = rng.randn(6, 8).astype(np.float32)
    p = tmp_path / "x.pfm"
    p.write_bytes(_write_pfm_bytes(img))
    np.testing.assert_allclose(native.decode_pfm(p.read_bytes()),
                               read_pfm(str(p)), rtol=1e-6)


def test_composite_matches_numpy(rng):
    rgb = rng.rand(2, 8, 10, 3).astype(np.float32)
    alt = rng.rand(2, 8, 10, 3).astype(np.float32)
    mask = rng.rand(2, 8, 10).astype(np.float32)
    want = rgb * (1 - mask[..., None]) + alt * mask[..., None]
    got = native.composite(rgb.copy(), alt, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = rng.rand(12, 16, 3).astype(np.float32)
    got = native.resize_bilinear(src, (7, 9))
    want = cv2.resize(src, (9, 7), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chain_step_matches_numpy(rng):
    H, W, N = 10, 12, 50
    flow = rng.randn(H, W, 2).astype(np.float32)
    coords = (rng.rand(N, 2) * [W + 4, H + 4] - 2).astype(np.float32)
    want = coords.copy()
    xi = np.clip(np.round(want[:, 0]).astype(int), 0, W - 1)
    yi = np.clip(np.round(want[:, 1]).astype(int), 0, H - 1)
    want += flow[yi, xi]
    got = native.chain_step(flow, coords.copy())
    np.testing.assert_allclose(got, want, rtol=1e-6)
