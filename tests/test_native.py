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


def test_mark_covered_frame_matches_definitional_replay(rng):
    """Native/fallback deferred coverage == per-layer replay of the
    definitional rule: a point is hidden by every LATER-pasted layer whose
    support contains its rounded, in-bounds pixel. Includes half-integer
    coords (banker's rounding) and out-of-bounds points."""
    H, W, N = 20, 24, 400
    trajs = (rng.rand(N, 2) * [W + 8, H + 8] - 4).astype(np.float32)
    trajs[:32, 0] = np.arange(32) - 4 + 0.5   # exact .5 -> round-half-even
    trajs[:32, 1] = np.arange(32) % (H + 2)
    birth = rng.randint(0, 4, N).astype(np.int32)
    layers = [(rng.rand(H, W) < 0.15) for _ in range(1, 4)]  # layers 1..3
    painter = np.zeros((H, W), np.uint8)
    for k, m in enumerate(layers, start=1):
        painter[m] = k

    vis = np.ones(N, np.float32)
    native.mark_covered_frame(painter, trajs, birth, vis.copy())  # smoke
    got = np.ones(N, np.float32)
    native.mark_covered_frame(painter, trajs, birth, got)

    want = np.ones(N, np.float32)
    xy = trajs.round().astype(np.int64)
    for n in range(N):
        x, y = xy[n]
        if not (0 <= x < W and 0 <= y < H):
            continue
        # topmost layer at the pixel decides (later paints overwrite)
        top = 0
        for k, m in enumerate(layers, start=1):
            if m[y, x]:
                top = k
        if top > birth[n]:
            want[n] = 0
    np.testing.assert_array_equal(got, want)


def test_visibility_frame_matches_numpy_definition(rng):
    """Native/fallback fused visibility pass == the definitional numpy
    expression, on edge coords (exactly 0, W-1, W-0.5, negatives)."""
    H, W, N = 16, 20, 300
    trajs = (rng.rand(N, 2) * [W + 6, H + 6] - 3).astype(np.float32)
    edge = np.array([[0, 0], [W - 1, H - 1], [W - 0.5, 2], [-0.5, 3],
                     [W - 1.5, H - 0.5], [0.49, -0.49]], np.float32)
    trajs[:len(edge)] = edge
    occ = np.zeros((H, W), np.float32)
    occ[:, :4] = 255.0
    occ[5:9, 10:15] = 255.0
    vis0 = (rng.rand(N) > 0.2).astype(np.float32)

    got_vis = vis0.copy()
    got_inb = np.empty(N, np.uint8)
    native.visibility_frame(trajs, occ, got_vis, got_inb)

    x, y = trajs[:, 0], trajs[:, 1]
    xy = trajs.round().astype(np.int32)
    xcl, ycl = xy[:, 0].clip(0, W - 1), xy[:, 1].clip(0, H - 1)
    inb_r = ((xy[:, 0] >= 0) & (xy[:, 0] <= W - 1)
             & (xy[:, 1] >= 0) & (xy[:, 1] <= H - 1))
    inb_f = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    want_vis = vis0.copy()
    want_vis[((occ[ycl, xcl] == 255) & inb_r) | ~inb_f] = 0
    np.testing.assert_array_equal(got_vis, want_vis)
    np.testing.assert_array_equal(got_inb.astype(bool), inb_f)
