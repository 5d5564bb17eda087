"""FlyingThings++ loader end-to-end against a synthetic on-disk tree."""

import os

import numpy as np
import pytest

from pips_tpu.data.flyingthings import FlyingThingsDataset

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_pfm(path, data):
    h, w = data.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n" + f"{w} {h}\n".encode() + b"-1.0\n")
        f.write(np.flipud(data).astype("<f4").tobytes())


@pytest.fixture(scope="module")
def fake_flt(tmp_path_factory):
    """A minimal FlyingThings++ tree: 1 video, 10 frames, trajs + occluders."""
    root = tmp_path_factory.mktemp("flt")
    rng = np.random.RandomState(0)
    H, W, S_load, n_frames = 120, 160, 8, 10

    for sub, folder in [("A", "0000000"), ("A", "0000001")]:
        rgb_dir = root / "frames_cleanpass_webp" / "TRAIN" / sub / folder / "left"
        mask_dir = root / "object_index" / "TRAIN" / sub / folder / "left"
        traj_dir = root / "trajs_ad" / "TRAIN" / sub / folder / "left"
        occ_dir = root / "occluders_al" / "TRAIN" / sub / folder / "left"
        for d in (rgb_dir, mask_dir, traj_dir, occ_dir):
            d.mkdir(parents=True, exist_ok=True)

        for fr in range(n_frames):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(rgb_dir / f"{fr:04d}.webp", lossless=True)
            mask = np.zeros((H, W), np.float32)
            mask[20:60, 30:90] = 1.0  # a convex object with id 1
            _write_pfm(str(mask_dir / f"{fr:04d}.pfm"), mask)

        # trajectories: static points scattered in bounds
        N_raw = 300
        pts = rng.rand(N_raw, 2) * [W - 2, H - 2]
        trajs = np.tile(pts[None], (S_load, 1, 1)).astype(np.float16)
        for k in range(3):  # upstream make_trajs writes starts 0..2
            np.savez(traj_dir / f"trajs_at_{k}.npz", trajs=trajs)

        occ_trajs = np.tile((rng.rand(40, 2) * [50, 30] + [30, 20])[None],
                            (S_load, 1, 1)).astype(np.float16)
        for k in range(3):
            np.save(occ_dir / f"occluder_at_{k}.npy", {"1": occ_trajs},
                    allow_pickle=True)
    return str(root)


def test_index_scan(fake_flt):
    ds = FlyingThingsDataset(fake_flt, dset="TRAIN", subset="all", N=16,
                             S=8, crop_size=(96, 128))
    assert len(ds) == 6  # 2 folders x 3 start inds
    assert len(ds.occluders) == 6


def test_getitem_no_augs(fake_flt):
    ds = FlyingThingsDataset(fake_flt, dset="TRAIN", subset="A", N=16,
                             S=8, crop_size=(96, 128), use_augs=False)
    sample, gotit = ds[0]
    assert gotit
    assert sample["rgbs"].shape == (8, 96, 128, 3)
    assert sample["trajs"].shape == (8, 16, 2)
    assert sample["visibles"].shape == (8, 16)
    assert sample["valids"][0].sum() == 16  # frame-0 all valid after padding
    # sampled trajectories stay inside the crop at frame 0 (twice-vis filter)
    assert (sample["trajs"][0, :, 0] >= 0).all()
    assert (sample["trajs"][0, :, 0] <= 127).all()


def test_getitem_with_augs(fake_flt):
    ds = FlyingThingsDataset(fake_flt, dset="TRAIN", subset="A", N=8,
                             S=8, crop_size=(96, 128), use_augs=True)
    got_any = False
    for idx in range(4):
        sample, gotit = ds[idx]
        if gotit:
            got_any = True
            assert sample["rgbs"].shape == (8, 96, 128, 3)
            assert np.isfinite(sample["trajs"]).all()
    assert got_any


def test_shorter_S_subsample(fake_flt):
    ds = FlyingThingsDataset(fake_flt, dset="TRAIN", subset="A", N=8,
                             S_load=8, S=4, crop_size=(96, 128))
    sample, gotit = ds[0]
    assert gotit
    assert sample["rgbs"].shape == (4, 96, 128, 3)


def test_failure_returns_fake_sample(fake_flt):
    ds = FlyingThingsDataset(fake_flt, dset="TRAIN", subset="A", N=5000,
                             S=8, crop_size=(96, 128))
    sample, gotit = ds[0]
    assert not gotit
    assert sample["rgbs"].shape == (8, 96, 128, 3)
    assert sample["valids"].sum() == 0


def test_visibility_filter_matches_reference_loop():
    """Oracle: literal per-frame transcription of the padding/oob/twice-vis
    bookkeeping (reference flyingthingsdataset.py:314-432) vs the vectorized
    visibility_filter, on random inputs with exact-boundary edge cases."""
    from pips_tpu.data.flyingthings import visibility_filter

    def oracle(trajs, visibles, valids, occs, crop_size,
               force_twice_vis, force_last_vis, force_all_inb):
        trajs, visibles, valids = trajs.copy(), visibles.copy(), valids.copy()
        S = len(occs)
        H, W = crop_size
        for s in range(S):
            xy = trajs[s].round().astype(np.int32)
            x, y = xy[:, 0], xy[:, 1]
            xc, yc = x.clip(0, W - 1), y.clip(0, H - 1)
            padded = ((occs[s][yc, xc] == 255) & (x >= 0) & (x <= W - 1)
                      & (y >= 0) & (y <= H - 1))
            visibles[s, padded] = 0
            oob = (trajs[s, :, 0] < 0) | (trajs[s, :, 0] > W - 1) \
                | (trajs[s, :, 1] < 0) | (trajs[s, :, 1] > H - 1)
            visibles[s, oob] = 0

        def inb(s):
            return ((trajs[s, :, 0] >= 0) & (trajs[s, :, 0] <= W - 1)
                    & (trajs[s, :, 1] >= 0) & (trajs[s, :, 1] <= H - 1))

        if force_twice_vis:
            vis0, inb0 = visibles[0] > 0, inb(0)
            vis_other, inb_other = visibles[1] > 0, inb(1)
            for s in range(2, S):
                vis_other |= visibles[s] > 0
                inb_other |= inb(s)
            keep = (inb0 & inb_other) & (vis0 & vis_other)
            trajs, visibles, valids = trajs[:, keep], visibles[:, keep], valids[:, keep]
        if force_last_vis:
            keep = (visibles[-1] > 0) & inb(S - 1)
            trajs, visibles, valids = trajs[:, keep], visibles[:, keep], valids[:, keep]
        if force_all_inb:
            keep = inb(0)
            for s in range(1, S):
                keep &= inb(s)
            trajs, visibles, valids = trajs[:, keep], visibles[:, keep], valids[:, keep]
        return trajs, visibles, valids

    rng = np.random.RandomState(9)
    S, N, H, W = 5, 400, 40, 56
    for flags in [(True, False, False), (False, True, False),
                  (False, False, True), (True, True, True),
                  (False, False, False)]:
        trajs = (rng.rand(S, N, 2) * [W + 20, H + 20] - 10).astype(np.float32)
        # exact-boundary cases: x == W-1 (in), x == -0.5 (rounds to 0, oob)
        trajs[0, :4] = [[W - 1, H - 1], [-0.5, 5], [W - 0.6, 5], [0, 0]]
        occs = [np.where(rng.rand(H, W) < 0.3, 255.0, 0.0).astype(np.float32)
                for _ in range(S)]
        visibles = (rng.rand(S, N) > 0.2).astype(np.float32)
        valids = np.ones((S, N), np.float32)
        got = visibility_filter(trajs, visibles, valids, occs, (H, W),
                                force_twice_vis=flags[0],
                                force_last_vis=flags[1],
                                force_all_inb=flags[2])
        want = oracle(trajs, visibles, valids, occs, (H, W), *flags)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
