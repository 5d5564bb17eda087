"""Full dataset-generation round trip: raw FlyingThings tree -> datagen
drivers -> trajs_ad/occluders_al -> FlyingThingsDataset loads them."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from tests_treeutil import _write_pfm  # noqa: E402


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """Raw inputs only: webp frames, pfm object-index masks, pfm flows.
    One translating convex object (id 1) on static background (id 0)."""
    root = tmp_path_factory.mktemp("flt_raw")
    rng = np.random.RandomState(0)
    H, W, n_frames = 96, 128, 10
    vx, vy = 2.0, 1.0
    box = (10, 10, 60, 60)

    base = ["frames_cleanpass_webp", "object_index", "optical_flow"]
    folder = "0000000"
    rgb_dir = root / base[0] / "TRAIN/A" / folder / "left"
    mask_dir = root / base[1] / "TRAIN/A" / folder / "left"
    ff_dir = root / base[2] / "TRAIN/A" / folder / "into_future/left"
    fb_dir = root / base[2] / "TRAIN/A" / folder / "into_past/left"
    for d in (rgb_dir, mask_dir, ff_dir, fb_dir):
        d.mkdir(parents=True)

    def mask_at(s):
        m = np.zeros((H, W), np.float32)
        x0, y0, x1, y1 = box
        ox, oy = int(vx * s), int(vy * s)
        m[y0 + oy:y1 + oy, x0 + ox:x1 + ox] = 1.0
        return m

    def write_flow_pfm(path, flow):
        # flows are 3-channel PF files in FlyingThings (u, v, unused)
        h, w = flow.shape[:2]
        data = np.concatenate([flow, np.zeros((h, w, 1), np.float32)], -1)
        with open(path, "wb") as f:
            f.write(b"PF\n" + f"{w} {h}\n".encode() + b"-1.0\n")
            f.write(np.flipud(data).astype("<f4").tobytes())

    for fr in range(n_frames):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(rgb_dir / f"{fr:04d}.webp", lossless=True)
        _write_pfm(str(mask_dir / f"{fr:04d}.pfm"), mask_at(fr))

        ff = np.zeros((H, W, 2), np.float32)
        ff[mask_at(fr) > 0] = [vx, vy]
        write_flow_pfm(str(ff_dir / f"OpticalFlowIntoFuture_{fr:04d}_L.pfm"), ff)
        fb = np.zeros((H, W, 2), np.float32)
        if fr > 0:
            fb[mask_at(fr) > 0] = [-vx, -vy]
        write_flow_pfm(str(fb_dir / f"OpticalFlowIntoPast_{fr:04d}_L.pfm"), fb)
    return str(root)


def test_datagen_to_loader_roundtrip(raw_tree):
    from pips_tpu.data.flyingthings import FlyingThingsDataset
    from pips_tpu.datagen.run import main as datagen_main

    datagen_main(what="trajs", flt3d_path=raw_tree, dsets=("TRAIN",),
                 subsets=("A",), starts=(0,))
    datagen_main(what="occluders", flt3d_path=raw_tree, dsets=("TRAIN",),
                 subsets=("A",), starts=(0,))

    import os
    traj_f = os.path.join(raw_tree, "trajs_ad/TRAIN/A/0000000/left/trajs_at_0.npz")
    occ_f = os.path.join(raw_tree, "occluders_al/TRAIN/A/0000000/left/occluder_at_0.npy")
    assert os.path.isfile(traj_f) and os.path.isfile(occ_f)
    trajs = dict(np.load(traj_f, allow_pickle=True))["trajs"]
    assert trajs is not None and trajs.shape[0] == 8 and trajs.shape[1] >= 256
    occ = np.load(occ_f, allow_pickle=True).item()
    assert "1" in occ  # the convex moving object was extracted

    ds = FlyingThingsDataset(raw_tree, dset="TRAIN", subset="A", N=16, S=8,
                             crop_size=(64, 96), use_augs=False)
    assert len(ds) == 1
    sample, gotit = ds[0]
    assert gotit
    assert sample["trajs"].shape == (8, 16, 2)
    # generated trajectories moved with the flow: object points translate
    deltas = np.linalg.norm(sample["trajs"][-1] - sample["trajs"][0], axis=-1)
    assert np.isfinite(deltas).all()
