"""Builders for synthetic on-disk dataset trees (shared across tests)."""

import json

import numpy as np
from PIL import Image


def _write_pfm(path, data):
    h, w = data.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n" + f"{w} {h}\n".encode() + b"-1.0\n")
        f.write(np.flipud(data).astype("<f4").tobytes())


def make_flyingthings_tree(root, dset="TRAIN", H=120, W=160, S_load=8,
                           n_frames=10, n_traj=300, seed=0) -> str:
    rng = np.random.RandomState(seed)
    for sub, folder in [("A", "0000000"), ("A", "0000001")]:
        rgb_dir = root / "frames_cleanpass_webp" / dset / sub / folder / "left"
        mask_dir = root / "object_index" / dset / sub / folder / "left"
        traj_dir = root / "trajs_ad" / dset / sub / folder / "left"
        occ_dir = root / "occluders_al" / dset / sub / folder / "left"
        for d in (rgb_dir, mask_dir, traj_dir, occ_dir):
            d.mkdir(parents=True, exist_ok=True)
        for fr in range(n_frames):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(rgb_dir / f"{fr:04d}.webp", lossless=True)
            mask = np.zeros((H, W), np.float32)
            mask[20:60, 30:90] = 1.0
            _write_pfm(str(mask_dir / f"{fr:04d}.pfm"), mask)
        pts = rng.rand(n_traj, 2) * [W - 2, H - 2]
        trajs = np.tile(pts[None], (S_load, 1, 1)).astype(np.float16)
        for k in range(3):
            np.savez(traj_dir / f"trajs_at_{k}.npz", trajs=trajs)
        occ = np.tile((rng.rand(40, 2) * [50, 30] + [30, 20])[None],
                      (S_load, 1, 1)).astype(np.float16)
        for k in range(3):
            np.save(occ_dir / f"occluder_at_{k}.npy", {"1": occ}, allow_pickle=True)
    return str(root)


def make_badja_tree(root, T=4, H=60, W=80, seed=0) -> str:
    rng = np.random.RandomState(seed)
    (root / "joint_annotations").mkdir()
    animal = "bear"
    img_dir = root / "DAVIS/JPEGImages/Full-Resolution" / animal
    seg_dir = root / "DAVIS/Annotations/Full-Resolution" / animal
    img_dir.mkdir(parents=True)
    seg_dir.mkdir(parents=True)
    ann = []
    for fr in range(T):
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{fr:05d}.jpg")
        seg = np.zeros((H, W), np.uint8)
        seg[10:40, 20:60] = 255
        Image.fromarray(seg).save(seg_dir / f"{fr:05d}.png")
        ann.append({
            "image_path": f"DAVIS/JPEGImages/Full-Resolution/{animal}/{fr:05d}.jpg",
            "segmentation_path":
                f"DAVIS/Annotations/Full-Resolution/{animal}/{fr:05d}.png",
            "joints": (rng.rand(37, 2) * [H - 1, W - 1]).tolist(),  # (y, x)
            "visibility": np.ones(37, int).tolist(),
        })
    (root / "joint_annotations" / "bear.json").write_text(json.dumps(ann))
    return str(root)


def make_crohd_tree(root, n_frames=30, n_heads=4, seed=0, H=96, W=128) -> str:
    rng = np.random.RandomState(seed)
    for sub in ("HT21-01", "HT21-02", "HT21-03", "HT21-04"):
        img_dir = root / "HT21/train" / sub / "img1"
        gt_dir = root / "HT21Labels/train" / sub / "gt"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for fr in range(n_frames):
            Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
                img_dir / f"{fr + 1:06d}.jpg")
        rows = []
        for fr in range(n_frames):
            for hid in range(n_heads):
                x = 5 + hid * 8 + fr * (3 if hid == 0 else 0.2)
                y = 10.0 + hid
                rows.append(f"{fr + 1},{hid + 1},{x:.1f},{y:.1f},4,4,1,1,1")
        (gt_dir / "gt.txt").write_text("\n".join(rows))
    return str(root)


def make_davis_tree(root, n_videos=2, n_frames=8, seed=0) -> str:
    rng = np.random.RandomState(seed)
    for v in range(n_videos):
        vd = root / "JPEGImages/Full-Resolution" / f"video{v}"
        vd.mkdir(parents=True)
        for fr in range(n_frames):
            Image.fromarray((rng.rand(60, 104, 3) * 255).astype(np.uint8)).save(
                vd / f"{fr:05d}.jpg")
    return str(root)
