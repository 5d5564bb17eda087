"""BADJA / CroHD dress rehearsal: emit a synthetic on-disk tree in the EXACT
benchmark format, then run the full eval runner against it from disk —
dataset -> chain -> PCK/ATE end-to-end (VERDICT r3 #6; mirrors
tools/make_synth_flt.py for FlyingThings).

Content is TRACKABLE (textured bodies moving smoothly over a textured
panning background), not noise: with a trained checkpoint the metrics are
meaningful; with --init_dir random the run still proves formats, coordinate
conventions, filters, and metric plumbing.

Formats reproduced:
  BADJA (reference ``badjadataset.py:286-338``):
    <root>/DAVIS/JPEGImages/Full-Resolution/<animal>/%05d.jpg
    <root>/DAVIS/Annotations/Full-Resolution/<animal>/%05d.png
    <root>/joint_annotations/<animal>.json  (joints in (y, x) order)
  CroHD (reference ``crohddataset.py:41-70``):
    <root>/HT21/train/<seq>/img1/%06d.jpg
    <root>/HT21Labels/train/<seq>/gt/gt.txt  (frame,id,x,y,w,h,conf,cls,vis)

    python tools/eval_dress_rehearsal.py --benchmark badja --root /tmp/badja_synth
    python tools/eval_dress_rehearsal.py --benchmark crohd --root /tmp/crohd_synth
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def _texture(rng, H, W, scale=8):
    import cv2

    small = rng.rand(max(H // scale, 2), max(W // scale, 2), 3).astype(np.float32)
    return cv2.resize(small, (W, H), interpolation=cv2.INTER_CUBIC).clip(0, 1)


def _save_jpg(path, img01):
    from PIL import Image

    Image.fromarray((img01 * 255).clip(0, 255).astype(np.uint8)).save(path)


def make_badja_root(root: str, T: int = 20, H: int = 320, W: int = 512,
                    n_joints: int = 37, seed: int = 0) -> str:
    # n_joints=37: the SMAL joint array length; BadjaDataset indexes its
    # 20 ANNOTATED_CLASSES (up to index 36) out of it (data/badja.py:16)
    """Textured 'animal' body translating sinusoidally over a panning
    background; joints ride fixed offsets inside the body; seg follows it."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    animal = "bear"
    img_dir = os.path.join(root, "DAVIS/JPEGImages/Full-Resolution", animal)
    seg_dir = os.path.join(root, "DAVIS/Annotations/Full-Resolution", animal)
    ann_dir = os.path.join(root, "joint_annotations")
    for d in (img_dir, seg_dir, ann_dir):
        os.makedirs(d, exist_ok=True)

    bg = _texture(rng, H + 40, W + 40)
    bh, bw = H // 3, W // 3
    body = _texture(rng, bh, bw, scale=4)
    # joint offsets inside the body (margin 4px so they stay on-body)
    off = np.stack([rng.randint(4, bh - 4, n_joints),
                    rng.randint(4, bw - 4, n_joints)], 1)  # (n, 2) yx

    ann = []
    for t in range(T):
        # smooth body path + slow background pan
        cy = int(H * 0.3 + (H * 0.25) * np.sin(2 * np.pi * t / T))
        cx = int(W * 0.1 + (W * 0.55) * t / max(T - 1, 1))
        py, px = int(6 * np.sin(2 * np.pi * t / T)) + 20, (t * 2) % 40
        frame = bg[py:py + H, px:px + W].copy()
        frame[cy:cy + bh, cx:cx + bw] = body
        _save_jpg(os.path.join(img_dir, f"{t:05d}.jpg"), frame)

        seg = np.zeros((H, W), np.uint8)
        seg[cy:cy + bh, cx:cx + bw] = 255
        Image.fromarray(seg).save(os.path.join(seg_dir, f"{t:05d}.png"))

        joints_yx = off + [cy, cx]  # (n, 2) in (y, x) like real BADJA
        ann.append({
            "image_path": f"DAVIS/JPEGImages/Full-Resolution/{animal}/{t:05d}.jpg",
            "segmentation_path":
                f"DAVIS/Annotations/Full-Resolution/{animal}/{t:05d}.png",
            "joints": joints_yx.astype(float).tolist(),
            "visibility": [1] * n_joints,
        })
    with open(os.path.join(ann_dir, f"{animal}.json"), "w") as f:
        json.dump(ann, f)
    return root


def make_crohd_root(root: str, n_frames: int = 26, H: int = 512, W: int = 768,
                    n_heads: int = 8, head: int = 16, seed: int = 0) -> str:
    """Textured 'heads' moving linearly >150px across the clip (passes the
    prep_sample motion filter); one occluder bar sweeps through and zeroes
    the gt vis flag of covered heads (exercises req_occlusion=True)."""
    rng = np.random.RandomState(seed)
    seq = "HT21-01"
    img_dir = os.path.join(root, "HT21/train", seq, "img1")
    gt_dir = os.path.join(root, "HT21Labels/train", seq, "gt")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    bg = _texture(rng, H, W)
    heads = [_texture(rng, head, head, scale=4) for _ in range(n_heads)]
    # start left, move right; speed sized so the 150px motion filter passes
    # even on the stride-3-subsampled window (21 of n_frames-1 frames)
    y0 = rng.randint(head, H - 2 * head, n_heads)
    x0 = rng.randint(head, W // 4, n_heads)
    vx = 150.0 / (n_frames - 1) * (1.7 + 0.5 * rng.rand(n_heads))
    vy = rng.uniform(-1.5, 1.5, n_heads)

    occ_w = 60
    rows = []
    for t in range(n_frames):
        frame = bg.copy()
        # occluder sweeps right-to-left AGAINST the heads so they cross it
        occ_x = int(W * 0.85 - t * (W * 0.55) / n_frames)
        for i in range(n_heads):
            x = int(x0[i] + vx[i] * t)
            y = int(np.clip(y0[i] + vy[i] * t, 0, H - head))
            covered = (i % 2 == 0) and occ_x <= x <= occ_x + occ_w
            if not covered:
                frame[y:y + head, x:x + head] = heads[i]
            # gt.txt box: top-left x,y,w,h; conf, class, visibility-flag
            rows.append(f"{t + 1},{i + 1},{x},{y},{head},{head},1,1,"
                        f"{0 if covered else 1}")
        frame[:, occ_x:occ_x + occ_w] = 0.2  # the occluder bar itself
        _save_jpg(os.path.join(img_dir, f"{t + 1:06d}.jpg"), frame)
    with open(os.path.join(gt_dir, "gt.txt"), "w") as f:
        f.write("\n".join(rows))
    # the loader expects all four train sequences to exist
    for other in ("HT21-02", "HT21-03", "HT21-04"):
        od = os.path.join(root, "HT21/train", other, "img1")
        og = os.path.join(root, "HT21Labels/train", other, "gt")
        os.makedirs(od, exist_ok=True)
        os.makedirs(og, exist_ok=True)
        _save_jpg(os.path.join(od, "000001.jpg"), bg)
        _save_jpg(os.path.join(od, "000002.jpg"), bg)
        with open(os.path.join(og, "gt.txt"), "w") as f:
            f.write("1,1,10,10,4,4,1,1,1\n2,1,10,10,4,4,1,1,1")
    return root


def main(benchmark: str = "badja", root: str = "", init_dir: str = "random",
         modeltype: str = "pips", iters: int = 2, stride: int = 8,
         seed: int = 0, keep: bool = False):
    root = root or f"/tmp/{benchmark}_synth"
    if benchmark == "badja":
        make_badja_root(root, seed=seed)
        print(f"badja tree at {root}")
        from pips_tpu.evals import run_badja

        out = run_badja.main(init_dir=init_dir, data_dir=root, stride=stride,
                             iters=iters, max_iters=1, modeltype=modeltype)
    elif benchmark == "crohd":
        make_crohd_root(root, seed=seed)
        print(f"crohd tree at {root}")
        from pips_tpu.evals import run_crohd

        out = run_crohd.main(init_dir=init_dir, dataset_root=root,
                             stride=stride, iters=iters, N=8,
                             req_occlusion=True, modeltype=modeltype)
    else:
        raise ValueError(f"unknown benchmark {benchmark!r}")
    if not keep:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    print("dress rehearsal ok:", out)
    return out


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli

    auto_cli(main)
