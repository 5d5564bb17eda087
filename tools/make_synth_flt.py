"""Generate a synthetic RAW FlyingThings-style tree at configurable scale,
then run the repo's own datagen over it — the input side of the
data->train->eval loop through the REAL pipeline (VERDICT r2 #3).

The raw layout matches what `pips_tpu.datagen` and `FlyingThingsDataset`
expect from actual FlyingThings3D (reference ``make_trajs.py:47-204``):
  frames_cleanpass_webp/<DSET>/<SUB>/<video>/left/*.webp
  object_index/<DSET>/<SUB>/<video>/left/*.pfm
  optical_flow/<DSET>/<SUB>/<video>/into_{future,past}/left/*.pfm

Content: a panning textured background plus 4-7 translating textured
rectangles (convex -> pass the occluder-extraction hull check), with flows
exact by construction, so make_trajs' forward-chaining + fb-consistency
filtering and make_occlusions' extraction both behave as on real data.

    python tools/make_synth_flt.py --root /tmp/flt_synth --n_train 24 --n_test 8
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def _write_pfm(path, data):
    """Single- or 3-channel PFM, little-endian, bottom-up (FlyingThings)."""
    data = np.asarray(data, np.float32)
    c = 1 if data.ndim == 2 else data.shape[2]
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write((b"Pf\n" if c == 1 else b"PF\n") + f"{w} {h}\n".encode()
                + b"-1.0\n")
        f.write(np.flipud(data).astype("<f4").tobytes())


def _texture(rng, H, W):
    import cv2
    small = rng.rand(H // 8, W // 8, 3).astype(np.float32)
    big = cv2.resize(small, (W, H), interpolation=cv2.INTER_CUBIC)
    return np.clip(big * 255, 0, 255)


def make_video(root, dset, sub, vid, H=400, W=520, n_frames=10, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    folder = f"{vid:07d}"
    rgb_dir = os.path.join(root, "frames_cleanpass_webp", dset, sub, folder, "left")
    mask_dir = os.path.join(root, "object_index", dset, sub, folder, "left")
    ff_dir = os.path.join(root, "optical_flow", dset, sub, folder, "into_future/left")
    fb_dir = os.path.join(root, "optical_flow", dset, sub, folder, "into_past/left")
    for d in (rgb_dir, mask_dir, ff_dir, fb_dir):
        os.makedirs(d, exist_ok=True)

    bg = _texture(rng, H + 80, W + 80)
    bgv = rng.uniform(-1.5, 1.5, 2)  # camera pan, px/frame
    K = rng.randint(4, 8)
    objs = []
    for k in range(K):
        ow, oh = rng.randint(40, 140), rng.randint(40, 140)
        objs.append(dict(
            tex=_texture(rng, oh, ow),
            xy=np.array([rng.uniform(0, W - ow), rng.uniform(0, H - oh)]),
            v=rng.uniform(-4, 4, 2), wh=(ow, oh)))

    for fr in range(n_frames):
        img = np.empty((H, W, 3), np.float32)
        ox, oy = 40 + bgv[0] * fr, 40 + bgv[1] * fr
        ix, iy = int(round(ox)), int(round(oy))
        img[:] = bg[iy:iy + H, ix:ix + W]
        mask = np.zeros((H, W), np.float32)
        flow = np.tile(np.asarray([-bgv[0], -bgv[1]], np.float32), (H, W, 1))
        for k, o in enumerate(objs):
            x = int(round(o["xy"][0] + o["v"][0] * fr))
            y = int(round(o["xy"][1] + o["v"][1] * fr))
            ow, oh = o["wh"]
            x0, y0 = max(x, 0), max(y, 0)
            x1, y1 = min(x + ow, W), min(y + oh, H)
            if x1 <= x0 or y1 <= y0:
                continue
            img[y0:y1, x0:x1] = o["tex"][y0 - y:y1 - y, x0 - x:x1 - x]
            mask[y0:y1, x0:x1] = k + 1
            flow[y0:y1, x0:x1] = o["v"]

        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(rgb_dir, f"{fr:04d}.webp"), quality=90)
        _write_pfm(os.path.join(mask_dir, f"{fr:04d}.pfm"), mask)
        ff = np.concatenate([flow, np.zeros((H, W, 1), np.float32)], -1)
        _write_pfm(os.path.join(
            ff_dir, f"OpticalFlowIntoFuture_{fr:04d}_L.pfm"), ff)
        # into_past at frame fr maps fr -> fr-1: the negative velocity
        fb = np.concatenate([-flow, np.zeros((H, W, 1), np.float32)], -1)
        _write_pfm(os.path.join(
            fb_dir, f"OpticalFlowIntoPast_{fr:04d}_L.pfm"), fb)


def main(root="/tmp/flt_synth", n_train=24, n_test=8, H=400, W=520,
         n_frames=10, datagen=True):
    from pips_tpu.datagen.run import main as datagen_main

    jobs = [("TRAIN", n_train, 0), ("TEST", n_test, 10000)]
    for dset, n, seed0 in jobs:
        for vid in range(n):
            make_video(root, dset, "A", vid, H=H, W=W, n_frames=n_frames,
                       seed=seed0 + vid)
        print(f"{dset}: {n} raw videos written", flush=True)
        if datagen:
            datagen_main(what="trajs", flt3d_path=root, dsets=(dset,),
                         subsets=("A",), starts=(0,))
            datagen_main(what="occluders", flt3d_path=root, dsets=(dset,),
                         subsets=("A",), starts=(0,))
            print(f"{dset}: datagen done", flush=True)
    return root


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    print(auto_cli(main))
