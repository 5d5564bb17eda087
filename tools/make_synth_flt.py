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


def make_long_clip(T=40, H=368, W=496, N=256, seed=0, max_gap=6):
    """Long chaining-regime clip with EXACT ground truth (VERDICT r4 #5).

    A panning textured background, a few slow textured rects, plus thin FAST
    occluder bars whose sweeps create 1..max_gap-frame occlusion gaps — the
    regime BADJA/CroHD accuracy actually comes from (the reference chains
    8-frame windows through occlusions, ``test_on_badja.py:64-113``).

    All motion is integer-rounded exactly as rendered, so gt trajectories
    and per-frame visibility are exact by construction. Returns
    (rgbs (T,H,W,3) float32, trajs_g (T,N,2), vis_g (T,N)); every returned
    point is visible at frame 0 and stays in-bounds for all T; roughly half
    the points experience at least one occlusion gap.
    """
    rng = np.random.RandomState(seed)
    M = int(np.ceil(1.2 * T)) + 2  # bg margin: covers max |bgv|*T pan
    bg = _texture(rng, H + 2 * M, W + 2 * M)
    bgv = rng.uniform(-1.2, 1.2, 2)

    objs = []  # slow scene rects (trackable bodies)
    for _ in range(rng.randint(3, 6)):
        ow, oh = rng.randint(60, 140), rng.randint(60, 140)
        objs.append(dict(tex=_texture(rng, oh, ow),
                         xy=np.array([rng.uniform(0, W - ow), rng.uniform(0, H - oh)]),
                         v=rng.uniform(-2.5, 2.5, 2), wh=(ow, oh)))
    # fast thin occluder bars: width w at |vx| px/frame occludes a static
    # point for ~w/|vx| frames — sized for gaps <= max_gap
    for _ in range(rng.randint(4, 7)):
        vert = rng.rand() < 0.5
        speed = rng.uniform(6, 10) * rng.choice([-1, 1])
        gap = rng.randint(2, max_gap + 1)
        w = max(int(abs(speed) * gap), 12)
        if vert:  # vertical bar sweeping horizontally
            ow, oh = w, rng.randint(H // 2, H)
            v = np.array([speed, rng.uniform(-1, 1)])
            x0 = -ow if speed > 0 else W
            xy = np.array([x0 - speed * rng.uniform(0, T / 2),
                           rng.uniform(0, H - oh)])
        else:
            ow, oh = rng.randint(W // 2, W), w
            v = np.array([rng.uniform(-1, 1), speed])
            y0 = -oh if speed > 0 else H
            xy = np.array([rng.uniform(0, W - ow),
                           y0 - speed * rng.uniform(0, T / 2)])
        objs.append(dict(tex=_texture(rng, oh, ow), xy=xy, v=v, wh=(ow, oh)))

    rgbs = np.empty((T, H, W, 3), np.float32)
    owner = np.empty((T, H, W), np.int16)
    shifts = np.empty((T, 2), np.int32)      # rendered bg shift per frame
    obj_pos = np.empty((T, len(objs), 2), np.int32)  # rendered rect corners
    for fr in range(T):
        ix, iy = int(round(M + bgv[0] * fr)), int(round(M + bgv[1] * fr))
        shifts[fr] = (ix, iy)
        img = bg[iy:iy + H, ix:ix + W].copy()
        own = np.full((H, W), -1, np.int16)
        for k, o in enumerate(objs):
            x = int(round(o["xy"][0] + o["v"][0] * fr))
            y = int(round(o["xy"][1] + o["v"][1] * fr))
            obj_pos[fr, k] = (x, y)
            ow, oh = o["wh"]
            x0, y0 = max(x, 0), max(y, 0)
            x1, y1 = min(x + ow, W), min(y + oh, H)
            if x1 <= x0 or y1 <= y0:
                continue
            img[y0:y1, x0:x1] = o["tex"][y0 - y:y1 - y, x0 - x:x1 - x]
            own[y0:y1, x0:x1] = k
        rgbs[fr] = img
        owner[fr] = own

    # candidate pool: dense grid, owner at frame 0 decides attachment
    gy, gx = np.meshgrid(np.arange(8, H - 8, 4), np.arange(8, W - 8, 4),
                         indexing="ij")
    cand = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)  # (P,2) xy
    own0 = owner[0, cand[:, 1].astype(int), cand[:, 0].astype(int)]

    P = len(cand)
    trajs = np.empty((T, P, 2), np.float32)
    for fr in range(T):
        d_bg = (shifts[0] - shifts[fr]).astype(np.float32)   # bg moves -shift
        d_ob = (obj_pos[fr] - obj_pos[0]).astype(np.float32)  # (K,2)
        delta = np.where((own0 >= 0)[:, None], d_ob[np.maximum(own0, 0)], d_bg)
        trajs[fr] = cand + delta
    inb = ((trajs[..., 0] >= 0) & (trajs[..., 0] <= W - 1)
           & (trajs[..., 1] >= 0) & (trajs[..., 1] <= H - 1)).all(0)
    xr = np.clip(np.round(trajs[..., 0]).astype(int), 0, W - 1)
    yr = np.clip(np.round(trajs[..., 1]).astype(int), 0, H - 1)
    vis = (owner[np.arange(T)[:, None], yr, xr] == own0[None]).astype(np.float32)

    keep = inb & (vis[0] > 0)
    cand_i = np.flatnonzero(keep)
    gaps = (vis[:, cand_i] == 0).any(0)
    occd, alw = cand_i[gaps], cand_i[~gaps]
    rng.shuffle(occd), rng.shuffle(alw)
    # half occluded / half always-visible, backfilling from whichever pool
    # has spare when the other runs short (tiny test frames)
    n_occ = min(len(occd), N // 2)
    pick = np.concatenate([occd[:n_occ], alw, occd[n_occ:]])[:N]
    assert len(pick) == N, f"only {len(pick)} valid candidates for N={N}"
    return rgbs, trajs[:, pick], vis[:, pick]


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
