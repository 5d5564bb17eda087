"""FrameFeed double-buffered video feed: chunking protocol + engine parity.

The feed must be a drop-in for a decoded (T, H, W, 3) array in both
chaining engines (reference analog: chain_demo.py:104-117 decodes the
whole video up front; the feed overlaps decode with device encode).
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.inference import ChainTracker, ChainTrackerOnDevice, FrameFeed
from pips_tpu.inference.feed import _ArrayChunks, as_feed
from pips_tpu.models import Pips

TINY = dict(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
            mixer_dim=32, mixer_depth=2)


def _video(T, H=16, W=24, seed=0):
    return (np.random.RandomState(seed).rand(T, H, W, 3) * 255).astype(np.float32)


@pytest.mark.parametrize("T,chunk", [(8, 4), (7, 4), (3, 8), (5, 5), (1, 4)])
def test_feed_matches_array_chunks(T, chunk):
    rgbs = _video(T)
    got = list(FrameFeed(list(rgbs), chunk=chunk))
    want = list(_ArrayChunks(rgbs, chunk))
    assert len(got) == len(want)
    for (gc, gn), (wc, wn) in zip(got, want):
        assert gn == wn and gc.shape == wc.shape
        np.testing.assert_array_equal(gc, wc)


def test_feed_tail_padding_repeats_last_frame():
    rgbs = _video(6)
    chunks = list(FrameFeed(list(rgbs), chunk=4))
    c, n = chunks[-1]
    assert n == 2
    np.testing.assert_array_equal(c[2], rgbs[5])
    np.testing.assert_array_equal(c[3], rgbs[5])


def test_feed_lazy_callables_and_transform_run_on_feed_thread():
    rgbs = _video(5)
    seen_threads = set()

    def lazy(i):
        def load():
            seen_threads.add(threading.current_thread().name)
            return rgbs[i]
        return load

    out = np.concatenate([c[:n] for c, n in
                          FrameFeed([lazy(i) for i in range(5)], chunk=4,
                                    transform=lambda f: f * 2.0)], 0)
    np.testing.assert_allclose(out, rgbs * 2.0)
    assert "MainThread" not in seen_threads  # decode happened off-thread


def test_feed_propagates_decode_error():
    def boom():
        raise IOError("corrupt frame")

    feed = FrameFeed([lambda: _video(1)[0], boom], chunk=4)
    with pytest.raises(IOError, match="corrupt frame"):
        list(feed)


def test_as_feed_passthrough_and_validation():
    rgbs = _video(4)
    feed = FrameFeed(list(rgbs), chunk=2)
    assert as_feed(feed, chunk=8) is feed  # the feed's own chunk wins
    with pytest.raises(ValueError):
        list(_ArrayChunks(rgbs[0], 4))  # not (T, H, W, C)
    with pytest.raises(ValueError):
        FrameFeed(list(rgbs), chunk=0)


@pytest.fixture(scope="module")
def tiny_setup():
    model = Pips(**TINY)
    T, H, W, N = 7, 64, 96, 3
    rng = np.random.RandomState(7)
    rgbs = (rng.rand(T, H, W, 3) * 255).astype(np.float32)
    xys = (rng.rand(N, 2) * [W - 16, H - 16] + 8).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xys[None]),
                        jnp.asarray(rgbs[None, :4]), iters=1)
    return model, params, rgbs, xys


def test_chain_tracker_accepts_feed(tiny_setup):
    model, params, rgbs, xys = tiny_setup
    chain = ChainTracker(model, params, iters=1, encode_chunk=4)
    t_a, v_a = chain.track_video(rgbs, xys)
    t_f, v_f = chain.track_video(FrameFeed(list(rgbs), chunk=4), xys)
    np.testing.assert_array_equal(t_a, t_f)
    np.testing.assert_array_equal(v_a, v_f)


def test_on_device_tracker_accepts_feed(tiny_setup):
    model, params, rgbs, xys = tiny_setup
    chain = ChainTrackerOnDevice(model, params, iters=1)
    t_a, v_a = chain.track_video(rgbs, xys)
    t_f, v_f = chain.track_video(FrameFeed(list(rgbs), chunk=8), xys)
    np.testing.assert_array_equal(t_a, t_f)
    np.testing.assert_array_equal(v_a, v_f)


def test_track_stream_equals_track_video(tiny_setup):
    """Online (windows refined as frames arrive, features evicted) must
    EXACTLY equal offline chaining; peak feature memory stays O(S+chunk)."""
    model, params, rgbs, xys = tiny_setup
    chain = ChainTracker(model, params, iters=1, encode_chunk=4)
    t_off, v_off = chain.track_video(rgbs, xys)

    chain.stream_peak_chunks = 0
    t_arr, v_arr = chain.track_stream(rgbs, xys)             # array input
    np.testing.assert_array_equal(t_off, t_arr)
    np.testing.assert_array_equal(v_off, v_arr)
    # 7 frames / chunk 4 -> 2 chunks total; eviction can't exceed that, but
    # the window span bound is what matters on long videos (next test)
    assert chain.stream_peak_chunks <= 2

    t_f, v_f = chain.track_stream(FrameFeed(list(rgbs), chunk=4), xys)
    np.testing.assert_array_equal(t_off, t_f)
    np.testing.assert_array_equal(v_off, v_f)


def test_track_stream_evicts_on_long_video():
    model = Pips(**TINY)
    T, H, W, N = 25, 64, 96, 2
    rng = np.random.RandomState(3)
    rgbs = (rng.rand(T, H, W, 3) * 255).astype(np.float32)
    xys = (rng.rand(N, 2) * [W - 16, H - 16] + 8).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xys[None]),
                        jnp.asarray(rgbs[None, :4]), iters=1)
    chain = ChainTracker(model, params, iters=1, encode_chunk=4)
    t_off, v_off = chain.track_video(rgbs, xys)
    chain.stream_peak_chunks = 0
    t_on, v_on = chain.track_stream(FrameFeed(list(rgbs), chunk=4), xys)
    np.testing.assert_array_equal(t_off, t_on)
    np.testing.assert_array_equal(v_off, v_on)
    # 25 frames = 7 chunks; a window spans ceil(S/ck)+1 = 2 chunks and the
    # encode lookahead adds ~1 — far below holding the whole video
    assert chain.stream_peak_chunks <= 3, chain.stream_peak_chunks


def test_track_stream_with_mismatched_feed_chunk(tiny_setup):
    """A caller-built FrameFeed's own chunk size must win over encode_chunk
    (the store was previously keyed by the wrong chunk -> crash/corruption)."""
    model, params, rgbs, xys = tiny_setup
    chain = ChainTracker(model, params, iters=1, encode_chunk=4)
    t_off, v_off = chain.track_video(rgbs, xys)
    t_on, v_on = chain.track_stream(FrameFeed(list(rgbs), chunk=3), xys)
    np.testing.assert_array_equal(t_off, t_on)
    np.testing.assert_array_equal(v_off, v_on)


def test_track_stream_accepts_generator(tiny_setup):
    model, params, rgbs, xys = tiny_setup
    chain = ChainTracker(model, params, iters=1, encode_chunk=4)
    t_off, v_off = chain.track_video(rgbs, xys)
    t_on, v_on = chain.track_stream((f for f in rgbs), xys)  # length-unknown
    np.testing.assert_array_equal(t_off, t_on)
    np.testing.assert_array_equal(v_off, v_on)


def test_feed_is_single_use():
    rgbs = _video(4)
    feed = FrameFeed(list(rgbs), chunk=4)
    list(feed)
    with pytest.raises(RuntimeError, match="single-use"):
        list(feed)


def test_feed_close_releases_blocked_producer():
    import time
    rgbs = _video(40)
    feed = FrameFeed(list(rgbs), chunk=4, depth=1)  # producer blocks on put
    it = iter(feed)
    next(it)           # consume one chunk, then abandon
    it.close()         # generator finally -> feed.close()
    feed._thread.join(timeout=5.0)
    assert not feed._thread.is_alive()


def test_select_fn_contract_violation_raises(tiny_setup):
    model, params, rgbs, xys = tiny_setup
    bad = lambda vis, S: np.full(vis.shape[:-1], S, np.int64)  # skip == S
    chain = ChainTracker(model, params, iters=1, encode_chunk=4, select_fn=bad)
    with pytest.raises(ValueError, match="select_fn"):
        chain.track_video(rgbs, xys)
