"""Streaming frame buffer + pipelined dispatch (VERDICT r2 missing #3/#4).

The BA runners must consume unbounded frame generators in bounded memory
and produce the same results as the materialized path.
"""

import numpy as np
import pytest

from epivo_tpu.pipeline import runners, stream
from epivo_tpu.pipeline.config import BAConfig, LMConfig
from tests.test_runners_datasets import CAM, VO_CFG, make_sequence


def test_frame_stream_sequence_source():
    frames = [np.full((4, 4), i, np.float32) for i in range(5)]
    fs = stream.FrameStream(frames)
    assert fs.sized and len(fs) == 5
    assert fs.get(3)[0, 0] == 3.0
    fs.evict_below(4)  # no-op for sequences
    assert fs.get(0)[0, 0] == 0.0


def test_frame_stream_iterator_bounded():
    def gen():
        for i in range(100):
            yield np.full((8, 8), i, np.float32)

    fs = stream.FrameStream(gen(), n_frames=100)
    assert len(fs) == 100
    for i in range(0, 96, 4):
        # Window-style access: (i, i+1), (i, i+2), backward (i+1, i).
        assert fs.get(i + 2)[0, 0] == i + 2
        assert fs.get(i)[0, 0] == i
        fs.evict_below(i + 1)
    assert fs.peak_buffered <= 8, fs.peak_buffered
    with pytest.raises(IndexError, match="evicted"):
        fs.get(0)


def test_frame_stream_end_and_unsized():
    fs = stream.FrameStream(iter([np.zeros((2, 2))]), n_frames=None)
    assert not fs.sized
    with pytest.raises(TypeError, match="n_frames"):
        len(fs)
    with pytest.raises(IndexError, match="ended"):
        fs.get(5)


def test_frame_stream_skips_below_watermark():
    """Resume path: frames below the watermark are consumed, not buffered."""
    def gen():
        for i in range(50):
            yield np.full((8, 8), i, np.float32)

    fs = stream.FrameStream(gen(), n_frames=50)
    fs.evict_below(40)
    assert fs.get(41)[0, 0] == 41
    assert fs.peak_buffered <= 2, fs.peak_buffered


def test_pipelined_dispatch_order_and_flush():
    got = []
    pipe = stream.PipelinedDispatch(lambda r, c: got.append((r, c)))
    pipe.submit(lambda: "r0", "c0")
    assert got == []  # one-deep: first result still pending
    pipe.submit(lambda: "r1", "c1")
    assert got == [("r0", "c0")]
    pipe.flush()
    assert got == [("r0", "c0"), ("r1", "c1")]
    pipe.flush()  # idempotent
    assert len(got) == 2


def test_ba_sequence_streaming_matches_list():
    """Generator + n_frames == materialized list (same seed), and the
    stream path never materializes the sequence."""
    frames, gt = make_sequence(F=7)
    cfg = BAConfig(camera=CAM, frontend=VO_CFG.frontend, ransac=VO_CFG.ransac,
                   lm=LMConfig(n_points=32, revert_r_norm=1e-2))
    res_list = runners.run_ba_sequence(frames, cfg, gt_poses=gt)
    res_stream = runners.run_ba_sequence(
        (f for f in frames), cfg, gt_poses=gt, n_frames=7)
    np.testing.assert_allclose(res_stream.trajectory, res_list.trajectory,
                               atol=1e-6)
    assert res_stream.ate == pytest.approx(res_list.ate, abs=1e-6)


def test_extract_pairs_streaming_bounded_buffer():
    """Window-span pairs over a long generator keep the buffer bounded."""
    frames, _ = make_sequence(F=10)

    def gen():
        yield from frames

    fs = stream.FrameStream(gen(), n_frames=10)
    pairs = sorted({(i, i + 1) for i in range(9)}
                   | {(i, i + 2) for i in range(8)}
                   | {(b, b - 1) for b in range(1, 9)})
    out = runners._extract_pairs(fs, pairs, VO_CFG, seed=0, n_points=32,
                                 batch=4)
    assert set(out) == set(pairs)
    # Pairs span at most 2 frames; batches of 4 pairs cover ~ 6 frames.
    assert fs.peak_buffered <= 8, fs.peak_buffered
