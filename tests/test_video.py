"""Pure-Python Y4M codec (operators/video.py) + real-decode
sample_frames path — completes the multimodal triple (image/audio/
video) at pixel level."""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators import video

rng = np.random.default_rng(123)


def test_y4m_roundtrip():
    frames = rng.integers(0, 256, size=(5, 6, 8), dtype=np.uint8)
    back, fps = video.y4m_decode(video.y4m_encode(frames, fps=(30, 1)))
    assert fps == (30, 1)
    assert np.array_equal(back, frames)


def test_y4m_c420_luma_extraction():
    """A C420 stream (Y + quarter-size U/V planes) yields its Y plane."""
    w, h, n = 8, 4, 3
    luma = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    chroma = rng.integers(0, 256, size=(n, h * w // 2), dtype=np.uint8)
    payload = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
    for f in range(n):
        payload += b"FRAME\n" + luma[f].tobytes() + chroma[f].tobytes()
    back, fps = video.y4m_decode(bytes(payload))
    assert fps == (25, 1)
    assert np.array_equal(back, luma)


def test_y4m_unsupported_rejected():
    with pytest.raises(video.UnsupportedVideoError):
        video.y4m_decode(b"\x00\x00\x00\x18ftypmp42 not y4m")
    with pytest.raises(video.UnsupportedVideoError, match="colorspace"):
        video.y4m_decode(b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + b"\x00" * 12)


def test_frame_times_rational_fps():
    # NTSC 30000/1001: floor-ms times, no float drift
    times = video.frame_times_ms(4, (30000, 1001))
    assert times == [0, 33, 66, 100]


def test_sample_frames_real_decode(spark):
    """sample_frames(decode_stub=False): every_ms cadence over true
    media time, source frame indices/timestamps, PNG frames equal to
    the original luma planes."""
    import pandas as pd

    from xetl_spark.operators import imaging
    from xetl_spark.operators.multimodal import sample_frames

    frames = rng.integers(0, 256, size=(10, 5, 7), dtype=np.uint8)  # 1s at 10fps
    payload = video.y4m_encode(frames, fps=(10, 1))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [payload]}),
        "doc_id long, media binary",
    )
    rows = sample_frames(
        df, "media", "doc_id", every_ms=300, max_frames=3, decode_stub=False
    ).collect()
    # targets 0/300/600ms at 100ms frames → source frames 0, 3, 6
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (3, 300), (6, 600)]
    for r in rows:
        got = imaging.png_decode(bytes(r.frame))[:, :, 0]
        assert np.array_equal(got, frames[r.frame_idx])


def test_sample_frames_task(spark, tmp_path):
    """The sample_frames builtin task drives real Y4M decode from a
    manifest."""
    import pandas as pd

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    frames = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)  # 0.6s at 10fps
    pdf = pd.DataFrame(
        {"doc_id": [1], "media": [video.y4m_encode(frames, fps=(10, 1))]}
    )
    spark.createDataFrame(pdf, "doc_id long, media binary").createOrReplaceTempView(
        "clips_y4m"
    )
    job = Job.from_yaml(
        f"""
        name: frames
        data: {tmp_path}
        commands:
          - {{name: src, task: sql, env: {{QUERY: "SELECT * FROM clips_y4m"}}}}
          - {{name: fr, task: sample_frames,
              env: {{MEDIA_COL: media, ID_COL: doc_id, EVERY_MS: 200, MAX_FRAMES: 3}}}}
        """,
        basedir=str(tmp_path),
    )
    results = run_job(spark, job)
    rows = results[-1].output.collect()
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (2, 200), (4, 400)]


def test_y4m_truncated_payload_rejected():
    """A truncated frame payload raises the typed codec error, not a
    bare ValueError from numpy/index internals."""
    frames = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    payload = video.y4m_encode(frames)
    with pytest.raises(video.UnsupportedVideoError, match="truncated"):
        video.y4m_decode(payload[:-5])  # short last frame
    with pytest.raises(video.UnsupportedVideoError):
        video.y4m_decode(b"YUV4MPEG2 W4 H4 F25:1 Cmono")  # unterminated header
    with pytest.raises(video.UnsupportedVideoError):
        # frame marker present but its newline is missing
        video.y4m_decode(b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME")


def test_scene_cuts_on_synthesized_two_scene_video(spark):
    """Two static scenes (luma 50 then 200) with a hard cut: exactly
    one detected boundary, at the cut frame, with the analytic delta."""
    import numpy as np

    from xetl_spark.operators.multimodal import scene_cuts
    from xetl_spark.operators.video import y4m_encode

    h, w = 16, 16
    frames = np.concatenate(
        [np.full((3, h, w), 50, np.uint8), np.full((2, h, w), 200, np.uint8)]
    )
    payload = y4m_encode(frames, fps=(10, 1))
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, media binary")
    got = sorted(
        scene_cuts(df, threshold=30.0).collect(), key=lambda r: r.frame_idx
    )
    assert [(r.frame_idx, r.mean_abs_diff) for r in got] == [(0, 0.0), (3, 150.0)]
    assert got[1].frame_ts_ms == 300  # 3rd frame at 10 fps
    # below-threshold noise produces no cut
    calm = np.full((4, h, w), 90, np.uint8)
    calm[2] += 5  # delta 5 < threshold
    df2 = spark.createDataFrame(
        [(1, bytearray(y4m_encode(calm, fps=(10, 1))))], "doc_id long, media binary"
    )
    assert scene_cuts(df2, threshold=30.0).count() == 1  # just frame 0
