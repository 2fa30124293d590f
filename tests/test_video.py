"""MJPEG-AVI fallback video writer (nnc_tpu/utils/video.py).

The reference writes mp4 videos (run_nerf.py:781-794); this env has no
ffmpeg, so the writer muxes PIL JPEGs into a RIFF/AVI container in pure
Python. These tests parse the container back and decode a frame."""
import struct

import numpy as np
import pytest

from nnc_tpu.utils.video import write_mjpeg_avi, write_video


def _gradient_frames(n=5, h=24, w=32):
    # smooth content so JPEG round-trips close to the original
    y, x = np.mgrid[0:h, 0:w]
    frames = [np.stack([(x * 255 / (w - 1)),
                        (y * 255 / (h - 1)),
                        np.full((h, w), 40.0 * i)], axis=-1)
              for i in range(n)]
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


def _parse_avi(data):
    """Minimal RIFF walk: return (avih fields, list of jpeg payloads,
    idx1 entry count)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8
    pos, avih, jpegs, n_idx = 12, None, [], 0
    while pos < len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc == b"LIST":
            pos += 12  # descend
            continue
        payload = data[pos + 8:pos + 8 + size]
        if fourcc == b"avih":
            avih = struct.unpack("<14I", payload)
        elif fourcc == b"00dc":
            jpegs.append(payload)
        elif fourcc == b"idx1":
            n_idx = size // 16
        pos += 8 + size + (size % 2)
    return avih, jpegs, n_idx


def test_mjpeg_avi_round_trip(tmp_path):
    frames = _gradient_frames()
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=30)
    data = open(path, "rb").read()
    avih, jpegs, n_idx = _parse_avi(data)
    assert avih is not None
    usec, _, _, flags, total, _, nstreams, _, w, h = avih[:10]
    assert usec == round(1e6 / 30) and flags & 0x10
    assert (total, nstreams, w, h) == (len(frames), 1, 32, 24)
    assert len(jpegs) == len(frames) and n_idx == len(frames)
    # decode the middle frame and compare (JPEG-lossy tolerance)
    from PIL import Image
    import io
    img = np.asarray(Image.open(io.BytesIO(jpegs[2])))
    assert img.shape == (24, 32, 3)
    assert np.mean(np.abs(img.astype(int) - frames[2].astype(int))) < 8


def test_mjpeg_avi_grayscale_promoted(tmp_path):
    frames = _gradient_frames()[..., 0]  # (N,H,W)
    path = str(tmp_path / "gray.avi")
    write_mjpeg_avi(path, frames, fps=10)
    _, jpegs, _ = _parse_avi(open(path, "rb").read())
    from PIL import Image
    import io
    assert np.asarray(Image.open(io.BytesIO(jpegs[0]))).shape == (24, 32, 3)


def test_mjpeg_avi_rejects_float():
    with pytest.raises(TypeError):
        write_mjpeg_avi("/dev/null", _gradient_frames().astype(np.float32))


def test_write_video_dispatch(tmp_path):
    # in this env ffmpeg is absent -> the dispatcher must land on .avi
    path = write_video(str(tmp_path / "clip"), _gradient_frames())
    assert path is not None and path.endswith((".mp4", ".avi"))
    assert (tmp_path / path.split("/")[-1]).stat().st_size > 0
