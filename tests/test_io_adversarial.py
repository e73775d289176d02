"""Adversarial I/O tests: every reader fails loudly with a useful message.

The reference raises bare struct/reshape/RuntimeError on malformed input
(``inference_kitti.py:33-38``, ``data_processing.py:17-29``); here each
defect gets a ValueError/RuntimeError naming the path and the problem
(VERDICT r4 task 7).
"""

import struct

import numpy as np
import pytest

from opticalflow_tpu.io.flo import TAG_FLOAT, read_flo, write_flo
from opticalflow_tpu.io.kitti import read_flow_png, write_flow_png


# ---------------------------------------------------------------- .flo


def test_flo_wrong_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(struct.pack("<fii", 123.456, 4, 4) + b"\x00" * 128)
    with pytest.raises(ValueError, match="magic"):
        read_flo(str(p))


@pytest.mark.parametrize("payload", (8 * 8 * 2 * 4 // 2, 7),
                         ids=("half", "off-4-byte-boundary"))
def test_flo_truncated_payload(tmp_path, payload):
    # 7 bytes: truncation off a 4-byte boundary once surfaced numpy's bare
    # "buffer size must be a multiple of element size" with no path
    p = tmp_path / "trunc.flo"
    good = struct.pack("<fii", TAG_FLOAT, 8, 8)
    p.write_bytes(good + b"\x00" * payload)
    with pytest.raises(ValueError, match="truncated"):
        read_flo(str(p))


@pytest.mark.parametrize("nbytes", (0, 3, 11))
def test_flo_short_header(tmp_path, nbytes):
    p = tmp_path / "short.flo"
    p.write_bytes(struct.pack("<f", TAG_FLOAT)[:nbytes])
    with pytest.raises(ValueError, match="header bytes"):
        read_flo(str(p))


@pytest.mark.parametrize("w,h", ((-1, 4), (4, -1), (0, 4), (2**30, 2**30)))
def test_flo_implausible_dims(tmp_path, w, h):
    p = tmp_path / "dims.flo"
    p.write_bytes(struct.pack("<fii", TAG_FLOAT, w, h) + b"\x00" * 64)
    with pytest.raises(ValueError, match="dimensions"):
        read_flo(str(p))


def test_flo_roundtrip_still_works(tmp_path):
    p = tmp_path / "ok.flo"
    flow = np.random.RandomState(0).randn(6, 5, 2).astype(np.float32)
    write_flo(str(p), flow)
    np.testing.assert_array_equal(read_flo(str(p)), flow)


# ---------------------------------------------------------- KITTI PNG


def test_kitti_8bit_png_rejected(tmp_path):
    import cv2
    p = tmp_path / "flow8.png"
    cv2.imwrite(str(p), np.zeros((8, 8, 3), np.uint8))  # 8-bit impostor
    with pytest.raises(ValueError, match="uint16"):
        read_flow_png(str(p))


def test_kitti_grayscale_png_rejected(tmp_path):
    import cv2
    p = tmp_path / "gray.png"
    cv2.imwrite(str(p), np.zeros((8, 8), np.uint16))
    with pytest.raises(ValueError, match="3-channel"):
        read_flow_png(str(p))


def test_kitti_missing_file_raises(tmp_path):
    with pytest.raises(Exception, match="(?i)imread|no such file"):
        read_flow_png(str(tmp_path / "nope.png"))


def test_kitti_roundtrip_still_works(tmp_path):
    p = tmp_path / "ok.png"
    rng = np.random.RandomState(1)
    flow = (rng.randn(8, 6, 2) * 4).astype(np.float32)
    valid = rng.rand(8, 6) > 0.3
    write_flow_png(str(p), flow, valid=valid)
    back, v = read_flow_png(str(p))
    np.testing.assert_allclose(back, flow, atol=1 / 64.0)
    np.testing.assert_array_equal(v, valid)


# ------------------------------------------------------------- video


def test_unreadable_video_raises(tmp_path):
    from opticalflow_tpu.video import frame_pairs_from_video
    bogus = tmp_path / "not_a_video.mp4"
    bogus.write_bytes(b"this is not an mp4")
    with pytest.raises(RuntimeError, match="cannot open video"):
        next(frame_pairs_from_video(str(bogus)))


def test_missing_video_raises(tmp_path):
    from opticalflow_tpu.video import frame_pairs_from_video
    with pytest.raises(RuntimeError, match="cannot open video"):
        next(frame_pairs_from_video(str(tmp_path / "missing.mp4")))


# ------------------------------------------------------------- i420


@pytest.mark.parametrize("shape", ((1, 100, 64),   # rows not H*3/2
                                   (1, 99, 63),    # odd width
                                   (1, 105, 65)))  # odd width, valid rows
def test_i420_bad_packed_geometry(shape):
    from opticalflow_tpu.video import yuv_i420_to_rgb_u8
    with pytest.raises(ValueError, match="I420"):
        yuv_i420_to_rgb_u8(np.zeros(shape, np.uint8))


def test_i420_midrow_chroma_boundary_still_works():
    # h=70 → 35 chroma rows of w/2: the U/V boundary falls mid-row in the
    # packed layout; the element-count slicing must keep handling it
    import cv2
    from opticalflow_tpu.video import yuv_i420_to_rgb_u8
    rng = np.random.RandomState(2)
    bgr = rng.randint(0, 256, (70, 64, 3), np.uint8)
    packed = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)
    ours = np.asarray(yuv_i420_to_rgb_u8(packed[None]))[0]
    ref = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420)[..., ::-1]
    np.testing.assert_array_equal(ours, ref)
