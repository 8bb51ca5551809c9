"""decode_image: real BMP/PPM decoding (pure numpy) and the media
metadata plumbing."""

import numpy as np
import pandas as pd
import pytest

from tumult_analytics_spark.operators.multimodal import (
    _decode_bmp,
    _decode_ppm,
    decode_image,
    synthesize_bmp,
)


def test_bmp_roundtrip_with_padding():
    # width 3 -> row stride 12 bytes (9 data + 3 pad): a decoder that
    # ignores padding or the bottom-up flip gets the wrong pixel_sum.
    for w, h, seed in [(3, 2, 5), (1, 1, 0), (7, 5, 123), (4, 3, 9)]:
        buf = synthesize_bmp(w, h, seed)
        rec = _decode_bmp(buf)
        assert rec is not None
        hh, ww, ch, psum = rec
        assert (hh, ww, ch) == (h, w, 3)
        expect = int(((seed * 7 + np.arange(w * h * 3) * 13) % 256).sum())
        assert psum == expect


def test_ppm_decode():
    w, h = 4, 2
    pixels = bytes(range(w * h * 3))
    buf = b"P6\n# comment\n4 2\n255\n" + pixels
    rec = _decode_ppm(buf)
    assert rec == (h, w, 3, sum(pixels))


def test_decode_image_dataframe(spark):
    rows = [
        (1, synthesize_bmp(3, 2, 1)),
        (2, b"P6\n2 2\n255\n" + bytes(12)),
        (3, b"not an image"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r["id"]: r for r in decode_image(df, "payload").collect()}
    assert (out[1]["height"], out[1]["width"], out[1]["channels"]) == (2, 3, 3)
    assert out[2]["pixel_sum"] == 0
    assert out[3]["height"] is None
    assert out[4]["pixel_sum"] is None


class TestSampleVideoFrames:
    def _videos(self, spark):
        from tumult_analytics_spark.operators.multimodal import (
            synthesize_raw_video,
        )

        rows = [
            (1, synthesize_raw_video(2, 2, 5, seed=1)),   # frames 0,2,4
            (2, synthesize_raw_video(3, 1, 1, seed=2)),   # frame 0 only
            (3, None),                                    # null payload
            (4, b"notavideo"),                            # unrecognized
        ]
        return spark.createDataFrame(rows, "vid long, payload binary")

    def test_every_2nd_frame_with_exact_pixel_sums(self, spark):
        from tumult_analytics_spark.operators.multimodal import (
            sample_video_frames,
        )

        out = sample_video_frames(self._videos(spark), "payload", 2)
        rows = {(r["vid"], r["frame_index"]): r for r in out.collect()}
        assert set(rows) == {(1, 0), (1, 2), (1, 4), (2, 0)}
        # pixel byte i of frame f for seed s: (s*7 + f*19 + i*13) % 256
        n = 2 * 2 * 3
        want = sum((1 * 7 + 2 * 19 + i * 13) % 256 for i in range(n))
        assert rows[(1, 2)]["frame_pixel_sum"] == want
        assert rows[(1, 2)]["height"] == 2 and rows[(1, 2)]["width"] == 2
        # raw frame bytes round-trip
        frame = bytes(rows[(2, 0)]["frame_rgb"])
        assert len(frame) == 3 * 1 * 3
        assert frame[0] == (2 * 7) % 256

    def test_binary_column_not_in_output(self, spark):
        from tumult_analytics_spark.operators.multimodal import (
            sample_video_frames,
        )

        out = sample_video_frames(self._videos(spark), "payload", 2)
        assert "payload" not in out.columns
