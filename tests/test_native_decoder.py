"""Native JPEG decoder vs PIL golden test (skipped when the toolchain is
unavailable)."""

import io

import numpy as np
import pytest
from PIL import Image

from coin_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder unavailable")


def _jpeg_bytes(rng, h, w):
    # smooth gradient + low-freq noise: JPEG round-trips cleanly, and
    # DCT-domain prescale stays close to full-decode-then-resize
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy * 255.0 / h, xx * 255.0 / w,
                     (yy + xx) * 127.0 / (h + w)], -1)
    noise = rng.randn(h // 8 + 1, w // 8 + 1, 3) * 20
    noise = np.asarray(Image.fromarray(
        np.clip(noise + 128, 0, 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32) - 128.0
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_jpeg_size(rng):
    blob = _jpeg_bytes(rng, 48, 64)
    assert native.jpeg_size(blob) == (48, 64)


def test_decode_batch_matches_pil(rng):
    blobs = [_jpeg_bytes(rng, 96, 128), _jpeg_bytes(rng, 64, 80)]
    scales = [0.5, 0.75]
    out = native.decode_batch(blobs, scales, (64, 96))
    assert out is not None
    canvases, out_hw = out
    assert canvases.shape == (2, 64, 96, 3)
    np.testing.assert_array_equal(out_hw[0], [48, 64, 96, 128])
    np.testing.assert_array_equal(out_hw[1], [48, 60, 64, 80])

    for i, (blob, s) in enumerate(zip(blobs, scales)):
        ref = Image.open(io.BytesIO(blob)).convert("RGB")
        nh, nw = out_hw[i][0], out_hw[i][1]
        ref = np.asarray(ref.resize((nw, nh), Image.BILINEAR), np.float32)
        got = canvases[i, :nh, :nw].astype(np.float32)
        # decode paths differ slightly (DCT prescale + our bilinear);
        # require close agreement on average
        assert np.abs(got - ref).mean() < 6.0
    # padding stays zero
    assert canvases[0, 50:, :, :].max() == 0
