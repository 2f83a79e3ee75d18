"""Native baseline JPEG decoder (MJPEG VMJPG001 shards) vs PIL/libjpeg.

PIL is used only to ENCODE golden inputs and to produce the reference
decode; the loader's decode path is the in-tree C++ decoder.
"""

import io

import numpy as np
import pytest

from videomamba_tpu.data import native as nat

if not nat.native_available():  # pragma: no cover - g++ is in the image
    pytest.skip("native loader unavailable (no g++?)", allow_module_level=True)
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

MEAN = np.array(nat.IMAGENET_MEAN, np.float32)
STD = np.array(nat.IMAGENET_STD, np.float32)
H, W = 48, 56


def _test_image():
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([
        np.sin(xx / 8) * 110 + 128,
        np.cos(yy / 6) * 100 + 120,
        (xx + yy) * 2 % 256,
    ], -1)
    return img.clip(0, 255).astype(np.uint8)


def _decode_via_loader(tmp_path, jpeg_bytes_list):
    p = tmp_path / "clip.vmjpg"
    nat.write_vmjpg(p, jpeg_bytes_list, H, W)
    ld = nat.NativeClipLoader([str(p)], clip_len=len(jpeg_bytes_list),
                              crop=min(H, W), batch_size=1)
    (clips, _), = list(ld.epoch())
    ld.close()
    # un-normalise back to uint8 scale, undo center crop bookkeeping
    frames = clips[0].transpose(1, 2, 3, 0) * STD + MEAN
    return frames * 255.0


def _golden(jpeg_bytes):
    return np.asarray(
        Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")).astype(np.float32)


def _crop(img, s):
    cy, cx = (img.shape[0] - s) // 2, (img.shape[1] - s) // 2
    return img[cy:cy + s, cx:cx + s]


@pytest.mark.parametrize("subsampling,quality,tol_mean", [
    (0, 95, 0.1),   # 4:4:4
    (1, 90, 0.6),   # 4:2:2
    (2, 90, 0.6),   # 4:2:0
])
def test_decode_matches_libjpeg(tmp_path, subsampling, quality, tol_mean):
    img = _test_image()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality,
                              subsampling=subsampling)
    data = buf.getvalue()
    got = _decode_via_loader(tmp_path, [data])[0]
    ref = _crop(_golden(data), min(H, W))
    diff = np.abs(got - ref)
    assert diff.max() <= 3.5  # rounding-level agreement (incl. normalise round-trip)
    assert diff.mean() <= tol_mean


def test_grayscale_exact(tmp_path):
    img = _test_image()[..., 0]
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=95)
    data = buf.getvalue()
    got = _decode_via_loader(tmp_path, [data])[0]
    ref = _crop(_golden(data), min(H, W))
    assert np.abs(got - ref).max() <= 0.01


def test_restart_markers(tmp_path):
    img = _test_image()
    buf = io.BytesIO()
    try:
        Image.fromarray(img).save(buf, format="JPEG", quality=90,
                                  subsampling=0, restart_marker_blocks=2)
    except TypeError:
        pytest.skip("PIL too old for restart_marker_blocks")
    data = buf.getvalue()
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn present
    got = _decode_via_loader(tmp_path, [data])[0]
    ref = _crop(_golden(data), min(H, W))
    assert np.abs(got - ref).max() <= 3.5


def test_multiframe_shard_sampling(tmp_path):
    rng = np.random.default_rng(0)
    vid = np.stack([_test_image()] * 6).astype(np.int16)
    vid = (vid + rng.integers(-5, 6, vid.shape)).clip(0, 255).astype(np.uint8)
    p = tmp_path / "v.vmjpg"
    nat.encode_vmjpg(p, vid, quality=95, subsampling=0)
    ld = nat.NativeClipLoader([str(p)], clip_len=3, frame_stride=2,
                              crop=min(H, W), batch_size=1)
    (clips, _), = list(ld.epoch())
    ld.close()
    # center start for span 5 within T=6 -> start 0; frames 0, 2, 4
    for i, t in enumerate([0, 2, 4]):
        buf = io.BytesIO()
        Image.fromarray(vid[t]).save(buf, format="JPEG", quality=95,
                                     subsampling=0)
        ref = _crop(_golden(buf.getvalue()), min(H, W))
        got = (clips[0, :, i].transpose(1, 2, 0) * STD + MEAN) * 255
        assert np.abs(got - ref).max() <= 3.5


def test_progressive_rejected(tmp_path):
    buf = io.BytesIO()
    Image.fromarray(_test_image()).save(buf, format="JPEG", progressive=True)
    p = tmp_path / "p.vmjpg"
    nat.write_vmjpg(p, [buf.getvalue()], H, W)
    ld = nat.NativeClipLoader([str(p)], clip_len=1, crop=min(H, W),
                              batch_size=1)
    with pytest.raises(RuntimeError, match="progressive"):
        list(ld.epoch())
    ld.close()


def test_truncated_jpeg_errors(tmp_path):
    buf = io.BytesIO()
    Image.fromarray(_test_image()).save(buf, format="JPEG", quality=90)
    p = tmp_path / "t.vmjpg"
    nat.write_vmjpg(p, [buf.getvalue()[:40]], H, W)
    ld = nat.NativeClipLoader([str(p)], clip_len=1, crop=min(H, W),
                              batch_size=1)
    with pytest.raises(RuntimeError, match="jpeg decode failed"):
        list(ld.epoch())
    ld.close()


def _expect_decode_error(tmp_path, payload: bytes, name: str):
    p = tmp_path / name
    nat.write_vmjpg(p, [payload], H, W)
    ld = nat.NativeClipLoader([str(p)], clip_len=1, crop=8, batch_size=1)
    with pytest.raises(RuntimeError):
        list(ld.epoch())
    ld.close()


def test_malformed_segments_never_crash(tmp_path):
    """Crafted/truncated segments must fail cleanly, not read out of
    bounds (ADVICE round-1 high: heap overflow on truncated DQT)."""
    cases = {
        # 7-byte JPEG with a truncated DQT segment (ASAN repro from ADVICE).
        "dqt_trunc.vmjpg": bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x03, 0x00]),
        # DQT declaring a 16-bit table but segment too short for 64 u16s.
        "dqt_short16.vmjpg": bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x05, 0x10,
                                    0x01, 0x02]),
        # DHT with counts summing past the segment end.
        "dht_counts.vmjpg": bytes([0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x15, 0x00]
                                  + [0xFF] * 16 + [0x01, 0x02]),
        # SOF0 segment shorter than its component list claims.
        "sof_short.vmjpg": bytes([0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x08, 0x08,
                                  0x00, 0x10, 0x00, 0x10, 0x03]),
        # SOS with truncated component spec.
        "sos_short.vmjpg": bytes([0xFF, 0xD8,
                                  0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08,
                                  0x00, 0x08, 0x01, 0x01, 0x11, 0x00,
                                  0xFF, 0xDA, 0x00, 0x03, 0x01]),
        # Segment length < 2 (would compute a negative segment end).
        "seglen_zero.vmjpg": bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x00]),
    }
    for name, payload in cases.items():
        _expect_decode_error(tmp_path, payload, name)


def test_huge_dc_size_symbol_rejected(tmp_path):
    """A Huffman table whose only DC symbol is 0xFF (magnitude category 255)
    must be rejected before read_bits(255) executes UB (ADVICE medium)."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00] + [1] * 64))
    sof = seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    # one 1-bit DC code -> symbol 0xFF; one 1-bit AC code -> symbol 0x00 (EOB)
    dht_dc = seg(0xC4, bytes([0x00, 1] + [0] * 15 + [0xFF]))
    dht_ac = seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan = bytes([0x00, 0xFF, 0xD9])
    payload = bytes([0xFF, 0xD8]) + dqt + sof + dht_dc + dht_ac + sos + scan
    _expect_decode_error(tmp_path, payload, "dc255.vmjpg")


def test_corrupt_shard_offsets_rejected(tmp_path):
    """VMJPG001 offsets past the file size must be rejected at header parse
    (ADVICE medium: jbuf.resize(huge) would std::terminate a worker)."""
    import struct

    p = tmp_path / "hugeoff.vmjpg"
    with open(p, "wb") as f:
        f.write(b"VMJPG001")
        f.write(struct.pack("<4I", 1, H, W, 3))
        f.write(np.array([0, 1 << 40], np.uint64).tobytes())
        f.write(b"\xff\xd8\xff\xd9")
    with pytest.raises(RuntimeError, match="exceed file size"):
        nat.NativeClipLoader([str(p)], clip_len=1, crop=8, batch_size=1)
