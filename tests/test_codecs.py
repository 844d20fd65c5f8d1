import numpy as np
import pytest

from raqc_ray.codecs import (
    DecodeError,
    decode_image,
    decode_png,
    decode_ppm,
    encode_image,
    hamming64,
    phash64,
    psnr,
    synth_image,
)


@pytest.mark.parametrize("fmt", ["ppm", "png"])
@pytest.mark.parametrize("dims", [(32, 32), (64, 48), (97, 33)])
def test_roundtrip_lossless(fmt, dims):
    rng = np.random.default_rng(7)
    img = synth_image(rng, *dims)
    data = encode_image(img, fmt)
    out = decode_image(data, fmt)
    assert np.array_equal(out, img)  # lossless ⇒ exact equality (BASELINE.json:15)


def test_decode_rejects_garbage():
    with pytest.raises(DecodeError):
        decode_ppm(b"\x00garbage" * 10)
    with pytest.raises(DecodeError):
        decode_png(b"\x00garbage" * 10)


def test_decode_rejects_truncation():
    rng = np.random.default_rng(7)
    img = synth_image(rng, 32, 32)
    for fmt, dec in (("ppm", decode_ppm), ("png", decode_png)):
        data = encode_image(img, fmt)
        with pytest.raises(DecodeError):
            dec(data[: len(data) // 3])


def test_png_all_filter_types_decode():
    # hand-build scanlines with each filter type and check the decoder
    # inverts them (spec behavior, not just our encoder's filter-0)
    import struct
    import zlib

    from raqc_ray.codecs import _chunk, _PNG_SIG

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    h, w = 5, 4
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    recon = np.zeros((h, stride), dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else c)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(line.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, img)


def test_phash_properties():
    rng = np.random.default_rng(11)
    img = synth_image(rng, 64, 64)
    ph = phash64(img)
    assert hamming64(ph, ph) == 0
    # tiny perturbation → tiny hamming distance
    img2 = np.clip(img.astype(np.int16) + 1, 0, 255).astype(np.uint8)
    assert hamming64(ph, phash64(img2)) <= 4
    # different image → large distance
    other = synth_image(np.random.default_rng(99), 64, 64)[::-1, ::-1]
    assert hamming64(ph, phash64(255 - other)) > 10


def test_psnr():
    rng = np.random.default_rng(1)
    img = synth_image(rng, 32, 32)
    assert psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(np.int16) + rng.integers(-2, 3, img.shape), 0, 255
                    ).astype(np.uint8)
    assert psnr(img, noisy) > 40


# ------------------------------------------------------------------ jpeg


def test_jpeg_roundtrip_psnr():
    """Lossy invariant (BASELINE 'PSNR>=40dB for lossy fmt'): encoder →
    decoder round trip on fixture-style images stays above 40 dB."""
    import numpy as np

    from raqc_ray.codecs import decode_image, encode_image, psnr, synth_image

    for i in range(8):
        rng = np.random.default_rng(100 + i)
        w, h = [int(x) for x in rng.choice([32, 64, 96, 128], 2)]
        img = synth_image(rng, w, h)
        out = decode_image(encode_image(img, "jpeg"), "jpeg")
        assert out.shape == img.shape
        assert psnr(img, out) >= 40.0


def test_jpeg_odd_dims_and_flat():
    import numpy as np

    from raqc_ray.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((17, 23, 3), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat))
    assert out.shape == (17, 23, 3)
    assert np.abs(out.astype(int) - 200).max() <= 2


def test_jpeg_truncated_raises():
    import numpy as np
    import pytest as _pytest

    from raqc_ray.codecs import DecodeError
    from raqc_ray.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    b = encode_jpeg(img)
    with _pytest.raises(DecodeError):
        decode_jpeg(b[: len(b) // 3])
    with _pytest.raises(DecodeError):
        decode_jpeg(b"\x00\x01" + b[2:])
