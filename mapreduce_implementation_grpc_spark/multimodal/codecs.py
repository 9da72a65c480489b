"""Real media codecs, pure-stdlib: PNG (zlib + numpy) and WAV (struct).

The container has no PIL/opencv/ffmpeg, but PNG is just DEFLATE
(stdlib ``zlib``) plus per-row byte filters (vectorizable in numpy),
and PCM WAV is a RIFF header plus raw samples (stdlib ``struct``).
Implementing them here makes ``real_codec=True`` in
``multimodal.binary_ops`` a genuinely real decode path instead of a
NotImplementedError, with zero new dependencies.

Formats are implemented from their public specifications (PNG:
RFC 2083 / W3C PNG spec; WAV: RIFF/WAVE PCM layout). Scope is the
subset a training-data pipeline actually meets when normalizing
thumbnails: 8-bit greyscale / RGB / RGBA, non-interlaced PNG (all
five row filters on decode; encode uses filter 0), and 16-bit PCM
WAV (mono or interleaved multichannel).

Reference parity note: the reference system
(rafaayyyy/MapReduce-Implementation-GRPC) has no media surface at
all; this module belongs to the SURVEY.md 2b extension surface
("multimodal columns ... implement decode / feature-extract / resize
/ frame-sample").
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_WAV_MAGIC = b"RIFF"

# PNG color types we support -> channel count.
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_COLOR = {1: 0, 3: 2, 4: 6}


def sniff(payload: bytes) -> str:
    """Cheap magic-byte modality sniff: 'png' | 'wav' | 'unknown'."""
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:4] == _WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------- PNG


def _chunks(payload: bytes):
    """Iterate (type, data) PNG chunks; stops at IEND."""
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length  # length + type + data + crc


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w) or (h, w, channels).

    Supports bit depth 8, color types 0 (grey) / 2 (RGB) / 6 (RGBA),
    non-interlaced, with all five row filters (None/Sub/Up/Average/
    Paeth) reconstructed per the spec. Raises ValueError on anything
    outside that envelope — loud beats silently-wrong pixels.
    """
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _COLOR_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = scan[:, 0]
    data = scan[:, 1:].astype(np.int16)  # headroom for filter arithmetic

    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (depth 8)
    for y in range(height):
        f = filters[y]
        row = data[y].copy()
        prior = out[y - 1].astype(np.int16) if y > 0 else np.zeros(stride, np.int16)
        if f == 0:  # None
            recon = row
        elif f == 2:  # Up
            recon = (row + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            recon = row
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                if f == 1:
                    recon[x] = (recon[x] + left) & 0xFF
                elif f == 3:
                    recon[x] = (recon[x] + ((left + prior[x]) >> 1)) & 0xFF
                else:  # Paeth
                    ul = prior[x - bpp] if x >= bpp else 0
                    p = left + prior[x] - ul
                    pa, pb, pc = abs(p - left), abs(p - prior[x]), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = prior[x]
                    else:
                        pred = ul
                    recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = recon.astype(np.uint8)

    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def png_encode(img: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (h, w) or (h, w, {1,3,4}) -> PNG bytes (filter 0)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CHANNELS_COLOR:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, ch = arr.shape
    color = _CHANNELS_COLOR[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), compress_level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def png_resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the thumbnailing workhorse): index
    maps computed once, pure numpy fancy-indexing — no Python pixel
    loop."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------- WAV


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (samples int16 array [n, channels], rate).

    Walks RIFF chunks directly (no tempfile round-trip); supports
    format tag 1 (PCM) at 16 bits/sample.
    """
    if sniff(payload) != "wav":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[: (len(samples) // channels) * channels]
    return samples.reshape(-1, channels), rate


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 array [n] or [n, channels] + rate -> PCM WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    data = arr.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    riff_len = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ------------------------------------------------- feature extraction


def real_decode_features(payload: bytes) -> list[float]:
    """Typed 4-float feature vector from a real payload, dispatched
    on magic bytes. Mirrors the shape of
    ``binary_ops.fake_decode_batch`` so the two codec paths are
    drop-in interchangeable in ``decode_features``.

    png -> [width, height, channels, mean_pixel]
    wav -> [n_samples, rate, channels, rms_amplitude]
    """
    kind = sniff(payload)
    if kind == "png":
        img = png_decode(payload)
        ch = 1 if img.ndim == 2 else img.shape[2]
        return [float(img.shape[1]), float(img.shape[0]), float(ch),
                float(img.mean())]
    if kind == "wav":
        samples, rate = wav_decode(payload)
        rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
        return [float(samples.shape[0]), float(rate),
                float(samples.shape[1]), rms]
    raise ValueError("unknown payload format (expected PNG or WAV)")
