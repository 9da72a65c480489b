"""Pure-stdlib/numpy baseline JPEG codec (round 9, VERDICT r8 #8):
the dominant real-world multimodal image format, decodable without
PIL/opencv/ffmpeg (absent from this container by design).

Scope -- baseline sequential DCT (SOF0), the overwhelmingly common
profile for photos:
- decoder: multi-marker parse (APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS),
  canonical Huffman entropy decode with byte-unstuffing and RSTn
  restart handling, dequantize, 8x8 IDCT, general (h,v) chroma
  sampling factors with replication upsampling, JFIF YCbCr->RGB.
- encoder: 4:4:4 or 4:2:0, libjpeg-style quality-scaled Annex K
  quantization tables, the spec's standard Huffman tables, DC
  prediction + (run,size) AC coding, byte stuffing.

Everything is deterministic float64/int numpy -- same bytes in, same
pixels out, on any host -- so the decode path slots into the same
Arrow mapInPandas plumbing as the PNG/GIF/WAV codecs
(multimodal/binary_ops.py) and downstream phash dedup stays
reproducible. Progressive (SOF2) and arithmetic-coded JPEGs raise
ValueError with a clear message; they are rare in LLM training
corpora relative to baseline and are the documented boundary.

Spec references: ITU-T T.81 (JPEG), Annex F (baseline), Annex K
(example tables -- the de-facto standard ones); JFIF 1.02 for the
color transform. All public documents.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order: index z -> (row, col) flattened position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard Huffman tables (Annex K): (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis with JPEG normalization: F = C @ f @ C.T
_k = np.arange(8).reshape(8, 1).astype(np.float64)
_n = np.arange(8).reshape(1, 8).astype(np.float64)
DCT_C = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.where(
    _k == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0)
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn
    markers, raises ValueError on truncation."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # A real marker was already reached on a previous fill:
            # any further bit demand means the entropy segment ended
            # before the last MCU.  Without this check, the zero bits
            # below decode as valid Annex-K symbols (DC size 0 / EOB)
            # and the remaining MCUs silently repeat the DC predictor.
            raise ValueError("JPEG entropy data ended before last MCU")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker: signal and emit zero bits so a
                # caller that ignores it fails loudly downstream
                self.marker = nxt
                self.pos += 1
                b = 0
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial-byte bits and consume a pending marker (the
        RSTn path)."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker may still be ahead in the raw stream
            while self.pos + 1 < len(self.data) and not (
                self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00
            ):
                self.pos += 1
            if self.pos + 1 < len(self.data):
                self.marker = self.data[self.pos + 1]
                self.pos += 2
        m, self.marker = self.marker, None
        return m


def _build_huffman(bits: list[int], values: list[int]):
    """Canonical JPEG Huffman: returns
    (decode dict {(length, code): symbol}, encode dict {symbol:
    (code, length)})."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[vi]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return decode, encode


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed
    value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------- decode


def jpeg_decode(payload: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array, (h, w) for grayscale or (h, w, 3)
    RGB. Baseline sequential DCT only; progressive or arithmetic
    streams raise ValueError. Malformed/truncated streams raise
    ValueError (same contract as png/gif_decode)."""
    try:
        return _jpeg_decode_inner(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _jpeg_decode_inner(payload: bytes) -> np.ndarray:
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS data
            break
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    table = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    table = np.frombuffer(
                        seg[p : p + 128], ">u2"
                    ).astype(np.int64)
                    p += 128
                qts[tq] = table
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both baseline-decodable)
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack(">BBB", seg[6 + 3 * i : 9 + 3 * i])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG profile (SOF marker 0xFF{marker:02X}): "
                "only baseline sequential DCT is implemented"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                dec, _enc = _build_huffman(bits, values)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # A scan carrying fewer components than the frame is a
                # non-interleaved (multi-scan) baseline JPEG; decoding
                # it with the frame-wide MCU geometry below would
                # produce scrambled pixels, so fail loudly like SOF2.
                raise ValueError(
                    "unsupported non-interleaved JPEG scan "
                    f"({ns} of {len(frame['comps'])} components)"
                )
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"JPEG SOS references unknown component id {cs}"
                    )
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(
                payload, pos + seg_len, frame, scan, qts, dc_tables,
                ac_tables, restart_interval
            )
        # APPn / COM / others: skip
        pos += seg_len
    raise ValueError("JPEG stream has no SOS scan")


def _decode_scan(payload, pos, frame, scan, qts, dc_tables, ac_tables,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64
        )

    reader = _BitReader(payload, pos)
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                preds = {cid: 0 for cid in preds}
            for comp, td, ta in scan:
                qt = qts[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _decode_symbol(reader, dc_tables[td])
                        diff = _extend(reader.read_bits(s), s)
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(reader, ac_tables[ta])
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt
                        pix = DCT_C.T @ block.reshape(8, 8) @ DCT_C
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    out_planes = []
    for comp, _, _ in scan:
        p = planes[comp["id"]] + 128.0
        # replication upsample to full MCU-grid resolution
        p = np.repeat(
            np.repeat(p, hmax // comp["h"], axis=1), vmax // comp["v"], axis=0
        )
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


def _encode_block(writer, block, qt, dc_enc, ac_enc, pred: int) -> int:
    coef = DCT_C @ (block - 128.0) @ DCT_C.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / qt[ZIGZAG]).astype(np.int64)
    # DC
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_enc[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # AC
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = (last_nz[-1] + 1) if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_enc[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_enc[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _pad_to(img: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = img.shape
    ph = (mult_y - h % mult_y) % mult_y
    pw = (mult_x - w % mult_x) % mult_x
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def jpeg_encode(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF JPEG
    bytes. subsample=True emits 4:2:0 (chroma averaged 2x2), the
    photographic default; False emits 4:4:4."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode wants uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)

    if gray:
        comps = [(img.astype(np.float64), qt_l, 0, (1, 1))]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
            comps = [(y, qt_l, 0, (2, 2)), (cb, qt_c, 1, (1, 1)),
                     (cr, qt_c, 1, (1, 1))]
        else:
            comps = [(y, qt_l, 0, (1, 1)), (cb, qt_c, 1, (1, 1)),
                     (cr, qt_c, 1, (1, 1))]

    hmax = max(c[3][0] for c in comps)
    vmax = max(c[3][1] for c in comps)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0: 1x1 density, no thumbnail
    for tq, qt in ((0, qt_l), (1, qt_c))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(x) for x in qt[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (_, _, tq, (ch, cv)) in enumerate(comps):
        out += struct.pack(">BBB", i + 1, (ch << 4) | cv, tq)
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    encs = {}
    for tclass, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values), tclass
        ) + bytes(bits) + bytes(values)
        encs[tclass] = _build_huffman(bits, values)[1]
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        td_ta = 0x00 if i == 0 else 0x11
        out += struct.pack(">BB", i + 1, td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    writer = _BitWriter()
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its exact MCU-grid shape (edge replication)
    padded = []
    for plane, qt, _tq, (ch, cv) in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        padded.append(p)

    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, qt, _tq, (ch, cv)) in enumerate(comps):
                dc_enc = encs[0x00 if ci == 0 else 0x01]
                ac_enc = encs[0x10 if ci == 0 else 0x11]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qt, dc_enc, ac_enc, preds[ci]
                        )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)
