"""Numpy-free pure-Python oracle for the multimodal operators.

Independent restatement of multimodal.py's decode + feature semantics
using only the stdlib (struct / wave / math): BMP and PPM parsing by
walking the header byte-by-byte, features in exact integer arithmetic.
Because both sides reduce to exact integer sums before any division, the
Spark (numpy) implementation must match these values bit-for-bit — the
same two-implementation strategy as pyref.py for the text pipeline.

Used by golden.ensure_media_golden to materialize the DuckDB oracle
parquet for media_image_features / media_audio_features.
"""

from __future__ import annotations

import io
import math
import struct
import wave


def decode_bmp_py(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """24-bit uncompressed BMP → (w, h, rows of (r, g, b))."""
    magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    _hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP")
    flip = h > 0
    h = abs(h)
    stride = w * 3 + (4 - (w * 3) % 4) % 4
    img = [[(0, 0, 0)] * w for _ in range(h)]
    for i in range(h):
        y = (h - 1 - i) if flip else i
        base = off + i * stride
        row = img[y]
        for x in range(w):
            b = payload[base + 3 * x]
            g = payload[base + 3 * x + 1]
            r = payload[base + 3 * x + 2]
            row[x] = (r, g, b)
    return w, h, img


def decode_ppm_py(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Binary PPM (P6, maxval 255) → (w, h, rows of (r, g, b))."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    end = len(payload)
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < end and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= end:
            raise ValueError("truncated PPM header")
        if payload[pos:pos + 1] == b"#":
            while pos < end and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < end and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255")
    img = []
    for y in range(h):
        base = pos + y * w * 3
        img.append([(payload[base + 3 * x], payload[base + 3 * x + 1],
                     payload[base + 3 * x + 2]) for x in range(w)])
    return w, h, img


def decode_image_py(payload: bytes):
    if payload[:2] == b"BM":
        return decode_bmp_py(payload)
    if payload[:2] == b"P6":
        return decode_ppm_py(payload)
    raise ValueError("oracle only decodes real formats")


def image_features_py(payload: bytes) -> dict:
    """Channel means + integer 8x8 average hash (multimodal.image_features
    semantics, restated with plain loops and exact integer sums)."""
    w, h, img = decode_image_py(payload)
    sr = sg = sb = 0
    for row in img:
        for r, g, b in row:
            sr += r
            sg += g
            sb += b
    n_px = w * h
    hh, ww = (h // 8) * 8, (w // 8) * 8
    block_sums = [[0] * 8 for _ in range(8)]
    for y in range(hh):
        by = y * 8 // hh
        row = img[y]
        for x in range(ww):
            r, g, b = row[x]
            block_sums[by][x * 8 // ww] += r + g + b
    total = sum(sum(r) for r in block_sums)
    unsigned = 0
    i = 0
    for by in range(8):
        for bx in range(8):
            if block_sums[by][bx] * 64 > total:
                unsigned |= 1 << i
            i += 1
    phash = unsigned - (1 << 64) if unsigned >= (1 << 63) else unsigned
    return {"width": w, "height": h, "mean_r": sr / n_px, "mean_g": sg / n_px,
            "mean_b": sb / n_px, "phash": phash}


def _rle8_rows_py(raster: bytes, w: int, h: int, palette: bytes) -> list:
    """BI_RLE8 raster → rows of (r,g,b), stdlib loops only (independent
    restatement of multimodal._rle8_undo): encoded (count,index) runs,
    absolute mode (word-aligned), EOL/EOB/delta escapes, bottom-up rows,
    unwritten pixels = palette index 0."""
    idx = [[0] * w for _ in range(h)]
    x, y = 0, h - 1
    pos, n = 0, len(raster)
    while pos + 1 < n and y >= 0:
        cnt = raster[pos]
        pos += 1
        if cnt == 0:
            op = raster[pos]
            pos += 1
            if op == 0:
                x, y = 0, y - 1
            elif op == 1:
                break
            elif op == 2:
                x += raster[pos]
                y -= raster[pos + 1]
                pos += 2
            else:
                for j in range(op):
                    if x + j < w:
                        idx[y][x + j] = raster[pos + j]
                pos += op + (op % 2)
                x += op
        else:
            v = raster[pos]
            pos += 1
            for j in range(min(cnt, w - x)):
                idx[y][x + j] = v
            x += cnt
    # palette is BGRX quads
    lut = [(palette[4 * i + 2], palette[4 * i + 1], palette[4 * i])
           for i in range(min(256, len(palette) // 4))]
    return [[lut[v] for v in row] for row in idx]


def decode_avi_py(payload: bytes) -> tuple[list, int, int, int]:
    """RIFF/AVI → (frames as rows of (r,g,b), w, h, usec).

    Stdlib-only restatement of multimodal.decode_avi: RIFF chunk walk,
    avih for timing/dims, 'vids' strh sanity, '00db' BI_RGB DIB rasters
    (BGR bottom-up, 4-byte row padding) and '00dc' BI_RLE8 rasters
    (8-bit palette-indexed) decoded with plain loops."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    usec = w = h = None
    comp = 0
    palette = b""
    vids_ok = False
    frames = []

    def scan(pos: int, end: int) -> None:
        nonlocal usec, w, h, vids_ok, comp, palette
        while pos + 8 <= end:
            fcc = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            s = pos + 8
            e = s + size
            if fcc == b"LIST":
                scan(s + 4, e)
            elif fcc == b"avih":
                vals = struct.unpack_from("<10I", payload, s)
                usec, w, h = vals[0], vals[8], vals[9]
            elif fcc == b"strh":
                ftype, handler = struct.unpack_from("<4s4s", payload, s)
                if ftype == b"vids":
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00",
                                       b"RGB ", b"MRLE", b"mrle"):
                        raise ValueError("unsupported codec")
                    vids_ok = True
            elif fcc == b"strf" and vids_ok and not frames:
                _sz, _bw, _bh, _pl, bpp, comp = struct.unpack_from(
                    "<IiiHHI", payload, s)
                if (bpp, comp) == (8, 1):
                    palette = payload[s + 40:s + 40 + 1024]
                elif (bpp, comp) != (24, 0):
                    raise ValueError("unsupported DIB")
            elif fcc in (b"00db", b"00dc"):
                if comp == 1:
                    frames.append(_rle8_rows_py(payload[s:e], w, h, palette))
                else:
                    stride = w * 3 + (4 - (w * 3) % 4) % 4
                    img = [None] * h
                    for i in range(h):
                        base = s + i * stride
                        img[h - 1 - i] = [
                            (payload[base + 3 * x + 2],
                             payload[base + 3 * x + 1],
                             payload[base + 3 * x])
                            for x in range(w)]
                    frames.append(img)
            pos = e + (size % 2)

    scan(12, len(payload))
    if usec is None or not vids_ok:
        raise ValueError("missing AVI headers")
    return frames, w, h, usec


def _frame_features_py(img, w: int, h: int) -> dict:
    """Channel means + integer 8x8 average hash over one frame's rows —
    identical math to image_features_py's body."""
    sr = sg = sb = 0
    for row in img:
        for r, g, b in row:
            sr += r
            sg += g
            sb += b
    n_px = w * h
    hh, ww = (h // 8) * 8, (w // 8) * 8
    block_sums = [[0] * 8 for _ in range(8)]
    for y in range(hh):
        by = y * 8 // hh
        row = img[y]
        for x in range(ww):
            r, g, b = row[x]
            block_sums[by][x * 8 // ww] += r + g + b
    total = sum(sum(r) for r in block_sums)
    unsigned = 0
    i = 0
    for by in range(8):
        for bx in range(8):
            if block_sums[by][bx] * 64 > total:
                unsigned |= 1 << i
            i += 1
    phash = unsigned - (1 << 64) if unsigned >= (1 << 63) else unsigned
    return {"mean_r": sr / n_px, "mean_g": sg / n_px, "mean_b": sb / n_px,
            "phash": phash}


def video_frame_features_py(payload: bytes) -> list:
    """Per-container-frame features (multimodal.video_frame_features
    semantics): one dict per frame with container timing."""
    frames, w, h, usec = decode_avi_py(payload)
    out = []
    for i, img in enumerate(frames):
        f = _frame_features_py(img, w, h)
        f.update({"frame_idx": i, "ts_ms": i * usec // 1000})
        out.append(f)
    return out


def audio_features_py(payload: bytes) -> dict:
    """RMS + zero crossings over PCM16 WAV samples, exact-integer sums."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16")
        raw = wf.readframes(wf.getnframes())
    n = len(raw) // 2
    samples = struct.unpack(f"<{n}h", raw)
    ssq = 0
    zc = 0
    prev_neg = None
    for s in samples:
        ssq += s * s
        neg = s < 0
        if prev_neg is not None and neg != prev_neg:
            zc += 1
        prev_neg = neg
    rms = math.sqrt(ssq / (n * 32767.0 * 32767.0))
    return {"rms": rms, "zero_cross": zc}
