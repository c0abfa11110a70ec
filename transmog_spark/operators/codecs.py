"""Dependency-free media codecs: PCM WAV (RIFF) and binary PPM (P6).

The multimodal operator surface (``operators/multimodal.py``) is generic
plumbing around an injected ``decode_fn``; these built-ins prove the
non-stub path with REAL decoders that need nothing beyond the stdlib —
written to the public format specs:

* WAV: RIFF container, ``fmt `` + ``data`` chunks, PCM 16-bit LE
  (Microsoft/IBM RIFF spec, multimedia programming interface rev 1.0).
* PPM: netpbm ``P6`` binary rasters (netpbm format spec).

Both directions ship (encode for synthesizing test payloads, decode for
the feature path) so tests and oracle queries can round-trip payloads
without any media library. The reference library has no media surface at
all (see SURVEY.md §2.8) — this is engine-side extension surface.
"""

from __future__ import annotations

import math
import struct


# --------------------------------------------------------------------------
# WAV (RIFF / PCM 16-bit little-endian)
# --------------------------------------------------------------------------

def encode_wav_pcm16(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Minimal canonical WAV: RIFF header + ``fmt `` chunk + ``data`` chunk.

    ``samples`` are interleaved int16 values in [-32768, 32767].
    """
    data = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE payload -> (sample_rate, channels, samples).

    Walks the chunk list (tolerates extra chunks like ``LIST``/``fact`` and
    odd-length padding per the RIFF spec); accepts only format tag 1 (PCM)
    at 16 bits.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    sample_rate = channels = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding tag={tag} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = list(struct.unpack("<%dh" % (len(data) // 2), data[: len(data) & ~1]))
    return sample_rate, channels, samples


def wav_feature_vector(payload: bytes) -> list[float]:
    """Real audio features from a decoded PCM payload:

    ``[n_samples, sample_rate, peak, rms, zcr]`` with peak/rms on the
    [-1, 1] scale (int16 / 32768) and zcr = sign-change fraction over
    consecutive samples (sign(x) := x >= 0). Deterministic pure math —
    mirrored exactly by the DuckDB oracle in ``media_wav_features``.
    """
    sample_rate, _channels, samples = decode_wav_pcm16(bytes(payload))
    n = len(samples)
    if n == 0:
        return [0.0, float(sample_rate), 0.0, 0.0, 0.0]
    peak = max(abs(s) for s in samples) / 32768.0
    rms = math.sqrt(sum((s / 32768.0) ** 2 for s in samples) / n)
    crossings = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    zcr = crossings / (n - 1) if n > 1 else 0.0
    return [float(n), float(sample_rate), peak, rms, zcr]


# --------------------------------------------------------------------------
# PPM (netpbm P6, binary 8-bit RGB)
# --------------------------------------------------------------------------

def encode_ppm(pixels: bytes, width: int, height: int, maxval: int = 255) -> bytes:
    """P6 raster: ASCII header then width*height*3 binary RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer length != width*height*3")
    return f"P6\n{width} {height}\n{maxval}\n".encode() + bytes(pixels)


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse P6 -> (width, height, maxval, pixels). Handles comment lines
    and arbitrary whitespace in the header per the netpbm spec."""
    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    pixels = buf[pos : pos + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, maxval, pixels


def ppm_feature_vector(payload: bytes) -> list[float]:
    """``[width, height, mean_r, mean_g, mean_b, luma_mean]`` on the [0, 1]
    scale; luma uses the ITU-R BT.601 weights (0.299/0.587/0.114)."""
    width, height, maxval, pixels = decode_ppm(payload)
    n = width * height
    if n == 0:
        return [float(width), float(height), 0.0, 0.0, 0.0, 0.0]
    sums = [0, 0, 0]
    for i in range(0, len(pixels), 3):
        sums[0] += pixels[i]
        sums[1] += pixels[i + 1]
        sums[2] += pixels[i + 2]
    mr, mg, mb = (s / n / maxval for s in sums)
    return [
        float(width),
        float(height),
        mr,
        mg,
        mb,
        0.299 * mr + 0.587 * mg + 0.114 * mb,
    ]


def ppm_resize_nn(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a P6 PPM raster, dependency-free.

    Standard NN index rule: output pixel (x, y) samples source pixel
    (x*W DIV out_w, y*H DIV out_h) — exact integer floor division, so the
    mapping (and therefore every output byte) is engine-reproducible; the
    DuckDB oracle recomputes the same mapping in SQL. Upscales and
    downscales alike; preserves maxval.
    """
    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    width, height, maxval, pixels = decode_ppm(payload)
    if width == 0 or height == 0:
        raise ValueError("cannot resize an empty raster")
    out = bytearray(out_w * out_h * 3)
    pos = 0
    for y in range(out_h):
        sy = (y * height) // out_h
        row = sy * width
        for x in range(out_w):
            src = (row + (x * width) // out_w) * 3
            out[pos : pos + 3] = pixels[src : src + 3]
            pos += 3
    return encode_ppm(bytes(out), out_w, out_h, maxval)
