"""Pure-numpy media codecs: BMP (24-bit), WAV (PCM16 mono), and a
trivial frame container for video — REAL encode/decode with no external
libraries (this environment ships no PIL/ffmpeg/soundfile; BMP and
RIFF/WAVE are simple enough to implement exactly from their public
specs, which is what makes the multimodal stages real rather than
stubs).

Formats:
- BMP: ``BITMAPFILEHEADER`` + ``BITMAPINFOHEADER`` (40 bytes), 24 bpp,
  bottom-up rows padded to 4 bytes — the baseline Windows bitmap.
- WAV: RIFF/WAVE with a ``fmt `` chunk (PCM, mono, 16-bit) and one
  ``data`` chunk.
- WSMV ("work-sample media video"): our own minimal container —
  ``b'WSMV' | u32 n_frames | u32 frame_ms | u64 offsets[n+1]`` followed
  by the frames as back-to-back BMP blobs. Invented, but fully decodable
  — frame sampling genuinely decodes pixels.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # bottom-up, BGR order
    bgr = pixels[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (H, W, 3) uint8 RGB."""
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hdr_size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (header={hdr_size}, bpp={bpp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# --------------------------------------------------------------------------
# WAV (PCM16 mono)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 samples -> RIFF/WAVE (PCM, mono, 16-bit)."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 samples, sample_rate). PCM16 mono only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM16 mono only)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + clen + (clen & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


# --------------------------------------------------------------------------
# WSMV video container (concatenated BMP frames)
# --------------------------------------------------------------------------


def encode_wsmv(frames: list[np.ndarray], frame_ms: int = 1000) -> bytes:
    blobs = [encode_bmp(f) for f in frames]
    offs = np.zeros(len(blobs) + 1, dtype=np.uint64)
    np.cumsum([len(b) for b in blobs], out=offs[1:])
    head = b"WSMV" + struct.pack("<II", len(blobs), frame_ms) + offs.tobytes()
    return head + b"".join(blobs)


def wsmv_info(data: bytes) -> tuple[int, int]:
    """(n_frames, frame_ms) without decoding any frame."""
    if data[:4] != b"WSMV":
        raise ValueError("not a WSMV payload")
    n, frame_ms = struct.unpack_from("<II", data, 4)
    return n, frame_ms


def decode_wsmv_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode ONE frame by index — the point of the offset table: frame
    sampling reads only the sampled frame's bytes."""
    n, _ms = wsmv_info(data)
    if not 0 <= idx < n:
        raise IndexError(idx)
    offs = np.frombuffer(data, dtype=np.uint64, count=n + 1, offset=12)
    base = 12 + 8 * (n + 1)
    return decode_bmp(data[base + int(offs[idx]) : base + int(offs[idx + 1])])


# --------------------------------------------------------------------------
# feature kernels (shared by the Ray stages)
# --------------------------------------------------------------------------


def thumb_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-fit thumbnail dimensions, exact-integer (floor division)
    so the SQL twin can replay the rule: no-op when the longest side
    already fits, else scale both sides by max_side/max(w, h)."""
    mx = max(w, h)
    if mx <= max_side:
        return w, h
    return max(1, (w * max_side) // mx), max(1, (h * max_side) // mx)


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic floor mapping
    src_i = (dst_i * src_len) // dst_len) — pure numpy indexing, no
    interpolation state, bit-reproducible anywhere."""
    h, w = rgb.shape[0], rgb.shape[1]
    iy = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ix = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return np.ascontiguousarray(rgb[iy][:, ix])


def image_features(rgb: np.ndarray, grid: int = 8) -> np.ndarray:
    """(H, W, 3) -> grid x grid grayscale thumbnail (area-averaged),
    flattened float32 in [0, 1] — a real, deterministic visual signature
    (aHash-family)."""
    gray = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    h, w = gray.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    out = np.empty((grid, grid), dtype=np.float32)
    for i in range(grid):
        for j in range(grid):
            out[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return (out / 255.0).ravel()


def audio_features(samples: np.ndarray, bins: int = 64) -> np.ndarray:
    """int16 PCM -> log-magnitude spectrum folded into ``bins`` bands
    (float32) — a real spectral signature via one rfft."""
    x = samples.astype(np.float32) / 32768.0
    spec = np.abs(np.fft.rfft(x))
    n = spec.size
    edges = (np.arange(bins + 1) * n) // bins
    out = np.empty(bins, dtype=np.float32)
    for b in range(bins):
        seg = spec[edges[b] : max(edges[b + 1], edges[b] + 1)]
        out[b] = np.log1p(seg.mean())
    return out
