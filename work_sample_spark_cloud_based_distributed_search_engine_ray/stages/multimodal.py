"""Multimodal columns: image/audio/video as ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages — with
REAL decoders.

This environment ships no media libraries, so the decoders are
pure-numpy implementations of simple public formats
(``functions/media_codecs.py``): 24-bit BMP for images, RIFF/WAVE PCM16
for audio, and a minimal offset-indexed frame container (WSMV) for
video. Decode, feature extraction (8x8 grayscale thumbnail / 64-band
log spectrum) and per-frame sampling all operate on actual pixels and
samples; a payload that fails to parse falls back to a digest-derived
feature and is flagged in the ``decoded`` column rather than crashing
the pipeline (malformed inputs are a fact of 100 TB corpora).

Scale notes:
- Large binary payloads mean SMALL batches: callers pass
  ``batch_size=8..64`` so batch x concurrency fits a worker heap; the
  payload column is dropped as soon as features are extracted
  (projection discipline, same as the ``html`` column in the index
  build).
- The stages are stateful on purpose: a heavier decoder/model would be
  loaded once per actor in ``__init__`` (the reference analog is the
  per-JVM robots cache, ``crawler/Crawler.java:27``).
- Frame sampling decodes ONLY the sampled frames (the container's
  offset table makes that an O(frame) slice, not a full-video decode).
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error

import numpy as np
import pyarrow as pa

from ..functions.media_codecs import (
    audio_features,
    decode_bmp,
    decode_wav,
    decode_wsmv_frame,
    encode_bmp,
    encode_wav,
    encode_wsmv,
    image_features,
    wsmv_info,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def _digest_features(payload: bytes, dim: int) -> np.ndarray:
    """Fallback feature for undecodable payloads: seeded by the
    payload's blake2b digest (identical bytes -> identical feature, so
    exact dedup still works on junk inputs)."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureStage:
    """binary payload -> REAL decoded features + basic metadata.

    Output: media_id, kind, mime, payload_bytes, payload_sha1, decoded
    (bool), width, height, duration_ms, feature(list<float>). The
    ``payload`` column is consumed and NOT re-emitted.

    - image: BMP decode -> 8x8 grayscale thumbnail (FEATURE_DIM=64).
    - audio: WAV decode -> 64-band log-magnitude spectrum; duration
      from sample count / rate.
    - video: container header + FIRST frame's thumbnail as the feature
      (per-frame work belongs to ``FrameSampleStage``).
    """

    def __init__(self, *, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # a heavier decoder/model would be loaded here, once per actor

    def _one(self, payload: bytes, kind: str):
        if kind == "image":
            rgb = decode_bmp(payload)
            return image_features(rgb), rgb.shape[1], rgb.shape[0], -1
        if kind == "audio":
            samples, rate = decode_wav(payload)
            return audio_features(samples), -1, -1, int(samples.size * 1000 / rate)
        if kind == "video":
            n, frame_ms = wsmv_info(payload)
            first = decode_wsmv_frame(payload, 0)
            return image_features(first), first.shape[1], first.shape[0], n * frame_ms
        raise ValueError(kind)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        n = len(payloads)
        # zeros, not empty: a decoder returning fewer than feature_dim
        # values must leave deterministic (zero) padding, never
        # uninitialized memory
        feats = np.zeros((n, self.feature_dim), dtype=np.float32)
        widths = np.full(n, -1, np.int32)
        heights = np.full(n, -1, np.int32)
        durs = np.full(n, -1, np.int32)
        decoded = np.zeros(n, bool)
        sha1s: list[str] = []
        sizes = np.empty(n, dtype=np.int64)
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            try:
                f, widths[i], heights[i], durs[i] = self._one(p, kind)
                feats[i, : f.size] = f[: self.feature_dim]
                decoded[i] = True
            except (ValueError, IndexError, struct_error):
                feats[i] = _digest_features(p, self.feature_dim)
            sha1s.append(hashlib.sha1(p).hexdigest())
            sizes[i] = len(p)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "mime": batch["mime"],
                "payload_bytes": pa.array(sizes),
                "payload_sha1": pa.array(sha1s, pa.string()),
                "decoded": pa.array(decoded.tolist(), pa.bool_()),
                "width": pa.array(widths),
                "height": pa.array(heights),
                "duration_ms": pa.array(durs),
                "feature": pa.array(
                    [feats[i].tolist() for i in range(n)], pa.list_(pa.float32())
                ),
            }
        )



class FrameSampleStage:
    """video payload -> one row per sampled frame, REALLY decoded.

    Frame selection is uniform every ``stride_ms`` (capped at
    ``max_frames``); each selected frame is sliced out of the container
    via its offset-table entry and BMP-decoded — only sampled frames'
    bytes are touched. Output: media_id, frame_idx, frame_ts_ms,
    mean_luma, frame_sha1 (sha1 of the decoded RGB pixels, so identical
    frames dedup regardless of container framing)."""

    def __init__(self, *, stride_ms: int = 1000, max_frames: int = 32):
        self.stride_ms = stride_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_ts, out_luma, out_sha = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames, frame_ms = wsmv_info(payload)
            step = max(1, self.stride_ms // max(frame_ms, 1))
            picks = list(range(0, n_frames, step))[: self.max_frames]
            for f in picks:
                rgb = decode_wsmv_frame(payload, f)
                out_id.append(mid)
                out_idx.append(f)
                out_ts.append(f * frame_ms)
                out_luma.append(float(rgb.astype(np.float32).mean()))
                out_sha.append(hashlib.sha1(rgb.tobytes()).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "mean_luma": pa.array(out_luma, pa.float64()),
                "frame_sha1": pa.array(out_sha, pa.string()),
            }
        )


def _synth_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic gradient + noise image."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1) + (yy * 131) // max(h - 1, 1)) % 256
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.int64)
    rgb = (base[:, :, None] + noise) % 256
    return rgb.astype(np.uint8)


def synth_media(n: int, seed: int = 42, _frame_truth: list | None = None) -> pa.Table:
    """Deterministic media corpus with REAL payloads: BMP images, WAV
    sine mixtures, WSMV frame containers; ~6% exact-duplicate payloads
    (dedup fodder). Pure function of (n, seed).

    ``_frame_truth`` (internal, used by ``synth_media_frame_truth``):
    when a list is passed, one dict per (video row, frame) is appended
    with mean_luma/sha1 computed from the PRE-ENCODE pixel arrays — the
    decode-inverts-encode ground truth for the frame-sampling oracle."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"]), size=n, p=[0.7, 0.2, 0.1])
    dup = rng.random(n) < 0.06
    payloads: list[bytes] = []
    widths = np.full(n, -1, np.int32)
    heights = np.full(n, -1, np.int32)
    durs = np.full(n, -1, np.int32)
    vid_frames: dict[int, tuple[list[np.ndarray], int]] = {}

    def _record_truth(media_id: int, frames: list[np.ndarray], frame_ms: int):
        if _frame_truth is None:
            return
        for f_idx, frame in enumerate(frames):
            _frame_truth.append(
                {
                    "media_id": media_id,
                    "frame_idx": f_idx,
                    "frame_ts_ms": f_idx * frame_ms,
                    "mean_luma": float(frame.astype(np.float32).mean()),
                    "frame_sha1": hashlib.sha1(frame.tobytes()).hexdigest(),
                }
            )

    for i in range(n):
        if dup[i] and i > 0:
            j = int(rng.integers(0, i))
            payloads.append(payloads[j])
            kinds[i] = kinds[j]
            widths[i], heights[i], durs[i] = widths[j], heights[j], durs[j]
            if j in vid_frames:
                vid_frames[i] = vid_frames[j]
                _record_truth(i, *vid_frames[j])
            continue
        k = kinds[i]
        if k == "image":
            w, h = int(rng.integers(16, 160)), int(rng.integers(16, 160))
            payloads.append(encode_bmp(_synth_image(rng, w, h)))
            widths[i], heights[i] = w, h
        elif k == "audio":
            rate = 8000
            ms = int(rng.integers(200, 3000))
            t = np.arange(rate * ms // 1000, dtype=np.float32) / rate
            f1, f2 = rng.uniform(100, 2000, size=2)
            x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
            payloads.append(encode_wav((x * 20000).astype(np.int16), rate))
            durs[i] = ms
        else:
            nf = int(rng.integers(2, 10))
            frame_ms = 500
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            frames = [_synth_image(rng, w, h) for _ in range(nf)]
            payloads.append(encode_wsmv(frames, frame_ms))
            widths[i], heights[i], durs[i] = w, h, nf * frame_ms
            vid_frames[i] = (frames, frame_ms)
            _record_truth(i, frames, frame_ms)
    mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "video/x-wsmv"}
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mimes[k] for k in kinds.tolist()], pa.string()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "duration_ms": pa.array(durs),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_frame_truth(n: int, seed: int = 42) -> pa.Table:
    """Ground truth for EVERY frame of every video row of
    ``synth_media(n, seed)``: (media_id, frame_idx, frame_ts_ms,
    mean_luma, frame_sha1) computed from the pre-encode pixel arrays.
    The frame-sampling pipeline must reproduce these by decoding the
    container payloads — decode-inverts-encode, per frame."""
    truth: list[dict] = []
    synth_media(n, seed, _frame_truth=truth)
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in truth], pa.int64()),
            "frame_idx": pa.array([r["frame_idx"] for r in truth], pa.int32()),
            "frame_ts_ms": pa.array([r["frame_ts_ms"] for r in truth], pa.int32()),
            "mean_luma": pa.array([r["mean_luma"] for r in truth], pa.float64()),
            "frame_sha1": pa.array([r["frame_sha1"] for r in truth], pa.string()),
        }
    )


# --------------------------------------------------------------------------
# perceptual-hash image near-dup (pHash: 32x32 grayscale -> DCT-II ->
# low-frequency 8x8 block -> median threshold -> 64-bit sketch)
# --------------------------------------------------------------------------


def synth_images_neardup(
    n: int, seed: int = 43, _pixel_truth: list | None = None
) -> pa.Table:
    """Deterministic image corpus with NEAR-duplicate variants: ~15% of
    rows re-encode an earlier base image with +-2 pixel noise and a
    small brightness shift — byte-different payloads (exact dedup
    misses them) whose low-frequency spectra, and therefore pHashes,
    stay within a few bits of the base. ``base_id`` carries the ground
    truth (-1 for originals). Pure function of (n, seed)."""
    from ..functions.media_codecs import encode_bmp

    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    base_ids = np.full(n, -1, np.int64)
    pixels: list[np.ndarray] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.15:
            j = int(rng.integers(0, i))
            base = pixels[j].astype(np.int64)
            noise = rng.integers(-2, 3, size=base.shape)
            shift = int(rng.integers(-3, 4))
            img = np.clip(base + noise + shift, 0, 255).astype(np.uint8)
            base_ids[i] = j
        else:
            w = int(rng.integers(48, 96))
            h = int(rng.integers(48, 96))
            img = _synth_image(rng, w, h)
        pixels.append(img)
        payloads.append(encode_bmp(img))
    if _pixel_truth is not None:
        _pixel_truth.extend(pixels)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "base_id": pa.array(base_ids),
        }
    )


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type II, norm='ortho') as a dense
    float64 matrix — applied as two matmuls per image."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def phash64(rgb: np.ndarray, *, grid: int = 32, block: int = 8) -> int:
    """Classic pHash of an RGB uint8 array: grayscale (integer channel
    mean), block-mean resize to grid x grid, 2-D DCT-II, keep the
    low-frequency block x block corner, threshold every coefficient
    except DC against the MEDIAN of the rest. Returns a 64-bit sketch
    as signed int64 (bit i = coefficient i in row-major order; DC bit
    0). Small pixel noise moves high frequencies, not the low block —
    near-identical images land within a few bits."""
    g = rgb.astype(np.int64).sum(axis=2) // 3
    h, w = g.shape
    # block-mean resize: pixel (r, c) -> cell (r*grid//h, c*grid//w)
    ri = (np.arange(h, dtype=np.int64) * grid) // h
    ci = (np.arange(w, dtype=np.int64) * grid) // w
    cell = ri[:, None] * grid + ci[None, :]
    sums = np.bincount(cell.ravel(), weights=g.ravel(), minlength=grid * grid)
    cnts = np.bincount(cell.ravel(), minlength=grid * grid)
    small = (sums / np.maximum(cnts, 1)).reshape(grid, grid)
    d = _dct_matrix(grid)
    freq = d @ small @ d.T
    low = freq[:block, :block].ravel()
    med = np.median(low[1:])
    bits = np.zeros(block * block, np.uint64)
    bits[1:] = (low[1:] > med).astype(np.uint64)
    v = np.uint64(0)
    for i in range(block * block):
        v |= bits[i] << np.uint64(i)
    return int(v.view(np.int64) if hasattr(v, "view") else v)


class PHashStage:
    """Actor-pool stage: BMP payload -> (media_id, phash). The DCT
    basis matrix is built ONCE per actor in ``__init__``; per batch the
    decode + hash loop is per-IMAGE C-speed numpy (images are the batch
    unit, like model inference)."""

    def __init__(self, *, grid: int = 32, block: int = 8):
        self.grid = grid
        self.block = block
        self._dct = _dct_matrix(grid)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.media_codecs import decode_bmp

        out = np.empty(batch.num_rows, np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            out[i] = phash64(decode_bmp(p), grid=self.grid, block=self.block)
        return pa.table({"media_id": batch["media_id"], "phash": pa.array(out)})


class ThumbnailStage:
    """Actor-pool stage: BMP payload -> aspect-fit thumbnail (decode,
    nearest-neighbor resample, re-encode) + (dims, sha1) provenance —
    the image half of a multimodal prep pipeline (dedup by thumb hash,
    preview serving, model input normalization). All integer/floor
    arithmetic, so output bytes are bit-reproducible at any
    partitioning and the SQL twin replays the dimension rule."""

    def __init__(self, *, max_side: int = 32):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.media_codecs import (
            decode_bmp,
            encode_bmp,
            resize_nearest,
            thumb_dims,
        )

        n = batch.num_rows
        ws = np.empty(n, np.int64)
        hs = np.empty(n, np.int64)
        tws = np.empty(n, np.int64)
        ths = np.empty(n, np.int64)
        nbytes = np.empty(n, np.int64)
        thumbs: list[bytes] = []
        sha1s: list[str] = []
        for i, p in enumerate(batch["payload"].to_pylist()):
            rgb = decode_bmp(p)
            hs[i], ws[i] = rgb.shape[0], rgb.shape[1]
            tw, th = thumb_dims(int(ws[i]), int(hs[i]), self.max_side)
            tws[i], ths[i] = tw, th
            tp = encode_bmp(resize_nearest(rgb, tw, th))
            nbytes[i] = len(tp)
            thumbs.append(tp)
            sha1s.append(hashlib.sha1(tp).hexdigest())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(ws),
                "height": pa.array(hs),
                "thumb_w": pa.array(tws),
                "thumb_h": pa.array(ths),
                "thumb_bytes": pa.array(nbytes),
                "thumb_sha1": pa.array(sha1s, pa.string()),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


class AudioResampleStage:
    """Actor-pool stage: WAV payload -> integer-factor downsample
    (every ``factor``-th sample — the exact decimation a feature
    frontend applies before FFT) + re-encode + provenance. All integer
    slicing, so output bytes are bit-reproducible at any partitioning;
    the SQL twin replays the arithmetic (sample counts, rate) and
    checks the payload via embedded pure-function sha1."""

    def __init__(self, *, factor: int = 2):
        assert factor >= 1
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.media_codecs import decode_wav, encode_wav

        n = batch.num_rows
        in_n = np.empty(n, np.int64)
        out_n = np.empty(n, np.int64)
        out_rate = np.empty(n, np.int64)
        nbytes = np.empty(n, np.int64)
        sha1s: list[str] = []
        for i, p in enumerate(batch["payload"].to_pylist()):
            samples, rate = decode_wav(p)
            ds = np.ascontiguousarray(samples[:: self.factor])
            rr = rate // self.factor
            enc = encode_wav(ds, rr)
            in_n[i] = samples.size
            out_n[i] = ds.size
            out_rate[i] = rr
            nbytes[i] = len(enc)
            sha1s.append(hashlib.sha1(enc).hexdigest())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_samples": pa.array(in_n),
                "out_samples": pa.array(out_n),
                "out_rate": pa.array(out_rate),
                "out_bytes": pa.array(nbytes),
                "out_sha1": pa.array(sha1s, pa.string()),
            }
        )


def phash_near_dups(
    media, *, max_hamming: int = 3, num_chunks: int = 4, concurrency: int | None = None
):
    """Image near-dup pairs by perceptual hash: PHashStage actor pool
    -> the generic 64-bit pigeonhole banding + popcount verify
    (``stages/dedup.hamming_band_pairs`` — the SimHash machinery reused
    on a visual sketch). Output: doc_a, doc_b, hamming."""
    from .dedup import hamming_band_pairs

    hashes = media.map_batches(
        PHashStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency or 4,
    )
    return hamming_band_pairs(
        hashes,
        hash_col="phash",
        id_col="media_id",
        max_hamming=max_hamming,
        num_chunks=num_chunks,
    )


def synth_audio_neardup(n: int, seed: int = 44, *, rate: int = 8000) -> pa.Table:
    """Deterministic audio corpus with planted near-duplicates: each
    clip is a sum of 3 random sinusoids + noise, PCM16-encoded; ~15% of
    rows re-encode an earlier base clip through a small gain change and
    fresh low-amplitude noise — byte-different payloads whose band-
    energy spectra, and therefore fingerprints, stay within a few bits
    of the base. ``base_id`` carries the ground truth (-1 for
    originals). Pure function of (n, seed)."""
    from ..functions.media_codecs import encode_wav

    rng = np.random.default_rng(seed)
    n_samp = rate // 2  # 0.5 s clips
    t = np.arange(n_samp, dtype=np.float64) / rate
    payloads: list[bytes] = []
    base_ids = np.full(n, -1, np.int64)
    waves: list[np.ndarray] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.15:
            j = int(rng.integers(0, i))
            gain = 1.0 + float(rng.uniform(-0.01, 0.01))
            noise = rng.normal(0.0, 10.0, n_samp)
            w = waves[j] * gain + noise
            base_ids[i] = j
        else:
            # non-stationary on purpose: linear chirps under random
            # Gaussian envelopes, so the 16 analysis frames carry
            # DIFFERENT spectra and the fingerprint uses all 64 bits
            # (a stationary tone repeats one frame's bits 16x)
            w = rng.normal(0.0, 40.0, n_samp)
            dur = t[-1]
            for _ in range(3):
                f0 = float(rng.uniform(100.0, rate / 2 - 500.0))
                f1 = float(rng.uniform(100.0, rate / 2 - 500.0))
                a = float(rng.uniform(1500.0, 4000.0))
                ph = float(rng.uniform(0.0, 2.0 * np.pi))
                c0 = float(rng.uniform(0.0, dur))
                sg = float(rng.uniform(0.05, 0.3))
                env = np.exp(-0.5 * ((t - c0) / sg) ** 2)
                inst = 2.0 * np.pi * (f0 * t + 0.5 * (f1 - f0) / dur * t * t)
                w = w + a * env * np.sin(inst + ph)
        waves.append(w)
        payloads.append(encode_wav(np.clip(w, -32768, 32767).astype(np.int16), rate))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "base_id": pa.array(base_ids),
        }
    )


def afp64(samples: np.ndarray, *, frames: int = 16, bands: int = 4) -> int:
    """64-bit audio fingerprint (chromaprint-flavored, pure numpy):
    split the clip into ``frames`` equal frames, rfft each, sum |X|^2
    over ``bands`` log-spaced frequency bands (DC excluded), threshold
    each (frame, band) energy against its BAND's median across frames
    (the ``phash64`` median-sketch rule, applied per band: a global
    median would leave every quiet frame all-zero and collapse sketch
    entropy). Gain changes scale a band's energies uniformly (median
    invariant); low-amplitude noise moves energies a little —
    near-identical clips land within a few bits."""
    x = samples.astype(np.float64)
    flen = x.size // frames
    if flen == 0:  # shorter than one sample per frame: degenerate clip
        return 0
    fr = x[: flen * frames].reshape(frames, flen)
    spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
    nf = spec.shape[1] - 1  # usable bins, DC excluded
    # log-spaced band edges over bins [1, nf]
    edges = np.unique(
        np.rint(np.logspace(0, np.log10(nf), bands + 1)).astype(np.int64)
    )
    while edges.size < bands + 1:  # tiny clips: pad linearly
        edges = np.append(edges, edges[-1] + 1)
    e = np.zeros((frames, bands))
    for b in range(bands):
        e[:, b] = spec[:, edges[b] : edges[b + 1]].sum(axis=1)
    bits = (e > np.median(e, axis=0, keepdims=True)).ravel().astype(np.uint64)
    v = np.uint64(0)
    for i in range(frames * bands):
        v |= bits[i] << np.uint64(i)
    return int(v.astype(np.int64))


class AudioFPStage:
    """Actor-pool stage: WAV payload -> (media_id, afp). Per batch the
    decode + fingerprint loop is per-CLIP C-speed numpy (clips are the
    batch unit, like model inference)."""

    def __init__(self, *, frames: int = 16, bands: int = 4):
        self.frames = frames
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.media_codecs import decode_wav

        out = np.empty(batch.num_rows, np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            samples, _rate = decode_wav(p)
            out[i] = afp64(samples, frames=self.frames, bands=self.bands)
        return pa.table({"media_id": batch["media_id"], "afp": pa.array(out)})


def audio_near_dups(
    media, *, max_hamming: int = 3, num_chunks: int = 4, concurrency: int | None = None
):
    """Audio near-dup pairs by band-energy fingerprint: AudioFPStage
    actor pool -> the generic 64-bit pigeonhole banding + popcount
    verify (``stages/dedup.hamming_band_pairs`` — the third consumer of
    the SimHash machinery, after text and images). Output: doc_a,
    doc_b, hamming."""
    from .dedup import hamming_band_pairs

    hashes = media.map_batches(
        AudioFPStage,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency or 4,
    )
    return hamming_band_pairs(
        hashes,
        hash_col="afp",
        id_col="media_id",
        max_hamming=max_hamming,
        num_chunks=num_chunks,
    )


def synth_video_neardup(n: int, seed: int = 45) -> pa.Table:
    """Deterministic WSMV video corpus with planted near-duplicates:
    each clip is 4-8 frames of synthetic imagery; ~15% of rows
    re-encode an earlier base clip with per-frame +-2 pixel noise and a
    small brightness shift — byte-different payloads (exact dedup
    misses them) whose per-frame pHashes, and therefore the clip
    fingerprint, stay within a few bits. ``base_id`` carries the ground
    truth (-1 for originals). Pure function of (n, seed)."""
    from ..functions.media_codecs import encode_wsmv

    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    base_ids = np.full(n, -1, np.int64)
    clips: list[list[np.ndarray]] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.15:
            j = int(rng.integers(0, i))
            shift = int(rng.integers(-3, 4))
            frames = []
            for f in clips[j]:
                noise = rng.integers(-2, 3, size=f.shape)
                frames.append(
                    np.clip(f.astype(np.int64) + noise + shift, 0, 255).astype(
                        np.uint8
                    )
                )
            base_ids[i] = j
        else:
            w = int(rng.integers(48, 64))
            h = int(rng.integers(48, 64))
            frames = [
                _synth_image(rng, w, h) for _ in range(int(rng.integers(4, 9)))
            ]
        clips.append(frames)
        payloads.append(encode_wsmv(frames, frame_ms=500))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "base_id": pa.array(base_ids),
        }
    )


def vhash64(payload: bytes, *, max_frames: int = 8, grid: int = 32, block: int = 8) -> int:
    """64-bit video fingerprint: XOR of the pHashes of <= ``max_frames``
    stride-sampled frames (the WSMV offset table means ONLY sampled
    frames are decoded — the bound that keeps per-clip cost constant
    regardless of clip length). XOR keeps every output bit uniform
    across unrelated clips (XOR of independent ~uniform bits stays
    uniform — a majority vote instead collapses entropy on biased
    bits, measured: 560/7116 unrelated pairs within 3 bits), while a
    near-duplicate's distance is bounded by the SUM of its per-frame
    pHash flips (a few bits total for pixel-noise variants). Order-
    invariant across frames; same-length re-encodes sample the same
    frame indices."""
    from ..functions.media_codecs import decode_wsmv_frame, wsmv_info

    n, _ms = wsmv_info(payload)
    take = min(max_frames, n)
    v = np.uint64(0)
    for k in range(take):
        ix = (k * n) // take
        ph = phash64(decode_wsmv_frame(payload, int(ix)), grid=grid, block=block)
        v ^= np.uint64(np.array(ph, dtype=np.int64).view(np.uint64))
    return int(np.array(v, dtype=np.uint64).view(np.int64))


class VideoFPStage:
    """Actor-pool stage: WSMV payload -> (media_id, vhash). The DCT
    basis is built ONCE per actor; per batch the sample-decode + hash
    loop is per-CLIP C-speed numpy over <= max_frames frames."""

    def __init__(self, *, max_frames: int = 8, grid: int = 32, block: int = 8):
        self.max_frames = max_frames
        self.grid = grid
        self.block = block
        self._dct = _dct_matrix(grid)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            out[i] = vhash64(
                p, max_frames=self.max_frames, grid=self.grid, block=self.block
            )
        return pa.table({"media_id": batch["media_id"], "vhash": pa.array(out)})


def video_near_dups(
    media, *, max_hamming: int = 4, num_chunks: int = 8, concurrency: int | None = None
):
    """Video near-dup pairs by majority-of-frame-pHashes fingerprint:
    VideoFPStage actor pool -> the generic 64-bit pigeonhole banding +
    popcount verify (``stages/dedup.hamming_band_pairs`` — the FOURTH
    consumer of the SimHash machinery, after text, images and audio).
    Output: doc_a, doc_b, hamming."""
    from .dedup import hamming_band_pairs

    hashes = media.map_batches(
        VideoFPStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency or 4,
    )
    return hamming_band_pairs(
        hashes,
        hash_col="vhash",
        id_col="media_id",
        max_hamming=max_hamming,
        num_chunks=num_chunks,
    )


def image_stats(rgb: np.ndarray) -> tuple:
    """Exact integer per-image channel statistics of an (h, w, 3)
    uint8 pixel array — the profiling pass an image-curation pipeline
    gates on (too dark / too flat / wrong colour cast). All values are
    exact ints: channel means as e4 floors, ITU-R BT.601 integer luma
    ((299r + 587g + 114b) // 1000), dark/bright pixel counts at the
    64/192 luma thresholds, contrast = max - min luma. Pure function —
    shared verbatim by the engine stage and the oracle replay."""
    px = rgb.astype(np.int64)
    n = px.shape[0] * px.shape[1]
    sums = px.reshape(-1, 3).sum(axis=0)
    luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
    return (
        int((10_000 * sums[0]) // n),
        int((10_000 * sums[1]) // n),
        int((10_000 * sums[2]) // n),
        int(luma.min()),
        int(luma.max()),
        int((luma < 64).sum()),
        int((luma >= 192).sum()),
    )


class ImageStatsStage:
    """payload batch -> per-image exact channel statistics: REAL BMP
    decode per row (``functions/media_codecs.decode_bmp``), then the
    :func:`image_stats` integer kernel. Actor-pool stage (import cost
    once per actor); malformed payloads emit ``decoded=false`` zero
    rows rather than aborting the batch (the MediaFeatureStage
    fallback contract)."""

    def __init__(self):
        from ..functions.media_codecs import decode_bmp

        self._decode = decode_bmp

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out = {
            "media_id": [], "decoded": [], "width": [], "height": [],
            "mean_r_e4": [], "mean_g_e4": [], "mean_b_e4": [],
            "min_luma": [], "max_luma": [], "n_dark": [], "n_bright": [],
        }
        for mid, payload in zip(ids, batch["payload"].to_pylist()):
            out["media_id"].append(int(mid))
            try:
                rgb = self._decode(payload)
                st = image_stats(rgb)
                out["decoded"].append(True)
                out["width"].append(int(rgb.shape[1]))
                out["height"].append(int(rgb.shape[0]))
                for k, v in zip(
                    ("mean_r_e4", "mean_g_e4", "mean_b_e4", "min_luma",
                     "max_luma", "n_dark", "n_bright"),
                    st,
                ):
                    out[k].append(v)
            except Exception:
                out["decoded"].append(False)
                for k in ("width", "height", "mean_r_e4", "mean_g_e4",
                          "mean_b_e4", "min_luma", "max_luma", "n_dark",
                          "n_bright"):
                    out[k].append(0)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "decoded": pa.array(out["decoded"], pa.bool_()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
                "mean_r_e4": pa.array(out["mean_r_e4"], pa.int64()),
                "mean_g_e4": pa.array(out["mean_g_e4"], pa.int64()),
                "mean_b_e4": pa.array(out["mean_b_e4"], pa.int64()),
                "min_luma": pa.array(out["min_luma"], pa.int64()),
                "max_luma": pa.array(out["max_luma"], pa.int64()),
                "n_dark": pa.array(out["n_dark"], pa.int64()),
                "n_bright": pa.array(out["n_bright"], pa.int64()),
            }
        )


def synth_video_scenes(
    n: int, seed: int = 46, _truth: list | None = None
) -> pa.Table:
    """Deterministic WSMV corpus with planted SCENE STRUCTURE: each
    clip is 2-4 scenes, each scene 3-5 frames of one base image with
    +-2 pixel noise per frame — so consecutive frames WITHIN a scene
    are a few pHash bits apart and frames ACROSS a scene boundary are
    unrelated (a hard cut). ``_truth`` (optional out-param) collects
    per-clip (n_frames, n_cuts = n_scenes - 1). Pure function of
    (n, seed)."""
    from ..functions.media_codecs import encode_wsmv

    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    for i in range(n):
        w = int(rng.integers(48, 64))
        h = int(rng.integers(48, 64))
        n_scenes = int(rng.integers(2, 5))
        frames: list[np.ndarray] = []
        for _s in range(n_scenes):
            base = _synth_image(rng, w, h).astype(np.int64)
            for _f in range(int(rng.integers(3, 6))):
                noise = rng.integers(-2, 3, size=base.shape)
                frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
        if _truth is not None:
            _truth.append((len(frames), n_scenes - 1))
        payloads.append(encode_wsmv(frames, frame_ms=250))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def scene_cut_count(payload: bytes, *, thr_mean_x1: int = 4) -> tuple:
    """Shot-boundary detection on a WSMV clip: the classic PIXEL
    DIFFERENCE method — a hard cut between consecutive frames when the
    mean absolute pixel difference exceeds ``thr_mean_x1``, compared as
    the EXACT integer ``sum|a-b| > thr * n_values`` (no float). pHash
    is the wrong tool here: on low-texture frames small noise flips
    near-zero DCT signs, so within-scene hamming is unstable (measured
    0-39 bits on the synthetic corpus) while raw pixel deltas separate
    cleanly (~1.5 within a scene vs ~10.7 across). Decodes EVERY frame
    (unlike the stride-sampled ``vhash64`` — boundary detection is
    inherently sequential). Pure function shared by the stage and the
    oracle replay. Returns (n_frames, n_cuts)."""
    from ..functions.media_codecs import decode_wsmv_frame, wsmv_info

    n, _ms = wsmv_info(payload)
    cuts = 0
    prev = None
    for i in range(n):
        f = decode_wsmv_frame(payload, i).astype(np.int64)
        if prev is not None and prev.shape == f.shape:
            if int(np.abs(f - prev).sum()) > thr_mean_x1 * f.size:
                cuts += 1
        elif prev is not None:
            cuts += 1  # resolution change is a cut by definition
        prev = f
    return n, cuts


class SceneCutStage:
    """payload batch -> (media_id, n_frames, n_cuts): real WSMV decode
    + per-frame pHash + consecutive hamming threshold — the
    shot-boundary segmentation a video-curation pipeline samples clips
    by. Actor-pool stage; malformed payloads emit decoded=false."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dec, nf, nc = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(int(mid))
            try:
                n, cuts = scene_cut_count(payload)
                dec.append(True)
                nf.append(n)
                nc.append(cuts)
            except Exception:
                dec.append(False)
                nf.append(0)
                nc.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "decoded": pa.array(dec, pa.bool_()),
                "n_frames": pa.array(nf, pa.int64()),
                "n_cuts": pa.array(nc, pa.int64()),
            }
        )


def synth_audio_segments(
    n: int, seed: int = 47, *, rate: int = 8000, _truth: list | None = None
) -> pa.Table:
    """Deterministic audio corpus with planted ACTIVITY STRUCTURE: each
    clip alternates 1-4 loud tone bursts (amplitude ~4000) with silence
    gaps (tiny noise, amplitude ~10) of 100-300 ms each. ``_truth``
    (optional out-param) collects the planted per-clip active-segment
    count. Pure function of (n, seed)."""
    from ..functions.media_codecs import encode_wav

    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    for i in range(n):
        n_seg = int(rng.integers(1, 5))
        parts = []
        for s in range(n_seg):
            gap = int(rng.integers(rate // 10, 3 * rate // 10))
            parts.append(rng.normal(0.0, 10.0, gap))
            burst = int(rng.integers(rate // 10, 3 * rate // 10))
            f0 = float(rng.uniform(200.0, 2000.0))
            tt = np.arange(burst) / rate
            parts.append(4000.0 * np.sin(2 * np.pi * f0 * tt))
        parts.append(rng.normal(0.0, 10.0, int(rng.integers(rate // 10, rate // 5))))
        w = np.concatenate(parts)
        if _truth is not None:
            _truth.append(n_seg)
        payloads.append(encode_wav(np.clip(w, -32768, 32767).astype(np.int16), rate))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def audio_segment_count(payload: bytes, *, win_ms: int = 50, thr: int = 500) -> tuple:
    """Energy-based activity segmentation (the VAD primitive speech
    pipelines gate on): the clip splits into ``win_ms`` windows; a
    window is ACTIVE when its energy exceeds the threshold, compared as
    the EXACT integer ``sum(x^2) > thr^2 * n_win_samples`` (no float,
    no sqrt); segments = runs of consecutive active windows. Pure
    function shared by the stage and the oracle replay. Returns
    (n_windows, n_active_windows, n_segments)."""
    from ..functions.media_codecs import decode_wav

    samples, rate = decode_wav(payload)
    x = samples.astype(np.int64)
    w = max(1, rate * win_ms // 1000)
    n_win = x.size // w
    if n_win == 0:
        return 0, 0, 0
    e = (x[: n_win * w] * x[: n_win * w]).reshape(n_win, w).sum(axis=1)
    active = e > thr * thr * w
    segs = int(active[0]) + int((active[1:] & ~active[:-1]).sum())
    return int(n_win), int(active.sum()), segs


class AudioSegmentStage:
    """payload batch -> (media_id, decoded, n_windows, n_active,
    n_segments): real WAV decode + the exact-integer energy VAD kernel.
    Actor-pool stage; malformed payloads emit decoded=false."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dec, nw, na, ns = [], [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            ids.append(int(mid))
            try:
                w, a, s = audio_segment_count(payload)
                dec.append(True)
                nw.append(w)
                na.append(a)
                ns.append(s)
            except Exception:
                dec.append(False)
                nw.append(0)
                na.append(0)
                ns.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "decoded": pa.array(dec, pa.bool_()),
                "n_windows": pa.array(nw, pa.int64()),
                "n_active": pa.array(na, pa.int64()),
                "n_segments": pa.array(ns, pa.int64()),
            }
        )
