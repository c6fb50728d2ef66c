"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see ``_require_codec``): ``decode_mode="fake"``
substitutes a deterministic, size-aware fake so the Ray-side plumbing —
schema, small-batch sizing for large payloads, actor signature, output
layout — is real and tested; ``decode_mode="real"`` raises
``NotImplementedError`` at the exact seam where PIL/ffmpeg would slot
in.

Scale notes:
- Large binary payloads mean SMALL batches: callers pass
  ``batch_size=8..64`` so batch x concurrency fits a worker heap; the
  payload column is dropped as soon as features are extracted
  (projection discipline, same as the ``html`` column in the index
  build).
- The stage is stateful on purpose: a real decoder/model would be
  loaded once per actor in ``__init__`` (the reference analog is the
  per-JVM robots cache, ``crawler/Crawler.java:27``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def _require_codec(kind: str) -> None:
    raise NotImplementedError(
        f"no {kind} codec in this environment — plug a real decoder "
        "(PIL / soundfile / pyav) into MediaFeatureStage._decode_real; "
        "the surrounding Ray plumbing is complete and tested with "
        "decode_mode='fake'"
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector: seeded by the payload's
    blake2b digest, so identical bytes -> identical features (lets tests
    assert dedup-by-feature without a real model)."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureStage:
    """binary payload -> feature vector + basic metadata.

    Output: media_id, kind, mime, payload_bytes, feature(list<float>),
    payload_sha1. The ``payload`` column is consumed and NOT re-emitted.
    """

    def __init__(self, *, decode_mode: str = "fake", feature_dim: int = FEATURE_DIM):
        assert decode_mode in ("fake", "real")
        self.decode_mode = decode_mode
        self.feature_dim = feature_dim
        # a real implementation loads the model/codec here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        sha1s: list[str] = []
        sizes = np.empty(len(payloads), dtype=np.int64)
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            if self.decode_mode == "real":
                _require_codec(kind)
            feats[i] = _fake_features(p, self.feature_dim)
            sha1s.append(hashlib.sha1(p).hexdigest())
            sizes[i] = len(p)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "mime": batch["mime"],
                "payload_bytes": pa.array(sizes),
                "payload_sha1": pa.array(sha1s, pa.string()),
                "feature": pa.array(
                    [feats[i].tolist() for i in range(feats.shape[0])],
                    pa.list_(pa.float32()),
                ),
            }
        )


class FrameSampleStage:
    """video payload -> one row per sampled frame offset.

    Frame DECODE is stubbed; frame SELECTION (uniform every
    ``stride_ms`` over ``duration_ms``) and the 1->N row explode are
    real. Output: media_id, frame_idx, frame_ts_ms, frame_sha1."""

    def __init__(self, *, stride_ms: int = 1000, max_frames: int = 32):
        self.stride_ms = stride_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_ts, out_sha = [], [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n = min(self.max_frames, max(1, int(dur) // self.stride_ms))
            for f in range(n):
                ts = f * self.stride_ms
                # real path: decode frame at ts; fake: hash(payload, ts)
                h = hashlib.sha1(payload + ts.to_bytes(8, "big")).hexdigest()
                out_id.append(mid)
                out_idx.append(f)
                out_ts.append(ts)
                out_sha.append(h)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "frame_sha1": pa.array(out_sha, pa.string()),
            }
        )


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads with realistic
    size spread; ~6% exact-duplicate payloads) for tests/bench."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"]), size=n, p=[0.7, 0.2, 0.1])
    sizes = np.clip(np.exp(rng.normal(np.log(4096), 1.0, size=n)).astype(np.int64), 64, 262144)
    dup = rng.random(n) < 0.06
    rows_payload: list[bytes] = []
    for i in range(n):
        if dup[i] and i > 0:
            rows_payload.append(rows_payload[rng.integers(0, i)])
        else:
            rows_payload.append(rng.bytes(int(sizes[i])))
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(rows_payload, pa.binary()),
            "mime": pa.array([mimes[k] for k in kinds.tolist()], pa.string()),
            "width": pa.array(
                np.where(kinds == "image", rng.integers(64, 2048, n), -1).astype(np.int32)
            ),
            "height": pa.array(
                np.where(kinds == "image", rng.integers(64, 2048, n), -1).astype(np.int32)
            ),
            "duration_ms": pa.array(
                np.where(kinds != "image", rng.integers(1000, 30000, n), -1).astype(np.int32)
            ),
        },
        schema=MEDIA_SCHEMA,
    )
