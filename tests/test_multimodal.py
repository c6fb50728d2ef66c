"""Multimodal stages with REAL pure-numpy codecs (BMP / WAV-PCM16 /
WSMV frame container): codec round-trips, decoded features, frame
sampling that touches actual pixels, and malformed-payload fallback."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
    decode_bmp,
    decode_wav,
    decode_wsmv_frame,
    encode_bmp,
    encode_wav,
    encode_wsmv,
    image_features,
    wsmv_info,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    FrameSampleStage,
    MediaFeatureStage,
    synth_media,
)


def test_bmp_roundtrip_including_padding():
    rng = np.random.default_rng(0)
    for w, h in [(1, 1), (3, 2), (5, 7), (64, 16)]:  # odd widths hit row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (w, h)


def test_wav_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(-30000, 30000, size=4321).astype(np.int16)
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(got, x)


def test_wsmv_frame_addressing():
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8) for _ in range(5)]
    blob = encode_wsmv(frames, 250)
    assert wsmv_info(blob) == (5, 250)
    for i in (0, 2, 4):
        assert np.array_equal(decode_wsmv_frame(blob, i), frames[i])


def test_synth_media_schema_and_determinism():
    a, b = synth_media(50), synth_media(50)
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)


def test_feature_stage_pipeline(ray_session):
    tbl = synth_media(60)
    ds = rd.from_arrow(tbl)
    # small batches on purpose: large binary payloads
    out = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(out) == 60
    assert "payload" not in out.columns  # payload dropped after extract
    assert out["decoded"].all()  # every synthetic payload really decodes
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # decoded metadata matches the generator's
    src = tbl.to_pandas()
    m = out.set_index("media_id")
    for _, row in src.iterrows():
        if row["kind"] == "image":
            assert m.loc[row["media_id"], "width"] == row["width"]
            assert m.loc[row["media_id"], "height"] == row["height"]
        elif row["kind"] == "audio":
            assert abs(m.loc[row["media_id"], "duration_ms"] - row["duration_ms"]) <= 1
    # identical payload bytes -> identical features (dedup by feature works)
    by_sha = out.groupby("payload_sha1")["feature"].apply(
        lambda fs: len({tuple(np.round(f, 6)) for f in fs})
    )
    assert (by_sha == 1).all()
    assert out["payload_sha1"].duplicated().sum() > 0  # corpus has dup payloads


def test_feature_is_really_the_thumbnail():
    """The image feature is the actual 8x8 area-averaged grayscale
    thumbnail of the decoded pixels — check against a flat-color image."""
    img = np.full((32, 40, 3), 200, np.uint8)
    stage = MediaFeatureStage()
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_bmp(img)], pa.binary()),
            "mime": pa.array(["image/bmp"]),
        }
    )
    out = stage(batch)
    feat = np.array(out["feature"][0].as_py(), np.float32)
    assert np.allclose(feat, 200.0 / 255.0, atol=1e-3)
    assert np.allclose(feat, image_features(img), atol=1e-6)


def test_malformed_payload_falls_back_not_crashes():
    stage = MediaFeatureStage()
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["image", "audio"]),
            "payload": pa.array([b"not a bmp", b"junk"], pa.binary()),
            "mime": pa.array(["image/bmp", "audio/wav"]),
        }
    )
    out = stage(batch)
    assert out["decoded"].to_pylist() == [False, False]
    assert all(len(f) == FEATURE_DIM for f in out["feature"].to_pylist())


def test_frame_sample_really_decodes(ray_session):
    tbl = synth_media(30)
    vids = tbl.filter(pa.compute.equal(tbl["kind"], "video"))
    assert vids.num_rows > 0
    out = (
        rd.from_arrow(vids)
        .map_batches(FrameSampleStage, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    for mid, payload in zip(vids["media_id"].to_pylist(), vids["payload"].to_pylist()):
        n_frames, frame_ms = wsmv_info(payload)
        step = max(1, 1000 // frame_ms)
        picks = list(range(0, n_frames, step))[:32]
        frames = out[out["media_id"] == mid].sort_values("frame_idx")
        assert frames["frame_idx"].tolist() == picks
        # sha and luma match a direct decode of the same frame
        import hashlib

        rgb = decode_wsmv_frame(payload, picks[0])
        assert frames.iloc[0]["frame_sha1"] == hashlib.sha1(rgb.tobytes()).hexdigest()
        assert abs(frames.iloc[0]["mean_luma"] - float(rgb.astype(np.float32).mean())) < 1e-6


def test_audio_fingerprint_near_dups(ray_session):
    # planted gain/noise near-dups are recovered; the sketch pairs are
    # exactly the popcount-<=3 pairs of the pure-function fingerprints
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_wav,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        afp64,
        audio_near_dups,
        synth_audio_neardup,
    )

    tbl = synth_audio_neardup(120)
    got = (
        audio_near_dups(
            rd.from_arrow(tbl.select(["media_id", "payload"])), max_hamming=3
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    fps = [afp64(decode_wav(p)[0]) for p in tbl["payload"].to_pylist()]
    want = sorted(
        (a, b, bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1"))
        for a in range(len(fps))
        for b in range(a + 1, len(fps))
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    )
    assert list(map(tuple, got[["doc_a", "doc_b", "hamming"]].to_numpy())) == want
    # every planted (dup, base) pair is among the sketch pairs
    planted = {
        tuple(sorted((i, b)))
        for i, b in enumerate(tbl["base_id"].to_pylist())
        if b >= 0
    }
    assert planted <= {(a, b) for a, b, _h in want}
    assert len(planted) > 0


def test_video_fingerprint_near_dups(ray_session):
    # planted noise/brightness clip variants are recovered; the sketch
    # pairs are exactly the popcount-<=4 pairs of the pure-function
    # XOR-of-frame-pHash fingerprints, and every planted (dup, base)
    # pair is among them
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_video_neardup,
        vhash64,
        video_near_dups,
    )

    tbl = synth_video_neardup(100)
    got = (
        video_near_dups(
            rd.from_arrow(tbl.select(["media_id", "payload"])), max_hamming=4
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    fps = [vhash64(p) for p in tbl["payload"].to_pylist()]
    want = sorted(
        (a, b, bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1"))
        for a in range(len(fps))
        for b in range(a + 1, len(fps))
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 4
    )
    assert list(map(tuple, got[["doc_a", "doc_b", "hamming"]].to_numpy())) == want
    planted = {
        tuple(sorted((i, b)))
        for i, b in enumerate(tbl["base_id"].to_pylist())
        if b >= 0
    }
    assert planted <= {(a, b) for a, b, _h in want}
    assert len(planted) > 0


def test_vhash64_samples_only_stride_frames():
    # clip length beyond max_frames does not change cost semantics:
    # the fingerprint is a pure function of the stride-sampled frames
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_wsmv_frame,
        encode_wsmv,
        wsmv_info,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        phash64,
        vhash64,
    )

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8) for _ in range(16)
    ]
    payload = encode_wsmv(frames, frame_ms=100)
    n, _ms = wsmv_info(payload)
    assert n == 16
    take = 8
    expect = 0
    for k in range(take):
        ix = (k * n) // take
        expect ^= phash64(decode_wsmv_frame(payload, ix)) & ((1 << 64) - 1)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert vhash64(payload, max_frames=take) == expect


def test_afp64_gain_invariant():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        afp64,
    )

    rng = np.random.default_rng(3)
    t = np.arange(4000) / 8000.0
    w = 3000 * np.exp(-0.5 * ((t - 0.2) / 0.1) ** 2) * np.sin(2 * np.pi * (300 * t + 2000 * t * t))
    a = afp64(np.clip(w, -32768, 32767).astype(np.int16))
    b = afp64(np.clip(w * 0.5, -32768, 32767).astype(np.int16))
    # pure gain change: band medians scale with the energies
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 2


def test_thumbnail_stage_roundtrip():
    """ThumbnailStage: dims follow the aspect-fit floor rule, the
    payload decodes back to exactly resize_nearest of the source, and
    no-op-sized images keep their dims."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_bmp,
        resize_nearest,
        thumb_dims,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        ThumbnailStage,
        synth_images_neardup,
    )

    src = synth_images_neardup(40)
    got = (
        rd.from_arrow(src)
        .map_batches(
            ThumbnailStage, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
        )
        .take_all()
    )
    by_id = {r["media_id"]: r for r in got}
    for mid, p in zip(src["media_id"].to_pylist(), src["payload"].to_pylist()):
        rgb = decode_bmp(p)
        h, w = rgb.shape[0], rgb.shape[1]
        r = by_id[mid]
        assert (r["width"], r["height"]) == (w, h)
        tw, th = thumb_dims(w, h, 32)
        assert (r["thumb_w"], r["thumb_h"]) == (tw, th)
        want = resize_nearest(rgb, tw, th)
        assert (decode_bmp(r["thumb"]) == want).all()

    # no-op path: an image already within max_side keeps its dims
    assert thumb_dims(20, 30, 32) == (20, 30)
    assert thumb_dims(64, 16, 32) == (32, 8)
    assert thumb_dims(200, 3, 32) == (32, 1)


def test_image_stats_decode_inverts_encode():
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        image_stats,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    st = image_stats(decode_bmp(encode_bmp(img)))
    assert st == image_stats(img)
    # exact-integer replay of the kernel contract
    px = img.astype(np.int64)
    n = 17 * 23
    luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
    assert st[0] == (10_000 * int(px[..., 0].sum())) // n
    assert st[3] == int(luma.min()) and st[4] == int(luma.max())
    assert st[5] == int((luma < 64).sum()) and st[6] == int((luma >= 192).sum())

    # malformed payload -> decoded=false row, batch survives
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        ImageStatsStage,
    )

    tbl = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_bmp(img), b"notabmp"], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(ImageStatsStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("media_id")
    )
    assert out.decoded.tolist() == [True, False]


def test_scene_cuts_recover_planted_scenes():
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        SceneCutStage,
        scene_cut_count,
        synth_video_scenes,
    )

    truth = []
    tbl = synth_video_scenes(40, _truth=truth)
    # pure function recovers every planted (n_frames, n_cuts)
    for payload, want in zip(tbl["payload"].to_pylist(), truth):
        assert scene_cut_count(payload) == want
    # distributed stage matches the pure function
    got = (
        rd.from_arrow(tbl)
        .map_batches(SceneCutStage, batch_format="pyarrow", concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert got.decoded.all()
    assert list(zip(got.n_frames, got.n_cuts)) == truth
    # malformed payload path
    import pyarrow as pa

    bad = pa.table(
        {"media_id": pa.array([0], pa.int64()), "payload": pa.array([b"xx"], pa.binary())}
    )
    out = (
        rd.from_arrow(bad)
        .map_batches(SceneCutStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert not out.decoded[0]


def test_audio_segments_recover_planted_bursts():
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        AudioSegmentStage,
        audio_segment_count,
        synth_audio_segments,
    )

    truth = []
    tbl = synth_audio_segments(40, _truth=truth)
    for payload, want in zip(tbl["payload"].to_pylist(), truth):
        assert audio_segment_count(payload)[2] == want
    got = (
        rd.from_arrow(tbl)
        .map_batches(AudioSegmentStage, batch_format="pyarrow", concurrency=2, batch_size=8)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert got.decoded.all()
    assert got.n_segments.tolist() == truth
    assert (got.n_active < got.n_windows).all()  # silence really exists
