"""Multimodal plumbing: schema, actor-pool stage, frame explode, stub
seam. Decoders are fakes by design (no image/audio libs in container)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    FrameSampleStage,
    MediaFeatureStage,
    synth_media,
)


def test_synth_media_schema_and_determinism():
    a, b = synth_media(50), synth_media(50)
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)


def test_feature_stage_pipeline():
    tbl = synth_media(60)
    ds = rd.from_arrow(tbl)
    # small batches on purpose: large binary payloads
    out = ds.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert len(out) == 60
    assert "payload" not in out.columns  # payload dropped after extract
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # identical payload bytes -> identical features (dedup by feature works)
    by_sha = out.groupby("payload_sha1")["feature"].apply(
        lambda fs: len({tuple(np.round(f, 6)) for f in fs})
    )
    assert (by_sha == 1).all()
    dups = out["payload_sha1"].duplicated().sum()
    assert dups > 0  # corpus really contains dup payloads


def test_frame_sample_explode():
    tbl = synth_media(30)
    vids = tbl.filter(pa.compute.equal(tbl["kind"], "video"))
    assert vids.num_rows > 0
    out = (
        rd.from_arrow(vids)
        .map_batches(FrameSampleStage, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    for mid, dur in zip(vids["media_id"].to_pylist(), vids["duration_ms"].to_pylist()):
        frames = out[out["media_id"] == mid]
        assert len(frames) == min(32, max(1, dur // 1000))
        assert frames["frame_idx"].tolist() == list(range(len(frames)))


def test_real_mode_raises_at_decode_seam():
    stage = MediaFeatureStage(decode_mode="real")
    tbl = synth_media(3)
    with pytest.raises(NotImplementedError):
        stage(tbl)
