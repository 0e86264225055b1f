"""Multimodal stub stages: schema, actor signatures, batch plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from txiac_qc_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    MEDIA_SCHEMA,
    VideoFrameSampleStage,
    media_pipeline,
    synth_media_table,
)


def test_synth_media_deterministic():
    a, b = synth_media_table(50), synth_media_table(50)
    assert a.equals(b)
    assert a.schema.equals(MEDIA_SCHEMA)


def test_image_stage_direct():
    t = synth_media_table(40)
    out = ImageDecodeStage()(t)
    assert "img_mean_rgb" in out.column_names
    is_img = np.asarray(pa.compute.equal(t["media_type"], "image"))
    stats = out.column("img_mean_rgb").to_pylist()
    for i, m in enumerate(is_img):
        if m:
            assert not any(np.isnan(stats[i]))
        else:
            assert all(np.isnan(stats[i]))


def test_image_stage_fake_flag():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(allow_fake=False)


def test_video_frame_offsets():
    t = synth_media_table(60)
    out = VideoFrameSampleStage(k_frames=4)(t)
    nf = np.asarray(t["n_frames"])
    for offs, n, mt in zip(out.column("frame_offsets").to_pylist(), nf,
                           t.column("media_type").to_pylist()):
        if mt == "video":
            assert 1 <= len(offs) <= 4
            assert all(0 <= o < n for o in offs)
        else:
            assert offs == []


def test_media_pipeline_end_to_end(ray_session):
    import ray.data

    t = synth_media_table(200)
    ds = media_pipeline(ray.data.from_arrow(t), batch_size=32, concurrency=(1, 2))
    df = ds.to_pandas()
    assert len(df) == 200
    assert "payload" not in df.columns  # wide column dropped before sink
    for col in ("img_mean_rgb", "audio_mfcc", "frame_offsets"):
        assert col in df.columns
    # deterministic under re-run
    df2 = media_pipeline(ray.data.from_arrow(t), batch_size=64, concurrency=(1, 2)).to_pandas()
    a = np.stack(df.sort_values("media_id", ignore_index=True)["audio_mfcc"].to_numpy())
    b = np.stack(df2.sort_values("media_id", ignore_index=True)["audio_mfcc"].to_numpy())
    np.testing.assert_array_equal(a, b)  # NaN == NaN under array_equal
