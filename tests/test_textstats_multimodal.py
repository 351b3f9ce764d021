import numpy as np
import pyarrow as pa
import pytest
import ray

from blockchainspider_ray.stages.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
    ImageFeatureStage,
    make_fake_image,
)
from blockchainspider_ray.stages.textstats import (
    FingerprintStage,
    LangIdStage,
    predict_lang,
    rolling_fingerprints,
)


def test_predict_lang():
    assert predict_lang("the cat is in the house and it is lazy for now") == "en"
    assert predict_lang("der hund ist nicht mit der katze und das ist gut") == "de"
    assert predict_lang("这是一个中文测试页面内容很多") == "zh"
    assert predict_lang("") == ""


def test_rolling_fingerprints_deterministic_and_shift_invariant_tail():
    t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    a = rolling_fingerprints(t)
    b = rolling_fingerprints(t)
    assert a == b and len(a) == 4
    assert rolling_fingerprints("short text") == rolling_fingerprints("short text")
    assert rolling_fingerprints("") == []


def test_stages_over_ray():
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["the cat is in the house and it is big", "der hund ist nicht hier und das"],
        }
    )
    ds = ray.data.from_arrow(docs)
    langs = ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=1).take_all()
    assert [r["lang_pred"] for r in sorted(langs, key=lambda r: r["doc_id"])] == ["en", "de"]
    fps = ds.map_batches(FingerprintStage, batch_format="pyarrow", concurrency=1).take_all()
    assert all(len(r["fingerprints"]) >= 1 for r in fps)


def test_decode_image_stub_raises():
    t = pa.table({"image_id": [1], "image": [make_fake_image(4, 4)]})
    with pytest.raises(NotImplementedError):
        DecodeImageStage(codec="stub")(t)


def test_decode_image_fake_pipeline():
    imgs = pa.table(
        {
            "image_id": pa.array([1, 2, 3], pa.int64()),
            "image": pa.array(
                [make_fake_image(8, 6, 3, seed=i) for i in range(3)], pa.binary()
            ),
        }
    )
    ds = ray.data.from_arrow(imgs)
    out = ds.map_batches(
        DecodeImageStage(codec="fake"), batch_format="pyarrow", batch_size=2
    ).take_all()
    assert len(out) == 3
    for r in out:
        assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
        assert 0 <= r["mean_luma"] <= 255
        assert "image" not in r  # payload dropped

    feats = ds.map_batches(
        ImageFeatureStage(codec="fake"), batch_format="pyarrow", batch_size=2
    ).take_all()
    assert all(len(r["feature"]) == 16 for r in feats)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in feats)


def test_frame_sampling():
    video = b"".join(make_fake_image(4, 4, 3, seed=i) for i in range(6))
    t = pa.table({"video_id": pa.array([7], pa.int64()), "video": pa.array([video], pa.binary())})
    out = FrameSampleStage(codec="fake", every=2)(t)
    assert out.column("frame_index").to_pylist() == [0, 2, 4]
    assert out.column("video_id").to_pylist() == [7, 7, 7]


def test_audio_decode_stage():
    import numpy as np

    from blockchainspider_ray.stages.multimodal import (
        DecodeAudioStage,
        make_fake_audio,
    )

    with pytest.raises(NotImplementedError):
        DecodeAudioStage()(pa.table({"audio": pa.array([b""], pa.binary())}))

    t = pa.table(
        {
            "audio_id": pa.array([1, 2], pa.int64()),
            "audio": pa.array(
                [make_fake_audio(8000, 400, seed=1), make_fake_audio(16000, 800, seed=2)],
                pa.binary(),
            ),
        }
    )
    out = DecodeAudioStage(codec="fake")(t)
    assert out.column("sample_rate").to_pylist() == [8000, 16000]
    assert out.column("n_samples").to_pylist() == [400, 800]
    assert out.column("duration_s").to_pylist() == [400 / 8000, 800 / 16000]
    assert all(0 < r < 32768 for r in out.column("rms").to_pylist())
    assert "audio" not in out.column_names


def test_audio_window_stage_explodes_full_windows():
    from blockchainspider_ray.stages.multimodal import (
        AudioWindowStage,
        make_fake_audio,
    )

    # 700 samples at window 256 -> 2 full windows (trailing 188 dropped)
    t = pa.table(
        {
            "audio_id": pa.array([5], pa.int64()),
            "audio": pa.array([make_fake_audio(8000, 700, seed=3)], pa.binary()),
        }
    )
    out = AudioWindowStage(codec="fake", window=256)(t)
    assert out.column("window_index").to_pylist() == [0, 1]
    assert out.column("audio_id").to_pylist() == [5, 5]
    assert all(r > 0 for r in out.column("rms").to_pylist())


def test_resize_image_stage_reencodes():
    from blockchainspider_ray.stages.multimodal import (
        DecodeImageStage,
        ResizeImageStage,
        make_fake_image,
    )

    t = pa.table(
        {
            "image_id": pa.array([1], pa.int64()),
            "image": pa.array([make_fake_image(8, 6, 3, seed=9)], pa.binary()),
        }
    )
    resized = ResizeImageStage(codec="fake", out_w=4, out_h=4)(t)
    assert "image" in resized.column_names  # payload replaced, not dropped
    dec = DecodeImageStage(codec="fake")(resized)
    assert dec.column("width").to_pylist() == [4]
    assert dec.column("height").to_pylist() == [4]
    assert dec.column("channels").to_pylist() == [3]
    # nearest-neighbor keeps pixel values from the original
    assert 0 <= dec.column("mean_luma").to_pylist()[0] <= 255


def test_image_resize_query_pins_dims():
    from blockchainspider_ray.pipelines.queries import q_image_resize

    df = q_image_resize("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert (df["width"] == 4).all()
    assert (df["height"] == 4).all()
    assert (df["channels"] == 3).all()
    assert df["mean_luma"].between(0, 255).all()


def test_compression_ratio_pinned(ray_session):
    """gz_ratio: deterministic zlib-6 ratios; repetitive text compresses
    far below high-entropy text, and values match a direct zlib call."""
    import zlib

    import numpy as np

    from blockchainspider_ray.pipelines.queries import q_compression_ratio

    df = q_compression_ratio("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert (df["gz_ratio"] > 0).all() and (df["gz_ratio"] <= 1.5).all()
    # spot-pin three docs against an independent zlib call
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    by_id = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    for doc_id in list(by_id)[:3]:
        raw = by_id[doc_id].encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / max(1, len(raw)), 6)
        got = float(df.loc[df["doc_id"] == doc_id, "gz_ratio"].iloc[0])
        assert got == want
    # rerun is identical (determinism)
    df2 = q_compression_ratio("/root/testdata/sf0.001").to_pandas()
    assert np.array_equal(df["gz_ratio"].to_numpy(), df2["gz_ratio"].to_numpy())
