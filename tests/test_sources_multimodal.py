"""S2 seed import, S6 export, multimodal stages, property tests."""

import pyarrow as pa
import pytest

from freshonions_torscraper_ray.functions.regexes import canonicalize_url
from freshonions_torscraper_ray.sources.seeds import parse_onion_lines
from freshonions_torscraper_ray.stages.multimodal import (
    ImageDecoder,
    ImageResizer,
    media_rows_from_spans,
)

DOM = "a" * 16 + ".onion"
DOM3 = "b" * 56 + ".onion"


def test_parse_onion_lines_tolerant():
    t = pa.Table.from_arrays(
        [
            pa.array(
                [
                    f"visit http://{DOM}/page now",
                    "no onions here",
                    f"bare {DOM3} mention",
                    f"TWO: {DOM} and {DOM}",
                ]
            )
        ],
        names=["text"],
    )
    urls = parse_onion_lines(t).to_pydict()["url"]
    assert urls == [f"http://{DOM}/", f"http://{DOM3}/", f"http://{DOM}/", f"http://{DOM}/"]


def test_canonicalize_idempotent():
    # property: canonicalize ∘ canonicalize == canonicalize
    cases = [f"HTTP://{DOM.upper()}/A#x", f"https://{DOM}:443/p", f"http://{DOM3}:8080/q"]
    for c in cases:
        once = canonicalize_url(c)
        assert once is not None and canonicalize_url(once) == once


def _media_fixture():
    spans = [
        [
            {"kind": "text", "text": "hi", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": f"http://{DOM}/img/1.png", "offset": 2},
            {"kind": "image", "text": "", "media_ref": f"http://{DOM}/img/2.png", "offset": 3},
        ]
    ]
    from freshonions_torscraper_ray.schemas import DOCUMENTS

    return pa.Table.from_arrays(
        [pa.array([f"http://{DOM}/"], pa.string()), pa.array(spans, DOCUMENTS.field("spans").type)],
        names=["doc_id", "spans"],
    )


def test_media_explode_and_decode_deterministic():
    media = media_rows_from_spans(_media_fixture())
    assert media.num_rows == 2
    assert set(media["media_type"].to_pylist()) <= {"image", "video", "audio"}
    payloads1 = media["payload"].to_pylist()
    payloads2 = media_rows_from_spans(_media_fixture())["payload"].to_pylist()
    assert payloads1 == payloads2  # deterministic payloads

    import pyarrow.compute as pc

    imgs = media.filter(pc.equal(media["media_type"], "image"))
    if imgs.num_rows:
        dec = ImageDecoder()
        out1 = dec(imgs)
        out2 = ImageDecoder()(imgs)
        assert out1["height"].to_pylist() == out2["height"].to_pylist()
        assert "payload" not in out1.column_names  # raw bytes dropped post-decode
        assert len(out1["features"][0].as_py()) == ImageDecoder.FEATURE_DIM


def test_ppm_decode_exact_pixels():
    """Hand-built 2x3 PPM: decode/encode round-trip + exact features."""
    import numpy as np

    from freshonions_torscraper_ray.stages.multimodal import decode_ppm, encode_ppm

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = encode_ppm(px)
    assert payload.startswith(b"P6\n3 2\n255\n")
    back = decode_ppm(payload)
    assert np.array_equal(back, px)
    f = ImageDecoder.features(px)
    flat = px.reshape(-1, 3).astype(np.float32)
    assert np.allclose(f[0:3], flat.mean(axis=0))
    assert np.allclose(f[3:6], flat.std(axis=0))


def test_resize_real_pixels():
    """Nearest-neighbor resample: exact expected pixel selection."""
    import numpy as np

    from freshonions_torscraper_ray.stages.multimodal import decode_ppm, encode_ppm

    px = np.zeros((8, 4, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(8)[:, None] * 10  # row-coded red channel
    media = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "media_ref": pa.array(["r"], pa.string()),
            "payload": pa.array([encode_ppm(px)], pa.large_binary()),
            "media_type": pa.array(["image"], pa.string()),
        }
    )
    out = ImageResizer(max_side=4)(media)
    assert out["height"].to_pylist() == [4] and out["width"].to_pylist() == [2]
    rpx = decode_ppm(out["payload"][0].as_py())
    # rows sampled at 0,2,4,6 of the original (index*(8/4))
    assert rpx[:, 0, 0].tolist() == [0, 20, 40, 60]


def test_decoder_strict_mode_raises_on_library_format():
    dec = ImageDecoder(strict=True)
    if not dec._pil:
        jpeg_ish = pa.table(
            {
                "doc_id": pa.array(["d"], pa.string()),
                "media_ref": pa.array(["r"], pa.string()),
                "payload": pa.array([b"\xff\xd8\xff\xe0fakejpeg"], pa.large_binary()),
                "media_type": pa.array(["image"], pa.string()),
            }
        )
        with pytest.raises(NotImplementedError):
            dec(jpeg_ish)


def test_frame_sampler_demuxes_vid0():
    import numpy as np

    from freshonions_torscraper_ray.stages.multimodal import (
        FrameSampler,
        decode_ppm,
        encode_video,
    )

    frames = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(5)]
    media = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "media_ref": pa.array(["v"], pa.string()),
            "payload": pa.array([encode_video(frames)], pa.large_binary()),
            "media_type": pa.array(["video"], pa.string()),
        }
    )
    out = FrameSampler(stride=2, max_frames=2)(media)
    assert out["frame_idx"].to_pylist() == [0, 2]
    # the demuxed frame bytes are the REAL per-frame PPMs
    got = [decode_ppm(f.as_py())[0, 0, 0] for f in out["frame"]]
    assert got == [0, 2]
    out2 = FrameSampler(stride=2, max_frames=2)(media)
    assert out.to_pylist() == out2.to_pylist()  # deterministic
    strict = FrameSampler(strict=True)
    if not strict._av:
        mp4_ish = media.set_column(
            2, "payload", pa.array([b"\x00\x00\x00\x18ftypmp42"], pa.large_binary())
        )
        with pytest.raises(NotImplementedError):
            strict(mp4_ish)


@pytest.mark.usefixtures("ray_session")
def test_export_onion_list(tmp_path):
    import ray.data as rd

    from freshonions_torscraper_ray.sources.seeds import export_onion_list

    ds = rd.from_arrow(pa.Table.from_arrays([pa.array([DOM, DOM3])], names=["domain"]))
    out = tmp_path / "onions"
    export_onion_list(ds, str(out))
    import glob

    content = "".join(open(f).read() for f in glob.glob(str(out / "*")))
    assert DOM in content and DOM3 in content


def test_wav_roundtrip_and_features():
    import numpy as np

    from freshonions_torscraper_ray.stages.multimodal import (
        AudioFeatures,
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 1000, -1000, 500, -500, 0], dtype=np.int16)
    payload = encode_wav(s, rate=16000)
    back, rate = decode_wav(payload)
    assert rate == 16000 and np.array_equal(back, s)
    media = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "media_ref": pa.array(["a"], pa.string()),
            "payload": pa.array([payload], pa.large_binary()),
            "media_type": pa.array(["audio"], pa.string()),
        }
    )
    out = AudioFeatures()(media)
    assert out["sample_rate"].to_pylist() == [16000]
    assert out["n_samples"].to_pylist() == [6]
    x = s.astype(np.float64)
    assert out["rms"].to_pylist()[0] == pytest.approx(float(np.sqrt(np.mean(x * x))))
    # signbit flips: 0->1000 no (0 nonneg), 1000->-1000 yes, -1000->500 yes,
    # 500->-500 yes, -500->0 yes => 4/5
    assert out["zcr"].to_pylist()[0] == pytest.approx(0.8)
    strict = AudioFeatures(strict=True)
    mp3_ish = media.set_column(
        2, "payload", pa.array([b"ID3\x03fakemp3"], pa.large_binary())
    )
    with pytest.raises(NotImplementedError):
        strict(mp3_ish)
